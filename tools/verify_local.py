#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"`,
run `python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/graft_verify`.

For each query dir under outDir: run the oracle SQL in DuckDB over views named
after the parquet tables, load the Spark result, compare schema + multiset of
rows (sorted by all columns, column order by name).
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    return v


def rows_key(row):
    return tuple((str(type(v)), str(canon(v))) for v in row)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        if name not in oracles:
            print(f"SKIP  {name} (no oracle; rows={len(spark_rel.fetchall())})")
            n_skip += 1
            continue
        try:
            oracle_rel = con.sql(oracles[name])
            scols = sorted(spark_rel.columns)
            ocols = sorted(oracle_rel.columns)
            if scols != ocols:
                print(f"FAIL  {name}: columns {scols} vs oracle {ocols}")
                n_fail += 1
                continue
            sdf = spark_rel.df()[scols]
            odf = oracle_rel.df()[ocols]
            srows = sorted((rows_key(r) for r in sdf.itertuples(index=False)))
            orows = sorted((rows_key(r) for r in odf.itertuples(index=False)))
            if len(srows) != len(orows):
                print(f"FAIL  {name}: rowcount {len(srows)} vs oracle {len(orows)}")
                n_fail += 1
            elif srows != orows:
                diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
                print(f"FAIL  {name}: first diff at sorted row {diff}:")
                print(f"      spark:  {srows[diff]}")
                print(f"      oracle: {orows[diff]}")
                n_fail += 1
            else:
                # types: compare duckdb-side dtypes of both frames
                stypes = [str(t) for _, t in sorted(zip(spark_rel.columns, spark_rel.types))]
                otypes = [str(t) for _, t in sorted(zip(oracle_rel.columns, oracle_rel.types))]
                flag = "" if stypes == otypes else f"  [type drift: {stypes} vs {otypes}]"
                print(f"PASS  {name} ({len(srows)} rows){flag}")
                n_pass += 1
        except Exception as e:
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
