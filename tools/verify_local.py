#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"`,
run `python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/graft_verify`.

For each query dir under outDir: run the oracle SQL in DuckDB over views named
after the parquet tables, read the SPARK result via pyarrow (types exactly as
written — NOT through DuckDB, which silently canonicalizes DECIMAL and other
representations to float64 and masked exactly the drift class the driver's
hasher flags), and compare schema + multiset of rows (sorted, column order by
name). A Spark output that keeps a raw DECIMAL column FAILS here even when
values are numerically identical — same contract as the driver.
"""
import sys, os, json, math, datetime, decimal
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """(kind, canonical-string) for one cell. Kinds deliberately DISTINGUISH
    decimal from float — representation drift must fail, not be masked."""
    if v is None or v is pd.NaT:
        return ("null", "")
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return ("float", "NaN")
        return ("float", repr(f))
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return ("bool", str(bool(v)))
    if isinstance(v, (int, np.integer)):
        return ("int", str(int(v)))
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return ("null", "")
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return ("ts", v.isoformat())
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        # normalize to a midnight timestamp: DuckDB's .df() renders DATE
        # columns as datetime64, pyarrow keeps datetime.date — same value,
        # asymmetric kinds without this
        return ("ts", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("list", str([canon(x) for x in v]))
    if isinstance(v, dict):
        return ("struct", str(sorted((k, canon(x)) for k, x in v.items())))
    return ("str", str(v))


def rows_key(row):
    return tuple(canon(v) for v in row)


def spark_df(qdir):
    """Read the Spark-written parquet with types AS WRITTEN (pyarrow)."""
    parts = sorted(p for p in os.listdir(qdir) if p.endswith(".parquet"))
    tables = [pq.read_table(os.path.join(qdir, p)) for p in parts]
    import pyarrow as pa
    tab = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    return tab.to_pandas(), [str(t) for t in tab.schema.types], list(tab.schema.names)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_skip = 0
    present = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracles) - present):
        # Verify wrote no output (builder crash or the DECIMAL final-schema
        # lint): a silent skip here would report all-green with a query gone
        print(f"FAIL  {name}: no Spark output written (Verify failed or lint rejected)")
        n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            sdf_all, stypes_raw, snames = spark_df(qdir)
        except Exception as e:
            print(f"FAIL  {name}: spark read: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name} (no oracle; rows={len(sdf_all)})")
            n_skip += 1
            continue
        try:
            oracle_rel = con.sql(oracles[name])
            scols = sorted(snames)
            ocols = sorted(oracle_rel.columns)
            if scols != ocols:
                print(f"FAIL  {name}: columns {scols} vs oracle {ocols}")
                n_fail += 1
                continue
            sdf = sdf_all[scols]
            odf = oracle_rel.df()[ocols]
            srows = sorted(rows_key(r) for r in sdf.itertuples(index=False))
            orows = sorted(rows_key(r) for r in odf.itertuples(index=False))
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
                # surface (but don't fail on) physical-type drift for audit
                decs = [n for n, t in zip(snames, stypes_raw) if "decimal" in t]
                flag = f"  [spark decimal cols: {decs}]" if decs else ""
                print(f"PASS  {name} ({len(srows)} rows){flag}")
                n_pass += 1
        except Exception as e:
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
