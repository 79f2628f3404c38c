package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Tables
import graft.ops.LoggingService
import graft.sources.{LegacyQuerySource, Sources}

/** Oracle-checked queries for S7 (legacy query options), ST6 (quarantine),
  * X7 (logging thresholds). */
object OpsQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Single per-JVM scratch root for ret1's store (see the query comment). */
  private lazy val retRoot: String =
    graft.util.Scratch.dir("graft_ret")

  /** event_type → log level mapping shared by l1/l2/st8. */
  private def levelOf = when(col("event_type") === "error", "ERROR")
    .when(col("event_type") === "purchase", "WARN")
    .when(col("event_type") === "signup", "INFO")
    .when(col("event_type") === "click", "DEBUG")
    .otherwise("TRACE")

  /** (level, subsystem, message, ts) log projection over an events frame. */
  private def logRecordsOf(events: org.apache.spark.sql.DataFrame) =
    events.select(levelOf.as("level"),
      (col("user_id") % 3).cast("string").as("subsystem"),
      col("event_type").as("message"), col("ts"))

  /** Final merged-log projection shared by l2 (batch) and st8 (stream). */
  private def mergedLogColumns(df: org.apache.spark.sql.DataFrame) =
    df.select(col("subsystem"), col("level"), col("message"),
        col("win").getField("start").cast("long").as("win_start"),
        col("merged_count"),
        col("first_ts").cast("long").as("first_s"),
        col("last_ts").cast("long").as("last_s"))
      .orderBy("subsystem", "level", "message", "win_start")

  val queries: Map[String, Q] = Map(
    // ---- bloom-pruned semi-join: a selective order filter keeps ~3% of
    // keys; the bloom bitmap (built distributed, broadcast back) prunes
    // the lineitem side BEFORE its shuffle, then the exact semi-join
    // removes bloom false positives — result provably identical to the
    // plain semi-join the oracle runs ------------------------------------
    "bf1_bloom_prune" -> { (s, dir) =>
      val urgent = Tables.t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") >= 250000.0)
        .select("o_orderkey")
      graft.ops.BloomPrune.semiJoin(
          Tables.t(s, dir, "lineitem"), urgent,
          probeKey = "l_orderkey", buildKey = "o_orderkey",
          expectedNumItems = 100000L)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // ---- data-quality: one-scan column profile over orders --------------
    "dq1_profile" -> { (s, dir) =>
      graft.ops.DataQuality.profile(Tables.t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("col")
    },
    // ---- per-group winsorization (outlier clipping): values clipped to
    // [p05, p95] of their event_type — exact interpolated percentiles (the
    // q7-proven quantile_cont equivalence), bounds re-joined as a |types|-
    // row broadcast, clip itself is selection-only (least/greatest), so
    // the result hash-matches unrounded --------------------------------
    "dq3_winsorize" -> { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val bounds = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.05)").as("lo"),
          expr("percentile(value, 0.95)").as("hi"))
      ev.join(broadcast(bounds), "event_type")
        .select(col("event_id"), col("event_type"),
          least(greatest(col("value"), col("lo")), col("hi")).as("value_w"))
        .orderBy("event_id")
    },
    // ---- data-quality: expectation rules + FK check over a snapshot with
    // deterministic corruptions (same shape as st6's quarantine seeding) --
    "dq2_expectations" -> { (s, dir) =>
      val corrupt1 = col("l_orderkey") % 101 === 0 && col("l_linenumber") === 1
      val corrupt2 = col("l_orderkey") % 103 === 0 && col("l_linenumber") === 1
      val corrupt3 = col("l_orderkey") % 107 === 0 && col("l_linenumber") === 1
      val corrupt4 = col("l_orderkey") % 109 === 0 && col("l_linenumber") === 1
      val li = Tables.t(s, dir, "lineitem").select(
        when(corrupt1, -5.0).otherwise(col("l_quantity")).as("q"),
        when(corrupt2, 0.99).otherwise(col("l_discount")).as("d"),
        when(corrupt3, col("l_orderkey") + 30000000L)
          .otherwise(col("l_orderkey")).as("fk"),
        when(corrupt4, lit(null)).otherwise(col("l_returnflag")).as("rf"))
      graft.ops.DataQuality.expectations(li, Seq(
          "quantity_range" -> !col("q").between(1, 50),
          "discount_range" -> !col("d").between(0, 0.1),
          "returnflag_not_null" -> col("rf").isNull))
        .unionByName(graft.ops.DataQuality.fkViolations(li, "fk",
          Tables.t(s, dir, "orders"), "o_orderkey", "fk_orders"))
        .orderBy("rule")
    },
    // ---- CDC snapshot diff: recover the I/U/D changeset between two
    // whole-table snapshots (deterministic synthetic drift) ---------------
    "cdc1_snapshot_diff" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val old = orders.select(col("o_orderkey"), col("o_totalprice").as("v"),
        col("o_orderstatus").as("st"))
      val neu = orders.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10)
            .otherwise(col("o_totalprice")).as("v"),
          col("o_orderstatus").as("st"))
        .unionByName(orders.filter(col("o_orderkey") % 500 === 0)
          .select((col("o_orderkey") + 20000000L).as("o_orderkey"),
            col("o_totalprice").as("v"), lit("N").as("st")))
      graft.ops.SnapshotDiff.diff(old, neu, Seq("o_orderkey"))
        .orderBy("op", "o_orderkey")
    },
    // ---- CDC closure: recover the changeset with SnapshotDiff, APPLY it
    // back onto the old snapshot with MERGE — the result must reconstruct
    // the new snapshot exactly (the oracle IS the new snapshot). This is
    // the incremental-consumer contract the two operators exist for ------
    "cdc2_diff_apply" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val old = orders.select(col("o_orderkey"), col("o_totalprice").as("v"),
        col("o_orderstatus").as("st"))
      val neu = orders.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10)
            .otherwise(col("o_totalprice")).as("v"),
          col("o_orderstatus").as("st"))
        .unionByName(orders.filter(col("o_orderkey") % 500 === 0)
          .select((col("o_orderkey") + 20000000L).as("o_orderkey"),
            col("o_totalprice").as("v"), lit("N").as("st")))
      val cs = graft.ops.SnapshotDiff.changeset(old, neu, Seq("o_orderkey"))
      graft.ops.MergeInto.merge(old, cs, Seq("o_orderkey"),
          matchedDelete = Some(col("op") === "D"),
          matchedUpdate = Map("v" -> col("new_v"), "st" -> col("new_st")),
          notMatchedInsert = Some(Map(
            "v" -> col("new_v"), "st" -> col("new_st"))))
        .orderBy("o_orderkey")
    },
    // ---- h1: recursive hierarchy explosion — the WITH RECURSIVE surface
    // Spark SQL lacks, as an operator: customers arranged into a dense
    // tree (parent = key div 8, root 0), exploded into (node, depth,
    // materialized path) by Hierarchy's frontier loop; the oracle IS a
    // recursive CTE, so engine recursion is checked against real SQL
    // recursion ----------------------------------------------------------
    "h1_hierarchy" -> { (s, dir) =>
      // custkey 0 IS the root — as a child row it would be a self-loop
      val children = Tables.t(s, dir, "customer")
        .filter(col("c_custkey") > 0)
        .select(col("c_custkey").as("child"),
          expr("c_custkey div 8").as("parent"))
      graft.ops.Hierarchy.explode(children, "child", "parent", rootId = 0L)
        .orderBy("node")
    },
    // ---- h2: subtree rollup over the h1 tree — the reason hierarchies
    // get materialized paths: every node's subtree total (count + balance)
    // falls out of ONE explode of the path into its ancestors + one
    // co-keyed aggregation, no per-level joins. Balances are summed in
    // DECIMAL(28,12) (exact, order-free) ---------------------------------
    "h2_subtree_rollup" -> { (s, dir) =>
      val d28 = org.apache.spark.sql.types.DecimalType(28, 12)
      val cust = Tables.t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      val children = cust.filter(col("c_custkey") > 0)
        .select(col("c_custkey").as("child"),
          expr("c_custkey div 8").as("parent"))
      val tree = graft.ops.Hierarchy.explode(children, "child", "parent",
        rootId = 0L)
      tree.join(cust, tree("node") === cust("c_custkey"))
        .select(explode(split(col("path"), "/")).as("anc"), col("c_acctbal"))
        .groupBy(col("anc").cast("long").as("node"))
        .agg(count(lit(1)).as("subtree_n"),
          sum(col("c_acctbal").cast(d28)).cast("double").as("subtree_bal"))
        .orderBy("node")
    },
    // ---- dq7: train/val/test split LEAKAGE — the eval-contamination bug
    // class: two NEAR-duplicate documents (≥ 10 shared 5-token shingles,
    // ss1's pair definition and lossless prefix-filtered machinery) land
    // in different splits of tx16's deterministic md5-mod-100 split
    // (trainValTestSplit — the ONE shared definition), silently inflating
    // eval scores. Pairs are split-labeled by two co-keyed joins and
    // counted per unordered split pair; non-empty output IS the finding.
    // Scale shape = ss1's + two equi-joins -------------------------------
    "dq7_split_leakage" -> { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
        .withColumn("__toks", split(col("text"), " "))
        .withColumn("__sh", graft.dedup.TextDedup.wordShingles(col("__toks"), 5))
      val splits = Tables.t(s, dir, "documents").select(col("doc_id"),
        graft.dedup.TextDedup.trainValTestSplit(col("doc_id")).as("split"))
      graft.dedup.OverlapJoin.join(docs, "doc_id", "__sh", minOverlap = 10)
        .join(splits.select(col("doc_id").as("id_a"), col("split").as("sa")),
          "id_a")
        .join(splits.select(col("doc_id").as("id_b"), col("split").as("sb")),
          "id_b")
        .filter(col("sa") =!= col("sb"))
        .groupBy(least(col("sa"), col("sb")).as("split_a"),
          greatest(col("sa"), col("sb")).as("split_b"))
        .agg(count(lit(1)).as("n_leaked_pairs"))
        .orderBy("split_a", "split_b")
    },
    // ---- dq13: benchmark CONTAMINATION audit — the decontamination stage
    // every LLM training pipeline runs before eval (GPT-3-style n-gram
    // overlap): for each held-out "benchmark" doc (doc_id % 97 — disjoint
    // from tx16's split universe), the fraction of its distinct 5-token
    // shingles that appear ANYWHERE in the train corpus. dq7 finds leaked
    // near-dup PAIRS; this is the per-eval-doc hit-rate the
    // decontaminator thresholds on. Scale shape: both sides shuffle
    // co-keyed on the gram (train side pre-distinct'd — the join never
    // sees duplicate grams), then one small per-doc aggregate; no
    // pair-space, no window ----------------------------------------------
    // ---- dq14: dedup-inflation audit — the "effective dataset size"
    // number a curation pipeline reports: per source, how many tokens
    // survive dd18's exact duplicated-substring removal. Composes the ONE
    // shared mask (DedupQueries.dupSpanMask) with a per-doc count and a
    // |sources|-row rollup; the ratio is the only double and rides the
    // standard D6 round ---------------------------------------------------
    "dq14_dedup_inflation" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val docs = Tables.t(s, dir, "documents")
      DedupQueries.dupSpanMask(docs)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("toks"),
          count(when(col("rm") === 1, 1)).as("dups"))
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"),
          sum("dups").as("n_dup_tokens"))
        .withColumn("dup_ratio", (col("n_dup_tokens").cast("double") /
          col("n_tokens")).cast(D6).cast("double"))
        .orderBy("source")
    },
    "dq13_contamination" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val sh = Tables.t(s, dir, "documents")
        .withColumn("__toks", split(col("text"), " "))
        .select(col("doc_id"),
          explode(graft.dedup.TextDedup.wordShingles(col("__toks"), 5))
            .as("gram"))
      val ev = sh.filter(col("doc_id") % 97 === 0)
      val tr = sh.filter(col("doc_id") % 97 =!= 0).select("gram").distinct()
      ev.join(tr.withColumn("__hit", lit(1L)), Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_grams"))
            .cast(D6).cast("double").as("hit_frac"),
          (col("n_hit") > 0).cast("int").as("contaminated"))
        .orderBy("doc_id")
    },
    // ---- dq4: equi-width histogram of a numeric column per event type —
    // the binned-distribution profile next to dq1's moments. Two exact
    // aggregations: global min/max (1 row, broadcast back) fix the bin
    // edges, then one co-keyed (type, bin) count. Bin index is
    // floor((v−min)/width) clamped to the last bin — min/max/width are
    // identical doubles on both engines, so the floor is too (no epsilon,
    // no rounding) -------------------------------------------------------
    "dq4_histogram" -> { (s, dir) =>
      // NULL values are excluded (a histogram of observations, not a
      // null-count — dq1 profiles nulls); a degenerate hi == lo range
      // puts everything in bin 0 rather than dividing by a zero width
      // (where Spark's floor(NaN)→0 and DuckDB's →NULL would diverge)
      val ev = Tables.t(s, dir, "events")
        .select(col("event_type"), col("value"))
        .filter(col("value").isNotNull)
      val edges = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      ev.crossJoin(broadcast(edges))
        .withColumn("bin", when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit(9L),
            floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / 10.0))
              .cast("long"))))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bin")
    },
    // ---- dq8: k-anonymity audit — the privacy gate next to tx6's PII
    // scrub: group the table by its quasi-identifier tuple (nation,
    // segment, banded balance — banding is itself the generalization step
    // of k-anonymization) and flag every equivalence class smaller than
    // k=5 as re-identifiable. Exact, one map-side-combined aggregation;
    // the band division is shared IEEE double math (floor(x/1000)) ------
    "dq8_k_anonymity" -> { (s, dir) =>
      Tables.t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("group_size"))
        .withColumn("k_anonymous", (col("group_size") >= 5).cast("int"))
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")
    },
    // ---- dq9: Benford first-digit audit — the classic fabricated-data
    // screen for financial columns: observed first-significant-digit
    // counts of o_totalprice vs the Benford expectation N·log10(1+1/d),
    // with the per-digit chi-square contribution. Counts are exact
    // integers; float enters only at log10/square/divide (identical IEEE
    // inputs on both engines), then the one DECIMAL(18,6) round. Scale
    // shape: one map-side-combined digit agg + a 1-row broadcast of N —
    // nothing corpus-sized moves -----------------------------------------
    "dq9_benford" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val digits = Tables.t(s, dir, "orders")
        .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
          .as("digit"))
      val n = digits.agg(count(lit(1)).as("total"))
      digits.groupBy("digit").agg(count(lit(1)).as("n_obs"))
        .crossJoin(broadcast(n))
        .withColumn("ne", col("total").cast("double") *
          log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
        .select(col("digit"), col("n_obs"),
          col("ne").cast(D6).cast("double").as("n_exp"),
          ((col("n_obs").cast("double") - col("ne")) *
            (col("n_obs").cast("double") - col("ne")) / col("ne"))
            .cast(D6).cast("double").as("chi2"))
        .orderBy("digit")
    },
    // ---- dq10: functional-dependency audit — the schema-profiling step
    // behind "is this column a key / does A determine B": for each
    // candidate FD, the number of LHS groups, the groups carrying >1
    // distinct RHS (the violations), and the row mass inside violating
    // groups. One map-side-combined agg per candidate, exact counts; a
    // held FD (the PK) reports zeros, a broken one quantifies HOW broken -
    "dq10_fd_audit" -> { (s, dir) =>
      def fd(df: DataFrame, name: String, lhs: String, rhs: String) =
        df.groupBy(col(lhs))
          .agg(count_distinct(col(rhs)).as("d"), count(lit(1)).as("n"))
          .agg(lit(name).as("fd"), count(lit(1)).as("n_groups"),
            sum((col("d") > 1).cast("long")).as("violating_groups"),
            coalesce(sum(when(col("d") > 1, col("n"))), lit(0L))
              .as("violating_rows"))
      fd(Tables.t(s, dir, "orders"),
          "o_orderkey->o_custkey", "o_orderkey", "o_custkey")
        .unionByName(fd(Tables.t(s, dir, "lineitem"),
          "l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"))
        .unionByName(fd(Tables.t(s, dir, "customer"),
          "c_nationkey->c_mktsegment", "c_nationkey", "c_mktsegment"))
        .orderBy("fd")
    },
    // ---- dq11: profile DRIFT between two snapshots — dq1's one-scan
    // column profile computed on the base table and on a deterministically
    // drifted twin (nulls injected %11, values scaled %7, rows dropped
    // %13), then diffed per column: the "did yesterday's load change the
    // data's shape" monitoring primitive. Two one-scan profiles + a
    // |cols|-row join; exact counts ---------------------------------------
    "dq11_profile_drift" -> { (s, dir) =>
      val base = Tables.t(s, dir, "orders")
      val drifted = base
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 11 === 0, lit(null))
            .otherwise(col("o_orderstatus")))
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 10)
            .otherwise(col("o_totalprice")))
        .filter(col("o_orderkey") % 13 =!= 0)
      val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
      def slim(df: DataFrame, suf: String) =
        graft.ops.DataQuality.profile(df, cols)
          .select(col("col"), col("n_rows").as(s"rows_$suf"),
            col("n_nulls").as(s"nulls_$suf"),
            col("n_distinct").as(s"nd_$suf"))
      slim(base, "a").join(slim(drifted, "b"), "col")
        .select(col("col"),
          (col("rows_b") - col("rows_a")).as("row_drift"),
          (col("nulls_b") - col("nulls_a")).as("null_drift"),
          (col("nd_b") - col("nd_a")).as("distinct_drift"))
        .orderBy("col")
    },
    // ---- cdc3: SCD Type-2 history build — three order snapshots (base,
    // price bump for key%7, status flip for key%5) collapsed into
    // effective-dated rows by Scd2's gaps-and-islands (two key-partitioned
    // windows + one agg; first() inside a run is deterministic because a
    // run is BY CONSTRUCTION attribute-constant, and the oracle's min()
    // agrees for the same reason). Completes the CDC family: cdc1 diffs,
    // cdc2 applies, cdc3 accumulates history -----------------------------
    "cdc3_scd2" -> { (s, dir) =>
      val base = Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").as("price"),
          col("o_orderstatus").as("st"))
      val p2 = when(col("o_orderkey") % 7 === 0, col("price") + 10)
        .otherwise(col("price"))
      val s3 = when(col("o_orderkey") % 5 === 0, lit("X")).otherwise(col("st"))
      val snaps = base.withColumn("version", lit(1L))
        .unionByName(base.withColumn("price", p2).withColumn("version", lit(2L)))
        .unionByName(base.withColumn("price", p2).withColumn("st", s3)
          .withColumn("version", lit(3L)))
      graft.ops.Scd2.build(snaps, Seq("o_orderkey"), "version",
          Seq("price", "st"))
        .select(col("o_orderkey"), col("valid_from"), col("valid_to"),
          col("price"), col("st"), col("is_current"))
        .orderBy("o_orderkey", "valid_from")
    },
    // ---- cdc4: incremental aggregate maintenance — apply a signed CDC
    // changeset (insert/update/delete with old+new values) to a per-key
    // (count, total) aggregate WITHOUT rescanning the base facts; exact
    // DECIMAL retraction, keys whose count hits zero drop out. Scale
    // shape: delta pre-agg (map-side combined) + ONE co-keyed full-outer
    // merge — cost is O(|delta| + |agg keys|), never O(base). The oracle
    // recomputes the aggregate from the post-change fact table directly,
    // so maintained-equals-recomputed is the checked contract ------------
    "cdc4_incremental_agg" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val base = orders.filter(col("o_orderkey") % 10 =!= 0)
      val oldAgg = base.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("total"))
      val changes = orders.filter(col("o_orderkey") % 10 === 0)
        .select(lit("i").as("op"), col("o_custkey"),
          lit(null).cast("double").as("old_v"),
          col("o_totalprice").as("new_v"))
        .unionByName(orders.filter(col("o_orderkey") % 10 === 1)
          .select(lit("u").as("op"), col("o_custkey"),
            col("o_totalprice").as("old_v"),
            (col("o_totalprice") + 100).as("new_v")))
        .unionByName(orders.filter(col("o_orderkey") % 10 === 2)
          .select(lit("d").as("op"), col("o_custkey"),
            col("o_totalprice").as("old_v"),
            lit(null).cast("double").as("new_v")))
      graft.ops.IncrementalAgg.applyDelta(oldAgg, changes, Seq("o_custkey"))
        // exact DECIMAL retraction internally; emit DOUBLE (Verify lints
        // DecimalType out of final schemas — driver hashing contract)
        .withColumn("total", col("total").cast("double"))
        .orderBy("o_custkey")
    },
    // ---- cdc6: PARTITIONED maintained rollup — the upgrade path cdc4/
    // st19's copy-on-write refresh documents in SCALE.md §5, shipped: the
    // (user_id → n, total) aggregate lives in a PartitionedStore (16
    // xxhash64 partitions, manifest-committed), and each of 4 sequential
    // delta batches (events quartered by event_id % 4) refreshes ONLY the
    // partitions its delta keys hash to — per-batch write I/O is
    // O(touched partitions), not O(all keys), and the one atomic manifest
    // rename keeps readers on a consistent view version throughout
    // (PartitionedRollupSpec pins untouched-bytes-identical + failure
    // atomicity; this query pins the maintained VALUES: after all
    // batches, maintained == recomputed-from-scratch, the cdc4 contract)
    "cdc6_partitioned_rollup" -> { (s, dir) =>
      val root = graft.util.Scratch.dir("graft_cdc6")
      val ps = new graft.store.PartitionedStore(s, root, Seq("user_id"), 16)
      val ev = Tables.t(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
      // empty initial rollup (schema from an impossible filter)
      ps.init(ev.filter(lit(false)).groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
            .as("total")))
      for (batch <- 0L until 4L) {
        val delta = ev.filter(col("event_id") % 4 === batch)
          .select(lit("i").as("op"), col("user_id"),
            lit(null).cast("double").as("old_v"), col("value").as("new_v"))
          .cache()
        val touched = ps.touchedBy(delta)
        if (touched.nonEmpty) {
          val cur = ps.readPartitions(touched)
          ps.refresh(touched,
            graft.ops.IncrementalAgg.applyDelta(cur, delta, Seq("user_id")))
        }
        delta.unpersist()
      }
      ps.read()
        .select(col("user_id"), col("n"), col("total").cast("double").as("total"))
        .orderBy("user_id")
    },
    // ---- cdc7: TIME-TRAVEL diff — cdc1's snapshot diff fed from the
    // store's OWN retained versions instead of two separately-kept tables:
    // the partitioned rollup absorbs two delta batches (manifest versions
    // 2 and 3), then SnapshotDiff.diff(readAsOf(2), readAsOf(3)) recovers
    // exactly the changeset the second batch caused. This is what the
    // manifest lineage is FOR: an incremental consumer reads "what changed
    // between commits n and n+1" without the upstream retaining anything
    // beyond its own store (retainVersions bounds the window). The oracle
    // recomputes both rollup versions from events directly and diffs them
    // in SQL — maintained-version diff == recomputed-version diff --------
    "cdc7_time_travel_diff" -> { (s, dir) =>
      val root = graft.util.Scratch.dir("graft_cdc7")
      val ps = new graft.store.PartitionedStore(s, root, Seq("user_id"), 16,
        retainVersions = 3)
      val ev = Tables.t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
      ps.init(ev.filter(lit(false)).groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
            .as("total"))) // v1: empty rollup
      for (batch <- 0L until 2L) { // v2, v3
        val delta = ev.filter(col("event_id") % 2 === batch)
          .select(lit("i").as("op"), col("user_id"),
            lit(null).cast("double").as("old_v"), col("value").as("new_v"))
          .cache()
        val touched = ps.touchedBy(delta)
        if (touched.nonEmpty) {
          ps.refresh(touched, graft.ops.IncrementalAgg.applyDelta(
            ps.readPartitions(touched), delta, Seq("user_id")))
        }
        delta.unpersist()
      }
      def snap(v: Int) = ps.readAsOf(v)
        .select(col("user_id"), col("n"),
          col("total").cast("double").as("total"))
      graft.ops.SnapshotDiff.diff(snap(2), snap(3), Seq("user_id"))
        .orderBy("op", "user_id")
    },
    // ---- cdc8: SCHEMA EVOLUTION on the partitioned store — the additive-
    // column lakehouse feature: the rollup (n, total) absorbs a new
    // `click_max` column via PartitionedStore.evolve, rewriting ONLY the
    // partitions of users who clicked; every other user's parquet stays
    // byte-untouched and reads the new column as NULL through the evolved
    // schema. The oracle recomputes the final view relationally (purchase
    // rollup LEFT JOIN click max) — NULL exactly where no click exists, so
    // the result is partitioning-independent by construction and the
    // untouched-partitions-read-NULL path is what the equality checks ----
    "cdc8_schema_evolution" -> { (s, dir) =>
      val root = graft.util.Scratch.dir("graft_cdc8")
      val ps = new graft.store.PartitionedStore(s, root, Seq("user_id"), 16,
        retainVersions = 3)
      val ev = Tables.t(s, dir, "events")
      ps.init(ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
            .as("total"))) // v1: the pre-evolution rollup
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id")
        .agg(max(col("value").cast("decimal(18,2)")).as("click_max"))
      // evolution trigger: stored users who clicked; their partitions only
      val trigger = clicks.join(ps.read().select("user_id"), "user_id")
      val touched = ps.touchedBy(trigger.select("user_id"))
      require(touched.nonEmpty, "fixture invariant: some purchaser clicked")
      ps.evolve(touched,
        ps.readPartitions(touched).join(trigger, Seq("user_id"), "left")) // v2
      ps.read()
        .select(col("user_id"), col("n"),
          col("total").cast("double").as("total"),
          col("click_max").cast("double").as("click_max"))
        .orderBy("user_id")
    },
    // ---- cdc5: incremental JOIN maintenance — the view half of cdc4's
    // aggregate maintenance: a materialized orders⋈customer view absorbs
    // a CDC batch touching BOTH sides (order inserts/updates/deletes +
    // customer balance updates and deletions) via the delta decomposition
    // in IncrementalJoin — anti-join survivors + two delta-bounded joins,
    // never re-running the base join. The oracle recomputes the join from
    // the post-change tables directly, so maintained == recomputed is the
    // checked contract (the cdc4 contract applied to joins) --------------
    "cdc5_incremental_join" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = Tables.t(s, dir, "customer")
        .select("c_custkey", "c_acctbal", "c_mktsegment")
      // base tables BEFORE the batch (inserts %10==0 not yet present;
      // updated rows at their old values; deletes still present)
      val aOld = orders.filter(col("o_orderkey") % 10 =!= 0)
      val bOld = cust
      val vOld = aOld.join(bOld, col("o_custkey") === col("c_custkey"))
      // post-change tables (how the caller maintains them is its business;
      // here they are the direct apply of the synthetic changes)
      val aNew = orders.filter(col("o_orderkey") % 10 =!= 2)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 1, col("o_totalprice") + 100)
            .otherwise(col("o_totalprice")))
      val bNew = cust.filter(col("c_custkey") % 31 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 7 === 3, col("c_acctbal") + 50)
            .otherwise(col("c_acctbal")))
      val aChanged = orders.filter(col("o_orderkey") % 10 <= 2)
        .select("o_orderkey").distinct()
      val bChanged = cust
        .filter(col("c_custkey") % 7 === 3 || col("c_custkey") % 31 === 0)
        .select("c_custkey").distinct()
      graft.ops.IncrementalJoin.applyDelta(vOld, aNew, bNew,
          aChanged, bChanged,
          aKey = "o_orderkey", bKey = "c_custkey",
          joinExpr = "o_custkey = c_custkey")
        .orderBy("o_orderkey")
    },
    // ---- S7: legacy V1 query object with control fields -----------------
    "s7_legacy_query" -> { (s, dir) =>
      val q = LegacyQuerySource.parse(Map(
        "event_type" -> "purchase",
        ":tmin" -> java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        ":tmax" -> java.sql.Timestamp.valueOf("2024-01-20 00:00:00"),
        ":fields" -> Seq("event_id", "user_id", "value"),
        ":splits" -> 8))
      // injected predicate = the ACL/soft-delete seam
      LegacyQuerySource.run(Tables.t(s, dir, "events"), q, "ts",
          injected = Some(col("user_id") >= 0))
        .orderBy("event_id")
    },
    // ---- ST6: malformed-JSON quarantine shunt ---------------------------
    "st6_quarantine" -> { (s, dir) =>
      // deterministically corrupt ~1% of props payloads
      val ev = Tables.t(s, dir, "events").withColumn("props",
        when(col("event_id") % 97 === 0, concat(lit("{bad"), col("props")))
          .otherwise(col("props")))
      val parsed = Sources.parseJsonQuarantine(ev, "props",
        StructType(Seq(StructField("k", LongType))))
      parsed.select(col("event_id"), col("_quarantined"),
          col("props_parsed.k").as("k"))
        .orderBy("event_id")
    },
    // ---- §1.3 collide policy: ragged-batch union with widening ----------
    "c1_collide_widen" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      // batch A: narrow types; batch B: conflicting o_orderkey type
      val a = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"),
          col("o_totalprice").cast("float").as("price"),
          col("o_custkey").cast("int").as("cust"))
      val b = orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey").cast("string").as("o_orderkey"),
          col("o_totalprice").as("price"), col("o_custkey").as("cust"))
      graft.model.SchemaEvolution.unionWithPolicy(Seq(a, b))
        .orderBy("o_orderkey")
    },
    // ---- skew handling: salted two-stage agg over a 3-key distribution --
    // result must equal the direct groupBy (associative combine) — the
    // hot-key aggregation pattern, oracle-pinned
    "skew1_salted_agg" -> { (s, dir) =>
      graft.ops.Skew.saltedAgg(Tables.t(s, dir, "lineitem"),
          keyCols = Seq("l_returnflag"), sumCols = Seq("l_quantity"),
          buckets = 16)
        .orderBy("l_returnflag")
    },
    // ---- skew handling: salted join fans a hot probe key over buckets ---
    "skew2_salted_join" -> { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
      val dim = li.select(col("l_returnflag")).distinct()
        .withColumn("label", concat(lit("flag_"), col("l_returnflag")))
      graft.ops.Skew.saltedJoin(
          li.select("l_orderkey", "l_linenumber", "l_returnflag"),
          dim, keyCols = Seq("l_returnflag"), buckets = 8)
        .orderBy("l_orderkey", "l_linenumber")
    },
    // ---- X7: logging level thresholds -----------------------------------
    "l1_log_threshold" -> { (s, dir) =>
      // synthesize log records from events: level by event_type
      val logs = Tables.t(s, dir, "events")
        .select(col("event_id"), levelOf.as("level"),
          (col("user_id") % 3).cast("string").as("subsystem"))
      LoggingService.levelFilter(logs,
          thresholds = Map("0" -> "ERROR", "1" -> "DEBUG"), defaultLevel = "INFO")
        .orderBy("event_id")
    },
    // X7 merge/rate-limit: duplicate log records collapse per key per hourly
    // rate window with a suppressed-duplicate count — one output row per hot
    // key per window
    "l2_log_merge" -> { (s, dir) =>
      mergedLogColumns(LoggingService.mergeAndRateLimit(
        logRecordsOf(Tables.t(s, dir, "events")), windowSec = 3600))
    },
    // retention: time-partitioned write + partition-level age-out at a FIXED
    // reference instant (deterministic); survivors = partitions at/after the
    // truncated cutoff. Partition drop is a directory delete — no rewrite.
    // One temp root per JVM + overwrite: repeated invocations (bench warmup
    // + timed run) rebuild in place instead of leaking a copy each time
    "ret1_age_out" -> { (s, dir) =>
      val store = new graft.store.BucketStore(s, retRoot)
      val b = graft.model.Bucket("/ret/events", graft.model.DataSchema(
        temporal = Some(graft.model.TemporalSchema("ts",
          graft.model.GroupingPeriod.Daily)),
        storage = Some(graft.model.StorageSchema(
          existAgeMax = Some(java.time.Duration.ofDays(10))))))
      store.write(b, Tables.t(s, dir, "events"),
        mode = org.apache.spark.sql.SaveMode.Overwrite)
      store.ageOut(b, "processed",
        now = java.time.Instant.parse("2024-01-20T00:00:00Z"))
      store.read(b, "processed")
        .groupBy(col(graft.store.BucketStore.PartitionCol).cast("string").as("day"))
        .agg(count(lit(1)).as("n"))
        .orderBy("day")
    },
    // ---- robust outlier audit: median/MAD (the robust z-score) per
    // event_type — the outlier rule data-quality teams reach for when
    // dq3's percentile clipping is too blunt. Two exact interpolated
    // percentiles (the q7/dq3-proven percentile ≡ quantile_cont), each
    // re-joined as a |types|-row broadcast; the 4.4478 (= 3·1.4826 robust
    // sigma) threshold is a single shared literal so both engines parse
    // the same decimal→binary rounding. One double compare per row ------
    "dq12_mad_outliers" -> { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val th = dev.groupBy("event_type")
        .agg(max(col("med")).as("med"),
          expr("percentile(adev, 0.5)").as("mad"),
          count(lit(1)).as("n"))
      dev.select("event_type", "adev")
        .join(broadcast(th), "event_type")
        .groupBy(col("event_type"), col("n"), col("med"), col("mad"))
        // coalesce: an all-NULL-value type sums NULL predicates to NULL
        // where the oracle's count(*) FILTER yields 0 — align to 0
        .agg(coalesce(sum((col("adev") > lit(4.4478) * col("mad"))
          .cast("long")), lit(0L)).as("n_outliers"))
        .select(col("event_type"), col("n"), col("med"), col("mad"),
          col("n_outliers"),
          (col("n_outliers").cast("double") / col("n")).as("rate"))
        .orderBy("event_type")
    },
    // X7×ST: the SAME merge/rate-limit module run as a streaming query
    // (shared batch/stream modules, ST4) — update-mode changelog, final
    // state must equal the batch result, so l2's oracle applies verbatim
    "st8_stream_log_merge" -> { (s, dir) =>
      val raw = graft.streaming.Streams.parquetStream(s, s"$dir/events.parquet",
        s.read.parquet(s"$dir/events.parquet").schema)
      val logs = logRecordsOf(Tables.normalizeTs(raw))
      mergedLogColumns(graft.streaming.Streams.runWindowedAgg(logs,
        df => LoggingService.mergeAndRateLimit(df, windowSec = 3600),
        keyCols = Seq("subsystem", "level", "message", "win"),
        statePartitions = Some(8)))
    }
  )

  /** One oracle for both the batch (l2) and streaming (st8) log merge —
    * the streaming final state must equal the batch aggregate. */
  private val logMergeOracleSql: String =
      ("WITH logs AS (SELECT CASE event_type WHEN 'error' THEN 'ERROR' " +
        "WHEN 'purchase' THEN 'WARN' WHEN 'signup' THEN 'INFO' WHEN 'click' THEN 'DEBUG' " +
        "ELSE 'TRACE' END AS level, CAST(user_id % 3 AS VARCHAR) AS subsystem, " +
        "event_type AS message, ts FROM events) " +
        "SELECT subsystem, level, message, " +
        "CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start, " +
        "CAST(count(*) AS BIGINT) AS merged_count, " +
        "CAST(floor(epoch(min(ts))) AS BIGINT) AS first_s, " +
        "CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s " +
        "FROM logs GROUP BY 1, 2, 3, 4 " +
        "ORDER BY subsystem, level, message, win_start")

  val oracle: Map[String, String] = Map(
    // the recompute-from-scratch truth the maintained aggregate must equal
    // exactly: final facts = base (%10 != 0 kept, minus deletes %10==2)
    // plus inserts (%10==0), with updates (%10==1) at the new price
    // maintained-equals-recomputed for the PARTITIONED rollup: same truth
    // as st19's (all purchases, grouped), independent of the 4-way batch
    // split AND of the partition routing (DECIMAL folds commute)
    "cdc6_partitioned_rollup" ->
      ("SELECT user_id, count(*) AS n, " +
        "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total " +
        "FROM events WHERE event_type = 'purchase' " +
        "GROUP BY 1 ORDER BY 1"),
    // the recompute-from-scratch truth for the maintained JOIN view:
    // post-change orders (deletes %10==2 out, updates %10==1 re-priced,
    // inserts %10==0 present) joined to post-change customers (deletes
    // %31==0 out, %7==3 re-balanced)
    "cdc5_incremental_join" ->
      ("WITH a AS (SELECT o_orderkey, o_custkey, " +
        "CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice + 100 " +
        "ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 10 <> 2), " +
        "b AS (SELECT c_custkey, " +
        "CASE WHEN c_custkey % 7 = 3 THEN c_acctbal + 50 " +
        "ELSE c_acctbal END AS c_acctbal, c_mktsegment " +
        "FROM customer WHERE c_custkey % 31 <> 0) " +
        "SELECT o_orderkey, o_custkey, o_totalprice, " +
        "c_custkey, c_acctbal, c_mktsegment " +
        "FROM a JOIN b ON o_custkey = c_custkey ORDER BY o_orderkey"),
    "cdc4_incremental_agg" ->
      ("WITH f AS (SELECT o_custkey, " +
        "CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice + 100 " +
        "ELSE o_totalprice END AS p " +
        "FROM orders WHERE o_orderkey % 10 <> 2) " +
        "SELECT o_custkey, count(*) AS n, " +
        "CAST(CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total " +
        "FROM f GROUP BY 1 ORDER BY 1"),
    "dq1_profile" ->
      ("SELECT 'o_orderkey' AS col, count(*) AS n_rows, count(*)-count(o_orderkey) AS n_nulls, " +
        "count(DISTINCT o_orderkey) AS n_distinct, CAST(min(o_orderkey) AS VARCHAR) AS min_v, " +
        "CAST(max(o_orderkey) AS VARCHAR) AS max_v FROM orders " +
        "UNION ALL SELECT 'o_custkey', count(*), count(*)-count(o_custkey), " +
        "count(DISTINCT o_custkey), CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders " +
        "UNION ALL SELECT 'o_orderstatus', count(*), count(*)-count(o_orderstatus), " +
        "count(DISTINCT o_orderstatus), CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM orders " +
        "UNION ALL SELECT 'o_orderpriority', count(*), count(*)-count(o_orderpriority), " +
        "count(DISTINCT o_orderpriority), CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM orders " +
        "ORDER BY col"),
    "dq3_winsorize" ->
      ("WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS lo, " +
        "quantile_cont(value, 0.95) AS hi FROM events GROUP BY 1) " +
        "SELECT event_id, e.event_type, least(greatest(value, lo), hi) AS value_w " +
        "FROM events e JOIN b USING (event_type) ORDER BY event_id"),
    "dq2_expectations" ->
      ("WITH c AS (SELECT " +
        "CASE WHEN l_orderkey % 101 = 0 AND l_linenumber = 1 THEN -5.0 ELSE l_quantity END AS q, " +
        "CASE WHEN l_orderkey % 103 = 0 AND l_linenumber = 1 THEN 0.99 ELSE l_discount END AS d, " +
        "CASE WHEN l_orderkey % 107 = 0 AND l_linenumber = 1 THEN l_orderkey + 30000000 ELSE l_orderkey END AS fk, " +
        "CASE WHEN l_orderkey % 109 = 0 AND l_linenumber = 1 THEN NULL ELSE l_returnflag END AS rf " +
        "FROM lineitem) " +
        "SELECT 'fk_orders' AS rule, count(*) AS n_violations FROM c " +
        "LEFT JOIN orders ON c.fk = orders.o_orderkey WHERE o_orderkey IS NULL " +
        "UNION ALL SELECT 'quantity_range', count(*) FROM c WHERE NOT (q BETWEEN 1 AND 50) " +
        "UNION ALL SELECT 'discount_range', count(*) FROM c WHERE NOT (d BETWEEN 0 AND 0.1) " +
        "UNION ALL SELECT 'returnflag_not_null', count(*) FROM c WHERE rf IS NULL " +
        "ORDER BY rule"),
    // the oracle is the NEW snapshot itself: diff→apply must be identity
    "cdc2_diff_apply" ->
      ("SELECT o_orderkey, CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10 " +
        "ELSE o_totalprice END AS v, o_orderstatus AS st FROM orders WHERE o_orderkey % 13 <> 0 " +
        "UNION ALL SELECT o_orderkey + 20000000, o_totalprice, 'N' FROM orders WHERE o_orderkey % 500 = 0 " +
        "ORDER BY o_orderkey"),
    // both rollup versions recomputed from events, diffed the cdc1 way —
    // the engine's diff of its own retained manifest versions must match
    "cdc7_time_travel_diff" ->
      ("WITH a AS (SELECT user_id, count(*) AS n, " +
        "CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total " +
        "FROM events WHERE event_type = 'purchase' AND event_id % 2 = 0 GROUP BY 1), " +
        "b AS (SELECT user_id, count(*) AS n, " +
        "CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1) " +
        "SELECT CASE WHEN b.user_id IS NULL THEN 'D' WHEN a.user_id IS NULL THEN 'I' " +
        "ELSE 'U' END AS op, coalesce(a.user_id, b.user_id) AS user_id " +
        "FROM a FULL JOIN b ON a.user_id = b.user_id " +
        "WHERE a.user_id IS NULL OR b.user_id IS NULL OR a.n <> b.n OR a.total <> b.total " +
        "ORDER BY op, user_id"),
    // the evolved view recomputed relationally: click_max NULL exactly
    // where no click exists — partitioning-independent, so the equality
    // checks the untouched-partitions-read-NULL path
    "cdc8_schema_evolution" ->
      ("WITH p AS (SELECT user_id, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total " +
        "FROM events WHERE event_type = 'purchase' GROUP BY user_id), " +
        "c AS (SELECT user_id, max(CAST(value AS DECIMAL(18,2))) AS click_max " +
        "FROM events WHERE event_type = 'click' GROUP BY user_id) " +
        "SELECT p.user_id AS user_id, n, CAST(total AS DOUBLE) AS total, " +
        "CAST(click_max AS DOUBLE) AS click_max " +
        "FROM p LEFT JOIN c ON p.user_id = c.user_id ORDER BY user_id"),
    "cdc1_snapshot_diff" ->
      ("WITH old AS (SELECT o_orderkey AS k, o_totalprice AS v, o_orderstatus AS st FROM orders), " +
        "new AS (SELECT o_orderkey AS k, CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10 " +
        "ELSE o_totalprice END AS v, o_orderstatus AS st FROM orders WHERE o_orderkey % 13 <> 0 " +
        "UNION ALL SELECT o_orderkey + 20000000, o_totalprice, 'N' FROM orders WHERE o_orderkey % 500 = 0) " +
        "SELECT CASE WHEN n.k IS NULL THEN 'D' WHEN o.k IS NULL THEN 'I' ELSE 'U' END AS op, " +
        "coalesce(o.k, n.k) AS o_orderkey " +
        "FROM old o FULL JOIN new n ON o.k = n.k " +
        "WHERE n.k IS NULL OR o.k IS NULL OR o.v <> n.v OR o.st <> n.st " +
        "ORDER BY op, o_orderkey"),
    // the recursive CTE's paths feed the same ancestor-explode rollup
    "h2_subtree_rollup" ->
      ("WITH RECURSIVE c AS (SELECT c_custkey AS child, c_custkey // 8 AS parent " +
        "FROM customer WHERE c_custkey > 0), " +
        "h(node, depth, path) AS (" +
        "SELECT CAST(0 AS BIGINT), 0, '0' " +
        "UNION ALL " +
        "SELECT c.child, h.depth + 1, h.path || '/' || c.child " +
        "FROM c JOIN h ON c.parent = h.node), " +
        "x AS (SELECT unnest(string_split(h.path, '/')) AS anc, cu.c_acctbal " +
        "FROM h JOIN customer cu ON h.node = cu.c_custkey) " +
        "SELECT CAST(anc AS BIGINT) AS node, count(*) AS subtree_n, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(28,12))) AS DOUBLE) AS subtree_bal " +
        "FROM x GROUP BY 1 ORDER BY node"),
    // genuine SQL recursion as the oracle for the engine's frontier loop
    "h1_hierarchy" ->
      ("WITH RECURSIVE c AS (SELECT c_custkey AS child, c_custkey // 8 AS parent " +
        "FROM customer WHERE c_custkey > 0), " +
        "h(node, depth, path) AS (" +
        "SELECT CAST(0 AS BIGINT), 0, '0' " +
        "UNION ALL " +
        "SELECT c.child, h.depth + 1, h.path || '/' || c.child " +
        "FROM c JOIN h ON c.parent = h.node) " +
        "SELECT node, depth, path FROM h ORDER BY node"),
    // ss1's naive all-shared-shingle pair formulation + the shared
    // splitSql CASE; the engine side only ever joins prefix-indexed
    // shingles
    // the shared dd18 mask fragment, rolled up per source
    "dq14_dedup_inflation" ->
      (s"WITH ${graft.queries.DedupQueries.dupMaskSql}, " +
        "per_doc AS (SELECT doc_id, count(*) AS toks, " +
        "CAST(count(*) FILTER (WHERE rm = 1) AS BIGINT) AS dups " +
        "FROM m GROUP BY doc_id) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(toks) AS BIGINT) AS n_tokens, " +
        "CAST(sum(dups) AS BIGINT) AS n_dup_tokens, " +
        "CAST(CAST(CAST(sum(dups) AS DOUBLE) / sum(toks) AS DECIMAL(18,6)) AS DOUBLE) AS dup_ratio " +
        "FROM per_doc JOIN documents USING (doc_id) GROUP BY source ORDER BY source"),
    // the same DISTINCT-shingle universe; LEFT join against the distinct
    // train-gram set, zero-coalesced hit counts
    "dq13_contamination" ->
      ("WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+5], ' ') AS gram " +
        "FROM tok, unnest(generate_series(0, len(toks)-5)) AS g(i)), " +
        "ev AS (SELECT * FROM sh WHERE doc_id % 97 = 0), " +
        "tr AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 97 <> 0) " +
        "SELECT ev.doc_id AS doc_id, count(*) AS n_grams, " +
        "CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit, " +
        "CAST(CAST(CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) " +
        "AS DECIMAL(18,6)) AS DOUBLE) AS hit_frac, " +
        "CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) > 0 AS INT) AS contaminated " +
        "FROM ev LEFT JOIN tr ON ev.gram = tr.gram " +
        "GROUP BY ev.doc_id ORDER BY doc_id"),
    "dq7_split_leakage" ->
      ("WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+5], ' ') AS s " +
        "FROM tok, unnest(generate_series(0, len(toks)-5)) AS g(i)), " +
        "pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS overlap " +
        "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "sp AS (SELECT doc_id, " + graft.queries.DedupQueries.splitSql +
        " AS split FROM documents) " +
        "SELECT least(sa.split, sb.split) AS split_a, " +
        "greatest(sa.split, sb.split) AS split_b, count(*) AS n_leaked_pairs " +
        "FROM pair JOIN sp sa ON sa.doc_id = pair.d1 " +
        "JOIN sp sb ON sb.doc_id = pair.d2 " +
        "WHERE overlap >= 10 AND sa.split <> sb.split " +
        "GROUP BY 1, 2 ORDER BY split_a, split_b"),
    // identical IEEE edge/bin arithmetic; least() clamps the max value
    // into the last bin on both sides
    "dq4_histogram" ->
      ("WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL), " +
        "edges AS (SELECT min(value) AS lo, max(value) AS hi FROM ev) " +
        "SELECT event_type, " +
        "CASE WHEN hi = lo THEN 0 ELSE " +
        "least(9, CAST(floor((value - lo) / ((hi - lo) / 10.0)) AS BIGINT)) END AS bin, " +
        "count(*) AS n FROM ev CROSS JOIN edges " +
        "GROUP BY 1, 2 ORDER BY event_type, bin"),
    // same QI tuple and IEEE band arithmetic; exact counts
    "dq8_k_anonymity" ->
      ("SELECT c_nationkey, c_mktsegment, " +
        "CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band, " +
        "count(*) AS group_size, CAST(count(*) >= 5 AS INT) AS k_anonymous " +
        "FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    // same exact digit counts; ne is computed unrounded in a CTE so chi2
    // uses the same operand the engine does
    "dq9_benford" ->
      ("WITH d AS (SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit FROM orders), " +
        "c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1), " +
        "t AS (SELECT count(*) AS total FROM d), " +
        "e AS (SELECT digit, n_obs, " +
        "CAST(total AS DOUBLE) * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS ne " +
        "FROM c CROSS JOIN t) " +
        "SELECT digit, n_obs, CAST(CAST(ne AS DECIMAL(18,6)) AS DOUBLE) AS n_exp, " +
        "CAST(CAST((CAST(n_obs AS DOUBLE) - ne) * (CAST(n_obs AS DOUBLE) - ne) / ne " +
        "AS DECIMAL(18,6)) AS DOUBLE) AS chi2 " +
        "FROM e ORDER BY digit"),
    // same drifted twin, same count/distinct/null profile algebra
    "dq11_profile_drift" ->
      ("WITH d AS (SELECT o_orderkey, " +
        "CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderstatus END AS st, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 10 ELSE o_totalprice END AS tp " +
        "FROM orders WHERE o_orderkey % 13 <> 0), " +
        "pa AS (SELECT count(*) AS n, count(o_orderkey) AS c1, count(DISTINCT o_orderkey) AS nd1, " +
        "count(o_orderstatus) AS c2, count(DISTINCT o_orderstatus) AS nd2, " +
        "count(o_totalprice) AS c3, count(DISTINCT o_totalprice) AS nd3 FROM orders), " +
        "pb AS (SELECT count(*) AS n, count(o_orderkey) AS c1, count(DISTINCT o_orderkey) AS nd1, " +
        "count(st) AS c2, count(DISTINCT st) AS nd2, " +
        "count(tp) AS c3, count(DISTINCT tp) AS nd3 FROM d) " +
        "SELECT 'o_orderkey' AS col, pb.n - pa.n AS row_drift, " +
        "(pb.n - pb.c1) - (pa.n - pa.c1) AS null_drift, pb.nd1 - pa.nd1 AS distinct_drift FROM pa, pb " +
        "UNION ALL SELECT 'o_orderstatus', pb.n - pa.n, " +
        "(pb.n - pb.c2) - (pa.n - pa.c2), pb.nd2 - pa.nd2 FROM pa, pb " +
        "UNION ALL SELECT 'o_totalprice', pb.n - pa.n, " +
        "(pb.n - pb.c3) - (pa.n - pa.c3), pb.nd3 - pa.nd3 FROM pa, pb " +
        "ORDER BY col"),
    // same per-candidate group profile; BIGINT casts (DuckDB sums promote)
    "dq10_fd_audit" -> {
      def fdSql(table: String, name: String, lhs: String, rhs: String) =
        s"SELECT '$name' AS fd, count(*) AS n_groups, " +
          "CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups, " +
          "CAST(coalesce(sum(CASE WHEN d > 1 THEN n END), 0) AS BIGINT) AS violating_rows " +
          s"FROM (SELECT $lhs, count(DISTINCT $rhs) AS d, count(*) AS n " +
          s"FROM $table GROUP BY 1)"
      fdSql("orders", "o_orderkey->o_custkey", "o_orderkey", "o_custkey") +
        " UNION ALL " +
        fdSql("lineitem", "l_orderkey->l_returnflag", "l_orderkey", "l_returnflag") +
        " UNION ALL " +
        fdSql("customer", "c_nationkey->c_mktsegment", "c_nationkey", "c_mktsegment") +
        " ORDER BY fd"
    },
    // same gaps-and-islands: per-attr IS DISTINCT FROM ≡ the engine's
    // null-safe struct comparison; min() over the attribute-constant run
    // equals the engine's first()
    "cdc3_scd2" ->
      ("WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS st FROM orders), " +
        "snaps AS (SELECT k, CAST(1 AS BIGINT) AS version, price, st FROM base " +
        "UNION ALL SELECT k, 2, CASE WHEN k % 7 = 0 THEN price + 10 ELSE price END, st FROM base " +
        "UNION ALL SELECT k, 3, CASE WHEN k % 7 = 0 THEN price + 10 ELSE price END, " +
        "CASE WHEN k % 5 = 0 THEN 'X' ELSE st END FROM base), " +
        "w AS (SELECT k, version, price, st, " +
        "CASE WHEN lag(price) OVER kw IS DISTINCT FROM price " +
        "OR lag(st) OVER kw IS DISTINCT FROM st THEN 1 ELSE 0 END AS start " +
        "FROM snaps WINDOW kw AS (PARTITION BY k ORDER BY version)), " +
        "runs AS (SELECT k, version, price, st, " +
        "sum(start) OVER (PARTITION BY k ORDER BY version) AS run FROM w), " +
        "byrun AS (SELECT k, run, min(version) AS valid_from, " +
        "min(price) AS price, min(st) AS st FROM runs GROUP BY k, run) " +
        "SELECT k AS o_orderkey, valid_from, " +
        "lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from) AS valid_to, " +
        "price, st, " +
        "CAST(lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from) IS NULL AS INT) AS is_current " +
        "FROM byrun ORDER BY o_orderkey, valid_from"),
    "bf1_bloom_prune" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey " +
        "AND o_orderpriority = '1-URGENT' AND o_totalprice >= 250000) " +
        "ORDER BY l_orderkey, l_linenumber"),
    "s7_legacy_query" ->
      ("SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase' " +
        "AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20' " +
        "AND user_id >= 0 ORDER BY event_id"),
    "st6_quarantine" ->
      ("SELECT event_id, NOT json_valid(p) AS _quarantined, " +
        "CASE WHEN json_valid(p) THEN CAST(json_extract(p, '$.k') AS BIGINT) ELSE NULL END AS k FROM " +
        "(SELECT event_id, CASE WHEN event_id % 97 = 0 THEN '{bad' || props ELSE props END AS p FROM events) " +
        "ORDER BY event_id"),
    "c1_collide_widen" ->
      ("SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, " +
        "CAST(CAST(o_totalprice AS FLOAT) AS DOUBLE) AS price, CAST(o_custkey AS BIGINT) AS cust " +
        "FROM orders WHERE o_orderkey % 2 = 0 " +
        "UNION ALL SELECT CAST(o_orderkey AS VARCHAR), o_totalprice, o_custkey " +
        "FROM orders WHERE o_orderkey % 2 = 1 ORDER BY o_orderkey"),
    "skew1_salted_agg" ->
      ("SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_l_quantity " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "skew2_salted_join" ->
      ("SELECT l_orderkey, l_linenumber, l_returnflag, 'flag_' || l_returnflag AS label " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "l1_log_threshold" ->
      ("WITH logs AS (SELECT event_id, CASE event_type WHEN 'error' THEN 'ERROR' " +
        "WHEN 'purchase' THEN 'WARN' WHEN 'signup' THEN 'INFO' WHEN 'click' THEN 'DEBUG' " +
        "ELSE 'TRACE' END AS level, CAST(user_id % 3 AS VARCHAR) AS subsystem FROM events), " +
        "ranked AS (SELECT *, CASE level WHEN 'TRACE' THEN 0 WHEN 'DEBUG' THEN 1 WHEN 'INFO' THEN 2 " +
        "WHEN 'WARN' THEN 3 WHEN 'ERROR' THEN 4 END AS r, " +
        "CASE subsystem WHEN '0' THEN 4 WHEN '1' THEN 1 ELSE 2 END AS thr FROM logs) " +
        "SELECT event_id, level, subsystem FROM ranked WHERE r >= thr ORDER BY event_id"),
    "l2_log_merge" -> logMergeOracleSql,
    // same two interpolated medians (quantile_cont ≡ percentile), same
    // single 4.4478 literal, exact counts, one double division
    "dq12_mad_outliers" ->
      ("WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med " +
        "FROM events GROUP BY 1), " +
        "dev AS (SELECT e.event_type, abs(e.value - m.med) AS adev, m.med " +
        "FROM events e JOIN med m USING (event_type)), " +
        "th AS (SELECT event_type, max(med) AS med, " +
        "quantile_cont(adev, 0.5) AS mad, count(*) AS n FROM dev GROUP BY 1) " +
        "SELECT t.event_type, CAST(t.n AS BIGINT) AS n, t.med, t.mad, " +
        "CAST(count(*) FILTER (WHERE d.adev > CAST(4.4478 AS DOUBLE) * t.mad) AS BIGINT) " +
        "AS n_outliers, " +
        "CAST(CAST(count(*) FILTER (WHERE d.adev > CAST(4.4478 AS DOUBLE) * t.mad) AS DOUBLE) " +
        "/ t.n AS DOUBLE) AS rate " +
        "FROM dev d JOIN th t USING (event_type) " +
        "GROUP BY t.event_type, t.n, t.med, t.mad ORDER BY t.event_type"),
    "ret1_age_out" ->
      ("SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, " +
        "CAST(count(*) AS BIGINT) AS n FROM events " +
        "WHERE date_trunc('day', ts) >= DATE '2024-01-10' " +
        "GROUP BY 1 ORDER BY day"),
    "st8_stream_log_merge" -> logMergeOracleSql
  )
}
