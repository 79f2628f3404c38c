package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.dsl.{Query, QueryCompiler}

/** Oracle-checked queries for the core operator inventory (SURVEY §2.2 F*,
  * read-path R*, §2.4 aggregation, §2.5 joins, §2.6 dedup).
  *
  * Conventions:
  *  - every query ends in a deterministic total order (the matching oracle
  *    SQL carries the same ORDER BY), so row-hash comparison is stable;
  *  - inexact double aggregates go through DECIMAL(18,6) per-row casts (exact,
  *    order-independent addition — Spark's partial-agg ordering can't flip a
  *    bit) and ONE final cast to double on BOTH sides, so the driver's
  *    comparison layer sees a plain float64 instead of engine-specific
  *    Decimal objects;
  *  - exact double aggregates (integral quantities, counts) stay double.
  */
object CoreQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def dec6(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))

  /** Single per-JVM scratch root for f12's time-partitioned store (same
    * overwrite-in-place discipline as OpsQueries.retRoot). */
  private lazy val f12Root: String =
    graft.util.Scratch.dir("graft_f12")

  private lazy val dppRoot: String =
    graft.util.Scratch.dir("graft_dpp")

  /** The dpp1 plan, pre-orderBy — shared with PlanSpec's executed-plan
    * assertion (the query itself hash-checks the rows). */
  private[graft] def dpp1(s: SparkSession, dir: String): DataFrame = {
    val store = new graft.store.BucketStore(s, dppRoot)
    val b = graft.model.Bucket("/dpp/events", graft.model.DataSchema(
      temporal = Some(graft.model.TemporalSchema("ts",
        graft.model.GroupingPeriod.Daily))))
    store.write(b, Tables.t(s, dir, "events"),
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    val fact = store.read(b)
    // days of interest derived from a TABLE: '2024-01-03'..'2024-01-07';
    // a literal IN list would be folded into a static partition filter —
    // the point here is the filter only materializes at RUNTIME
    val dim = Tables.t(s, dir, "nation").filter(col("n_nationkey") < 5)
      .select(concat(lit("2024-01-"),
        lpad((col("n_nationkey") + 3).cast("string"), 2, "0")).as("day"))
    fact.join(dim, fact(graft.store.BucketStore.PartitionCol) === dim("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        // DECIMAL(18,6) internally for exact addition; the FINAL emitted
        // column is DOUBLE — the verify contract forbids raw DECIMAL in
        // output schemas (Verify lints it), because the driver's hasher
        // canonicalizes decimal cells differently across engines.
        sum(col("value").cast("decimal(18,6)")).cast("decimal(18,6)")
          .cast("double").as("total"))
  }

  val queries: Map[String, Q] = Map(
    // ---- F1: when/equals ----------------------------------------------
    "f1_when_eq" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      QueryCompiler.run(t("lineitem"),
        Query.allOf().when("l_returnflag", "R")
          .orderBy("l_orderkey" -> 1, "l_linenumber" -> 1))
    },
    // ---- F2: whenNot (null-safe negation) -----------------------------
    "f2_when_not" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      QueryCompiler.run(t("orders"),
        Query.allOf().whenNot("o_orderstatus", "O").orderBy("o_orderkey" -> 1))
    },
    // ---- F3: withAny / any_of → In pushdown ---------------------------
    "f3_with_any" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      QueryCompiler.run(t("orders"),
        Query.allOf().withAny("o_orderpriority", Seq("1-URGENT", "2-HIGH"))
          .orderBy("o_orderkey" -> 1))
    },
    // ---- F4: withAll / all_of on an array field -----------------------
    "f4_with_all" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      val docs = t("documents").withColumn("tokens", split(col("text"), " "))
      QueryCompiler.run(docs,
        Query.allOf().withAll("tokens", Seq("spark", "hash"))
          .orderBy("doc_id" -> 1).withFields("doc_id", "lang"))
    },
    // ---- F5: exists / not-exists --------------------------------------
    "f5_exists" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      val ev = t("events").withColumn("et", expr("nullif(event_type,'click')"))
      QueryCompiler.run(ev,
        Query.allOf().withNotPresent("et")
          .orderBy("event_id" -> 1).withFields("event_id", "user_id"))
    },
    // ---- F6: range variants (timestamp + numeric) ---------------------
    "f6_range" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      QueryCompiler.run(t("lineitem"),
        Query.allOf()
          .rangeIn("l_shipdate",
            java.sql.Timestamp.valueOf("1996-01-01 00:00:00"),
            java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
          .rangeAbove("l_quantity", 45.0)
          .orderBy("l_orderkey" -> 1, "l_linenumber" -> 1))
    },
    // ---- F7: nested and/or composition --------------------------------
    "f7_bool_nesting" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      val q = Query.or(
        Query.allOf().when("l_returnflag", "A").rangeBelow("l_quantity", 5.0),
        Query.allOf().when("l_returnflag", "N").rangeAbove("l_quantity", 48.0))
      t("lineitem").filter(QueryCompiler.compile(q))
        .orderBy("l_orderkey", "l_linenumber")
    },
    // ---- F8+F9: multi-field ±sort with limit (top-k) ------------------
    "f9_sort_limit" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      QueryCompiler.run(t("orders"),
        Query.allOf().orderBy("o_totalprice" -> -1, "o_orderkey" -> 1).limit(20))
    },
    // ---- F10: projection ----------------------------------------------
    "f10_projection" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      QueryCompiler.run(t("orders"),
        Query.allOf().rangeAbove("o_totalprice", 100000.0)
          .orderBy("o_orderkey" -> 1).withFields("o_orderkey", "o_totalprice"))
    },
    // ---- F12: DSL date range → time-partition pruning -------------------
    // The DSL range on the RAW time column is turned into a predicate on
    // the derived p_time partition column (TimeSlice extraction +
    // BucketStore.readForQuery), so the scan touches only 5 of the 30
    // daily partitions (days 05-08 match rows; day 09 is kept by the
    // period-truncated hi bound and its rows drop at the exclusive row
    // filter) — PlanSpec asserts the pruning; this
    // query pins the ROWS (and the partition-value derivation, via `day`)
    // against the oracle computing the same slice directly
    "f12_date_prune" -> { (s, dir) =>
      val store = new graft.store.BucketStore(s, f12Root)
      val b = graft.model.Bucket("/f12/events", graft.model.DataSchema(
        temporal = Some(graft.model.TemporalSchema("ts",
          graft.model.GroupingPeriod.Daily))))
      store.write(b, Tables.t(s, dir, "events"),
        mode = org.apache.spark.sql.SaveMode.Overwrite)
      store.readForQuery(b,
          Query.allOf()
            .rangeIn("ts",
              java.time.Instant.parse("2024-01-05T00:00:00Z"),
              java.time.Instant.parse("2024-01-09T00:00:00Z"))
            .when("event_type", "click")
            .orderBy("event_id" -> 1))
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("ts_s"),
          col(graft.store.BucketStore.PartitionCol).as("day"))
    },
    // ---- dpp1: DYNAMIC partition pruning — the runtime half of F12's
    // static time-slice pruning: the days of interest arrive from a dim
    // TABLE (not a literal the optimizer could fold), so only Spark's DPP
    // subquery can prune the time-partitioned fact scan, at runtime, to
    // the dim's days. PlanSpec asserts `dynamicpruning` appears in the
    // executed scan's partition filters; this query hash-checks the
    // result. At 100 TB this is the difference between scanning 5 days
    // and scanning the whole fact table whenever the day list is data ----
    "dpp1_dynamic_prune" -> { (s, dir) =>
      dpp1(s, dir).orderBy("day")
    },
    // ---- read path: point lookup / counts (SURVEY §2.2 tail) ----------
    "r1_get_by_id" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      QueryCompiler.run(t("orders"), Query.allOf().when("o_orderkey", 100L))
    },
    "r2_count_by_spec" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      t("lineitem").filter(QueryCompiler.compile(
          Query.allOf().when("l_returnflag", "A").rangeAbove("l_quantity", 30.0)))
        .agg(count(lit(1)).as("n"))
    },
    "r3_count_limited" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      t("lineitem").filter(QueryCompiler.compile(
          Query.allOf().when("l_returnflag", "A")))
        .limit(1000).agg(count(lit(1)).as("n"))
    },
    // ---- flagship aggregation (TPC-H Q1 shape; partial agg + shuffle) --
    "q1_agg" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      t("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // ---- joins (SURVEY §2.5 J5 surface; broadcast small dims) ----------
    "j1_join_agg" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      t("orders")
        .join(t("customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(dec6(col("o_totalprice"))).cast("double").as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    },
    "j2_semi" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      t("customer")
        .join(t("orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    "j3_anti" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      val recent = t("orders").filter(
        col("o_orderdate") >= java.sql.Timestamp.valueOf("2001-01-01 00:00:00"))
      t("customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    "j4_outer_count" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      t("customer")
        .join(t("orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },
    // ---- J5 breadth: fact-to-dim join + agg over the part table --------
    "j5_part_revenue" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      t("lineitem")
        .join(t("part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },
    // ---- J5 breadth: small-dim broadcast join over the supplier table ---
    "j6_supplier_balance" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      t("supplier")
        .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(dec6(col("s_acctbal"))).cast("double").as("total_balance"))
        .orderBy("n_name")
    },
    // ---- as-of (point-in-time) join: last-touch attribution — each
    // purchase matched to the SAME user's latest click at-or-before it.
    // Union + single key shuffle + ignoreNulls carry-forward window: the
    // scalable as-of shape (no per-row range probe, no key×key product) --
    "j7_asof_attrib" -> { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
        .withColumn("t", unix_micros(col("ts"))) // micros, matches epoch_us
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "t")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("t").as("ct"),
          col("event_id").as("click_id"))
      graft.ops.AsOfJoin.asOf(purchases, clicks, Seq("user_id"),
          leftTs = "t", rightTs = "ct", payload = Seq("click_id", "ct"))
        .select("event_id", "user_id", "click_id", "ct")
        .orderBy("event_id")
    },
    // ---- range (interval) join: ALL clicks within the hour before each
    // purchase by the same user — the keep-all-matches sibling of j7. The
    // purchase interval [t-1h, t] is exploded to its covered 1h bins and
    // the join runs as a plain shuffled equi-join on (user_id, bin): no
    // nested-loop, no per-key quadratic post-filter blowup ----------------
    "j8_range_join" -> { (s, dir) =>
      val hourUs = 3600L * 1000000L
      val ev = Tables.t(s, dir, "events")
        .withColumn("t", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          (col("t") - hourUs).as("w_start"), col("t").as("w_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("t").as("ct"))
      graft.ops.RangeJoin.binned(clicks, purchases, Seq("user_id"),
          pointCol = "ct", startCol = "w_start", endCol = "w_end",
          binWidth = hourUs)
        .select("purchase_id", "click_id")
        .orderBy("purchase_id", "click_id")
    },
    // ---- interval × interval overlap join: order pairs of the same
    // customer whose 10-day fulfillment windows overlap. Both sides explode
    // to covered 10-day bins; each true pair joins ONCE (on the bin holding
    // the first instant of its intersection) — a shuffled equi-join on
    // (custkey, bin), never a per-key cross product. The oracle runs the
    // non-scalable all-pairs formulation of the same predicate ------------
    "j9_interval_overlap" -> { (s, dir) =>
      val dayUs = 86400L * 1000000L
      val iv = Tables.t(s, dir, "orders")
        .select(col("o_custkey").as("custkey"), col("o_orderkey"),
          // o_orderdate lands as TIMESTAMP_NTZ; the session TZ is UTC so
          // the LTZ cast is identity and unix_micros matches epoch_us
          unix_micros(col("o_orderdate").cast("timestamp")).as("s0"))
      val lhs = iv.select(col("custkey"), col("o_orderkey").as("k1"),
        col("s0").as("s1"), (col("s0") + 10 * dayUs).as("e1"))
      val rhs = iv.select(col("custkey"), col("o_orderkey").as("k2"),
        col("s0").as("s2"), (col("s0") + 10 * dayUs).as("e2"))
      graft.ops.RangeJoin.overlapBinned(lhs, rhs, Seq("custkey"),
          "s1", "e1", "s2", "e2", binWidth = 10 * dayUs)
        .filter(col("k1") < col("k2"))
        .select("custkey", "k1", "k2")
        .orderBy("custkey", "k1", "k2")
    },
    // ---- D1/D2: dedup winner-pick via window row_number ----------------
    "d1_dedup_window" -> { (s, dir) => val t = (n: String) => Tables.t(s, dir, n)
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      t("orders").withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    },
    // ---- percolation (reverse search): every record matched against a
    // REGISTRY of stored DSL queries — the alerting workload the reference
    // delegated to Elasticsearch's percolator. The 7-query registry
    // compiles once into ONE fused codegen projection over one scan; the
    // f1-f12 clause surface (eq, negated eq, in-list, 3 range forms,
    // OR-of-subqueries) is exercised in its stored-query role ------------
    "perc1_percolate" -> { (s, dir) =>
      graft.ops.Percolator.matches(Tables.t(s, dir, "events"),
          storedQueries, idCols = Seq("event_id"))
        .orderBy("event_id", "query_id")
    },
    // ---- perc2: the SAME registry ROUND-TRIPPED through its JSON wire
    // form (QueryJson — what a PERSISTED registry table or REST surface
    // stores) before compiling: serialize → parse → percolate must match
    // perc1's direct-AST run exactly, pinning wire fidelity end-to-end
    // under the oracle, not just AST-equality in the property spec -------
    "perc2_percolate_json" -> { (s, dir) =>
      val parsed = storedQueries.map { case (id, q) =>
        (id, graft.dsl.QueryJson.parse(graft.dsl.QueryJson.stringify(q)))
      }
      graft.ops.Percolator.matches(Tables.t(s, dir, "events"),
          parsed, idCols = Seq("event_id"))
        .orderBy("event_id", "query_id")
    },
    // ---- perc3: a 512-query registry — PAST maxPerProjection, so this is
    // the oracle gate on the custom PercolateExec single-scan operator
    // (graft/plans/Percolate.scala): one column-pruned scan, two row-based
    // codegen'd predicate shards, never a per-shard re-read. The registry
    // is parameterized (type = i%5, value ∈ [i%90, i%90+7)), so the DuckDB
    // twin replays it as an events × range(512) theta-join — every stored
    // query's semantics checked without 512 hand-written UNION arms ------
    "perc3_percolate_large" -> { (s, dir) =>
      graft.ops.Percolator.matches(Tables.t(s, dir, "events"),
          largeRegistry, idCols = Seq("event_id"))
        .orderBy("event_id", "query_id")
    },
    // ---- st25: the SAME registry percolating a STREAM — the actual
    // alerting deployment shape (match-on-arrival): stateless narrow
    // projection, append mode, zero state; batch oracle = the truth ------
    "st25_stream_percolate" -> { (s, dir) =>
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val raw = graft.streaming.Streams.parquetStream(
        s, s"$dir/events.parquet", schema)
      graft.streaming.Streams.runToParquet(Tables.normalizeTs(raw),
          st => graft.ops.Percolator.matches(st, storedQueries,
            idCols = Seq("event_id")))
        .orderBy("event_id", "query_id")
    },
    // ---- st28: the LARGE registry under streaming — perc3's 512 stored
    // queries (past maxPerProjection, so the custom PercolateNode plans
    // inside each micro-batch's IncrementalExecution) matching on arrival.
    // Stateless and per-record, so the batch theta-join SQL is the truth
    // regardless of the micro-batch split — this closes batch ≡ stream
    // for the custom single-scan operator under the driver oracle, not
    // just the spec ------------------------------------------------------
    "st28_stream_percolate_large" -> { (s, dir) =>
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val raw = graft.streaming.Streams.parquetStream(
        s, s"$dir/events.parquet", schema)
      graft.streaming.Streams.runToParquet(Tables.normalizeTs(raw),
          st => graft.ops.Percolator.matches(st, largeRegistry,
            idCols = Seq("event_id")))
        .orderBy("event_id", "query_id")
    }
  )

  /** perc3/st28's parameterized 512-query registry (type = i%5, value ∈
    * [i%90, i%90+7)) — one builder, batch and streaming, so the two can
    * never drift from each other or from the range(512) oracle twin. */
  private def largeRegistry: Seq[(String, graft.dsl.QueryComponent)] = {
    val types = Seq("purchase", "click", "view", "error", "signup")
    (0 until 512).map { i =>
      val lo = (i % 90).toDouble
      // Locale.ROOT: the f-interpolator pads with the DEFAULT locale's
      // digits, which would diverge from the oracle's printf('q_%04d')
      // under a non-ASCII numbering locale (the JsDate.iso defect class)
      (String.format(java.util.Locale.ROOT, "q_%04d", Int.box(i)),
        Query.allOf().when("event_type", types(i % 5))
          .rangeIn("value", lo, lo + 7.0))
    }
  }

  /** THE stored-query registry perc1/st25 percolate against — one
    * definition, both drivers; ids sorted so ties in the output explode
    * in registry order deterministically. */
  private def storedQueries: Seq[(String, graft.dsl.QueryComponent)] = Seq(
    "q_big_purchase" -> Query.allOf()
      .when("event_type", "purchase").rangeAbove("value", 100.0),
    "q_cheap_click" -> Query.allOf()
      .when("event_type", "click").rangeBelow("value", 5.0),
    "q_error_heavy" -> Query.allOf()
      .when("event_type", "error").rangeAbove("user_id", 100L),
    "q_hot_or" -> Query.or(
      Query.allOf().when("event_type", "view").rangeAbove("value", 90.0),
      Query.allOf().when("event_type", "signup").rangeAbove("value", 95.0)),
    "q_mid_value" -> Query.allOf().rangeIn("value", 10.0, 20.0),
    "q_not_view" -> Query.allOf()
      .whenNot("event_type", "view").rangeAbove("value", 99.5),
    "q_vip_action" -> Query.allOf()
      .withAny("event_type", Seq("signup", "purchase"))
      .rangeBelow("user_id", 20L))

  val oracle: Map[String, String] = Map(
    "f1_when_eq" ->
      "SELECT * FROM lineitem WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber",
    "f2_when_not" ->
      "SELECT * FROM orders WHERE o_orderstatus IS DISTINCT FROM 'O' ORDER BY o_orderkey",
    "f3_with_any" ->
      "SELECT * FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH') ORDER BY o_orderkey",
    "f4_with_all" ->
      "SELECT doc_id, lang FROM documents WHERE list_has_all(string_split(text, ' '), ['spark','hash']) ORDER BY doc_id",
    "f5_exists" ->
      "SELECT event_id, user_id FROM events WHERE nullif(event_type, 'click') IS NULL ORDER BY event_id",
    "f6_range" ->
      "SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity >= 45 ORDER BY l_orderkey, l_linenumber",
    "f7_bool_nesting" ->
      "SELECT * FROM lineitem WHERE (l_returnflag = 'A' AND l_quantity < 5) OR (l_returnflag = 'N' AND l_quantity >= 48) ORDER BY l_orderkey, l_linenumber",
    "f9_sort_limit" ->
      "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20",
    "f10_projection" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 100000 ORDER BY o_orderkey",
    "f12_date_prune" ->
      ("SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, " +
        "strftime(date_trunc('day', ts), '%Y-%m-%d') AS day FROM events " +
        "WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-09' " +
        "AND event_type = 'click' ORDER BY event_id"),
    // the dim days re-derived from nation exactly as the engine builds them
    "dpp1_dynamic_prune" ->
      ("WITH d AS (SELECT '2024-01-' || lpad(CAST(n_nationkey + 3 AS VARCHAR), 2, '0') AS day " +
        "FROM nation WHERE n_nationkey < 5), " +
        "e AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value FROM events) " +
        "SELECT d.day AS day, count(*) AS n, " +
        "CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS total " +
        "FROM e JOIN d ON e.day = d.day GROUP BY d.day ORDER BY day"),
    "r1_get_by_id" ->
      "SELECT * FROM orders WHERE o_orderkey = 100",
    "r2_count_by_spec" ->
      "SELECT count(*) AS n FROM lineitem WHERE l_returnflag = 'A' AND l_quantity >= 30",
    "r3_count_limited" ->
      "SELECT count(*) AS n FROM (SELECT * FROM lineitem WHERE l_returnflag = 'A' LIMIT 1000)",
    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue, " +
        "count(*) AS n_rows, sum(l_quantity) / count(*) AS avg_qty " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "j1_join_agg" ->
      ("SELECT n_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend, " +
        "count(*) AS n_orders FROM orders " +
        "JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),
    "j2_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey",
    "j3_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01') ORDER BY c_custkey",
    "j4_outer_count" ->
      "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey ORDER BY c_custkey",
    "j5_part_revenue" ->
      ("SELECT p_brand, CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue, " +
        "count(*) AS n_items FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY p_brand ORDER BY p_brand"),
    "j6_supplier_balance" ->
      ("SELECT n_name, count(*) AS n_suppliers, " +
        "CAST(sum(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_balance " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),
    // same union + carry-forward formulation; IGNORE NULLS last_value over
    // the identical (t, side, click_id) order picks the identical row
    "j7_asof_attrib" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events), " +
        "u AS (SELECT user_id, t, 1 AS side, event_id, NULL::BIGINT AS click_id, NULL::BIGINT AS ct " +
        "FROM ev WHERE event_type = 'purchase' " +
        "UNION ALL SELECT user_id, t, 0, NULL, event_id, t FROM ev WHERE event_type = 'click'), " +
        "w AS (SELECT *, " +
        "last_value(click_id IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY t, side, click_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_click, " +
        "last_value(ct IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY t, side, click_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_ct " +
        "FROM u) " +
        "SELECT event_id, user_id, m_click AS click_id, m_ct AS ct " +
        "FROM w WHERE side = 1 ORDER BY event_id"),
    // all-pairs formulation of the same interval predicate — identical
    // result, non-scalable plan (the engine side bins instead)
    "j8_range_join" ->
      ("SELECT p.event_id AS purchase_id, c.event_id AS click_id " +
        "FROM events p JOIN events c ON p.user_id = c.user_id " +
        "AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts) " +
        "WHERE p.event_type = 'purchase' AND c.event_type = 'click' " +
        "ORDER BY purchase_id, click_id"),
    // all-pairs formulation of the same overlap predicate — identical
    // result, non-scalable plan (the engine side bins both interval sets)
    "j9_interval_overlap" ->
      ("WITH iv AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderdate AS s, " +
        "o_orderdate + INTERVAL 10 DAY AS e FROM orders) " +
        "SELECT a.c AS custkey, a.k AS k1, b.k AS k2 " +
        "FROM iv a JOIN iv b ON a.c = b.c AND a.k < b.k " +
        "AND a.s <= b.e AND b.s <= a.e " +
        "ORDER BY custkey, k1, k2"),
    "d1_dedup_window" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice FROM " +
        "(SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn FROM orders) " +
        "WHERE rn = 1 ORDER BY o_custkey"),
    // each stored query restated as a literal WHERE (rangeAbove = >=,
    // rangeBelow = <, rangeIn = [lo, hi), whenNot = IS DISTINCT FROM —
    // the f1-f12-pinned clause semantics); st25 streams the same registry
    "perc1_percolate" -> percolateOracleSql,
    "perc2_percolate_json" -> percolateOracleSql,
    // the parameterized 512-query registry as an events × range(512)
    // theta-join: CASE replays type = i%5, the range replays [i%90, i%90+7);
    // st28 streams the same registry (stateless per-record matching, so
    // the batch theta-join is the truth there too)
    "perc3_percolate_large" -> largeRegistryOracleSql,
    "st25_stream_percolate" -> percolateOracleSql,
    "st28_stream_percolate_large" -> largeRegistryOracleSql
  )

  private def largeRegistryOracleSql: String =
    ("SELECT e.event_id AS event_id, printf('q_%04d', i) AS query_id " +
      "FROM events e JOIN range(512) AS r(i) ON " +
      "e.event_type = (CASE CAST(i % 5 AS INTEGER) " +
      "WHEN 0 THEN 'purchase' WHEN 1 THEN 'click' WHEN 2 THEN 'view' " +
      "WHEN 3 THEN 'error' ELSE 'signup' END) " +
      "AND e.value >= CAST(i % 90 AS DOUBLE) " +
      "AND e.value < CAST(i % 90 AS DOUBLE) + 7 " +
      "ORDER BY event_id, query_id")

  private def percolateOracleSql: String =
    ("SELECT event_id, query_id FROM (" +
      "SELECT event_id, 'q_big_purchase' AS query_id FROM events WHERE event_type = 'purchase' AND value >= 100 " +
      "UNION ALL SELECT event_id, 'q_cheap_click' FROM events WHERE event_type = 'click' AND value < 5 " +
      "UNION ALL SELECT event_id, 'q_error_heavy' FROM events WHERE event_type = 'error' AND user_id >= 100 " +
      "UNION ALL SELECT event_id, 'q_hot_or' FROM events WHERE (event_type = 'view' AND value >= 90) OR (event_type = 'signup' AND value >= 95) " +
      "UNION ALL SELECT event_id, 'q_mid_value' FROM events WHERE value >= 10 AND value < 20 " +
      "UNION ALL SELECT event_id, 'q_not_view' FROM events WHERE event_type IS DISTINCT FROM 'view' AND value >= 99.5 " +
      "UNION ALL SELECT event_id, 'q_vip_action' FROM events WHERE event_type IN ('signup', 'purchase') AND user_id < 20" +
      ") ORDER BY event_id, query_id")
}
