package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dsl._

/** Oracle-checked queries for the update DSL (SURVEY §2.3 U1-U14): each runs
  * the [[UpdateCompiler]] rewrite and returns the rewritten table, which the
  * oracle reproduces as a SELECT transform (CASE WHEN guard = the match
  * predicate). Array-result queries serialize the array to a joined string
  * on both sides (sorted where op order isn't semantic) — the driver's
  * pandas-based comparison can't hash array cells, and Spark's
  * array_union/except and DuckDB's list_distinct order differently.
  */
object UpdateQueries {
  private type Q = (SparkSession, String) => DataFrame

  private val urgent = Query.allOf().when("o_orderpriority", "1-URGENT")

  val queries: Map[String, Q] = Map(
    // U1+U2: $set + $unset under a predicate
    "u1_set_unset" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      UpdateCompiler.applyUpdate(orders,
        QueryCompiler.compile(Query.allOf().when("o_orderstatus", "F")),
        Update.update().set("o_orderpriority", "0-REPRIORITIZED").unset("o_orderstatus"))
        .orderBy("o_orderkey")
    },
    // u19: u1's exact update REPLAYED THROUGH THE JSON WIRE FORM — what a
    // persisted update template or REST mutation endpoint stores
    // (UpdateJson: serialize -> parse -> compile must hash-match u1's
    // direct-AST run under the same oracle)
    "u19_update_json" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val wire = UpdateJson.stringify(Update.update()
        .set("o_orderpriority", "0-REPRIORITIZED").unset("o_orderstatus"))
      UpdateCompiler.applyUpdate(orders,
        QueryCompiler.compile(Query.allOf().when("o_orderstatus", "F")),
        UpdateJson.parse(wire))
        .orderBy("o_orderkey")
    },
    // U3: $inc
    "u3_increment" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      UpdateCompiler.applyUpdate(orders, QueryCompiler.compile(urgent),
        Update.update().increment("o_totalprice", 500))
        .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
    },
    // U4: $push (append, keeps duplicates)
    "u4_push" -> { (s, dir) =>
      val df = Tables.t(s, dir, "orders")
        .withColumn("tags", array(col("o_orderstatus"), lit("base")))
      UpdateCompiler.applyUpdate(df, QueryCompiler.compile(urgent),
        Update.update().push("tags", Seq("rush", "base")))
        .select(col("o_orderkey"), array_join(col("tags"), ",").as("tags"))
        .orderBy("o_orderkey")
    },
    // U5: $addToSet (dedup; sorted for cross-engine comparison)
    "u5_add_to_set" -> { (s, dir) =>
      val df = Tables.t(s, dir, "orders")
        .withColumn("tags", array(col("o_orderstatus"), lit("base")))
      UpdateCompiler.applyUpdate(df, QueryCompiler.compile(urgent),
        Update.update().push("tags", Seq("rush", "base"), dedup = true))
        .select(col("o_orderkey"),
          array_join(array_sort(col("tags")), ",").as("tags"))
        .orderBy("o_orderkey")
    },
    // U6: $pullAll (Spark array_except dedups → sort+distinct both sides)
    "u6_pull_all" -> { (s, dir) =>
      val df = Tables.t(s, dir, "orders")
        .withColumn("tags", array(col("o_orderstatus"), lit("x"), col("o_orderpriority")))
      UpdateCompiler.applyUpdate(df, QueryCompiler.compile(urgent),
        Update.update().pullAll("tags", Seq("x")))
        .select(col("o_orderkey"),
          array_join(array_sort(col("tags")), ",").as("tags"))
        .orderBy("o_orderkey")
    },
    // U7: $pull with a nested element query (filter higher-order fn)
    "u7_pull_query" -> { (s, dir) =>
      val df = Tables.t(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(collect_list("l_quantity").as("qtys"))
      UpdateCompiler.applyUpdate(df, lit(true),
        Update.update().pull("qtys", Query.allOf().rangeAbove("", 25.0)))
        // doubles → fixed-scale decimal strings so both engines format alike
        .withColumn("qtys", expr(
          "array_join(transform(array_sort(qtys), q -> cast(cast(q as decimal(18,6)) as string)), ',')"))
        .orderBy("l_orderkey")
    },
    // U8: whole-doc delete sentinel
    "u8_delete_doc" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      UpdateCompiler.applyUpdate(orders,
        QueryCompiler.compile(Query.allOf().when("o_orderstatus", "F")),
        Update.update().deleteDoc())
        .orderBy("o_orderkey")
    },
    // U9: upsert-shaped merge-by-key: updates batch wins over base
    "u9_upsert_merge" -> { (s, dir) =>
      val base = Tables.t(s, dir, "orders")
      val updates = base.filter(col("o_orderstatus") === "O")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      base.join(updates.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
        .unionByName(updates)
        .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
    },
    // three-clause MERGE INTO (beyond-ref lakehouse primitive): amendments
    // update matched orders' price, flagged matches delete, unseen keys
    // insert — one full-outer co-keyed join + clause projection, vs the
    // reference's per-document upsert/delete round trips
    "u16_merge_into" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val target = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
      val amendments = orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000).as("src_price"),
          (col("o_orderkey") % 97 === 0).as("src_del"))
      val arrivals = orders.filter(col("o_orderkey") % 1000 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_totalprice").as("src_price"), lit(false).as("src_del"))
      graft.ops.MergeInto.merge(target,
          amendments.unionByName(arrivals), Seq("o_orderkey"),
          matchedDelete = Some(col("src_del")),
          matchedUpdate = Map("o_totalprice" -> col("src_price")),
          notMatchedInsert = Some(Map(
            "o_totalprice" -> col("src_price"),
            "o_orderstatus" -> lit("N"))))
        .orderBy("o_orderkey")
    },
    // u20: the SAME three-clause MERGE re-homed onto the partitioned
    // store — the scale shape of the write path: touched partitions are
    // derived from the source alone, only those are read+merged, and the
    // commit is one O(touched) refresh behind the atomic manifest swap
    // (vs CrudService.mergeInto's whole-store rewrite; the reference's
    // analog is the per-document upsert round trip,
    // `aleph2_crud_service_mongodb/.../services/MongoDbCrudService.java:493-525`).
    // Identical clauses and identical oracle to u16 pin the re-homing;
    // MergeIntoSpec pins untouched-partitions-byte-identical ---------------
    "u20_merge_partitioned" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val target = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
      val store = new graft.store.PartitionedStore(s,
        graft.util.Scratch.dir("graft_u20"), Seq("o_orderkey"), nPartitions = 32)
      store.init(target)
      val amendments = orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000).as("src_price"),
          (col("o_orderkey") % 97 === 0).as("src_del"))
      val arrivals = orders.filter(col("o_orderkey") % 1000 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_totalprice").as("src_price"), lit(false).as("src_del"))
      graft.ops.MergeInto.mergePartitioned(store,
        amendments.unionByName(arrivals),
        matchedDelete = Some(col("src_del")),
        matchedUpdate = Map("o_totalprice" -> col("src_price")),
        notMatchedInsert = Some(Map(
          "o_totalprice" -> col("src_price"),
          "o_orderstatus" -> lit("N"))))
      store.read().orderBy("o_orderkey")
    },
    // U11: top-k delete (sort+limit victims, anti-join rewrite)
    "u11_topk_delete" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      UpdateCompiler.deleteBySpec(orders,
        Query.allOf().when("o_orderstatus", "F")
          .orderBy("o_totalprice" -> -1, "o_orderkey" -> 1).limit(10))
        .select("o_orderkey", "o_totalprice", "o_orderstatus").orderBy("o_orderkey")
    },
    // U15: nested dot-path $set/$inc rewrite the struct field in place
    // (withField), not a flat "a.b"-named column
    "u15_nested_update" -> { (s, dir) =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      val ev = Tables.t(s, dir, "events")
        .withColumn("r", from_json(col("props"), schema))
      UpdateCompiler.applyUpdate(ev,
          QueryCompiler.compile(Query.allOf().when("event_type", "click")),
          Update.update().set("r.k", -1L))
        .select(col("event_id"), col("r.k").as("k"))
        .orderBy("event_id")
    },
    // U18 (beyond ref): Mongo $set + arrayFilters ($[e]) — mutate a
    // sub-field of array-of-struct ELEMENTS matching an element predicate,
    // inside documents matching the doc predicate. One transform()
    // projection per doc (no explode/re-group round trip); element order,
    // other fields, and non-matching docs pass through untouched ---------
    "u18_array_elem_update" -> { (s, dir) =>
      val docs = Tables.t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").as("ln"), col("l_quantity").as("qty"),
          col("l_returnflag").as("rf")))).as("items"),
          count(lit(1)).as("n_items"))
      UpdateCompiler.applyUpdate(docs,
          QueryCompiler.compile(Query.allOf().rangeAbove("n_items", 5L)),
          Update.update().setMatching("items",
            Query.allOf().rangeAbove("qty", 45.0), "rf", "X"))
        .select(col("l_orderkey"), explode(col("items")).as("x"))
        .select(col("l_orderkey"), col("x.ln").as("ln"),
          col("x.qty").as("qty"), col("x.rf").as("rf"))
        .orderBy("l_orderkey", "ln")
    },
    // U17 (beyond ref): optimistic-concurrency CAS update — stored
    // version o_orderkey%5, CAS batch targets every key%4==0 expecting
    // version 2; only the agreeing rows apply (+111 price, version bump),
    // stale matches surface as 'conflict'. One co-keyed equi-join, zero
    // per-document round trips -------------------------------------------
    "u17_version_cas" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val target = orders.select(col("o_orderkey"), col("o_totalprice"),
        (col("o_orderkey") % 5).as("version"))
      val updates = orders.filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), lit(2L).as("expected_version"),
          (col("o_totalprice") + 111).as("new_price"))
      graft.ops.OptimisticLock.casUpdate(target, updates, Seq("o_orderkey"),
          "version", "expected_version", Map("o_totalprice" -> "new_price"))
        .orderBy("o_orderkey")
    },
    // U14 / D3: create-if-absent by _id — first batch wins, second only adds
    "u14_store_dedup" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val first = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("src", lit("even"))
      val second = orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("src", lit("mod3"))
      first.unionByName(
          second.join(first.select("o_orderkey"), Seq("o_orderkey"), "left_anti"))
        .select("o_orderkey", "src").orderBy("o_orderkey")
    }
  )

  val oracle: Map[String, String] = Map(
    "u1_set_unset" ->
      ("SELECT o_orderkey, o_custkey, " +
        "CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS o_orderstatus, " +
        "o_totalprice, o_orderdate, " +
        "CASE WHEN o_orderstatus = 'F' THEN '0-REPRIORITIZED' ELSE o_orderpriority END AS o_orderpriority " +
        "FROM orders ORDER BY o_orderkey"),
    // identical semantics — the update arrived via its JSON wire form
    "u19_update_json" ->
      ("SELECT o_orderkey, o_custkey, " +
        "CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS o_orderstatus, " +
        "o_totalprice, o_orderdate, " +
        "CASE WHEN o_orderstatus = 'F' THEN '0-REPRIORITIZED' ELSE o_orderpriority END AS o_orderpriority " +
        "FROM orders ORDER BY o_orderkey"),
    "u3_increment" ->
      ("SELECT o_orderkey, CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 500 " +
        "ELSE o_totalprice END AS o_totalprice FROM orders ORDER BY o_orderkey"),
    "u4_push" ->
      ("SELECT o_orderkey, array_to_string(CASE WHEN o_orderpriority = '1-URGENT' " +
        "THEN list_concat([o_orderstatus, 'base'], ['rush', 'base']) " +
        "ELSE [o_orderstatus, 'base'] END, ',') AS tags FROM orders ORDER BY o_orderkey"),
    "u5_add_to_set" ->
      ("SELECT o_orderkey, array_to_string(list_sort(CASE WHEN o_orderpriority = '1-URGENT' " +
        "THEN list_distinct(list_concat([o_orderstatus, 'base'], ['rush', 'base'])) " +
        "ELSE [o_orderstatus, 'base'] END), ',') AS tags FROM orders ORDER BY o_orderkey"),
    "u6_pull_all" ->
      ("SELECT o_orderkey, array_to_string(list_sort(CASE WHEN o_orderpriority = '1-URGENT' " +
        "THEN list_distinct(list_filter([o_orderstatus, 'x', o_orderpriority], t -> t != 'x')) " +
        "ELSE [o_orderstatus, 'x', o_orderpriority] END), ',') AS tags FROM orders ORDER BY o_orderkey"),
    "u7_pull_query" ->
      // coalesce: DuckDB array_to_string(empty list) is NULL, Spark's is ''
      ("SELECT l_orderkey, coalesce(array_to_string(" +
        "[CAST(CAST(q AS DECIMAL(18,6)) AS VARCHAR) FOR q IN list_sort(list_filter(list(l_quantity), q -> NOT q >= 25.0))], " +
        "','), '') AS qtys FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"),
    "u8_delete_doc" ->
      "SELECT * FROM orders WHERE o_orderstatus != 'F' ORDER BY o_orderkey",
    // FULL JOIN + clause CASEs — the declarative statement of the same
    // three-clause dispatch
    "u16_merge_into" ->
      ("WITH src AS (SELECT o_orderkey AS k, o_totalprice + 1000 AS src_price, " +
        "(o_orderkey % 97 = 0) AS src_del FROM orders WHERE o_orderkey % 7 = 0 " +
        "UNION ALL SELECT o_orderkey + 10000000, o_totalprice, false " +
        "FROM orders WHERE o_orderkey % 1000 = 0), " +
        "m AS (SELECT t.o_orderkey AS tk, t.o_totalprice, t.o_orderstatus, " +
        "s.k, s.src_price, s.src_del FROM orders t FULL JOIN src s ON t.o_orderkey = s.k) " +
        "SELECT coalesce(tk, k) AS o_orderkey, " +
        "CASE WHEN k IS NOT NULL THEN src_price ELSE o_totalprice END AS o_totalprice, " +
        "CASE WHEN tk IS NULL THEN 'N' ELSE o_orderstatus END AS o_orderstatus " +
        "FROM m WHERE NOT (tk IS NOT NULL AND k IS NOT NULL AND coalesce(src_del, false)) " +
        "ORDER BY o_orderkey"),
    // u16's oracle verbatim — the partitioned commit path must be
    // semantically invisible
    "u20_merge_partitioned" ->
      ("WITH src AS (SELECT o_orderkey AS k, o_totalprice + 1000 AS src_price, " +
        "(o_orderkey % 97 = 0) AS src_del FROM orders WHERE o_orderkey % 7 = 0 " +
        "UNION ALL SELECT o_orderkey + 10000000, o_totalprice, false " +
        "FROM orders WHERE o_orderkey % 1000 = 0), " +
        "m AS (SELECT t.o_orderkey AS tk, t.o_totalprice, t.o_orderstatus, " +
        "s.k, s.src_price, s.src_del FROM orders t FULL JOIN src s ON t.o_orderkey = s.k) " +
        "SELECT coalesce(tk, k) AS o_orderkey, " +
        "CASE WHEN k IS NOT NULL THEN src_price ELSE o_totalprice END AS o_totalprice, " +
        "CASE WHEN tk IS NULL THEN 'N' ELSE o_orderstatus END AS o_orderstatus " +
        "FROM m WHERE NOT (tk IS NOT NULL AND k IS NOT NULL AND coalesce(src_del, false)) " +
        "ORDER BY o_orderkey"),
    "u9_upsert_merge" ->
      ("SELECT o_orderkey, CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2 " +
        "ELSE o_totalprice END AS o_totalprice FROM orders ORDER BY o_orderkey"),
    "u11_topk_delete" ->
      ("SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders " +
        "WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) ORDER BY o_orderkey"),
    "u15_nested_update" ->
      ("SELECT event_id, CASE WHEN event_type = 'click' THEN -1 " +
        "ELSE CAST(json_extract(props, '$.k') AS BIGINT) END AS k " +
        "FROM events ORDER BY event_id"),
    "u14_store_dedup" ->
      ("SELECT o_orderkey, CASE WHEN o_orderkey % 2 = 0 THEN 'even' ELSE 'mod3' END AS src " +
        "FROM orders WHERE o_orderkey % 2 = 0 OR o_orderkey % 3 = 0 ORDER BY o_orderkey"),
    // the array-element update restated FLAT (no array round trip — an
    // independent formulation): rf flips ⇔ the doc has ≥5 items AND the
    // element's qty ≥ 45; everything else passes through
    "u18_array_elem_update" ->
      ("SELECT l_orderkey, CAST(l_linenumber AS INT) AS ln, " +
        "l_quantity AS qty, " +
        "CASE WHEN count(*) OVER (PARTITION BY l_orderkey) >= 5 " +
        "AND l_quantity >= 45 THEN 'X' ELSE l_returnflag END AS rf " +
        "FROM lineitem ORDER BY l_orderkey, ln"),
    // the CAS truth table as CASE guards: applied ⇔ key%4=0 ∧ version(=key%5)=2
    "u17_version_cas" ->
      ("SELECT o_orderkey, " +
        "CASE WHEN o_orderkey % 4 = 0 AND o_orderkey % 5 = 2 " +
        "THEN o_totalprice + 111 ELSE o_totalprice END AS o_totalprice, " +
        "CASE WHEN o_orderkey % 4 = 0 AND o_orderkey % 5 = 2 " +
        "THEN o_orderkey % 5 + 1 ELSE o_orderkey % 5 END AS version, " +
        "CASE WHEN o_orderkey % 4 = 0 AND o_orderkey % 5 = 2 THEN 'applied' " +
        "WHEN o_orderkey % 4 = 0 THEN 'conflict' ELSE 'untouched' END AS cas_result " +
        "FROM orders ORDER BY o_orderkey")
  )
}
