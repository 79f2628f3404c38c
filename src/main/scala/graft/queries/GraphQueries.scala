package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.GraphBuilder

/** Oracle-checked graph queries (SURVEY §2 J1/J2, D2, X3) over the driver
  * tables: orders decompose into customer/order vertices + "placed" edges;
  * lineitem decomposes into order→part "contains" edges with duplicate
  * collapse. */
object GraphQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** lineitem → "contains" edge candidates in the shared o/p-prefixed id
    * space with (qty, price, n) property bags in FIXED positional order —
    * the g8/g9 input; [[sumMaxMerge]] is positional on this column order. */
  private def containsEdges(li: DataFrame): DataFrame =
    GraphBuilder.edgeCandidates(
        li.withColumn("srcid", concat(lit("o"), col("l_orderkey")))
          .withColumn("dstid", concat(lit("p"), col("l_partkey")))
          .withColumn("qty", col("l_quantity").cast("long"))
          .withColumn("n", lit(1L)),
        "contains", "srcid", "dstid",
        Map("qty" -> "qty", "price" -> "l_extendedprice", "n" -> "n"))
      .select("label", "src", "dst", "qty", "price", "n")

  /** user property-bag merge for [[containsEdges]] groups: qty summed, best
    * price kept, multiplicity summed. */
  private val sumMaxMerge: Seq[org.apache.spark.sql.Row] => org.apache.spark.sql.Row =
    rows => org.apache.spark.sql.Row(
      rows.head.getString(0), rows.head.getString(1), rows.head.getString(2),
      rows.map(_.getLong(3)).sum, rows.map(_.getDouble(4)).max,
      rows.map(_.getLong(5)).sum)

  /** supplier co-service graph for g10/g11: an edge per supplier pair that
    * served the same high-quantity order (distinct, canonical u<v). */
  private def coServiceEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 48.0)
      .select(col("l_orderkey"), col("l_suppkey"))
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .select(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .distinct()
  }

  val queries: Map[String, Q] = Map(
    // X3 decompose: vertex + edge candidate counts by type/label
    "g1_decompose" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val custV = GraphBuilder.vertexCandidates(orders, "customer",
        Map("key" -> "o_custkey"))
      val orderV = GraphBuilder.vertexCandidates(orders, "order",
        Map("key" -> "o_orderkey"))
      val placed = GraphBuilder.edgeCandidates(orders, "placed",
        "o_custkey", "o_orderkey")
      custV.unionByName(orderV)
        .groupBy("vtype").agg(count(lit(1)).as("n_candidates"),
          countDistinct(col("key")).as("n_keys"))
        .unionByName(
          placed.groupBy(col("label").as("vtype"))
            .agg(count(lit(1)).as("n_candidates"),
              countDistinct(struct(col("src"), col("dst"))).as("n_keys")))
        .orderBy("vtype")
    },
    // D2 vertex dedup: winner-per-key with deterministic order
    "g2_vertex_merge" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val candidates = GraphBuilder.vertexCandidates(orders, "customer",
        Map("key" -> "o_custkey"),
        Map("first_order" -> "o_orderkey", "price" -> "o_totalprice"))
      GraphBuilder.dedupVertices(candidates, Seq("key"), "first_order")
        .select("key", "first_order", "price")
        .orderBy("key")
    },
    // J2 duplicate-edge collapse on (label, src, dst)
    "g3_edge_dedup" -> { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
      GraphBuilder.dedupEdges(
          GraphBuilder.edgeCandidates(li, "contains", "l_orderkey", "l_partkey"))
        .orderBy("src", "dst")
    },
    // J1 batch-vs-existing key lookup + upsert merge
    "g4_graph_upsert" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      // "existing" graph = customers seen in F orders; batch = O orders
      val existing = GraphBuilder.dedupVertices(
        GraphBuilder.vertexCandidates(orders.filter(col("o_orderstatus") === "F"),
          "customer", Map("key" -> "o_custkey"), Map("src_order" -> "o_orderkey")),
        Seq("key"), "src_order")
      val batch = GraphBuilder.dedupVertices(
        GraphBuilder.vertexCandidates(orders.filter(col("o_orderstatus") === "O"),
          "customer", Map("key" -> "o_custkey"), Map("src_order" -> "o_orderkey")),
        Seq("key"), "src_order")
      GraphBuilder.upsertVertices(existing, batch, Seq("key"))
        .select("key", "src_order").orderBy("key")
    },
    // X3/D2 custom property-merge: user module merges each key's candidate
    // property bags (max price wins, multiplicities summed) — the
    // DedupPolicy.Custom seam exercised end-to-end
    "g5_custom_merge" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val cands = GraphBuilder.vertexCandidates(orders, "customer",
          Map("key" -> "o_custkey"), Map("price" -> "o_totalprice"))
        .withColumn("n", lit(1L))
      val merge = (rows: Seq[org.apache.spark.sql.Row]) =>
        org.apache.spark.sql.Row(
          rows.head.getString(0), rows.head.getLong(1),
          rows.map(_.getDouble(2)).max, rows.map(_.getLong(3)).sum)
      GraphBuilder.mergeVertices(cands, Seq("key"),
          graft.model.DedupPolicy.Custom(merge), orderCol = "key")
        .select("key", "price", "n").orderBy("key")
    },
    // X3 edge custom property-bag merge: duplicate (label, src, dst) edges
    // collapse through the user module (qty summed, best price kept,
    // multiplicity counted) — the edge analog of g5
    "g6_edge_merge" -> { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
      val cands = GraphBuilder.edgeCandidates(
          li.withColumn("qty", col("l_quantity").cast("long"))
            .withColumn("n", lit(1L)),
          "contains", "l_orderkey", "l_partkey",
          Map("qty" -> "qty", "price" -> "l_extendedprice", "n" -> "n"))
        .select("label", "src", "dst", "qty", "price", "n")
      val merge = (rows: Seq[org.apache.spark.sql.Row]) =>
        org.apache.spark.sql.Row(
          rows.head.getString(0), rows.head.getLong(1), rows.head.getLong(2),
          rows.map(_.getLong(3)).sum, rows.map(_.getDouble(4)).max,
          rows.map(_.getLong(5)).sum)
      GraphBuilder.mergeEdges(cands, merge).orderBy("src", "dst")
    },
    // J2 endpoint resolution: orders of one customer collapse to the winner
    // order vertex; lineitem edges re-point at it, then duplicate edges
    // collapse — one shared id space via o/p prefixes
    "g7_edge_resolve" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val winners = orders.groupBy("o_custkey").agg(min("o_orderkey").as("w"))
      val alias = orders.join(winners, "o_custkey")
        .select(concat(lit("o"), col("o_orderkey")).as("cand_id"),
          concat(lit("o"), col("w")).as("winner_id"))
      val li = Tables.t(s, dir, "lineitem")
        .withColumn("srcid", concat(lit("o"), col("l_orderkey")))
        .withColumn("dstid", concat(lit("p"), col("l_partkey")))
      GraphBuilder.dedupEdges(GraphBuilder.resolveEdges(
          GraphBuilder.edgeCandidates(li, "contains", "srcid", "dstid"), alias))
        .orderBy("src", "dst")
    },
    // J2 full flow: resolve BOTH endpoints (orders collapse per customer,
    // parts collapse per brand — one shared alias table, prefixed id space),
    // then merge the now-colliding edges' property bags through the user
    // module — endpoints first, properties preserved, exactly the
    // reference's finalEdgeGrouping → handleMerge order
    "g8_resolve_merge" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val oAlias = orders
        .join(orders.groupBy("o_custkey").agg(min("o_orderkey").as("w")), "o_custkey")
        .select(concat(lit("o"), col("o_orderkey")).as("cand_id"),
          concat(lit("o"), col("w")).as("winner_id"))
      val part = Tables.t(s, dir, "part")
      val pAlias = part
        .join(part.groupBy("p_brand").agg(min("p_partkey").as("w")), "p_brand")
        .select(concat(lit("p"), col("p_partkey")).as("cand_id"),
          concat(lit("p"), col("w")).as("winner_id"))
      val edges = containsEdges(Tables.t(s, dir, "lineitem"))
      GraphBuilder.mergeEdges(
          GraphBuilder.resolveEdges(edges, oAlias.unionByName(pAlias)),
          sumMaxMerge)
        .orderBy("src", "dst")
    },
    // X3/J2 full lifecycle in ONE plan: decompose → mergeVertices (winner
    // per business key) → alias from the winners → resolveEdges →
    // mergeEdges — every graph-service seam composed end-to-end
    "g9_graph_lifecycle" -> { (s, dir) =>
      val orders = Tables.t(s, dir, "orders")
      val cands = GraphBuilder.vertexCandidates(orders, "order",
        Map("key" -> "o_custkey"), Map("order_id" -> "o_orderkey"))
      val winners = GraphBuilder.mergeVertices(cands, Seq("key"),
        graft.model.DedupPolicy.KeepFirst, orderCol = "order_id")
      val alias = cands
        .join(winners.select(col("key"), col("order_id").as("w")), "key")
        .select(concat(lit("o"), col("order_id")).as("cand_id"),
          concat(lit("o"), col("w")).as("winner_id"))
      val edges = containsEdges(Tables.t(s, dir, "lineitem"))
      GraphBuilder.mergeEdges(GraphBuilder.resolveEdges(edges, alias),
          sumMaxMerge)
        .orderBy("src", "dst")
    },
    // graph analytics: exact triangle count over the supplier co-service
    // graph (suppliers sharing a high-quantity order). Wedge join +
    // closing semi-join — two co-keyed shuffles, no adjacency state on
    // the driver; the degree-ordered variant (TrianglesSpec pins equality)
    // bounds wedge explosion on skewed graphs
    "g10_triangle_count" -> { (s, dir) =>
      graft.graph.Triangles.count(coServiceEdges(s, dir))
    },
    // same count through the degree-ordered orientation — the variant to
    // run at 100× on a skewed graph (wedges bounded by O(m·arboricity)
    // instead of the max id-order out-degree); one extra degree agg +
    // re-canonicalization, still all equi-joins (PlanSpec pins no-product)
    "g11_triangle_degree" -> { (s, dir) =>
      graft.graph.Triangles.countOrientedByDegree(coServiceEdges(s, dir))
    },
    // per-vertex triangle participation + local clustering coefficient —
    // the node-level refinement of g10: closed triples kept (not just
    // counted), exploded to their three corners, aggregated per node; lcc
    // is one exact-integer division ---------------------------------------
    "g14_local_clustering" -> { (s, dir) =>
      graft.graph.Triangles.perVertex(coServiceEdges(s, dir))
        .orderBy("node")
    },
    // multi-source BFS over the same graph: exact hop distances from the 3
    // smallest supplier ids. Frontier-expansion rounds (shuffle ∝ frontier
    // out-edges, early exit on empty shell), lineage truncated per round —
    // the oracle replays it as a recursive CTE
    "g12_bfs_levels" -> { (s, dir) =>
      val edges = coServiceEdges(s, dir)
      val nodes = edges.select(col("u").as("n"))
        .union(edges.select(col("v").as("n"))).distinct()
      graft.graph.Bfs.hopLevels(edges, nodes.orderBy("n").limit(3), maxHops = 4)
        .select(col("node"), col("dist").cast("int").as("dist"))
        .orderBy("node")
    },
    // exact length-3 walk counts from the same sources — the integer-
    // arithmetic power iteration (PageRank's skeleton without the float
    // summation-order hazard); each round is one co-keyed join + partial-
    // aggregated sum, oracle = three unrolled matrix-vector rounds
    "g13_walk_counts" -> { (s, dir) =>
      val edges = coServiceEdges(s, dir)
      val nodes = edges.select(col("u").as("n"))
        .union(edges.select(col("v").as("n"))).distinct()
      graft.graph.Walks.walkCounts(edges, nodes.orderBy("n").limit(3), steps = 3)
        .orderBy("node")
    },
    // ---- PageRank, 3 unrolled iterations at damping 0.85 over the
    // symmetrized co-service graph — g13's integer walk counts proved the
    // power-iteration skeleton; this is the float version users actually
    // ask for. Per iteration: one co-keyed join + map-side-combined sum
    // (contributions), one broadcast of the 1-row node count — the same
    // shuffle shape as connected components, O(iters) rounds. Scores are
    // DECIMAL(18,6)-rounded on both sides: cross-partition float summation
    // order is the one nondeterminism a distributed PR cannot avoid ------
    "g15_pagerank" -> { (s, dir) =>
      val d = 0.85
      val e0 = coServiceEdges(s, dir)
      val edges = e0.unionByName(
        e0.select(col("v").as("u"), col("u").as("v")))
      val deg = edges.groupBy(col("u").as("node"))
        .agg(count(lit(1)).as("outdeg"))
      val nTot = deg.agg(count(lit(1)).as("n_nodes"))
      var pr = deg.crossJoin(broadcast(nTot))
        .select(col("node"), col("outdeg"),
          (lit(1.0) / col("n_nodes")).as("pr"))
      for (_ <- 1 to 3) {
        val inflow = pr.join(edges, pr("node") === edges("u"))
          .select(col("v").as("node"), (col("pr") / col("outdeg")).as("c"))
          .groupBy("node").agg(sum(col("c")).as("inflow"))
        pr = deg.crossJoin(broadcast(nTot))
          .join(inflow, Seq("node"), "left")
          .select(col("node"), col("outdeg"),
            // 0.15 as a literal, not 1.0-d: the oracle writes the same
            // constant, and double(1.0-0.85) != double literal 0.15
            (lit(0.15) / col("n_nodes") +
              lit(d) * coalesce(col("inflow"), lit(0.0))).as("pr"))
      }
      pr.select(col("node"),
          col("pr").cast(org.apache.spark.sql.types.DecimalType(18, 6))
            .cast("double").as("pagerank"))
        .orderBy("node")
    },
    // ---- g20: HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    // canonical co-service edges (u < v — direction is the point of HITS:
    // a hub points, an authority is pointed at). Two synchronous
    // auth-then-hub rounds, L1-normalized; every sum is per-term
    // DECIMAL(28,12)-cast (exact, order-free — the pp4 normalizer regime)
    // so both engines divide the SAME doubles. Scale shape per round: two
    // co-keyed equi-joins + map-side-combined sums and a 1-row norm
    // broadcast — identical to g15's join geometry --------------------------
    "g20_hits" -> { (s, dir) =>
      val D = org.apache.spark.sql.types.DecimalType(28, 12)
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val edges = coServiceEdges(s, dir)
      val nodes = edges.select(col("u").as("node"))
        .unionByName(edges.select(col("v").as("node"))).distinct()
      var hub = nodes.select(col("node"), lit(1.0).as("hub"))
      // auth has no initial value in auth-then-hub HITS — round 1 derives
      // it from the all-ones hub before any read
      var auth: DataFrame = null
      for (_ <- 1 to 2) {
        val ra = edges.join(hub.select(col("node").as("u"), col("hub")), "u")
          .groupBy(col("v").as("node")).agg(sum(col("hub").cast(D)).as("r"))
        auth = nodes.join(ra, Seq("node"), "left")
          .crossJoin(broadcast(ra.agg(sum(col("r")).as("z"))))
          .select(col("node"), (coalesce(col("r"), lit(0).cast(D))
            .cast("double") / col("z").cast("double")).as("auth"))
        val rh = edges.join(auth.select(col("node").as("v"), col("auth")), "v")
          .groupBy(col("u").as("node")).agg(sum(col("auth").cast(D)).as("r"))
        hub = nodes.join(rh, Seq("node"), "left")
          .crossJoin(broadcast(rh.agg(sum(col("r")).as("z"))))
          .select(col("node"), (coalesce(col("r"), lit(0).cast(D))
            .cast("double") / col("z").cast("double")).as("hub"))
      }
      auth.join(hub, "node")
        .select(col("node"), col("auth").cast(D6).cast("double").as("auth"),
          col("hub").cast(D6).cast("double").as("hub"))
        .orderBy("node")
    },
    // ---- g21: strongly connected components over a DIRECTED graph — the
    // cycle-structure operator none of g10-g20 covers (their co-service
    // edges are canonicalized u<v, a DAG by construction). Input: the
    // purchase "handoff" graph — within each (event_type, day), an edge
    // from each user to the next user in time iff the gap is ≤ 150s (a
    // session-adjacency graph; the gap keeps it sparse enough to have
    // real structure: at sf0.01 a 24-node giant, two mid components, 99
    // singletons). Engine = Scc's FW-BW-min coloring (equi-joins +
    // O(diameter) batched relaxation); oracle = full recursive closure +
    // min over the mutual-reachability set, feasible because the demo
    // graph is small — the ENGINE path never materializes a closure ----
    "g21_scc" -> { (s, dir) =>
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"), date_trunc("DAY", col("ts")))
        .orderBy(col("ts"), col("event_id"))
      val seq = Tables.t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("nxt", lead("user_id", 1).over(W))
        .withColumn("nts", lead("ts", 1).over(W))
      val e = seq.filter(col("nxt").isNotNull &&
          col("nxt") =!= col("user_id") &&
          unix_micros(col("nts")) <= unix_micros(col("ts")) + 150000000L)
        .select(col("user_id").as("u"), col("nxt").as("v")).distinct()
      val comp = graft.graph.Scc.scc(e)
      comp.join(comp.groupBy("scc_id").agg(count(lit(1)).as("scc_size")),
          "scc_id")
        .select(col("node").as("user_id"), col("scc_id"), col("scc_size"))
        .orderBy("user_id")
    },
    // ---- g23: degree assortativity (Newman's r) of the co-service graph
    // — do high-degree suppliers co-serve other high-degree suppliers?
    // Pearson correlation of (deg u, deg v) over the DIRECTED edge list
    // (both orientations — the standard convention, and it makes the
    // moment sums symmetric). The ts8 float regime: exact DECIMAL(38,0)
    // integer moments, float only at the final sqrt/divide, one
    // DECIMAL(18,6) round. Scale shape: one co-keyed degree agg + two
    // broadcast-joinable degree lookups; the correlation is a 1-row agg -
    "g23_assortativity" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val e0 = coServiceEdges(s, dir)
      val und = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      val deg = und.groupBy(col("u").as("w")).agg(count(lit(1)).as("deg"))
      und
        .join(deg.select(col("w").as("u"), col("deg").as("dx")), "u")
        .join(deg.select(col("w").as("v"), col("deg").as("dy")), "v")
        .agg(count(lit(1)).cast(D38).as("m"),
          sum(col("dx")).cast(D38).as("sx"), sum(col("dy")).cast(D38).as("sy"),
          // cast each FACTOR before multiplying (the oracle's HUGEINT
          // order): a degree past ~3e9 would wrap a long×long product
          sum(col("dx").cast(D38) * col("dy").cast(D38)).as("sxy"),
          sum(col("dx").cast(D38) * col("dx").cast(D38)).as("sxx"),
          sum(col("dy").cast(D38) * col("dy").cast(D38)).as("syy"))
        .withColumn("vx", col("m") * col("sxx") - col("sx") * col("sx"))
        .withColumn("vy", col("m") * col("syy") - col("sy") * col("sy"))
        .filter(col("vx") > 0 && col("vy") > 0)
        .select(col("m").cast("long").as("n_directed_edges"),
          ((col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt(col("vx").cast("double")) * sqrt(col("vy").cast("double"))))
            .cast(D6).cast("double").as("assortativity"))
    },
    // ---- g16: label-propagation communities over the same co-service
    // graph — 2 synchronous deterministic rounds (most-frequent neighbor
    // label, ties → smallest), oracle = 2 unrolled argmax CTEs. Completes
    // the named-algorithm set (triangles/BFS/walks/PageRank/CC) ----------
    "g16_label_prop" -> { (s, dir) =>
      graft.graph.LabelProp.propagate(coServiceEdges(s, dir), iters = 2)
        .orderBy("node")
    },
    // ---- g17: k-core decomposition over the same co-service graph —
    // iterative peeling to the unique fixpoint (KCore); the emitted in-core
    // degree column is the certificate (min over it is ≥ k by definition).
    // Oracle = a recursive CTE carrying the survivor set as ONE list-typed
    // row per round (DuckDB's single-recursive-reference rule forbids the
    // two endpoint joins otherwise), unrolled past convergence ------------
    "g17_kcore" -> { (s, dir) =>
      graft.graph.KCore.kCore(coServiceEdges(s, dir), k = 5)
        .withColumnRenamed("deg", "core_deg")
        .orderBy("node")
    },
    // ---- g19: link prediction by Adamic–Adar — for every NON-adjacent
    // supplier pair two hops apart, Σ 1/ln(deg(w)) over common neighbors
    // w (the classic who-should-be-connected score). Shape: one wedge
    // equi-join on the middle vertex (g10's mechanism), an anti-join
    // against the canonical edge set to drop existing edges, a broadcast
    // degree re-join, then one co-keyed sum. Each 1/ln term is rounded to
    // DECIMAL(28,12) BEFORE the sum (ts5's regime): the sum is exact and
    // order-free, so the score hash-matches despite libm ln drift --------
    "g19_adamic_adar" -> { (s, dir) =>
      val d28 = org.apache.spark.sql.types.DecimalType(28, 12)
      val e0 = coServiceEdges(s, dir) // canonical u < v
      val und = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      val deg = und.groupBy(col("u").as("w")).agg(count(lit(1)).as("deg"))
      val wedges = und.select(col("u").as("a"), col("v").as("w"))
        .join(und.select(col("u").as("w"), col("v").as("b")), "w")
        .filter(col("a") < col("b"))
      val nonAdj = wedges.join(
        e0.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"),
        "left_anti")
      nonAdj.join(broadcast(deg), "w")
        .withColumn("term", (lit(1.0) / log(col("deg").cast("double"))).cast(d28))
        .groupBy(col("a").as("u"), col("b").as("v"))
        .agg(sum(col("term")).cast("double").as("aa_score"),
          count(lit(1)).as("n_common"))
        .orderBy("u", "v")
    },
    // ---- g18: the full k-core peeling TRAJECTORY — per-vertex removal
    // round (the "onion layer"), -1 for survivors. Pins every intermediate
    // survivor set of g17's peel, so a convergent-but-wrong round order is
    // a hash failure; oracle derives layers from the same recursive CTE
    // (max round each vertex still appears in) ----------------------------
    "g18_peel_layers" -> { (s, dir) =>
      graft.graph.KCore.peelLayers(coServiceEdges(s, dir), k = 5)
        .orderBy("node")
    },
    // landmark (sampled) closeness centrality — the Eppstein–Wang pivot
    // estimate over the co-service graph: ONE tagged multi-source BFS
    // (visited keyed (src, node)) from the 5 smallest supplier ids instead
    // of 5 separate traversals; per-node landmark count + exact hop-sum,
    // float only at the final count/sum division. Shuffle per round is the
    // union of all landmarks' frontier out-edges co-keyed on the adjacency;
    // at 100 TB the landmark count (not graph size) scales the state ------
    "g24_closeness" -> { (s, dir) =>
      // the lineitem self-join behind the graph is the dominant stage and
      // feeds BOTH the landmark pick and the traversal's pinned adjacency
      // — persist so it runs once (safe to release after the call: the
      // returned levels are checkpoint-backed by IterTrunc)
      val edges = coServiceEdges(s, dir).persist()
      try {
        val nodes = edges.select(col("u").as("n"))
          .union(edges.select(col("v").as("n"))).distinct()
        graft.graph.Bfs.taggedHopLevels(edges, nodes.orderBy("n").limit(5),
            maxHops = 4)
          .filter(col("src") =!= col("node"))
          .groupBy("node")
          .agg(count(lit(1)).cast("int").as("n_landmarks"),
            sum(col("dist")).as("total_dist"))
          .withColumn("closeness",
            col("n_landmarks").cast("double") / col("total_dist"))
          .orderBy("node")
      } finally edges.unpersist()
    },
    // 2-sweep diameter lower bound (the double-BFS heuristic every graph
    // profiler runs first): BFS from the smallest node → its most distant
    // node a (ties → smallest id), BFS again from a → eccentricity(a) =
    // the bound. Two frontier expansions on the shared Bfs loop, the
    // 1-row argmax stays a DataFrame (no driver collect); exact integers
    // throughout ----------------------------------------------------------
    "g25_diameter_2sweep" -> { (s, dir) =>
      val edges = coServiceEdges(s, dir).persist()
      try {
        val s0 = edges.select(col("u").as("n"))
          .union(edges.select(col("v").as("n")))
          .agg(min(col("n")).as("n"))
        val b1 = graft.graph.Bfs.hopLevels(edges, s0, maxHops = 30)
        val a = b1.orderBy(col("dist").desc, col("node")).limit(1)
        val b2 = graft.graph.Bfs.hopLevels(edges, a.select("node"),
          maxHops = 30)
        val far = b2.orderBy(col("dist").desc, col("node")).limit(1)
        a.select(col("node").as("node_a"), col("dist").as("ecc_start"))
          .crossJoin(broadcast(far.select(col("node").as("node_b"),
            col("dist").as("lb_diameter"))))
      } finally edges.unpersist()
    },
    // registry: bucket metadata CRUD on the engine's own CrudService — the
    // management-DB surface; descriptors derive from region rows so the
    // oracle can reproduce them (the collect is 5 control-plane rows)
    "reg1_bucket_registry" -> { (s, dir) =>
      val store = new graft.store.BucketStore(s,
        graft.util.Scratch.dir("graft_reg"))
      val registry = new graft.meta.BucketRegistry(store)
      val buckets = Tables.t(s, dir, "region").collect().toSeq.map { r =>
        graft.model.Bucket(
          "/buckets/" + r.getAs[String]("r_name").toLowerCase,
          graft.model.DataSchema(
            temporal = Some(graft.model.TemporalSchema("ts",
              graft.model.GroupingPeriod.Daily)),
            storage = Some(graft.model.StorageSchema(codec = Some("snappy")))))
      }
      registry.registerAll(buckets)
      registry.list("/buckets/")
        .select("full_name", "signature", "grouping_period", "codec")
        .orderBy("full_name")
    }
  )

  val oracle: Map[String, String] = Map(
    // all-pairs triple join over the canonical (u<v) edge set — exact
    // same count, oracle-sized plan
    "g10_triangle_count" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey) " +
        "SELECT count(*) AS n_triangles FROM e e1 " +
        "JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v"),
    "g14_local_clustering" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "tri3 AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e e1 " +
        "JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v), " +
        "verts AS (SELECT a AS node FROM tri3 UNION ALL SELECT b FROM tri3 UNION ALL SELECT c FROM tri3), " +
        "tcnt AS (SELECT node, count(*) AS t FROM verts GROUP BY node), " +
        "deg AS (SELECT node, count(*) AS d FROM " +
        "(SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) GROUP BY node) " +
        "SELECT deg.node AS node, CAST(d AS BIGINT) AS degree, " +
        "CAST(coalesce(t, 0) AS BIGINT) AS tri, " +
        "CASE WHEN d < 2 THEN 0.0 ELSE CAST(2 * coalesce(t, 0) AS DOUBLE) / (d * (d - 1)) END AS lcc " +
        "FROM deg LEFT JOIN tcnt ON deg.node = tcnt.node ORDER BY node"),
    "g12_bfs_levels" ->
      ("WITH RECURSIVE li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0), " +
        "src AS (SELECT DISTINCT u AS n FROM e ORDER BY n LIMIT 3), " +
        "walk(n, d) AS (SELECT n, 0 FROM src " +
        "UNION SELECT e.v, walk.d + 1 FROM walk JOIN e ON e.u = walk.n WHERE walk.d < 4) " +
        "SELECT n AS node, CAST(min(d) AS INT) AS dist FROM walk GROUP BY n ORDER BY node"),
    "g13_walk_counts" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0), " +
        "src AS (SELECT DISTINCT u AS n FROM e ORDER BY n LIMIT 3), " +
        "c0 AS (SELECT n AS node, CAST(1 AS BIGINT) AS w FROM src), " +
        "c1 AS (SELECT e.v AS node, sum(w) AS w FROM c0 JOIN e ON e.u = c0.node GROUP BY 1), " +
        "c2 AS (SELECT e.v AS node, sum(w) AS w FROM c1 JOIN e ON e.u = c1.node GROUP BY 1), " +
        "c3 AS (SELECT e.v AS node, sum(w) AS w FROM c2 JOIN e ON e.u = c2.node GROUP BY 1) " +
        "SELECT node, CAST(w AS BIGINT) AS n_walks FROM c3 ORDER BY node"),
    // three unrolled PR rounds; every float input forced DOUBLE so DuckDB's
    // DECIMAL literal arithmetic can't diverge; DECIMAL(18,6) round at the
    // end matches the engine side (summation order is the only slack)
    "g15_pagerank" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), " +
        "deg AS (SELECT u AS node, count(*) AS outdeg FROM e GROUP BY 1), " +
        "st AS (SELECT count(*) AS n_nodes FROM deg), " +
        "p0 AS (SELECT node, outdeg, CAST(1.0 AS DOUBLE) / n_nodes AS pr FROM deg CROSS JOIN st), " +
        "p1 AS (SELECT d.node, d.outdeg, CAST(0.15 AS DOUBLE) / st.n_nodes + 0.85 * coalesce(f.inflow, 0.0) AS pr " +
        "FROM deg d CROSS JOIN st LEFT JOIN (SELECT e.v AS node, sum(p.pr / p.outdeg) AS inflow " +
        "FROM p0 p JOIN e ON e.u = p.node GROUP BY 1) f ON f.node = d.node), " +
        "p2 AS (SELECT d.node, d.outdeg, CAST(0.15 AS DOUBLE) / st.n_nodes + 0.85 * coalesce(f.inflow, 0.0) AS pr " +
        "FROM deg d CROSS JOIN st LEFT JOIN (SELECT e.v AS node, sum(p.pr / p.outdeg) AS inflow " +
        "FROM p1 p JOIN e ON e.u = p.node GROUP BY 1) f ON f.node = d.node), " +
        "p3 AS (SELECT d.node, d.outdeg, CAST(0.15 AS DOUBLE) / st.n_nodes + 0.85 * coalesce(f.inflow, 0.0) AS pr " +
        "FROM deg d CROSS JOIN st LEFT JOIN (SELECT e.v AS node, sum(p.pr / p.outdeg) AS inflow " +
        "FROM p2 p JOIN e ON e.u = p.node GROUP BY 1) f ON f.node = d.node) " +
        "SELECT node, CAST(CAST(pr AS DECIMAL(18,6)) AS DOUBLE) AS pagerank " +
        "FROM p3 ORDER BY node"),
    // two unrolled auth-then-hub rounds on the DIRECTED canonical edges;
    // the same per-term DECIMAL(28,12) casts make every sum order-free
    "g20_hits" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "n AS (SELECT u AS node FROM e UNION SELECT v AS node FROM e), " +
        "h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM n), " +
        "ra1 AS (SELECT e.v AS node, sum(CAST(h.hub AS DECIMAL(28,12))) AS r " +
        "FROM e JOIN h0 h ON h.node = e.u GROUP BY 1), " +
        "za1 AS (SELECT sum(r) AS z FROM ra1), " +
        "a1 AS (SELECT n.node, CAST(coalesce(r, 0) AS DOUBLE) / CAST(z AS DOUBLE) AS auth " +
        "FROM n LEFT JOIN ra1 USING (node) CROSS JOIN za1), " +
        "rh1 AS (SELECT e.u AS node, sum(CAST(a.auth AS DECIMAL(28,12))) AS r " +
        "FROM e JOIN a1 a ON a.node = e.v GROUP BY 1), " +
        "zh1 AS (SELECT sum(r) AS z FROM rh1), " +
        "h1 AS (SELECT n.node, CAST(coalesce(r, 0) AS DOUBLE) / CAST(z AS DOUBLE) AS hub " +
        "FROM n LEFT JOIN rh1 USING (node) CROSS JOIN zh1), " +
        "ra2 AS (SELECT e.v AS node, sum(CAST(h.hub AS DECIMAL(28,12))) AS r " +
        "FROM e JOIN h1 h ON h.node = e.u GROUP BY 1), " +
        "za2 AS (SELECT sum(r) AS z FROM ra2), " +
        "a2 AS (SELECT n.node, CAST(coalesce(r, 0) AS DOUBLE) / CAST(z AS DOUBLE) AS auth " +
        "FROM n LEFT JOIN ra2 USING (node) CROSS JOIN za2), " +
        "rh2 AS (SELECT e.u AS node, sum(CAST(a.auth AS DECIMAL(28,12))) AS r " +
        "FROM e JOIN a2 a ON a.node = e.v GROUP BY 1), " +
        "zh2 AS (SELECT sum(r) AS z FROM rh2), " +
        "h2 AS (SELECT n.node, CAST(coalesce(r, 0) AS DOUBLE) / CAST(z AS DOUBLE) AS hub " +
        "FROM n LEFT JOIN rh2 USING (node) CROSS JOIN zh2) " +
        "SELECT a2.node, CAST(CAST(auth AS DECIMAL(18,6)) AS DOUBLE) AS auth, " +
        "CAST(CAST(hub AS DECIMAL(18,6)) AS DOUBLE) AS hub " +
        "FROM a2 JOIN h2 USING (node) ORDER BY node"),
    // the oracle takes the O(n^2)-closure shortcut the engine never may:
    // scc_id(v) = min over {u : u ~>* v AND v ~>* u} (self included via
    // the identity rows); the micros gap comparison mirrors unix_micros
    "g21_scc" ->
      ("WITH RECURSIVE seq AS (SELECT event_type, user_id, ts, " +
        "lead(user_id) OVER w AS nxt, lead(ts) OVER w AS nts " +
        "FROM events WHERE event_type = 'purchase' " +
        "WINDOW w AS (PARTITION BY event_type, date_trunc('day', ts) " +
        "ORDER BY ts, event_id)), " +
        "e AS (SELECT DISTINCT user_id AS u, nxt AS v FROM seq " +
        "WHERE nxt IS NOT NULL AND nxt <> user_id " +
        "AND epoch_us(nts) <= epoch_us(ts) + 150000000), " +
        "n AS (SELECT DISTINCT u AS node FROM e UNION SELECT DISTINCT v FROM e), " +
        "reach(a, b) AS (SELECT u, v FROM e " +
        "UNION SELECT r.a, e.v FROM reach r JOIN e ON e.u = r.b), " +
        "r2 AS (SELECT a, b FROM reach UNION ALL SELECT node, node FROM n), " +
        "scc AS (SELECT f.b AS node, min(f.a) AS scc_id FROM r2 f " +
        "JOIN r2 g ON g.a = f.b AND g.b = f.a GROUP BY f.b), " +
        "sz AS (SELECT scc_id, count(*) AS scc_size FROM scc GROUP BY 1) " +
        "SELECT scc.node AS user_id, scc.scc_id AS scc_id, sz.scc_size " +
        "FROM scc JOIN sz USING (scc_id) ORDER BY user_id"),
    // two unrolled synchronous LPA rounds; per-round argmax replicated as
    // row_number over (count desc, label) — same tiebreak as the engine's
    // min(struct(-n, label)) aggregate
    "g16_label_prop" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), " +
        "l0 AS (SELECT DISTINCT u AS node, u AS label FROM e), " +
        "c1 AS (SELECT e.u AS node, l.label, count(*) AS n FROM e JOIN l0 l ON e.v = l.node GROUP BY 1, 2), " +
        "l1 AS (SELECT node, label FROM (SELECT node, label, " +
        "row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rn FROM c1) WHERE rn = 1), " +
        "c2 AS (SELECT e.u AS node, l.label, count(*) AS n FROM e JOIN l1 l ON e.v = l.node GROUP BY 1, 2), " +
        "l2 AS (SELECT node, label FROM (SELECT node, label, " +
        "row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rn FROM c2) WHERE rn = 1) " +
        "SELECT node, label FROM l2 ORDER BY node"),
    // orientation is an engine-side detail; the count is orientation-free,
    // so the degree-ordered path shares g10's oracle formulation
    "g11_triangle_degree" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey) " +
        "SELECT count(*) AS n_triangles FROM e e1 " +
        "JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v"),
    "g1_decompose" ->
      ("SELECT vtype, n_candidates, n_keys FROM (" +
        "SELECT 'customer' AS vtype, count(*) AS n_candidates, count(DISTINCT o_custkey) AS n_keys FROM orders " +
        "UNION ALL SELECT 'order', count(*), count(DISTINCT o_orderkey) FROM orders " +
        "UNION ALL SELECT 'placed', count(*), count(DISTINCT (o_custkey, o_orderkey)) FROM orders" +
        ") ORDER BY vtype"),
    "g2_vertex_merge" ->
      ("SELECT o_custkey AS key, o_orderkey AS first_order, o_totalprice AS price FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn FROM orders) " +
        "WHERE rn = 1 ORDER BY key"),
    "g3_edge_dedup" ->
      ("SELECT 'contains' AS label, l_orderkey AS src, l_partkey AS dst, " +
        "count(*) AS multiplicity FROM lineitem GROUP BY 2, 3 ORDER BY src, dst"),
    "g4_graph_upsert" ->
      ("SELECT key, src_order FROM (" +
        "SELECT o_custkey AS key, min(o_orderkey) AS src_order FROM orders WHERE o_orderstatus = 'F' GROUP BY 1 " +
        "UNION ALL " +
        "SELECT o_custkey, min(o_orderkey) FROM orders WHERE o_orderstatus = 'O' " +
        "AND o_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') GROUP BY o_custkey" +
        ") ORDER BY key"),
    "g5_custom_merge" ->
      ("SELECT o_custkey AS key, max(o_totalprice) AS price, count(*) AS n " +
        "FROM orders GROUP BY 1 ORDER BY key"),
    "g6_edge_merge" ->
      ("SELECT 'contains' AS label, l_orderkey AS src, l_partkey AS dst, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, " +
        "max(l_extendedprice) AS price, CAST(count(*) AS BIGINT) AS n " +
        "FROM lineitem GROUP BY 2, 3 ORDER BY src, dst"),
    "g7_edge_resolve" ->
      ("WITH winners AS (SELECT o_custkey, min(o_orderkey) AS w FROM orders GROUP BY 1), " +
        "alias AS (SELECT 'o' || o.o_orderkey AS cand_id, 'o' || w.w AS winner_id " +
        "FROM orders o JOIN winners w ON o.o_custkey = w.o_custkey) " +
        "SELECT 'contains' AS label, coalesce(a.winner_id, 'o' || l.l_orderkey) AS src, " +
        "'p' || l.l_partkey AS dst, CAST(count(*) AS BIGINT) AS multiplicity " +
        "FROM lineitem l LEFT JOIN alias a ON 'o' || l.l_orderkey = a.cand_id " +
        "GROUP BY 2, 3 ORDER BY src, dst"),
    "g8_resolve_merge" ->
      ("WITH ow AS (SELECT o_custkey, min(o_orderkey) AS w FROM orders GROUP BY 1), " +
        "oalias AS (SELECT 'o' || o.o_orderkey AS cand_id, 'o' || ow.w AS winner_id " +
        "FROM orders o JOIN ow ON o.o_custkey = ow.o_custkey), " +
        "pw AS (SELECT p_brand, min(p_partkey) AS w FROM part GROUP BY 1), " +
        "palias AS (SELECT 'p' || p.p_partkey AS cand_id, 'p' || pw.w AS winner_id " +
        "FROM part p JOIN pw ON p.p_brand = pw.p_brand) " +
        "SELECT 'contains' AS label, " +
        "coalesce(oa.winner_id, 'o' || l.l_orderkey) AS src, " +
        "coalesce(pa.winner_id, 'p' || l.l_partkey) AS dst, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, " +
        "max(l_extendedprice) AS price, CAST(count(*) AS BIGINT) AS n " +
        "FROM lineitem l " +
        "LEFT JOIN oalias oa ON 'o' || l.l_orderkey = oa.cand_id " +
        "LEFT JOIN palias pa ON 'p' || l.l_partkey = pa.cand_id " +
        "GROUP BY 2, 3 ORDER BY src, dst"),
    "g9_graph_lifecycle" ->
      ("WITH winners AS (SELECT o_custkey, min(o_orderkey) AS w FROM orders GROUP BY 1), " +
        "alias AS (SELECT 'o' || o.o_orderkey AS cand_id, 'o' || w.w AS winner_id " +
        "FROM orders o JOIN winners w ON o.o_custkey = w.o_custkey) " +
        "SELECT 'contains' AS label, " +
        "coalesce(a.winner_id, 'o' || l.l_orderkey) AS src, " +
        "'p' || l.l_partkey AS dst, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, " +
        "max(l_extendedprice) AS price, CAST(count(*) AS BIGINT) AS n " +
        "FROM lineitem l LEFT JOIN alias a ON 'o' || l.l_orderkey = a.cand_id " +
        "GROUP BY 2, 3 ORDER BY src, dst"),
    // k-core peel as a recursive CTE: each round is ONE row (i, [survivor
    // list]) because DuckDB allows a single reference to the recursive
    // table and the degree test needs the survivor set on BOTH endpoints;
    // 30 rounds is far past this graph's peeling depth, and the final
    // round's set is the fixpoint the engine's converged loop returns
    "g17_kcore" ->
      ("WITH RECURSIVE " +
        "li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), " +
        "peel(i, vs) AS (" +
        "SELECT 0, list(DISTINCT u ORDER BY u) FROM e " +
        "UNION ALL " +
        "SELECT i + 1, (" +
        "WITH cur AS (SELECT unnest(vs) AS x), " +
        "deg AS (SELECT e.u, count(*) AS d FROM e " +
        "JOIN cur c1 ON e.u = c1.x JOIN cur c2 ON e.v = c2.x GROUP BY e.u) " +
        "SELECT COALESCE(list(u ORDER BY u), []) FROM deg WHERE d >= 5" +
        ") FROM peel WHERE i < 30), " +
        "core AS (SELECT unnest(vs) AS node FROM peel WHERE i = 30) " +
        "SELECT e.u AS node, count(*) AS core_deg FROM e " +
        "JOIN core c1 ON e.u = c1.node JOIN core c2 ON e.v = c2.node " +
        "GROUP BY e.u ORDER BY node"),
    // same wedge/anti-join algebra; per-term DECIMAL(28,12) round before
    // the exact sum mirrors the engine
    "g19_adamic_adar" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), " +
        "deg AS (SELECT u AS w, count(*) AS deg FROM e GROUP BY u), " +
        "wed AS (SELECT e1.u AS a, e1.v AS w, e2.v AS b FROM e e1 " +
        "JOIN e e2 ON e1.v = e2.u WHERE e1.u < e2.v), " +
        "nonadj AS (SELECT a, w, b FROM wed WHERE NOT EXISTS " +
        "(SELECT 1 FROM e0 WHERE e0.u = wed.a AND e0.v = wed.b)) " +
        "SELECT a AS u, b AS v, " +
        "CAST(sum(CAST(1.0 / ln(CAST(deg AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS aa_score, " +
        "count(*) AS n_common " +
        "FROM nonadj JOIN deg USING (w) GROUP BY a, b ORDER BY u, v"),
    // same directed-edge-list Pearson with exact HUGEINT moments
    "g23_assortativity" ->
      ("WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), " +
        "deg AS (SELECT u AS w, count(*) AS deg FROM e GROUP BY u), " +
        "p AS (SELECT d1.deg AS dx, d2.deg AS dy FROM e " +
        "JOIN deg d1 ON e.u = d1.w JOIN deg d2 ON e.v = d2.w), " +
        "a AS (SELECT count(*) AS m, sum(dx) AS sx, sum(dy) AS sy, " +
        "sum(CAST(dx AS HUGEINT) * dx) AS sxx, sum(CAST(dy AS HUGEINT) * dy) AS syy, " +
        "sum(CAST(dx AS HUGEINT) * dy) AS sxy FROM p), " +
        "v AS (SELECT *, m * sxx - CAST(sx AS HUGEINT) * sx AS vx, " +
        "m * syy - CAST(sy AS HUGEINT) * sy AS vy FROM a) " +
        "SELECT CAST(m AS BIGINT) AS n_directed_edges, CAST(CAST(" +
        "CAST(m * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) / " +
        "(sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE))) " +
        "AS DECIMAL(18,6)) AS DOUBLE) AS assortativity " +
        "FROM v WHERE vx > 0 AND vy > 0"),
    // same peel CTE as g17; a vertex's layer = 1 + the last round it
    // survived (max i it appears in), -1 when it reaches the i=30 fixpoint
    "g18_peel_layers" ->
      ("WITH RECURSIVE " +
        "li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), " +
        "peel(i, vs) AS (" +
        "SELECT 0, list(DISTINCT u ORDER BY u) FROM e " +
        "UNION ALL " +
        "SELECT i + 1, (" +
        "WITH cur AS (SELECT unnest(vs) AS x), " +
        "deg AS (SELECT e.u, count(*) AS d FROM e " +
        "JOIN cur c1 ON e.u = c1.x JOIN cur c2 ON e.v = c2.x GROUP BY e.u) " +
        "SELECT COALESCE(list(u ORDER BY u), []) FROM deg WHERE d >= 5" +
        ") FROM peel WHERE i < 30), " +
        "r AS (SELECT i, unnest(vs) AS node FROM peel), " +
        "mx AS (SELECT node, max(i) AS mx FROM r GROUP BY node) " +
        "SELECT node, CAST(CASE WHEN mx = 30 THEN -1 ELSE mx + 1 END AS INT) AS layer " +
        "FROM mx ORDER BY node"),
    // two chained recursive walks (the second seeded by the first's
    // deterministic argmax), exact integer distances
    "g25_diameter_2sweep" ->
      ("WITH RECURSIVE li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0), " +
        "s0 AS (SELECT min(u) AS n FROM e), " +
        "walk1(n, d) AS (SELECT n, 0 FROM s0 " +
        "UNION SELECT e.v, walk1.d + 1 FROM walk1 JOIN e ON e.u = walk1.n WHERE walk1.d < 30), " +
        "m1 AS (SELECT n, min(d) AS d FROM walk1 GROUP BY 1), " +
        "a AS (SELECT n, d FROM m1 ORDER BY d DESC, n LIMIT 1), " +
        "walk2(n, d) AS (SELECT n, 0 FROM (SELECT n FROM a) " +
        "UNION SELECT e.v, walk2.d + 1 FROM walk2 JOIN e ON e.u = walk2.n WHERE walk2.d < 30), " +
        "m2 AS (SELECT n, min(d) AS d FROM walk2 GROUP BY 1), " +
        "b AS (SELECT n, d FROM m2 ORDER BY d DESC, n LIMIT 1) " +
        "SELECT a.n AS node_a, CAST(a.d AS INT) AS ecc_start, " +
        "b.n AS node_b, CAST(b.d AS INT) AS lb_diameter " +
        "FROM a CROSS JOIN b"),
    // per-landmark min distance via the tagged recursive walk (g12's CTE
    // carrying the source), exact integer count/sum, one double division
    "g24_closeness" ->
      ("WITH RECURSIVE li AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 48), " +
        "e0 AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey), " +
        "e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0), " +
        "src AS (SELECT DISTINCT u AS n FROM e ORDER BY n LIMIT 5), " +
        "walk(s, n, d) AS (SELECT n, n, 0 FROM src " +
        "UNION SELECT walk.s, e.v, walk.d + 1 FROM walk JOIN e ON e.u = walk.n WHERE walk.d < 4), " +
        "mind AS (SELECT s, n, min(d) AS d FROM walk GROUP BY 1, 2) " +
        "SELECT n AS node, CAST(count(*) AS INT) AS n_landmarks, " +
        "CAST(sum(d) AS BIGINT) AS total_dist, " +
        "CAST(count(*) AS DOUBLE) / sum(d) AS closeness " +
        "FROM mind WHERE s <> n GROUP BY n ORDER BY node"),
    "reg1_bucket_registry" ->
      ("SELECT '/buckets/' || lower(r_name) AS full_name, " +
        "'buckets_' || replace(lower(r_name), ' ', '_') AS signature, " +
        "'daily' AS grouping_period, 'snappy' AS codec " +
        "FROM region ORDER BY full_name")
  )
}
