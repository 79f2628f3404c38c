package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => fn}

/** Distributed triangle counting over an undirected simple graph — the
  * canonical graph-analytics companion to the builder/merge pipeline
  * ([[GraphBuilder]]) and connected components ([[graft.dedup.Clustering]]).
  *
  * Algorithm: orient every edge low→high, enumerate wedges with one
  * equi-join (u→v ⋈ v→w gives u<v<w, so each triangle is generated exactly
  * once, as its sorted vertex triple), then close them with a semi-join
  * against the edge set. Both joins are plain co-keyed shuffles — no
  * adjacency lists on the driver, no per-node materialization. The wedge
  * count is the scale knob: orienting by DEGREE instead of id (low-degree
  * endpoint first) bounds wedges by O(m·arboricity) on skewed graphs;
  * [[countOrientedByDegree]] does that re-orientation — same result, same
  * join shape, one extra degree-agg + re-canonicalization pass.
  */
object Triangles {

  /** Total triangles. `edges` = two columns (any names), one row per
    * undirected edge; self-loops, duplicates, and orientation are
    * normalized here. Returns one row, `n_triangles: bigint`. */
  def count(edges: DataFrame): DataFrame =
    countCanonical(canonicalize(edges))

  /** [[count]] with the degree-ordered orientation (identical result;
    * wedge explosion bounded on skewed degree distributions). */
  def countOrientedByDegree(edges: DataFrame): DataFrame = {
    val e = canonicalize(edges)
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(fn.count(lit(1)).as("d"))
    // re-orient each edge (lower degree, then lower id, first); the
    // canonical triple enumeration below is oblivious to WHICH total
    // order is used, as long as it is consistent — (d, id) is one
    val du = deg.select(col("n").as("u"), col("d").as("du"))
    val dv = deg.select(col("n").as("v"), col("d").as("dv"))
    val orient = e.join(du, "u").join(dv, "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("x"), col("v").as("y")))
          .otherwise(struct(col("v").as("x"), col("u").as("y"))).as("e"))
      .select(col("e.x").as("u"), col("e.y").as("v"))
    countOriented(orient)
  }

  /** Per-vertex triangle participation and local clustering coefficient —
    * (node, degree, tri, lcc) with lcc = 2·tri / (deg·(deg−1)), 0.0 for
    * degree < 2. Same triple enumeration as [[count]] (each triangle once,
    * as its sorted (a,b,c)), but the closed triples are kept and exploded
    * to their three vertices before the per-node aggregation — still all
    * co-keyed equi-joins, one narrow 3-way explode, no adjacency lists. */
  def perVertex(edges: DataFrame): DataFrame = {
    val e = canonicalize(edges)
    val tcnt = canonicalTriples(e)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(fn.count(lit(1)).as("tri"))
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(fn.count(lit(1)).as("degree"))
    deg.join(tcnt, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("degree") < 2, lit(0.0))
          .otherwise((coalesce(col("tri"), lit(0L)) * 2).cast("double") /
            (col("degree") * (col("degree") - 1)))
          .as("lcc"))
  }

  /** distinct low→high edges, self-loops dropped */
  private def canonicalize(edges: DataFrame): DataFrame = {
    val e = edges.toDF("a", "b")
    e.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
  }

  /** Every triangle exactly once as its sorted (a, b, c) triple — the ONE
    * copy of the wedge-enumeration + closing-join shape shared by the
    * total count and the per-vertex refinement. */
  private def canonicalTriples(e: DataFrame): DataFrame =
    e.as("x").join(e.as("y"), col("x.v") === col("y.u"))
      .select(col("x.u").as("a"), col("x.v").as("b"), col("y.v").as("c"))
      .join(e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))

  private def countCanonical(e: DataFrame): DataFrame =
    canonicalTriples(e).agg(fn.count(lit(1)).as("n_triangles"))

  /** wedge enumeration in an arbitrary consistent orientation: pivot p
    * points to both endpoints, so wedges are p's out-neighbor PAIRS; the
    * closing edge may run in either orientation. */
  private def countOriented(e: DataFrame): DataFrame = {
    val out = e // p = u, out-neighbor = v
    val wedges = out.as("x").join(out.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.v").as("u"), col("y.v").as("w"))
    val closing = e.select(col("u"), col("v").as("w"))
      .union(e.select(col("v").as("u"), col("u").as("w")))
    closeAndCount(wedges, closing)
  }

  /** `closing` must be duplicate-free: countOriented derives it from the
    * canonicalized (distinct) edge set — its two-orientation union cannot
    * collide because each undirected edge appears in exactly one
    * orientation. A re-distinct here would re-shuffle all m edges. */
  private def closeAndCount(wedges: DataFrame, closing: DataFrame): DataFrame =
    wedges.join(closing.select(col("u"), col("w")), Seq("u", "w"), "inner")
      .agg(fn.count(lit(1)).as("n_triangles"))
}
