package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Matula & Beck 1983): repeat
  * "drop every vertex with fewer than k neighbors among the survivors"
  * until a fixpoint. The result — the unique maximal subgraph of minimum
  * degree ≥ k — is order-independent, so the synchronous rounds here give
  * the same core as any sequential peel.
  *
  * Scale shape per round: the undirected edge set is joined against the
  * survivor table on EACH endpoint (two co-keyed equi-joins — the survivor
  * side is the small, shrinking one) followed by one map-side-combined
  * count per vertex. Rounds are bounded by the longest peeling chain
  * (≤ |V| worst case, tiny in practice); lineage is truncated per round
  * via the [[graft.ops.IterTrunc]] convention shared with Bfs/LabelProp,
  * and the one driver-side value per round is the survivor COUNT (a
  * single long — the fixpoint test), never the vertices themselves.
  *
  * Reference analog: none — its graph services stop at merge/dedup
  * (SURVEY §2 J2/D2); core extraction is part of the analytics extension
  * surface alongside triangles (g10) and PageRank (g15).
  */
object KCore {

  /** Vertices of the k-core of the UNDIRECTED closure of `edges` (a
    * one-direction (u,v) frame, no self-loops expected), with each
    * survivor's degree inside the core. Empty result when no k-core
    * exists. `maxRounds` is a runaway guard only — the loop exits on the
    * first round that peels nothing. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 100,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val trunc = new graft.ops.IterTrunc(edges.sparkSession, checkpointDir, "kcore")
    // pinned: read twice per round, and typically a derived frame (g17's
    // lineitem self-join) that must not re-execute every iteration
    val und = trunc.pin(edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v"))))
    val chan = trunc.channel()

    def degreesWithin(survivors: DataFrame): DataFrame =
      und.join(survivors.select(col("node").as("__su")), und("u") === col("__su"))
        .join(survivors.select(col("node").as("__sv")), und("v") === col("__sv"))
        .groupBy(und("u").as("node")).agg(count(lit(1)).as("deg"))

    // survivor counts ride each materialization as observed metrics —
    // one action per peel round, not a channel write plus a count() job
    var (cur, n) = graft.ops.IterTrunc.counted(chan,
      und.select(col("u").as("node")).distinct())
    var rounds = 0
    var converged = n == 0
    while (!converged && rounds < maxRounds) {
      val (next, m) = graft.ops.IterTrunc.counted(chan,
        degreesWithin(cur).filter(col("deg") >= k).select("node"))
      converged = m == n || m == 0
      cur = next
      n = m
      rounds += 1
    }
    // a silent partial peel would return vertices whose deg column
    // violates the ≥ k certificate — fail loudly instead (a path graph
    // peels 2 nodes/round, so deep chains CAN exhaust small maxRounds)
    if (!converged) sys.error(
      s"KCore: no fixpoint after $maxRounds rounds ($n survivors, still " +
        "shrinking) — raise maxRounds; a partial peel is not a k-core")
    // final pass re-derives the in-core degree so callers get the
    // certificate column (every deg is ≥ k by construction at fixpoint)
    degreesWithin(cur)
  }

  /** The full peeling TRAJECTORY for `k`: every vertex with the round
    * (1-based) in which the synchronous peel removed it, `-1` for k-core
    * survivors. Strictly stronger than [[kCore]]'s membership certificate —
    * the layer sequence pins every intermediate survivor set, so an
    * off-by-one-round bug that still converges to the right core is
    * caught. Same per-round shape as [[kCore]] plus one anti-join (the
    * removed set, appended to a channel-truncated accumulator). */
  def peelLayers(edges: DataFrame, k: Int, maxRounds: Int = 100,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val trunc = new graft.ops.IterTrunc(edges.sparkSession, checkpointDir,
      "kcore-layers")
    val und = trunc.pin(edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v"))))
    val chan = trunc.channel()
    val layerChan = trunc.channel()

    def degreesWithin(survivors: DataFrame): DataFrame =
      und.join(survivors.select(col("node").as("__su")), und("u") === col("__su"))
        .join(survivors.select(col("node").as("__sv")), und("v") === col("__sv"))
        .groupBy(und("u").as("node")).agg(count(lit(1)).as("deg"))

    // same one-action-per-round shape as [[kCore]]
    var (cur, n) = graft.ops.IterTrunc.counted(chan,
      und.select(col("u").as("node")).distinct())
    var layers = cur.limit(0).withColumn("layer", lit(1))
    var rounds = 0
    var converged = n == 0
    while (!converged && rounds < maxRounds) {
      val (next, m) = graft.ops.IterTrunc.counted(chan,
        degreesWithin(cur).filter(col("deg") >= k).select("node"))
      layers = layerChan(layers.unionByName(
        cur.join(next, Seq("node"), "left_anti")
          .withColumn("layer", lit(rounds + 1))))
      converged = m == n || m == 0
      cur = next
      n = m
      rounds += 1
    }
    if (!converged) sys.error(
      s"KCore: no fixpoint after $maxRounds rounds ($n survivors, still " +
        "shrinking) — raise maxRounds; a partial trajectory is not a peel")
    layers.unionByName(cur.withColumn("layer", lit(-1)))
  }
}
