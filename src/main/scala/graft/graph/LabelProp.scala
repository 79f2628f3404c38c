package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection as the fixed small set of deterministic rounds the rest of the
  * graph family uses (g13 walks, g15 PageRank): every node adopts its
  * neighbors' most frequent label each round, ties broken by the SMALLEST
  * label, so the result is a pure function of the graph (no async sweep
  * order, no RNG — the two classic LPA nondeterminism sources).
  *
  * Scale shape per round: one co-keyed equi-join (neighbor labels arrive
  * over the edge key, never a product) + two hash aggregations, the first
  * with map-side partial counts; the per-node argmax is `min(struct(-n,
  * label))` — an aggregate, not a window, so no per-node sort of the whole
  * label table. Lineage truncated per round ([[graft.ops.IterTrunc]]
  * convention via localCheckpoint).
  *
  * Reference analog: none — its graph services (Titan upserts) stop at
  * merge/dedup; community detection is part of the analytics extension
  * surface (SURVEY §2 graph analytics).
  */
object LabelProp {

  /** Labels after `iters` synchronous rounds over the UNDIRECTED closure of
    * `edges` (one-direction (u,v) frame). Initial label = node id.
    * `checkpointDir` selects [[graft.ops.IterTrunc]]'s cluster-reliable
    * mode (HDFS/S3 parquet round-trips) — same convention as Bfs/Walks. */
  def propagate(edges: DataFrame, iters: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val trunc = new graft.ops.IterTrunc(edges.sparkSession, checkpointDir, "lpa")
    // pin the undirected edge set: it is read by EVERY round, and for a
    // derived edge frame (g16: a lineitem self-join + distinct) leaving it
    // lazy would re-execute that upstream iters+1 times
    val und = trunc.pin(edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v"))))
    val labelChan = trunc.channel()
    var labels = labelChan(und.select(col("u").as("node")).distinct()
      .withColumn("label", col("node")))
    for (_ <- 1 to iters) {
      labels = labelChan(und.join(labels, und("v") === labels("node"))
        .select(und("u").as("node"), col("label"))
        .groupBy("node", "label").agg(count(lit(1)).as("n"))
        .groupBy("node")
        .agg(min(struct((-col("n")).as("negN"), col("label"))).as("w"))
        .select(col("node"), col("w.label").as("label")))
    }
    labels
  }
}
