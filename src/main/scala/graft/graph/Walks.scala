package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact walk counting — the sparse matrix-vector power iteration that
  * underlies PageRank/Katz centrality, kept in integer arithmetic so
  * results are exactly reproducible (float PageRank is order-of-summation
  * dependent across engines; walk counts are not). Each round is one
  * co-keyed join + sum aggregation: c_{k+1}(v) = Σ_{(u,v)∈E} c_k(u),
  * which Spark executes with map-side partial sums before the shuffle.
  * Lineage is truncated per round ([[graft.ops.IterTrunc]]).
  */
object Walks {

  /** Number of length-`steps` walks from the source set to each node:
    * (node, n_walks), nodes with zero walks absent. `steps = 0` returns
    * each source with count 1. Counts grow like degree^steps — callers
    * bound `steps` (3–5 is the centrality-flavored range; Long overflow
    * is on them beyond that). */
  def walkCounts(edges: DataFrame, sources: DataFrame, steps: Int,
      undirected: Boolean = true,
      checkpointDir: Option[String] = None): DataFrame = {
    require(steps >= 0, "steps must be non-negative")
    val trunc = new graft.ops.IterTrunc(edges.sparkSession, checkpointDir, "walk")
    val chan = trunc.channel()

    val e0 = edges.toDF("u", "v").filter(col("u") =!= col("v"))
    val adj = trunc.pin(
      (if (undirected) e0.union(e0.select(col("v"), col("u"))) else e0)
        .distinct())

    var counts = chan(sources.toDF("node").distinct()
      .withColumn("n_walks", lit(1L)))
    var k = 0
    while (k < steps) {
      counts = chan(adj.join(counts, adj("u") === counts("node"))
        .groupBy(adj("v").as("node"))
        .agg(sum(col("n_walks")).as("n_walks")))
      k += 1
    }
    counts
  }
}
