package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup clustering: turn near-duplicate candidate PAIRS (MinHash-LSH
  * output, [[TextDedup.minhashCandidates]]) into duplicate GROUPS via
  * connected components — the last step of the corpus-dedup story: a real
  * pipeline keeps one representative per component, not per pair.
  *
  * Algorithm: min-label propagation. Every node starts labeled with itself;
  * each round a node takes the min of its own label and its neighbors'
  * labels; fixpoint = components labeled by their min member. Rounds are
  * plain shuffles on node id (edges ⋈ labels, groupBy min), so each
  * iteration is one co-partitioned join at any scale; iteration count is
  * bounded by the component diameter — near-dup clusters are dense and
  * shallow, so a handful of rounds converges (`maxIters` caps pathological
  * chains; the loop exits early on fixpoint, detected with the same action
  * that materializes the round).
  *
  * Lineage is truncated per round (`localCheckpoint`) so the plan doesn't
  * grow with iterations — swap for `checkpoint` with a cluster-visible dir
  * in a multi-executor deployment.
  */
object Clustering {

  /** Connected components of an undirected graph.
    *
    * @param edges two-column DataFrame of undirected edges (any names)
    * @param nodes one-column DataFrame of ALL node ids (isolated nodes keep
    *              themselves as singleton components)
    * @return (node, component) — component = min node id of the component
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val e = edges.toDF("s", "d")
    // symmetrize once; propagation then only needs one join direction
    val sym = e.union(e.select(col("d"), col("s"))).distinct()
      .localCheckpoint(true)

    var labels = nodes.toDF("node").distinct()
      .withColumn("component", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val fromNbrs = sym.join(labels, sym("d") === labels("node"))
        .groupBy(sym("s").as("nbr_node"))
        .agg(min(col("component")).as("nbr_min"))
      val stepped = labels
        .join(fromNbrs, labels("node") === fromNbrs("nbr_node"), "left")
        .select(col("node"), col("component"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("next"))
        .localCheckpoint(true)
      // pointer jumping (path halving): also follow the candidate label one
      // hop through the label table itself — labels only decrease, so this
      // squares the propagation distance per round and a long chain
      // converges in O(log diameter) rounds, not O(diameter)
      val hop = stepped.select(col("node").as("jn"), col("next").as("jnext"))
      val jumped = stepped
        .join(hop, stepped("next") === hop("jn"), "left")
        .select(stepped("node"), stepped("component"),
          least(stepped("next"), coalesce(col("jnext"), stepped("next")))
            .as("next"))
        .localCheckpoint(true)
      changed = jumped.filter(col("next") =!= col("component")).count()
      labels = jumped.select(col("node"), col("next").as("component"))
      i += 1
    }
    if (changed > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents exited UNCONVERGED after $maxIters rounds " +
          s"($changed labels still moving) — results are partial; raise maxIters")
    labels
  }
}
