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
  * Lineage is truncated per round so the plan doesn't grow with iterations.
  * `checkpointDir = None` → `localCheckpoint` (executor-block-backed: fine
  * single-node / tests, lossy under executor failure); pass a
  * cluster-visible directory (HDFS/S3) in a multi-executor deployment.
  * The directory mode is a parquet round-trip, not an RDD checkpoint: each
  * round's label table is written under a per-call unique subdirectory of
  * `dir` and the superseded file is deleted eagerly, so only the
  * symmetrized-edge file and the FINAL label file survive the run. The
  * returned DataFrame is lazily backed by that final file — it is only
  * valid while `dir` exists; materialize (collect/write) before cleaning
  * `dir` up. The caller owns `dir`'s lifecycle.
  */
object Clustering {

  /** Connected components of an undirected graph.
    *
    * @param edges two-column DataFrame of undirected edges (any names)
    * @param nodes one-column DataFrame of ALL node ids (isolated nodes keep
    *              themselves as singleton components)
    * @param checkpointDir cluster-visible directory for fault-tolerant
    *              per-round lineage truncation via an eagerly-cleaned parquet
    *              round-trip (see object doc); None = localCheckpoint
    * @param strict if true, exhaust `maxIters` without convergence → throw
    *              instead of WARN-and-return-partial. Partial labels silently
    *              fed to a dedup-keep job would drop documents; a production
    *              pipeline should fail loudly.
    * @return (node, component) — component = min node id of the component
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
      maxIters: Int = 20, checkpointDir: Option[String] = None,
      strict: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    // per-round lineage truncation (local or cluster-visible parquet
    // round-trip with eager step cleanup) — shared with the other
    // iterative ops; see [[graft.ops.IterTrunc]] for the full contract
    val trunc = new graft.ops.IterTrunc(spark, checkpointDir, "cc")
    val truncEdges: DataFrame => DataFrame = trunc.pin
    val truncLabels: DataFrame => DataFrame = trunc.channel()
    val e = edges.toDF("s", "d")
    // symmetrize once; propagation then only needs one join direction.
    // (Measured, not taken: pre-partitioning sym by the join key d via
    // repartition+localCheckpoint — hoping each round's edges⋈labels join
    // would reuse the layout — was a net LOSS here (dd17 8.7→9.6s warm):
    // the setup shuffle is paid up front while AQE loses the freedom to
    // coalesce the per-round label exchanges against a pinned 32-way
    // layout. On a cluster where the edge table dominates, bucketing the
    // edges by d is the durable form of the same idea.)
    val sym = truncEdges(e.union(e.select(col("d"), col("s"))).distinct())

    var labels = truncLabels(nodes.toDF("node").distinct()
      .withColumn("component", col("node")))

    // One min-label propagation round as a PURE transformation: takes a
    // frame with (node, component), emits (node, prev, component) where
    // `prev` is the round's input label — the per-round movement signal
    // fused blocks observe. NOT truncated per round: the pointer jump's
    // self-join references each subtree twice and exchange reuse computes
    // the shared exchanges once; label values are integer mins, so the
    // result is plan-shape-independent.
    def round(lbl0: DataFrame): DataFrame = {
      val lbl = lbl0.select(col("node"), col("component"))
      val fromNbrs = sym.join(lbl, sym("d") === lbl("node"))
        .groupBy(sym("s").as("nbr_node"))
        .agg(min(col("component")).as("nbr_min"))
      val stepped = lbl
        .join(fromNbrs, lbl("node") === fromNbrs("nbr_node"), "left")
        .select(col("node"), col("component").as("prev"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("next"))
      // pointer jumping (path halving): also follow the candidate label one
      // hop through the label table itself — labels only decrease, so this
      // squares the propagation distance per round and a long chain
      // converges in O(log diameter) rounds, not O(diameter)
      val hop = stepped.select(col("node").as("jn"), col("next").as("jnext"))
      stepped.join(hop, stepped("next") === hop("jn"), "left")
        .select(stepped("node"), col("prev"),
          least(stepped("next"), coalesce(col("jnext"), stepped("next")))
            .as("component"))
    }

    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      // Fused blocks (r16, guide §1 fewer actions): after a first 1-round
      // probe block, TWO rounds run per materialization/truncation.
      // Labels form a min-semilattice, so fusing rounds lazily changes
      // nothing about the fixpoint; convergence is observed on the LAST
      // round's movement (component != prev — exactly the signal the
      // 1-round loop observed), so a shallow graph still stops at the
      // same round it always did while a deep chain pays half the
      // actions/checkpoints. The 1-round first block keeps the common
      // already-converged / 1-round cases at their old cost.
      val roundsThisBlock = if (i == 0) 1 else math.min(2, maxIters - i)
      var blk = labels
      for (_ <- 1 to roundsThisBlock) blk = round(blk)
      // convergence rides the SAME job as the block's materialization: an
      // observed metric instead of a separate count() action
      val obs = org.apache.spark.sql.Observation()
      val out = truncLabels(blk
        .observe(obs, sum(when(col("component") =!= col("prev"), 1L)
          .otherwise(0L)).as("moved"))
        .select(col("node"), col("component")))
      changed = obs.get.get("moved").flatMap(Option(_))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      labels = out
      i += roundsThisBlock
    }
    if (changed > 0) {
      val msg = s"connectedComponents exited UNCONVERGED after $maxIters rounds " +
        s"($changed labels still moving) — results are partial; raise maxIters"
      if (strict) throw new IllegalStateException(msg)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    labels
  }
}
