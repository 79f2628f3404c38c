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
    // Cluster-visible truncation is a parquet round-trip under `dir`, not a
    // reliable RDD checkpoint: Spark never deletes reliable checkpoint files
    // by default (`spark.cleaner.referenceTracking.cleanCheckpoints` is off),
    // so a long CC run would otherwise accumulate one copy of the label
    // table per materialization. Here each label file is deleted as soon as
    // the next one is materialized; only the symmetrized edge file (read by
    // every round) and the FINAL label file (which backs the returned
    // DataFrame — the caller owns `dir`'s lifecycle) survive the run. This
    // also avoids mutating the SparkContext-global checkpoint directory.
    val (truncEdges, truncLabels): (DataFrame => DataFrame, DataFrame => DataFrame) =
      checkpointDir match {
        case Some(dir) =>
          // per-call unique subdir: two calls sharing `dir` (sequential or
          // concurrent) must not overwrite each other's cc-* files — a fixed
          // naming scheme would restart at cc-00000 and delete the label file
          // backing the first call's still-live returned DataFrame
          val base = new org.apache.hadoop.fs.Path(dir,
            "cc-run-" + java.util.UUID.randomUUID().toString)
          val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
          var seq = 0
          var prevLabel: Option[org.apache.hadoop.fs.Path] = None
          def roundTrip(df: DataFrame): (DataFrame, org.apache.hadoop.fs.Path) = {
            val p = new org.apache.hadoop.fs.Path(base, f"cc-$seq%05d")
            seq += 1
            df.write.mode("overwrite").parquet(p.toString)
            (spark.read.parquet(p.toString), p)
          }
          (df => roundTrip(df)._1,
            df => {
              val (out, p) = roundTrip(df)
              // the previous label file fed this materialization and is now
              // unreachable — delete it eagerly
              prevLabel.foreach(fs.delete(_, true))
              prevLabel = Some(p)
              out
            })
        case None =>
          (df => df.localCheckpoint(true), df => df.localCheckpoint(true))
      }
    val e = edges.toDF("s", "d")
    // symmetrize once; propagation then only needs one join direction
    val sym = truncEdges(e.union(e.select(col("d"), col("s"))).distinct())

    var labels = truncLabels(nodes.toDF("node").distinct()
      .withColumn("component", col("node")))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val fromNbrs = sym.join(labels, sym("d") === labels("node"))
        .groupBy(sym("s").as("nbr_node"))
        .agg(min(col("component")).as("nbr_min"))
      val stepped = truncLabels(labels
        .join(fromNbrs, labels("node") === fromNbrs("nbr_node"), "left")
        .select(col("node"), col("component"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("next")))
      // pointer jumping (path halving): also follow the candidate label one
      // hop through the label table itself — labels only decrease, so this
      // squares the propagation distance per round and a long chain
      // converges in O(log diameter) rounds, not O(diameter)
      val hop = stepped.select(col("node").as("jn"), col("next").as("jnext"))
      val jumped = truncLabels(stepped
        .join(hop, stepped("next") === hop("jn"), "left")
        .select(stepped("node"), stepped("component"),
          least(stepped("next"), coalesce(col("jnext"), stepped("next")))
            .as("next")))
      changed = jumped.filter(col("next") =!= col("component")).count()
      labels = jumped.select(col("node"), col("next").as("component"))
      i += 1
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
