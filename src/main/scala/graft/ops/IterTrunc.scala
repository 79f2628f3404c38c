package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round lineage truncation for iterative DataFrame algorithms
  * (connected components, BFS, any fixpoint loop): without it the plan
  * grows by one join per round and the optimizer re-analyzes the whole
  * history every iteration.
  *
  * Two modes, chosen by `checkpointDir`:
  *
  *  - `None` → `localCheckpoint(eager)`: executor-block-backed. Fine
  *    single-node and in tests; lossy under executor failure.
  *  - `Some(dir)` → a parquet round-trip under a per-call UNIQUE
  *    subdirectory `<tag>-run-<uuid>/` of `dir` (cluster-visible, e.g.
  *    HDFS/S3). This is deliberately NOT a reliable RDD checkpoint: Spark
  *    never deletes reliable checkpoint files by default
  *    (`spark.cleaner.referenceTracking.cleanCheckpoints` is off), so a
  *    long run would accumulate one copy of the state table per round.
  *    Here each [[channel]] file is deleted as soon as its successor in
  *    the SAME channel is materialized; only [[pin]]ned files (read by
  *    every round, e.g. the edge set) and each channel's FINAL file (which
  *    lazily backs returned DataFrames) survive. The caller owns `dir`'s
  *    lifecycle and must materialize results before cleaning it up. The
  *    per-call unique subdir means two calls sharing `dir` (sequential or
  *    concurrent) cannot overwrite or delete each other's files.
  */
private[graft] final class IterTrunc(spark: SparkSession,
    checkpointDir: Option[String], tag: String) {

  private val state = checkpointDir.map { dir =>
    val base = new org.apache.hadoop.fs.Path(dir,
      s"$tag-run-" + java.util.UUID.randomUUID().toString)
    (base, base.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }
  private var seq = 0

  // synchronized: independent fixpoints of one algorithm (Scc's forward
  // and backward sweeps) may materialize their channels from concurrent
  // driver threads (guide §2.6 job overlap) — an unsynchronized counter
  // could hand two threads the same checkpoint path
  private def nextSeq(): Int = synchronized { val s = seq; seq += 1; s }

  private def roundTrip(df: DataFrame,
      base: org.apache.hadoop.fs.Path): (DataFrame, org.apache.hadoop.fs.Path) = {
    // Locale.ROOT: keep checkpoint names ASCII under any default locale
    val p = new org.apache.hadoop.fs.Path(base,
      String.format(java.util.Locale.ROOT, "%s-%05d", tag, Int.box(nextSeq())))
    df.write.mode("overwrite").parquet(p.toString)
    (spark.read.parquet(p.toString), p)
  }

  /** Truncate a table that must survive the whole run (e.g. the adjacency
    * read by every round) — never deleted by this object. */
  def pin(df: DataFrame): DataFrame = state match {
    case Some((base, _)) => roundTrip(df, base)._1
    case None => df.localCheckpoint(true)
  }

  /** An independent eager-delete chain for one evolving state table: each
    * truncation deletes the PREVIOUS file of this channel (it fed the new
    * materialization and is now unreachable). Algorithms with several live
    * state tables (BFS: visited + frontier) take one channel per table so
    * a channel's delete can never pull a file another table still reads. */
  def channel(): DataFrame => DataFrame = state match {
    case Some((base, fs)) =>
      var prev: Option[org.apache.hadoop.fs.Path] = None
      df => {
        val (out, p) = roundTrip(df, base)
        prev.foreach(fs.delete(_, true))
        prev = Some(p)
        out
      }
    case None => df => {
      val ck = df.localCheckpoint(true)
      // localCheckpoint truncates the plan but PRESERVES the source plan's
      // estimated statistics on the resulting LogicalRDD. A channel feeds
      // its own output back into the next round's joins, so those
      // estimates COMPOUND geometrically round over round (measured in
      // Scc: sizeInBytes growing from 52 bits to ~7 million bits in ~15
      // materializations) — the optimizer then spends its time multiplying
      // megabit BigIntegers and ultimately dies with "BigInteger would
      // overflow supported range". Re-wrapping the checkpointed RDD in a
      // fresh DataFrame resets stats to the constant default (AQE still
      // re-plans joins from ACTUAL runtime sizes, so broadcast decisions
      // are unaffected); the Row re-encode this costs is per-scan over
      // bounded iteration state, noise next to the joins themselves. The
      // parquet mode needs no such reset: its stats come from file sizes.
      ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    }
  }
}

private[graft] object IterTrunc {
  /** Materialize `df` through `chan` with aggregate metrics riding the SAME
    * job as observed metrics — replaces the separate `count()` /
    * checksum action every iterative loop used to pay per round on top of
    * its channel materialization (guide §1: one action per round). Returns
    * the truncated frame plus the metric row (`Observation` semantics:
    * global aggregates over exactly the materialized rows). */
  def observed(chan: DataFrame => DataFrame, df: DataFrame,
      metrics: Seq[org.apache.spark.sql.Column]): (DataFrame, Map[String, Any]) = {
    val obs = org.apache.spark.sql.Observation()
    val out = chan(df.observe(obs, metrics.head, metrics.tail: _*))
    (out, obs.get)
  }

  /** [[observed]] with the one metric every loop needs: the row count. */
  def counted(chan: DataFrame => DataFrame, df: DataFrame): (DataFrame, Long) = {
    val (out, m) = observed(chan, df,
      Seq(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1L)).as("__n")))
    (out, m("__n").asInstanceOf[Long])
  }
}
