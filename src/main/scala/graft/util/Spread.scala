package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan parallelism (guide §2: derive partitioning from the
  * input, never from a constant tuned for one deployment).
  *
  * A query whose per-row work is heavy IN the scan stage (explode →
  * partial-aggregate pipelines: Gram matrices, shingling, signature
  * generation) is bounded by the SCAN's partition count — a corpus that fits
  * one parquet split runs the whole stage on one core regardless of cluster
  * size. At production scale the scan has thousands of splits and this is a
  * no-op by construction; below that, one cheap round-robin shuffle of the
  * (narrow, pre-explode) rows spreads the stage across the executors.
  *
  * ONLY for plans whose downstream aggregation is order-free (exact decimal
  * / integer / min-max semilattice sums): round-robin repartition reorders
  * rows, so a float/double sum downstream would change ULPs and break the
  * bit-reproducibility contract. Callers own that proof.
  */
object Spread {
  /** Repartition `df` to the session's default parallelism iff its current
    * plan yields fewer than half that many partitions. */
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions * 2 < target)
      df.repartition(target)
    else df
  }
}
