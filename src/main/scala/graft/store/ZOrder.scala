package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping — the
  * layout lever behind Delta/Iceberg `OPTIMIZE ZORDER BY`: a single sort
  * column can only shrink ONE column's per-file min/max range; interleaving
  * the bits of two rank-scaled columns gives every output file a small
  * bounding BOX over both, so parquet row-group/file stats prune scans
  * filtered on either column (or both). The reference's ES backend got the
  * same effect from per-field inverted indexes; on immutable parquet the
  * layout IS the index.
  *
  * Scale shape: one min/max agg (4 scalars to the driver — control plane),
  * one codegen'd bit-interleave projection, one range repartition + local
  * sort. No window functions, no global sort, no skew pile-up (range
  * boundaries come from Spark's range-partition sampler over the z value).
  */
object ZOrder {

  /** 32-bit Morton code: `a`/`b` linearly rank-scaled to 16 bits each over
    * [min, max], bits interleaved (a even positions, b odd). Linear scaling
    * assumes roughly uniform domains (ids, dates); heavily skewed domains
    * would want quantile boundaries instead. */
  def zValue(a: Column, b: Column, aMin: Long, aMax: Long,
      bMin: Long, bMax: Long): Column = {
    def scaled(c: Column, lo: Long, hi: Long): Column = {
      val span = math.max(hi - lo, 1L)
      // exact integer arithmetic: (c - lo) * 65535 must not wrap a long —
      // an epoch-micros column spanning years would (span ~1.6e14 × 65535
      // > 2^63) and silently interleave garbage; rescale such domains
      // (e.g. to seconds/days) before z-ordering
      require(span <= Long.MaxValue / 65535L,
        s"column span $span too wide for exact 16-bit scaling; " +
          "rescale the domain (e.g. micros -> seconds) first")
      ((c.cast("long") - lit(lo)) * lit(65535L) / lit(span)).cast("long")
    }
    val sa = scaled(a, aMin, aMax)
    val sb = scaled(b, bMin, bMax)
    (0 until 16).foldLeft(lit(0L)) { (z, i) =>
      z.bitwiseOR(shiftleft(sa.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(sb.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Re-cluster `df` on the z-curve over two integral columns: range
    * repartition into `numFiles` z-ranges + local sort, so a subsequent
    * one-file-per-partition write yields tight per-file bounding boxes on
    * BOTH columns. The helper column is dropped before returning. */
  def clustered(df: DataFrame, colA: String, colB: String,
      numFiles: Int): DataFrame = {
    require(!df.columns.contains("__z"),
      "input columns must not be named __z (reserved by ZOrder)")
    val bounds = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    require(!bounds.anyNull, "z-order columns must be non-null")
    val z = zValue(col(colA), col(colB),
      bounds.getLong(0), bounds.getLong(1),
      bounds.getLong(2), bounds.getLong(3))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
