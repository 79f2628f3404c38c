package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping — the
  * layout lever behind Delta/Iceberg `OPTIMIZE ZORDER BY`: a single sort
  * column can only shrink ONE column's per-file min/max range; interleaving
  * the bits of N rank-scaled columns gives every output file a small
  * bounding BOX over all of them, so parquet row-group/file stats prune
  * scans filtered on any subset. The reference's ES backend got the same
  * effect from per-field inverted indexes; on immutable parquet the layout
  * IS the index.
  *
  * Scale shape: one min/max agg (2·N scalars to the driver — control
  * plane), one codegen'd bit-interleave projection, one range repartition +
  * local sort. No window functions, no global sort, no skew pile-up (range
  * boundaries come from Spark's range-partition sampler over the z value).
  * The rank-scaled variant ([[clusteredByRank]]) adds one approxQuantile
  * pass (bounded driver state: `buckets-1` doubles per column) and is the
  * right choice for power-law domains, where linear scaling would collapse
  * most rows into one hot z-range.
  */
object ZOrder {

  /** Bits of z-resolution per column: 16 when it fits, fewer for wide
    * interleaves so the code stays below the long's sign bit (N·bits ≤ 62 —
    * a signed-negative z would range-partition before the positives and
    * break the curve's ordering). */
  private[store] def bitsPerColumn(n: Int): Int = math.min(16, 62 / n)

  /** Interleave pre-scaled non-negative columns (each in [0, 2^bits)):
    * bit i of column k lands at position i·N + k. Pure bitwise Column
    * expressions — whole-stage codegen keeps this a single projection. */
  private[store] def interleave(scaled: Seq[Column], bits: Int): Column = {
    val n = scaled.size
    scaled.zipWithIndex.foldLeft(lit(0L)) { case (z, (s, k)) =>
      (0 until bits).foldLeft(z) { (acc, i) =>
        acc.bitwiseOR(shiftleft(s.bitwiseAND(lit(1L << i)), i * (n - 1) + k))
      }
    }
  }

  /** N-column Morton code: each column linearly scaled to
    * [[bitsPerColumn]] bits over its [lo, hi], bits interleaved. Linear
    * scaling assumes roughly uniform domains (ids, dates); heavily skewed
    * domains want [[clusteredByRank]]'s quantile scaling instead. */
  def zValue(cols: Seq[(Column, Long, Long)]): Column = {
    require(cols.size >= 2, "z-ordering needs at least two columns")
    val bits = bitsPerColumn(cols.size)
    val mask = (1L << bits) - 1L
    val scaled = cols.map { case (c, lo, hi) =>
      val span = math.max(hi - lo, 1L)
      // exact integer arithmetic: (c - lo) * mask must not wrap a long —
      // an epoch-micros column spanning years would (span ~1.6e14 × 65535
      // > 2^63) and silently interleave garbage; rescale such domains
      // (e.g. micros -> seconds/days) before z-ordering
      require(span <= Long.MaxValue / mask,
        s"column span $span too wide for exact $bits-bit scaling; " +
          "rescale the domain (e.g. micros -> seconds) first")
      // integral `div`, not `/`: Spark's `/` on longs is a double Divide,
      // inexact once the numerator passes 2^53 — boundary rows would land
      // one z-tile off. (c - lo) >= 0, so truncating div == floor div.
      call_function("div",
        (c.cast("long") - lit(lo)) * lit(mask), lit(span)).cast("long")
    }
    interleave(scaled, bits)
  }

  /** Two-column [[zValue]] (compat signature): a on even bit positions, b
    * on odd. */
  def zValue(a: Column, b: Column, aMin: Long, aMax: Long,
      bMin: Long, bMax: Long): Column =
    zValue(Seq((a, aMin, aMax), (b, bMin, bMax)))

  /** Re-cluster `df` on the z-curve over N integral columns: range
    * repartition into `numFiles` z-ranges + local sort, so a subsequent
    * one-file-per-partition write yields tight per-file bounding boxes on
    * EVERY listed column. The helper column is dropped before returning. */
  def clustered(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    require(!df.columns.contains("__z"),
      "input columns must not be named __z (reserved by ZOrder)")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    require(!bounds.anyNull, "z-order columns must be non-null")
    val z = zValue(cols.zipWithIndex.map { case (c, i) =>
      (col(c), bounds.getLong(2 * i), bounds.getLong(2 * i + 1))
    })
    writeLayout(df, z, numFiles)
  }

  /** Two-column [[clustered]] (compat signature). */
  def clustered(df: DataFrame, colA: String, colB: String,
      numFiles: Int): DataFrame = clustered(df, Seq(colA, colB), numFiles)

  /** Rank-scaled z-clustering for SKEWED domains: each column is mapped to
    * its quantile bucket (equi-DEPTH, not equi-width) before interleaving,
    * so a power-law column (a few hot ids owning most rows) still spreads
    * evenly across z-tiles instead of collapsing into one hot range —
    * per-file bounding boxes stay tight in RANK space, which is what
    * matters for skipping: parquet min/max pruning works on values, and
    * equi-depth buckets give every file few distinct values per column.
    *
    * One `approxQuantile` pass computes `buckets-1` interior boundaries per
    * column (driver state: N·(buckets-1) doubles — control plane). The
    * bucket index is a codegen'd `aggregate` fold over the boundary array
    * (≤255 comparisons/row in the default config), not a UDF. */
  def clusteredByRank(df: DataFrame, cols: Seq[String], numFiles: Int,
      buckets: Int = 256, relativeError: Double = 0.001): DataFrame = {
    require(cols.size >= 2, "z-ordering needs at least two columns")
    require(!df.columns.contains("__z"),
      "input columns must not be named __z (reserved by ZOrder)")
    // buckets < 2 would make every quantile-probe list empty (rank 0 for
    // all rows — a silent clustering no-op), and buckets = 0 drives the
    // bit count negative through log(0); reject before computing either
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val bits = {
      val b = (math.log(buckets) / math.log(2)).ceil.toInt
      math.min(b, bitsPerColumn(cols.size))
    }
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val scaled = cols.map { c =>
      val bounds = df.stat.approxQuantile(c, probs, relativeError)
      // duplicate boundaries (heavy hitters spanning quantiles) are fine:
      // the rank fold counts every boundary <= value, staying monotone
      val bArr = array(bounds.map(lit(_)): _*)
      val rank = aggregate(bArr, lit(0L),
        (acc, x) => acc + when(col(c).cast("double") >= x, 1L).otherwise(0L))
      // clamp into the interleave's bit budget when buckets > 2^bits
      least(rank, lit((1L << bits) - 1L))
    }
    writeLayout(df, interleave(scaled, bits), numFiles)
  }

  private def writeLayout(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
