package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point row to every interval row with
  * `start <= point <= end` for the same key — the batch sibling of the
  * streaming interval join (st7) and of the as-of join ([[AsOfJoin]], which
  * keeps only the latest match; this keeps ALL matches).
  *
  * Spark shape (the part that survives 100 TB): Catalyst plans a bare
  * non-equi predicate as a broadcast-nested-loop or a key-only equi-join
  * with a range post-filter — the former explodes when neither side is
  * broadcastable, the latter degenerates when one key has many rows on
  * both sides (its partition does |L_k|×|R_k| work). Binning fixes both:
  * each interval is exploded to the fixed-width time bins it covers, each
  * point gets its single covering bin, and the join becomes a plain
  * shuffled EQUI-join on (key, bin) — well-distributed as long as intervals
  * span O(1) bins (pick `binWidth` ≈ the typical interval length). The
  * exact `between` filter then drops same-bin non-overlaps. Each true pair
  * is emitted exactly once: a point has ONE bin, and the interval's
  * exploded bins are distinct.
  */
object RangeJoin {

  /** Floor-division of an exact integral column by `w`, without going
    * through double arithmetic (micros-scale values would be near the
    * 2^53 mantissa edge): subtract the (always-positive) pmod, then
    * integral-divide the exact multiple. */
  private def floorDiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** @param points    side with one integral event coordinate (`pointCol`)
    * @param intervals side with integral `[startCol, endCol]` bounds
    *                  (rows with `end < start` are empty and dropped)
    * @param keys      equi-key columns present on both sides (may be empty:
    *                  a pure range join distributes on the bin alone)
    * @param binWidth  bin size in the coordinate's unit; choose ≈ the
    *                  typical interval length so intervals explode to O(1)
    *                  bins (upper-bounded by `maxBinsPerInterval`)
    * @param maxBinsPerInterval guard against a degenerate interval (e.g. an
    *                  open-ended sentinel) silently exploding to millions of
    *                  rows — fail loudly instead
    * @return all matching (point × interval) pairs with both sides'
    *         columns (keys once); non-key names must not collide */
  def binned(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointCol: String, startCol: String, endCol: String, binWidth: Long,
      maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val collisions =
      (points.columns.toSet & intervals.columns.toSet) -- keys.toSet
    require(collisions.isEmpty, s"non-key columns collide: $collisions")
    // the internal bin key would silently clobber a same-named input column
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "input columns must not be named __bin (reserved by RangeJoin)")

    val pts = points.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    val startBin = floorDiv(col(startCol), binWidth)
    val endBin = floorDiv(col(endCol), binWidth)
    val guardMsg = lit(s"RangeJoin: an interval spans more than " +
      s"$maxBinsPerInterval bins of $binWidth; widen binWidth or cap intervals")
    val guardedEnd = when(endBin - startBin < lit(maxBinsPerInterval.toLong),
      endBin).otherwise(raise_error(guardMsg).cast("long"))
    val ivs = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bin", explode(sequence(startBin, guardedEnd)))
    pts.join(ivs, keys :+ "__bin")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** Interval × interval overlap join: all pairs (l, r) with equal `keys`
    * whose integral `[start, end]` ranges intersect. Same binning strategy
    * as [[binned]], applied to BOTH sides: any two overlapping intervals
    * share the bin containing max(l.start, r.start) — the first instant of
    * their intersection — so a shuffled equi-join on (keys, bin) finds every
    * true pair, and keeping only the rows where the joined bin IS that
    * first-overlap bin emits each pair exactly once (no distinct needed).
    * The exact predicate then drops same-bin non-overlaps.
    *
    * Column names: non-key columns must not collide across sides (alias
    * before calling, as with [[binned]]). Empty intervals (end < start) are
    * dropped. */
  def overlapBinned(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftStart: String, leftEnd: String, rightStart: String, rightEnd: String,
      binWidth: Long, maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val collisions =
      (left.columns.toSet & right.columns.toSet) -- keys.toSet
    require(collisions.isEmpty, s"non-key columns collide: $collisions")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "input columns must not be named __bin (reserved by RangeJoin)")

    def explodeBins(df: DataFrame, s: String, e: String): DataFrame = {
      val startBin = floorDiv(col(s), binWidth)
      val endBin = floorDiv(col(e), binWidth)
      val guardMsg = lit(s"RangeJoin: an interval spans more than " +
        s"$maxBinsPerInterval bins of $binWidth; widen binWidth or cap intervals")
      val guardedEnd = when(endBin - startBin < lit(maxBinsPerInterval.toLong),
        endBin).otherwise(raise_error(guardMsg).cast("long"))
      df.filter(col(s) <= col(e))
        .withColumn("__bin", explode(sequence(startBin, guardedEnd)))
    }
    val l = explodeBins(left, leftStart, leftEnd)
    val r = explodeBins(right, rightStart, rightEnd)
    l.join(r, keys :+ "__bin")
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(col("__bin") ===
        floorDiv(greatest(col(leftStart), col(rightStart)), binWidth))
      .drop("__bin")
  }
}
