package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters — every item with frequency strictly greater than
  * n/m — WITHOUT aggregating the full item domain. A plain
  * `groupBy(item).count.filter` shuffles one row per DISTINCT item (at
  * 100 TB of text, the full n-gram vocabulary); this shuffles only the
  * provable candidates.
  *
  *   1. Per-partition Misra–Gries with m counters (narrow `mapPartitions`,
  *      O(m) memory per task): a summary that retains every item whose
  *      LOCAL count exceeds localN/m.
  *   2. Union of summary keys = candidate set, ≤ m · numPartitions entries,
  *      broadcast. Provably a superset of the true heavy hitters: if
  *      Σfᵢ(x) > Σnᵢ/m then fᵢ(x) > nᵢ/m in at least one partition i
  *      (otherwise summing the per-partition bounds contradicts the
  *      premise), so x survives that partition's summary.
  *   3. Exact verify: count ONLY candidate items (broadcast semi-join
  *      before the shuffle) and filter by the global threshold — false
  *      candidates drop out, so the result is exact, not approximate.
  */
object HeavyHitters {

  /** Misra–Gries: maintain at most `k` counters; a miss with a full table
    * decrements every counter (evicting zeros). Surviving keys include all
    * items with count > n/k of the items seen by THIS iterator. */
  private[ops] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counts = mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      counts.get(x) match {
        case Some(c) => counts(x) = c + 1
        case None if counts.size < k => counts(x) = 1L
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.foreach { case (key, c) => if (c == 0L) dead += key }
          dead.foreach(counts.remove)
      }
    }
    counts.keysIterator
  }

  /** @param items   input rows (one item occurrence per row)
    * @param itemCol string item column
    * @param m       threshold denominator: return items with
    *                freq · m > total row count (at most m-1 results)
    * @return (itemCol, freq) — exact frequencies of the true heavy
    *         hitters only */
  def exact(items: DataFrame, itemCol: String, m: Int): DataFrame = {
    require(m >= 2, s"m must be >= 2: $m")
    import org.apache.spark.sql.types._
    val itemType = items.schema(itemCol).dataType
    // the summary pass works on strings; the candidate set must rejoin in
    // the item's NATIVE type — a string=bigint join coerces through double
    // and collapses ids past 2^53, silently dropping true hitters. Only
    // admit types whose string rendering round-trips exactly
    require(Seq(StringType, LongType, IntegerType, ShortType, ByteType)
      .contains(itemType), s"itemCol type must round-trip via string: $itemType")
    val spark = items.sparkSession
    import spark.implicits._
    val cands = items.select(col(itemCol).cast("string"))
      .as[String]
      .mapPartitions(it => misraGries(it, m))
      .toDF(itemCol)
      .select(col(itemCol).cast(itemType).as(itemCol)).distinct()
    val total = items.agg(count(lit(1)).as("__n"))
    items.join(broadcast(cands), itemCol)
      .groupBy(col(itemCol)).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * m > col("__n"))
      .drop("__n")
  }
}
