package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-handling operators — the 100 TB patterns AQE doesn't always
  * reach (AQE splits skewed SHUFFLE partitions, but a single pathological
  * key still lands on one reducer for hash aggregation, and broadcast-free
  * joins against a hot key still funnel through one task).
  *
  *  - [[saltedAgg]]: two-stage aggregation — stage 1 groups on (key, salt)
  *    so a hot key spreads across `buckets` reducers, stage 2 combines the
  *    ≤`buckets` partials per key. Identical result to the direct groupBy
  *    for algebraic aggregates (count/sum/min/max).
  *  - [[saltedJoin]]: replicate the small side once per salt value and join
  *    on (key, salt) — a hot probe key fans across `buckets` tasks instead
  *    of one. Row-identical to the plain inner join.
  *
  * The salt is `monotonically_increasing_id % buckets` — deterministic for
  * a fixed partition layout, and the RESULT is salt-invariant either way
  * (associative combine / join multiplicity unchanged), which is what the
  * oracle checks pin down.
  */
object Skew {

  private def saltCol(buckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** Two-stage salted sum/count aggregation.
    * Output columns: keyCols, `n` (count), `sum_<c>` per sum column. */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(buckets))
    val partialAggs = count(lit(1)).as("__n") +:
      sumCols.map(c => sum(col(c)).as(s"__s_$c"))
    val partial = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sum(col("__n")).as("n") +:
      sumCols.map(c => sum(col(s"__s_$c")).as(s"sum_$c"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted inner equi-join: `small` is replicated `buckets`× (explode of a
    * salt range — small side only), `big` carries one salt per row. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
      buckets: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("__salt", saltCol(buckets))
    val smallSalted = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    bigSalted.join(smallSalted, keyCols :+ "__salt").drop("__salt")
  }
}
