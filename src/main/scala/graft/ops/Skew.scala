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

  /** Hot-key synthetic shared by the BenchScale gate and PlanSpec's
    * balance test (one skew model, measured two ways): `n` rows, 50% on
    * key 0, rest uniform over 1000 keys. Deterministic (id-derived), no
    * RNG. */
  def hotKeyDf(spark: org.apache.spark.sql.SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(pmod(hash(col("id")), lit(1000)) + 1).as("k"),
      (col("id") % 97).cast("double").as("v"))

  /** Deterministic shuffle balance: rows per reduce partition under the
    * given partitioning expressions — max/mean is the single-task pileup
    * factor, measured without wall-clock noise. */
  def maxOverMean(df: DataFrame, parts: Int, exprs: Seq[Column]): Double = {
    val counts = df.withColumn("__p", pmod(hash(exprs: _*), lit(parts)))
      .groupBy("__p").count().collect().map(_.getLong(1))
    counts.max.toDouble / (counts.sum.toDouble / parts)
  }

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

  /** Two-stage latest-per-key — the hot-key-safe form of the upsert
    * sink's per-batch reduction (st30's `row_number` window sorts a key's
    * WHOLE row set on one task; a key carrying 50% of a batch makes that
    * the straggler). `max_by` is associative, so stage 1 reduces (key,
    * salt) partials and stage 2 combines the ≤`buckets` partials per key —
    * identical result whenever `ordCol` is unique per key (ties pick an
    * arbitrary row in BOTH strategies, so callers wanting determinism make
    * the order column unique, exactly as the merge order-guards already
    * require). Returns one row per key: keyCols ++ payloadCols ++ ordCol,
    * taken from the row with the greatest `ordCol`. */
  def saltedLatestBy(df: DataFrame, keyCols: Seq[String], ordCol: String,
      payloadCols: Seq[String], buckets: Int = 16): DataFrame = {
    val payload = struct((payloadCols :+ ordCol).map(col): _*)
    val partial = df.withColumn("__salt", saltCol(buckets))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(max_by(payload, col(ordCol)).as("__m"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(max_by(col("__m"), col(s"__m.$ordCol")).as("__m"))
      .select(keyCols.map(col) ++
        (payloadCols :+ ordCol).map(c => col(s"__m.$c").as(c)): _*)
  }
}
