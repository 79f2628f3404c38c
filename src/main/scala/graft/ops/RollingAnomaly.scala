package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rolling z-score anomaly gate over a keyed daily series — the
  * volume-spike monitor of an ingest pipeline (and the batch half of the
  * streaming variant, reused verbatim per the reference's batch/stream
  * module-sharing contract, `BatchEnrichmentContext` vs
  * `StreamingEnrichmentContext` in aleph2_data_model).
  *
  * mean/std come from EXACT integer window sums (cnt, Σn, Σn²) rather than
  * a stddev built-in: an engine's stddev accumulation order is its own, but
  * this expression tree is plain IEEE arithmetic over exact integers, so
  * any engine computing the same formula gets bit-identical doubles — the
  * cross-engine oracle hash-matches without rounding.
  *
  * Scale: the input is already an aggregate (|keys|×|days| rows); the
  * window's exchange moves only those rows, nothing at raw-event scale.
  */
object RollingAnomaly {

  /** @param daily  (key, day, n) aggregate rows
    * @param window trailing window size in ROWS (observed days), current
    *               inclusive. A key that emits no row on a zero-event day
    *               has its window span the last N *observed* days, not the
    *               last N calendar days — baselines can reach across a gap.
    *               Densify with `TimeSeries.gapFill` first (ts1) if strict
    *               calendar windows are wanted. */
  def zScores(daily: DataFrame, keyCol: String = "event_type",
      dayCol: String = "day_us", nCol: String = "n",
      window: Int = 7, threshold: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(-(window - 1), Window.currentRow)
    daily
      .withColumn("cnt", count(col(nCol)).over(w))
      .withColumn("s1", sum(col(nCol)).over(w))
      // Σn² in DECIMAL, not LongType: a long sum silently wraps once a key
      // exceeds ~3e9 events/day (possible at 100 TB), while the oracle
      // engine promotes BIGINT sums to 128-bit — the decimal sum stays
      // exact on both sides, and the value cast below is unchanged.
      // Measured cost of the exactness: the decimal window sum is
      // interpreted BigDecimal math where the long sum was codegen'd
      // primitives — ts3's clean-bench time doubled (0.16s → 0.34s at
      // sf0.1) when this landed. Accepted: the input is a daily aggregate
      // (|keys|×|days| rows), so the constant factor rides on tiny data;
      // the overflow class it removes is not recoverable after the fact.
      .withColumn("s2", sum(col(nCol).cast(DecimalType(18, 0))
        * col(nCol).cast(DecimalType(18, 0))).over(w))
      .withColumn("mu", col("s1").cast("double") / col("cnt"))
      .withColumn("varr",
        col("s2").cast("double") / col("cnt") - col("mu") * col("mu"))
      .withColumn("z", when(col("varr") > 0.0,
        (col(nCol) - col("mu")) / sqrt(col("varr"))).otherwise(lit(0.0)))
      .select(col(keyCol), col(dayCol), col(nCol), col("z"),
        (abs(col("z")) > threshold).as("is_anomaly"))
  }
}
