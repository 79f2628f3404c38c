package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average over a keyed daily series — the
  * trend baseline next to [[RollingAnomaly]]'s z-score gate, and like it a
  * batch module that streaming reuses verbatim on a watermarked windowed
  * aggregate (ST4 contract; q:ts6 batch, q:st16 stream).
  *
  * adjust=true form over the trailing `window` rows:
  * ewma_t = Σ_j (1-α)^j·x_{t-j} / Σ_j (1-α)^j, with α FIXED at 1/2: every
  * weight is a power of two (pow(0.5,k) == 2^-k exactly, verified in both
  * engines), weight·count products are exponent shifts of exact doubles,
  * and the window list is folded sequentially left-to-right — so results
  * are bit-identical cross-engine with no DECIMAL rounding
  * ([[RollingAnomaly]]'s exact-integer-sums trick extended to exponential
  * weights; the denominator's closed form 2 − 2^-(n-1) is exact too).
  *
  * Scale shape: one (key, day) shuffle upstream (the caller's daily agg);
  * the window holds ≤ `window` doubles per row.
  */
object Ewma {

  /** The one smoothing-window constant both engines derive from: ts6/st16
    * pass it explicitly and interpolate `DefaultWindow - 1` into the
    * oracle's ROWS frame, so engine and oracle can never desynchronize by
    * editing one side's literal. */
  val DefaultWindow: Int = 14

  def smooth(daily: DataFrame, keyCol: String = "event_type",
      dayCol: String = "day_us", nCol: String = "n",
      window: Int = DefaultWindow): DataFrame = {
    require(window >= 1 && window <= 64,
      s"window must be in [1, 64] (2^-w underflows far beyond), got $window")
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(-(window - 1), Window.currentRow)
    daily
      .withColumn("__xs", collect_list(col(nCol).cast("double")).over(w))
      .withColumn("ewma", expr(
        "aggregate(transform(__xs, (x, i) -> x * pow(0.5D, size(__xs) - 1 - i)), " +
          "0D, (a, b) -> a + b) / (2.0D - pow(0.5D, size(__xs) - 1))"))
      .drop("__xs")
  }
}
