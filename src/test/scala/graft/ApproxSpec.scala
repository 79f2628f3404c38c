package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** approx_count_distinct (HLL++) has no cross-engine oracle — bound its
  * error against the exact count instead (default rsd = 0.05; assert a
  * generous 4x that to keep the test stable across sketch seeds). */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("approx distinct users per event_type is within 20% of exact") {
    val approx = SparkEntry.queries("approx1_distinct")(spark, TestSession.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.t(spark, TestSession.sf, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      assert(math.abs(a - n) / math.max(n, 1L) <= 0.20,
        s"$k: approx $a vs exact $n")
    }
  }

  test("approx p50 per event_type sits inside the exact p40..p60 band") {
    val approx = SparkEntry.queries("approx2_quantile")(spark, TestSession.sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // approx_percentile(accuracy=1000) guarantees rank error <= n/1000;
    // the p40..p60 band is ~100x looser — stable across sketch layouts
    val bands = Tables.t(spark, TestSession.sf, "events")
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.4)").as("lo"),
        expr("percentile(value, 0.6)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === bands.keySet)
    bands.foreach { case (k, (lo, hi)) =>
      val a = approx(k)
      assert(a >= lo && a <= hi, s"$k: approx p50 $a outside [$lo, $hi]")
    }
  }
}
