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
}
