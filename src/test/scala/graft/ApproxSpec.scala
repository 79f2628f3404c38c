package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** approx1/approx2 are VERDICT queries (round 8): the sketch value never
  * leaves the query — it emits the exact aggregate plus a within-bound int
  * the DuckDB oracle pins to literal 1. These specs assert the verdict
  * holds and that the exact column really is the exact aggregate (i.e. the
  * query can't pass by emitting a wrong "exact" next to a vacuous 1).
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("approx1: every within_bound verdict is 1 and exact_users is exact") {
    val rows = SparkEntry.queries("approx1_distinct")(spark, TestSession.sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val exact = Tables.t(spark, TestSession.sf, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val (got, ok) = rows(k)
      assert(got === n, s"$k: exact_users $got != independent exact $n")
      assert(ok === 1, s"$k: HLL sketch drifted outside the 20% bound")
    }
  }

  test("approx2: every within_bound verdict is 1 and p50_exact is exact") {
    val rows = SparkEntry.queries("approx2_quantile")(spark, TestSession.sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    val exact = Tables.t(spark, TestSession.sf, "events")
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet === exact.keySet)
    exact.foreach { case (k, p) =>
      val (got, ok) = rows(k)
      assert(got === p, s"$k: p50_exact $got != independent exact $p")
      assert(ok === 1, s"$k: approx p50 left the exact p40..p60 band")
    }
  }
}
