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

  test("approx8: hk is the exact 64th-smallest hash and est is stable " +
    "under repartitioning (merge = heap union-truncate)") {
    import graft.dedup.TextDedup.md5Int
    val q = SparkEntry.queries("approx8_kmv")(spark, TestSession.sf)
    val rows = q.collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[java.lang.Long]("hk"), r.getDouble(3))))
      .toMap
    // independent hk: full sort of the DISTINCT hash set per type (classic
    // KMV — the same set st23's streaming state keeps)
    val sorted = Tables.t(spark, TestSession.sf, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .select(col("event_type"), md5Int(col("user_id").cast("string")).as("h"))
      .distinct()
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("h")))
      .filter(col("rn") === 64)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("h")).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (k, (exact, hk, est)) =>
      if (exact >= 64) {
        assert(hk != null && sorted.get(k).contains(hk.longValue),
          s"$k: hk $hk != independent 64th-smallest ${sorted.get(k)}")
        assert(est === 270582939648.0 / hk.doubleValue)
        // KMV standard error is ~1/sqrt(k-1) = 12.6%; 4 sigma as a red line
        assert(math.abs(est - exact) / exact < 0.504,
          s"$k: KMV estimate $est vs exact $exact left the 4-sigma band")
      } else {
        // not-full heap: hk NULL, estimate degrades to the exact count
        assert(hk == null && est === exact.toDouble,
          s"$k: not-full heap must fall back to exact ($hk, $est, $exact)")
      }
    }
    // partition-invariance: the 32-way shuffle in the query vs a skewed
    // 3-partition layout must emit identical rows (heap merge is a set op)
    val du = Tables.t(spark, TestSession.sf, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .select(col("event_type"), md5Int(col("user_id").cast("string")).as("h"))
      .distinct()
      .repartition(3, col("h"))
    val re = du.groupBy("event_type")
      .agg(graft.functions.GraftFunctions.top_k(-col("h"), 64).as("negk"))
      .withColumn("hk", -try_element_at(col("negk"), lit(64)))
      .collect().map(r => r.getString(0) -> r.getAs[java.lang.Long]("hk")).toMap
    rows.foreach { case (k, (_, hk, _)) =>
      assert(re(k) === hk, s"$k: hk drifted under repartitioning")
    }
  }

  test("st23: final streaming KMV state equals the approx8 batch sketch") {
    def skMap(name: String) =
      SparkEntry.queries(name)(spark, TestSession.sf)
        .select("event_type", "hk", "est").collect()
        .map(r => r.getString(0) ->
          ((r.getAs[java.lang.Long]("hk"), r.getDouble(2)))).toMap
    val batch = skMap("approx8_kmv")
    val stream = skMap("st23_stream_kmv")
    assert(batch.keySet === stream.keySet)
    batch.foreach { case (k, (hk, est)) =>
      val (shk, sest) = stream(k)
      assert(shk === hk && sest === est,
        s"$k: stream state ($shk, $sest) != batch sketch ($hk, $est)")
    }
  }
}
