package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming queries (ST1-ST3) must actually run end-to-end — these drive
  * the same SparkEntry entries Verify/Bench use, over the single-file
  * parquet layout the driver ships (a regression here once hid behind
  * swallowed exceptions in Bench). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("st1 passthrough streams every event row") {
    val out = SparkEntry.queries("st1_passthrough")(spark, TestSession.sf)
    val expected = Tables.t(spark, TestSession.sf, "events").count()
    assert(out.count() === expected)
  }

  test("st2 enrichment stream filters to clicks only") {
    val out = SparkEntry.queries("st2_stream_enrich")(spark, TestSession.sf)
    val expected = Tables.t(spark, TestSession.sf, "events")
      .filter(col("event_type") === "click").count()
    assert(out.count() === expected)
    assert(out.filter(col("event_type") =!= "click").count() === 0)
  }

  test("st3 windowed aggregation covers all events exactly once") {
    val out = SparkEntry.queries("st3_window_agg")(spark, TestSession.sf)
    val total = out.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total === Tables.t(spark, TestSession.sf, "events").count())
  }
}
