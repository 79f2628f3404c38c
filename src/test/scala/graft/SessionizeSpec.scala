package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Cross-batch keyed state (flatMapGroupsWithState): sessionize events per
  * user with a 30-minute inactivity gap, driven to completion over the
  * driver's events table, and checked against a batch-computed oracle
  * (lag-based session boundaries). */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("stateful sessionization matches the batch lag-window oracle") {
    val gapMin = 30
    val raw = Streams.parquetStream(spark, s"${TestSession.sf}/events.parquet",
      spark.read.parquet(s"${TestSession.sf}/events.parquet").schema)
    val stream = Tables.normalizeTs(raw)
    val out = Streams.runToParquet(
      Streams.sessionize(stream, gapMin),
      identity)

    // batch oracle: session id = cumulative count of gap-breaks per user
    val ev = Tables.t(spark, TestSession.sf, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 1000").as("t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t")
    val gapMs = gapMin * 60L * 1000L
    val sessions = ev
      .withColumn("prev", lag("t", 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        col("t") - col("prev") > gapMs, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("t").as("session_start"), max("t").as("session_end"),
        count(lit(1)).as("n_events"))

    // the stream emits only CLOSED sessions — every emitted session must
    // exist in the oracle with identical bounds and counts
    val emitted = out.select("user_id", "session_start", "session_end", "n_events")
    val unmatched = emitted.join(sessions,
      Seq("user_id", "session_start", "session_end", "n_events"), "left_anti")
    assert(unmatched.count() === 0,
      s"stream emitted sessions absent from the batch oracle")
    // a session closes when a later event for the user arrives (all but
    // each user's last) OR when the event-time timeout fires — the final
    // watermark is max(ts) - gap, so a last session also closes when
    // session_end + gap < watermark
    val maxMs = ev.agg(max("t")).collect()(0).getLong(0)
    val wm = maxMs - gapMs
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("session_start").desc)
    val withPos = sessions.withColumn("pos", row_number().over(wLast))
    val nonLast = withPos.filter(col("pos") > 1).count()
    val lastTimedOut = withPos.filter(col("pos") === 1)
      .filter(col("session_end") + gapMs < wm).count()
    assert(emitted.count() === nonLast + lastTimedOut,
      s"emitted ${emitted.count()} closed sessions, " +
        s"expected ${nonLast + lastTimedOut} (nonLast=$nonLast timedOut=$lastTimedOut)")
  }
}
