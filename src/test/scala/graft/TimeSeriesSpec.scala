package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeSeries

/** Batch sessionization vs a naive in-memory reference (randomized, with
  * tied timestamps), and gap-fill grid semantics + guard. */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("sessionize agrees with a naive per-key reference, ties included") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(23)
    // bursty timestamps with deliberate duplicates within a key
    val rows = (1 to 800).map { _ =>
      val k = rnd.nextInt(12).toLong
      val t = rnd.nextInt(40) * 25L + (if (rnd.nextBoolean()) 0L else rnd.nextInt(5).toLong)
      (k, t)
    }
    val gap = 30L
    val got = TimeSeries.sessionize(rows.toDF("k", "t"), "k", "t", gap)
      .select("k", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

    val naive = rows.groupBy(_._1).toSeq.flatMap { case (k, ev) =>
      val ts = ev.map(_._2).sorted
      val sessions = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
      var start = ts.head; var last = ts.head; var n = 1L
      ts.tail.foreach { t =>
        if (t - last > gap) { sessions += ((k, start, last, n)); start = t; n = 0L }
        last = t; n += 1
      }
      sessions += ((k, start, last, n))
      sessions
    }.sorted
    assert(got === naive)
    assert(got.exists(_._4 > 1)) // multi-event sessions actually occurred
    assert(got.size > rows.map(_._1).distinct.size) // and splits occurred
  }

  test("gapFill densifies each key's range, keeps real rows, zero-fills holes") {
    val spark2 = spark
    import spark2.implicits._
    val daily = Seq((1L, 10L, 5L), (1L, 40L, 7L), (2L, 20L, 1L))
      .toDF("k", "b", "n")
    val got = TimeSeries.gapFill(daily, "k", "b", step = 10L,
        fill = Map("n" -> lit(0L)))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 10L, 5L), (1L, 20L, 0L), (1L, 30L, 0L),
      (1L, 40L, 7L), (2L, 20L, 1L)))
  }

  test("gapFill rejects buckets off the key's min + k*step lattice loudly") {
    val spark2 = spark
    import spark2.implicits._
    // b=25 is not on the 10,20,30 lattice — a silent left join would drop
    // the row (and its 7 events) from every downstream total
    val daily = Seq((1L, 10L, 5L), (1L, 25L, 7L), (1L, 30L, 2L))
      .toDF("k", "b", "n")
    val ex = intercept[Exception] {
      TimeSeries.gapFill(daily, "k", "b", step = 10L,
        fill = Map("n" -> lit(0L))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("expectations on an empty frame reports 0 violations, not null") {
    val spark2 = spark
    import spark2.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = graft.ops.DataQuality.expectations(empty,
        Seq("a_positive" -> (col("a") <= 0), "b_null" -> col("b").isNull))
      .as[(String, Long)].collect().sorted.toSeq
    assert(got === Seq(("a_positive", 0L), ("b_null", 0L)))
  }

  test("gapFill fails loudly when a key's range exceeds maxSteps buckets") {
    val spark2 = spark
    import spark2.implicits._
    val daily = Seq((1L, 0L, 1L), (1L, 1000000L, 1L)).toDF("k", "b", "n")
    val ex = intercept[Exception] {
      TimeSeries.gapFill(daily, "k", "b", step = 1L,
        fill = Map("n" -> lit(0L)), maxSteps = 100).collect()
    }
    assert(ex.getMessage != null)
  }

  test("Ewma laws: window=1 is identity, constant series is a fixed point, " +
    "and the 2-row case matches hand arithmetic exactly") {
    val spark2 = spark
    import spark2.implicits._
    def ewmaOf(rows: Seq[(String, Long, Long)], window: Int): Map[Long, Double] =
      graft.ops.Ewma.smooth(rows.toDF("event_type", "day_us", "n"),
          window = window)
        .collect().map(r => r.getAs[Long]("day_us") -> r.getAs[Double]("ewma"))
        .toMap
    val series = (0L until 20L).map(d => ("k", d, d * 3 + 1))
    // window=1: only the current row, weight 1 → ewma == n exactly
    assert(ewmaOf(series, 1) == series.map(r => r._2 -> r._3.toDouble).toMap)
    // constant series: any weighting averages to the constant, bit-exactly
    // (dyadic weights + exact denominator)
    val const = (0L until 20L).map(d => ("k", d, 7L))
    assert(ewmaOf(const, 14).values.forall(_ == 7.0))
    // hand check at row 2: (x0·0.5 + x1) / 1.5
    val two = Seq(("k", 0L, 10L), ("k", 1L, 16L))
    assert(ewmaOf(two, 14)(1L) == (10.0 * 0.5 + 16.0) / 1.5)
  }
}
