package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

/** As-of join semantics on hand-built rows: at-or-before matching, ties at
  * equal timestamps, no-match nulls, and the single-shuffle plan shape. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("as-of picks the latest right row at-or-before each left row") {
    val spark2 = spark
    import spark2.implicits._
    val purchases = Seq( // (event_id, key, t)
      (100L, "a", 0L), (101L, "a", 1L), (102L, "a", 6L),
      (103L, "b", 9L)).toDF("event_id", "user_id", "t")
    val clicks = Seq( // (key, ct, click_id)
      ("a", 1L, 10L), ("a", 5L, 11L),
      ("c", 1L, 12L)).toDF("user_id", "ct", "click_id")
    val got = AsOfJoin.asOf(purchases, clicks, Seq("user_id"),
        leftTs = "t", rightTs = "ct", payload = Seq("click_id", "ct"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    assert(got === Seq(
      100L -> null, // t=0: before every click
      101L -> 10L,  // t=1: the equal-ts click counts (at-OR-before)
      102L -> 11L,  // t=6: latest of the two
      103L -> null)) // key with no clicks at all
  }

  test("equal-timestamp duplicate right rows resolve to the max tie-break id") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, "k", 5L)).toDF("event_id", "user_id", "t")
    val right = Seq(("k", 5L, 7L), ("k", 5L, 9L), ("k", 5L, 8L))
      .toDF("user_id", "ct", "click_id")
    val got = AsOfJoin.asOf(left, right, Seq("user_id"), "t", "ct",
      Seq("click_id", "ct")).collect().head
    assert(got.getLong(3) === 9L)
  }

  test("randomized as-of agrees with a naive per-row reference (fixed seed)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(42)
    // colliding timestamps on purpose: small ts range forces at-or-before
    // ties and duplicate right timestamps through the tie-break path
    val left = (1L to 400L).map(i =>
      (i, s"k${rnd.nextInt(12)}", rnd.nextInt(40).toLong))
    val right = (1L to 300L).map(i =>
      (s"k${rnd.nextInt(15)}", rnd.nextInt(40).toLong, i))
    val got = AsOfJoin.asOf(
        left.toDF("event_id", "user_id", "t"),
        right.toDF("user_id", "ct", "click_id"),
        Seq("user_id"), "t", "ct", Seq("click_id", "ct"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // reference: per left row, scan all right rows — max (ct, click_id)
    // among those with same key and ct <= t
    val expected = left.map { case (id, k, t) =>
      val matches = right.filter { case (rk, ct, _) => rk == k && ct <= t }
      id -> (if (matches.isEmpty) -1L
             else matches.maxBy { case (_, ct, cid) => (ct, cid) }._3)
    }.toMap
    assert(got === expected)
  }

  test("as-of plan shuffles once on the key (no join, no extra exchange)") {
    val spark2 = spark
    import spark2.implicits._
    val left = (1L to 100L).map(i => (i, i % 7, i)).toDF("event_id", "user_id", "t")
    val right = (1L to 50L).map(i => (i % 7, i, i + 1000)).toDF("user_id", "ct", "click_id")
    val plan = AsOfJoin.asOf(left, right, Seq("user_id"), "t", "ct",
      Seq("click_id", "ct")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"expected exactly one key shuffle:\n$plan")
  }
}
