package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** Binned range-join semantics: inclusive bounds, bin-boundary crossing,
  * empty/degenerate intervals, keyless mode, and agreement with the naive
  * non-equi join on randomized colliding data. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("inclusive bounds and bin-boundary-crossing intervals") {
    val spark2 = spark
    import spark2.implicits._
    // binWidth=10: interval [8, 21] covers bins 0,1,2; points at the exact
    // bounds are IN, just outside are OUT
    val pts = Seq(("k", 7L, 1L), ("k", 8L, 2L), ("k", 15L, 3L),
      ("k", 21L, 4L), ("k", 22L, 5L), ("z", 15L, 6L))
      .toDF("key", "p", "pid")
    val ivs = Seq(("k", 8L, 21L, 100L)).toDF("key", "s", "e", "iid")
    val got = RangeJoin.binned(pts, ivs, Seq("key"), "p", "s", "e", 10L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(got === Seq(2L -> 100L, 3L -> 100L, 4L -> 100L))
  }

  test("empty intervals (end < start) match nothing; keyless mode works") {
    val spark2 = spark
    import spark2.implicits._
    val pts = Seq((5L, 1L), (15L, 2L)).toDF("p", "pid")
    val ivs = Seq((10L, 3L, 100L), (0L, 20L, 200L)).toDF("s", "e", "iid")
    val got = RangeJoin.binned(pts, ivs, Nil, "p", "s", "e", 4L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(got === Seq(1L -> 200L, 2L -> 200L))
  }

  test("an interval spanning more than maxBinsPerInterval bins fails loudly") {
    val spark2 = spark
    import spark2.implicits._
    val pts = Seq((5L, 1L)).toDF("p", "pid")
    val ivs = Seq((0L, 100L, 1L)).toDF("s", "e", "iid")
    val ex = intercept[Exception] {
      RangeJoin.binned(pts, ivs, Nil, "p", "s", "e",
        binWidth = 10L, maxBinsPerInterval = 5).collect()
    }
    assert(ex.getMessage != null)
  }

  test("overlapBinned: randomized interval-interval join agrees with the " +
      "naive overlap join and emits each pair exactly once") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    def ivs(n: Int, seedCol: String) = (1L to n.toLong).map { i =>
      val s = rnd.nextInt(2000).toLong - 1000L
      // lengths up to 4 bins wide so pairs routinely share several bins —
      // the exactly-once dedup (first-overlap-bin filter) is what's on trial
      (s"k${rnd.nextInt(6)}", s, s + rnd.nextInt(200).toLong - 10L, i)
    }.toDF("key", s"s_$seedCol", s"e_$seedCol", s"id_$seedCol")
    val a = ivs(150, "a")
    val b = ivs(150, "b")
    val got = RangeJoin.overlapBinned(a, b, Seq("key"),
        "s_a", "e_a", "s_b", "e_b", binWidth = 50L)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    // empty intervals (e < s) are dropped by the operator by contract —
    // mirror that here, since the bare predicate would still "match" them
    val naive = a.filter(a("s_a") <= a("e_a"))
      .join(b.filter(b("s_b") <= b("e_b")),
        a("key") === b("key") &&
          a("s_a") <= b("e_b") && b("s_b") <= a("e_a"))
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    assert(got === naive) // sorted multiset equality: catches dupes too
    assert(got.nonEmpty)
    assert(got.distinct.size === got.size)
  }

  test("randomized binned join agrees with the naive non-equi join") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    // negative coordinates included: floor-division binning must stay
    // consistent below zero
    val pts = (1L to 500L).map(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(2000).toLong - 1000L, i))
      .toDF("key", "p", "pid")
    val ivs = (1L to 200L).map { i =>
      val s = rnd.nextInt(2000).toLong - 1000L
      (s"k${rnd.nextInt(10)}", s, s + rnd.nextInt(120).toLong - 10L, i)
    }.toDF("key", "s", "e", "iid")
    val got = RangeJoin.binned(pts, ivs, Seq("key"), "p", "s", "e", 50L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val naive = pts.as("a").join(ivs.as("b"),
        col("a.key") === col("b.key") &&
          col("a.p").between(col("b.s"), col("b.e")))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === naive)
    assert(got.nonEmpty) // the comparison actually exercised matches
  }
}
