package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.OverlapJoin

/** Exact overlap join vs a naive all-pairs intersection reference on
  * randomized skewed sets — exercises the prefix-filter lemma (no lost
  * pairs), duplicate collapsing, the sub-threshold drop, and the exact
  * threshold boundary. */
class OverlapJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("randomized skewed sets: pairs and overlaps match the naive reference") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(31)
    // Zipf-ish element draw: low ids very common, tail rare — the regime
    // where rarest-first prefix ordering matters. Duplicates within a set
    // (collapsed by the operator) appear naturally.
    def elem(): String = s"e${math.min(rnd.nextInt(40), rnd.nextInt(40))}"
    val docs = (1L to 120L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(25))(elem()))
    }
    val minOverlap = 4
    val got = OverlapJoin.join(docs.toDF("id", "s"), "id", "s", minOverlap)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val sets = docs.map { case (i, s) => i -> s.toSet }.toMap
    val naive = (for {
      a <- sets.keys; b <- sets.keys if a < b
      ov = (sets(a) & sets(b)).size if ov >= minOverlap
    } yield (a, b, ov.toLong)).toSeq.sorted
    assert(got === naive)
    assert(got.nonEmpty)
    // boundary coverage: some pair sits exactly at the threshold
    assert(naive.exists(_._3 == minOverlap.toLong))
  }

  test("jaccard join: randomized skewed sets match the naive reference") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(97)
    def elem(): String = s"e${math.min(rnd.nextInt(30), rnd.nextInt(30))}"
    // near-dup structure on purpose: even ids clone the previous odd id's
    // set with a small perturbation, so high-Jaccard pairs exist alongside
    // the random background
    val base = (1L to 60L).map(i => (i, Seq.fill(6 + rnd.nextInt(20))(elem())))
    val docs = base.map { case (i, s) =>
      if (i % 2 == 0) (i, base((i - 2).toInt)._2 ++ Seq(elem()) ) else (i, s)
    }
    val t = 0.6
    val got = OverlapJoin.jaccardJoin(docs.toDF("id", "s"), "id", "s", t)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val sets = docs.map { case (i, s) => i -> s.toSet }.toMap
    val naive = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      j = inter.toDouble / (sets(a).size + sets(b).size - inter) if j >= t
    } yield (a, b, j)).toSeq.sorted
    assert(got === naive)
    assert(got.nonEmpty)
    // identical sets hit jacc exactly 1.0; threshold-adjacent pairs exist
    assert(naive.exists(_._3 < 0.75), "want pairs near the threshold")
  }

  test("containment join: randomized sets match the naive directed reference") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(53)
    def elem(): String = s"e${rnd.nextInt(200)}"
    // containment structure: every third id is a strict SUBSET of the
    // previous id (the quote-inside-a-long-doc shape) — high containment
    // one way, low the other; Jaccard would miss these
    val base = (1L to 60L).map(i => (i, Seq.fill(12 + rnd.nextInt(20))(elem())))
    val docs = base.map { case (i, s) =>
      if (i % 3 == 0) (i, base((i - 2).toInt)._2.distinct.take(11)) else (i, s)
    }
    val (pct, minSize) = (90, 10)
    val got = OverlapJoin
      .containmentJoin(docs.toDF("id", "s"), "id", "s", pct, minSize)
      .select("src", "dst", "overlap", "src_sz")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val sets = docs.map { case (i, s) => i -> s.toSet }.toMap
    val naive = (for {
      a <- sets.keys; b <- sets.keys
      if a != b && sets(a).size >= minSize && sets(b).size >= minSize
      ov = (sets(a) & sets(b)).size
      if ov * 100 >= pct * sets(a).size
    } yield (a, b, ov.toLong, sets(a).size.toLong)).toSeq.sorted
    assert(got === naive)
    assert(got.nonEmpty)
    // the asymmetry is real: some qualifying (src, dst) has no (dst, src)
    val dirs = got.map(r => (r._1, r._2)).toSet
    assert(got.exists(r => !dirs.contains((r._2, r._1))),
      "want a pair contained one way only")
  }

  test("sets smaller than the threshold never pair; empty sets are safe") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, Seq("a", "b")), (2L, Seq("a", "b")), // |S| < T: dropped
      (3L, Seq.empty[String]),
      (4L, Seq("a", "b", "c")), (5L, Seq("a", "b", "c"))).toDF("id", "s")
    val got = OverlapJoin.join(docs, "id", "s", minOverlap = 3)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === Seq((4L, 5L, 3L)))
  }
  test("sorted_overlap expression: exact counts, early reject, null tail") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.OverlapExprFunctions.sorted_overlap
    val df = Seq(
      (1L, Seq("a", "b", "c", "d"), Seq("b", "c", "d", "e"), 1),  // ov 3
      (2L, Seq("a", "b"), Seq("c", "d"), 1),                      // ov 0, rejected at req 1
      (3L, Seq("a", "b", "c"), Seq("a", "x", "y"), 3),            // ov 1 < 3: early reject
      (4L, Seq("a", "a", "b"), Seq("a", "b", "b"), 0),            // dup-tolerant merge: pairs once each
      (5L, Seq[String](), Seq("a"), 0)                            // empty side
    ).toDF("id", "sa", "sb", "req")
    val got = df.select(col("id"),
        sorted_overlap(array_sort(col("sa")), array_sort(col("sb")), col("req"))
          .as("ov"))
      .as[(Long, Int)].collect().toMap
    assert(got(1L) === 3)
    assert(got(2L) === 0) // exhausts without matching; below-threshold exact count
    assert(got(3L) === -1) // early reject: cannot reach 3
    assert(got(4L) >= 2)   // exactness only promised for distinct inputs
    assert(got(5L) === 0)
    // the early exit NEVER distorts a pair that meets the threshold:
    // req == true overlap must return the exact count
    val exact = df.filter(col("id") === 1L).select(
      sorted_overlap(array_sort(col("sa")), array_sort(col("sb")), lit(3))
        .as("ov")).as[Int].head()
    assert(exact === 3)
    // null elements sort last and match nothing (equi-join semantics)
    val withNull = Seq((Seq[String]("a", "b", null), Seq[String]("a", null)))
      .toDF("sa", "sb")
      .select(sorted_overlap(array_sort(col("sa")), array_sort(col("sb")),
        lit(0)).as("ov")).as[Int].head()
    assert(withNull === 1)
  }
  test("non-string element types are rejected at plan time") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, Seq(1L, 2L)), (2L, Seq(2L, 3L))).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      OverlapJoin.join(docs, "id", "s", minOverlap = 1)
    }
    assert(e.getMessage.contains("array<string>") ||
      e.getMessage.contains("ArrayType"))
    intercept[IllegalArgumentException] {
      OverlapJoin.jaccardJoin(docs, "id", "s", 0.5)
    }
  }
}
