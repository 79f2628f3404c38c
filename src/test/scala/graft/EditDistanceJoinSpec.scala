package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.EditDistanceJoin

/** Exactness of the q-gram prefix-filtered edit-distance join against a
  * naive all-pairs reference — including the adversarial cases the
  * blocking math has to survive: highly repetitive strings (few distinct
  * grams, where the rarest-gram prefix degenerates to keep-all) and
  * planted near-duplicates at every distance 0..maxDist. */
class EditDistanceJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** textbook DP Levenshtein — the reference the engine must reproduce */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  private def run(strs: Seq[String], maxDist: Int): (Set[(Long, Long, Int)], Set[(Long, Long, Int)]) = {
    val s = spark; import s.implicits._
    val df = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
    val got = EditDistanceJoin.selfJoin(df, "id", "s", maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val minLen = 4 * (maxDist + 1)
    val eligible = strs.zipWithIndex.filter(_._1.length >= minLen)
    val want = (for {
      (a, i) <- eligible; (b, j) <- eligible if i < j
      d = lev(a, b) if d <= maxDist
    } yield (i.toLong, j.toLong, d)).toSet
    (got, want)
  }

  test("random corpus with planted near-dups matches the naive reference") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd "
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val base = Seq.fill(40)(word(12 + rnd.nextInt(8)))
    // plant mutations at distance 1..3 of random base strings
    val mutated = Seq.fill(30) {
      val s = base(rnd.nextInt(base.size)).toCharArray
      val edits = 1 + rnd.nextInt(3)
      (0 until edits).foreach { _ =>
        val p = rnd.nextInt(s.length)
        s(p) = alpha(rnd.nextInt(alpha.length))
      }
      new String(s)
    }
    val (got, want) = run(base ++ mutated, maxDist = 2)
    assert(got === want)
    assert(want.nonEmpty, "test corpus must actually contain near-dup pairs")
  }

  test("repetitive strings (degenerate gram sets) are still exact") {
    val strs = Seq(
      "aaaaaaaaaaaa", "aaaaaaaaaaab", "aaaabaaaaaaa", // d<=2 of each other
      "abababababab", "abababababba",
      "            ", "           x",
      "short", // below the q*(d+1) pigeonhole bound: excluded
      "cccccccccccccccc", "ccccccccccccccdc")
    val (got, want) = run(strs, maxDist = 2)
    assert(got === want)
    assert(want.exists(_._3 == 1) && want.exists(_._3 == 2))
    assert(!got.exists(t => t._1 == 7L || t._2 == 7L)) // "short" never pairs
  }

  test("distance-0 (exact duplicates) and maxDist=1 threshold edges") {
    val strs = Seq("the quick brown fox!", "the quick brown fox!",
      "the quick brown fox?", "the quick brawn fax?")
    val (got, want) = run(strs, maxDist = 1)
    assert(got === want)
    assert(got.contains((0L, 1L, 0)) && got.contains((0L, 2L, 1)))
    assert(!got.exists(t => t._1 == 0L && t._2 == 3L)) // distance 3
  }
}
