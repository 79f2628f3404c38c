package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Triangles

/** Triangle-count semantics: known small graphs, input normalization
  * (duplicates / reversed orientation / self-loops), and id-order vs
  * degree-order orientation agreeing on random graphs. */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def countOf(edges: Seq[(Long, Long)], byDegree: Boolean = false): Long = {
    val spark2 = spark
    import spark2.implicits._
    val df = edges.toDF("a", "b")
    val res = if (byDegree) Triangles.countOrientedByDegree(df)
      else Triangles.count(df)
    res.collect().head.getLong(0)
  }

  test("known graphs: triangle, square, square+diagonal, K4") {
    assert(countOf(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)) === 1L)
    assert(countOf(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)) === 0L)
    assert(countOf(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L)) === 2L)
    val k4 = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(countOf(k4) === 4L)
  }

  test("duplicates, reversed edges, and self-loops are normalized away") {
    val messy = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 1L -> 1L, 2L -> 3L)
    assert(countOf(messy) === 1L)
    assert(countOf(messy, byDegree = true) === 1L)
  }

  test("degree-ordered orientation matches id-ordered on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n * 4)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(countOf(edges) === countOf(edges, byDegree = true),
        s"trial $trial disagreed")
    }
  }
}
