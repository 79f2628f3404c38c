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

  test("perVertex: counts sum to 3x total; K4 and path lcc are exact") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val pv = Triangles.perVertex(edges.toDF("a", "b"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(pv.map(_._3).sum === 3 * countOf(edges))
    assert(pv.map(_._3).sum > 0)

    // K4: every vertex has degree 3 and sits in 3 triangles -> lcc 1.0;
    // a path's middle vertex has degree 2, no triangle -> lcc 0.0
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val pvK4 = Triangles.perVertex(k4.toDF("a", "b"))
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(pvK4 === (0L to 3L).map(i => (i, 3L, 3L, 1.0)))
    val path = Seq(1L -> 2L, 2L -> 3L)
    val pvPath = Triangles.perVertex(path.toDF("a", "b"))
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(pvPath === Seq((1L, 1L, 0L, 0.0), (2L, 2L, 0L, 0.0), (3L, 1L, 0L, 0.0)))
  }
}
