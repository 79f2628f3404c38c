package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Scc

/** Pins the FW-BW-min coloring SCC against hand-built graphs and a naive
  * O(n³) reachability reference on random digraphs. */
class SccSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Scc.scc(edges.toDF("u", "v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Naive SCC ids by Floyd–Warshall closure. */
  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.size
    val r = Array.fill(n, n)(false)
    nodes.indices.foreach(i => r(i)(i) = true)
    edges.foreach { case (u, v) => r(idx(u))(idx(v)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (r(i)(k) && r(k)(j)) r(i)(j) = true
    nodes.map { v =>
      val i = idx(v)
      v -> nodes.filter(w => r(i)(idx(w)) && r(idx(w))(i)).min
    }.toMap
  }

  test("two cycles bridged by a one-way path stay separate SCCs") {
    // cycle {1,2,3} -> bridge 3->10 -> cycle {10,11}, plus dangler 20->1
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 10), (20, 1))
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("long directed chain is all singletons; closing it is one SCC") {
    val chain = (1L to 40L).sliding(2).map(p => (p(0), p(1))).toSeq
    assert(run(chain).values.toSet.size == 40)
    val closed = chain :+ ((40L, 1L))
    assert(run(closed).values.toSet == Set(1L))
  }

  test("random digraphs match the naive closure reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 8 + trial
      val edges = (for {
        u <- 1L to n.toLong; v <- 1L to n.toLong
        if u != v && rnd.nextDouble() < 0.18
      } yield (u, v)).toSeq
      if (edges.nonEmpty)
        assert(run(edges) == naive(edges), s"trial $trial edges=$edges")
    }
  }
}
