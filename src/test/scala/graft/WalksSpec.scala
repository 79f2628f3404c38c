package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Walks

/** Exact walk counts on graphs small enough to enumerate by hand. */
class WalksSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def df2(rows: Seq[(Long, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("a", "b")
  }
  private def df1(rows: Seq[Long]) = {
    val s = spark; import s.implicits._
    rows.toDF("n")
  }
  private def toMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle from one source: counts match hand enumeration") {
    // undirected triangle 1-2-3: from 1, length-2 walks:
    // 1-2-1, 1-2-3, 1-3-1, 1-3-2 → node1:2, node2:1, node3:1
    val edges = df2(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val c2 = toMap(Walks.walkCounts(edges, df1(Seq(1L)), steps = 2))
    assert(c2 === Map(1L -> 2, 2L -> 1, 3L -> 1))
    // length-3: 8 walks total from 1 on a triangle (3-regular-ish):
    // ends at 1: 121->2? enumerate: paths of length 3 from 1:
    // 1212,1213,1231,1232,1312,1313,1321,1323 → node2:3, node3:3, node1:2
    val c3 = toMap(Walks.walkCounts(edges, df1(Seq(1L)), steps = 3))
    assert(c3 === Map(1L -> 2, 2L -> 3, 3L -> 3))
  }

  test("directed chain: counts move strictly forward; zero-walk nodes absent") {
    val edges = df2(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val c2 = toMap(Walks.walkCounts(edges, df1(Seq(1L)), steps = 2,
      undirected = false))
    assert(c2 === Map(3L -> 1))
    // steps=0 returns the (deduplicated) sources at count 1
    val c0 = toMap(Walks.walkCounts(edges, df1(Seq(1L, 1L, 4L)), steps = 0,
      undirected = false))
    assert(c0 === Map(1L -> 1, 4L -> 1))
  }

  test("multi-source counts add; multigraph input edges dedupe first") {
    val edges = df2(Seq((1L, 3L), (1L, 3L), (2L, 3L))) // duplicate edge
    // length-EXACTLY-1 walks from {1,2}: 1→3 and 2→3 — the duplicate
    // (1,3) edge must not double node 3's count; sources don't linger
    val c1 = toMap(Walks.walkCounts(edges, df1(Seq(1L, 2L)), steps = 1))
    assert(c1 === Map(3L -> 2))
    // one more step fans back out: 3→1 and 3→2, each with 3's count
    val c2 = toMap(Walks.walkCounts(edges, df1(Seq(1L, 2L)), steps = 2))
    assert(c2 === Map(1L -> 2, 2L -> 2))
  }
}
