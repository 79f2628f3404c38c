package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.KCore

/** KCore peeling against hand-checkable graphs plus the two defining laws
  * on a generated graph: (a) every survivor's in-core degree ≥ k, and
  * (b) the result equals brute-force sequential peeling (the fixpoint is
  * unique, so synchronous rounds and any sequential order agree). */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def edgesDf(es: Seq[(Long, Long)]) = {
    val s2 = spark
    import s2.implicits._
    es.toDF("u", "v")
  }

  private def run(es: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    KCore.kCore(edgesDf(es), k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference: sequential peeling on an adjacency map. */
  private def brute(es: Seq[(Long, Long)], k: Int): Set[Long] = {
    var adj = es.flatMap(e => Seq(e, e.swap)).distinct
      .groupMap(_._1)(_._2).map { case (n, vs) => n -> vs.toSet }
    var changed = true
    while (changed) {
      val drop = adj.collect { case (n, vs) if vs.size < k => n }.toSet
      changed = drop.nonEmpty
      adj = (adj -- drop).map { case (n, vs) => n -> (vs -- drop) }
    }
    adj.keySet
  }

  // 4-clique {1,2,3,4} with a pendant path 4-5-6
  private val cliquePlusTail = Seq[(Long, Long)](
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6))

  test("3-core of a 4-clique with a tail is exactly the clique") {
    val got = run(cliquePlusTail, 3)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ == 3L)) // each clique node keeps 3 in-core edges
  }

  test("peeling cascades: removing the tail strips nothing from the clique, " +
    "but k=2 keeps the path out only past its chain") {
    val got = run(cliquePlusTail, 2)
    // 5 and 6 peel in cascade (6 first, then 5); 4 keeps its clique degree
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("no k-core → empty result, loop terminates") {
    assert(run(Seq((1L, 2L), (2L, 3L)), 2).isEmpty)
  }

  test("exhausting maxRounds before the fixpoint fails loudly, never returns a partial peel") {
    // a path peels one endpoint pair per round: 12 nodes need 5 rounds at
    // k=2 to drain; maxRounds=2 must throw, not return mid-peel survivors
    val path = (0L until 11L).map(i => (i, i + 1))
    val e = intercept[RuntimeException](
      KCore.kCore(edgesDf(path), k = 2, maxRounds = 2).collect())
    assert(e.getMessage.contains("no fixpoint"))
  }

  test("matches brute-force sequential peeling on a generated graph, " +
    "and every in-core degree is ≥ k") {
    // deterministic pseudo-random sparse graph on 40 nodes
    val es = (for (i <- 0L until 40L; j <- (i + 1) until 40L
      if ((i * 7919 + j * 104729) % 13) < 3) yield (i, j)).toSeq
    for (k <- Seq(2, 4, 6)) {
      val got = run(es, k)
      assert(got.keySet == brute(es, k), s"k=$k")
      assert(got.values.forall(_ >= k), s"k=$k degree certificate")
    }
  }

  test("k=1 drops only isolated-after-dedup nothing (every edge endpoint survives)") {
    val got = run(cliquePlusTail, 1)
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  /** Reference synchronous-peel trajectory: layer = round removed, -1 core. */
  private def bruteLayers(es: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var adj = es.flatMap(e => Seq(e, e.swap)).distinct
      .groupMap(_._1)(_._2).map { case (n, vs) => n -> vs.toSet }
    val layers = scala.collection.mutable.Map.empty[Long, Int]
    var round = 1
    var changed = true
    while (changed) {
      val drop = adj.collect { case (n, vs) if vs.size < k => n }.toSet
      changed = drop.nonEmpty
      drop.foreach(layers(_) = round)
      adj = (adj -- drop).map { case (n, vs) => n -> (vs -- drop) }
      round += 1
    }
    layers.toMap ++ adj.keySet.map(_ -> -1)
  }

  test("peelLayers matches the brute-force synchronous trajectory") {
    // clique+tail at k=2: 6 peels in round 1, 5 in round 2, clique survives
    val got = KCore.peelLayers(edgesDf(cliquePlusTail), 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> -1, 2L -> -1, 3L -> -1, 4L -> -1, 5L -> 2, 6L -> 1))
    val es = (for (i <- 0L until 40L; j <- (i + 1) until 40L
      if ((i * 7919 + j * 104729) % 13) < 3) yield (i, j)).toSeq
    for (k <- Seq(2, 4, 6)) {
      val g = KCore.peelLayers(edgesDf(es), k).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(g == bruteLayers(es, k), s"k=$k")
    }
  }
}
