package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.graph.{KCore, LabelProp}
import graft.ops.Hierarchy

/** Property-based laws for the iterative frontier/fixpoint family —
  * the loop-invariant analog of QueryPropSpec's DSL enumeration: for
  * randomly generated graphs, each operator's distributed fixpoint must
  * equal a naive single-machine reference computation, and the loud-failure
  * contract must fire exactly when the bound is genuinely exceeded.
  * Graphs are small (each trial runs real Spark jobs per round); the laws,
  * not the scale, are under test here — BENCH_SCALE covers scale. */
object GraphIterPropSpec extends Properties("GraphIter") {
  private lazy val spark = TestSession.spark

  // each trial is several Spark rounds; a handful of random graphs per law
  // is the right cost/coverage trade (QueryPropSpec's filters are cheap,
  // these are not)
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    pairs.toDF("u", "v")
  }

  // ---- random undirected graphs (distinct one-direction pairs) ----------

  private val genGraph: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(4, 18)
    density <- Gen.choose(15, 45) // percent
    picks <- Gen.sequence[Seq[Boolean], Boolean](
      for { i <- 1 to n; j <- (i + 1) to n }
        yield Gen.choose(1, 100).map(_ <= density))
  } yield {
    val all = for { i <- 1 to n; j <- (i + 1) to n } yield (i.toLong, j.toLong)
    val chosen = all.zip(picks).collect { case (e, true) => e }
    // at least one edge so the vertex universe (edge endpoints) is nonempty
    if (chosen.nonEmpty) chosen else Seq((1L, 2L))
  }

  private def undirected(pairs: Seq[(Long, Long)]): Map[Long, Seq[Long]] = {
    val adj = pairs.flatMap { case (u, v) => Seq(u -> v, v -> u) }
    adj.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
  }

  // ---- k-core: fixpoint equals the naive synchronous peel ---------------

  private def naivePeel(adj: Map[Long, Seq[Long]], k: Int)
      : (Set[Long], Map[Long, Int]) = {
    var survivors = adj.keySet
    var layers = Map.empty[Long, Int]
    var round = 1
    var changed = true
    while (changed && survivors.nonEmpty) {
      val next = survivors.filter(v =>
        adj(v).count(survivors.contains) >= k)
      val removed = survivors -- next
      layers ++= removed.map(_ -> round)
      changed = next != survivors
      survivors = next
      round += 1
    }
    (survivors, layers)
  }

  property("kCore equals the naive synchronous peel, certificate degrees exact") =
    Prop.forAll(genGraph, Gen.choose(1, 4)) { (pairs, k) =>
      val adj = undirected(pairs)
      val (expect, _) = naivePeel(adj, k)
      val got = KCore.kCore(edgesDf(pairs), k, maxRounds = adj.size + 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val degOk = got.forall { case (v, d) =>
        d == adj(v).count(got.keySet.contains) && d >= k
      }
      (got.keySet == expect) :| s"core ${got.keySet} vs $expect" &&
        degOk :| "certificate degree wrong or below k"
    }

  property("peelLayers records the exact removal round per vertex") =
    Prop.forAll(genGraph, Gen.choose(1, 4)) { (pairs, k) =>
      val adj = undirected(pairs)
      val (core, layers) = naivePeel(adj, k)
      val got = KCore.peelLayers(edgesDf(pairs), k, maxRounds = adj.size + 2)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expect = layers ++ core.map(_ -> -1)
      (got == expect) :| s"layers $got vs $expect"
    }

  // ---- label propagation: rounds equal the naive synchronous sweep ------

  private def naiveLpa(adj: Map[Long, Seq[Long]], iters: Int): Map[Long, Long] = {
    var labels = adj.keySet.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      labels = adj.map { case (v, ns) =>
        val counts = ns.groupBy(labels).map { case (l, xs) => l -> xs.size }
        val bestN = counts.values.max
        v -> counts.collect { case (l, n) if n == bestN => l }.min
      }
    }
    labels
  }

  property("propagate equals the naive synchronous LPA with min-label ties") =
    Prop.forAll(genGraph, Gen.choose(0, 3)) { (pairs, iters) =>
      val adj = undirected(pairs)
      val got = LabelProp.propagate(edgesDf(pairs), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = naiveLpa(adj, iters)
      (got == expect) :| s"labels $got vs $expect"
    }

  // ---- hierarchy: closure equals the naive parent-chain walk ------------

  // a forest rooted at 0 (each node's parent has a smaller id) plus a
  // DISCONNECTED component rooted at 100 that must never reach the closure
  private val genForest: Gen[(Seq[(Long, Long)], Int)] = for {
    n <- Gen.choose(2, 14)
    parents <- Gen.sequence[Seq[Long], Long](
      (1 to n).map(i => Gen.choose(0, i - 1).map(_.toLong)))
    stray <- Gen.choose(1, 4)
  } yield {
    val tree = (1 to n).map(i => (i.toLong, parents(i - 1)))
    val island = (1 to stray).map(i => (100L + i, 100L + i - 1))
    (tree ++ island, n)
  }

  private def naiveClosure(edges: Seq[(Long, Long)], root: Long)
      : Set[(Long, Int, String)] = {
    val byParent = edges.groupBy(_._2)
    def walk(node: Long, depth: Int, path: String): Set[(Long, Int, String)] =
      Set((node, depth, path)) ++ byParent.getOrElse(node, Nil).flatMap {
        case (c, _) => walk(c, depth + 1, s"$path/$c")
      }
    walk(root, 0, root.toString)
  }

  property("hierarchy closure equals the naive walk; island stays out") =
    Prop.forAll(genForest) { case (edges, _) =>
      val expect = naiveClosure(edges, 0L)
      val got = Hierarchy.explode(edgesDf(edges)
          .toDF("child", "parent"), "child", "parent", rootId = 0L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      (got == expect) :| s"closure $got vs $expect" &&
        got.forall(_._1 < 100L) :| "disconnected island leaked into closure"
    }

  property("hierarchy fails loudly iff the tree outruns maxDepth") =
    Prop.forAll(genForest) { case (edges, _) =>
      val depth = naiveClosure(edges, 0L).map(_._2).max
      val df = edgesDf(edges).toDF("child", "parent")
      val atBound = Hierarchy.explode(df, "child", "parent", 0L,
        maxDepth = math.max(depth, 1)).count() > 0
      val below =
        if (depth < 2) true // maxDepth >= 1 required; nothing to undercut
        else
          try { Hierarchy.explode(df, "child", "parent", 0L,
            maxDepth = depth - 1); false }
          catch { case e: RuntimeException =>
            e.getMessage.contains("cycle") || e.getMessage.contains("deeper") }
      atBound :| "exact maxDepth must succeed" &&
        below :| "maxDepth below the true depth must fail loudly"
    }
}
