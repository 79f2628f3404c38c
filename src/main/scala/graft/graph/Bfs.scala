package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search: exact hop distances from a source
  * set — the reachability companion to [[Triangles]] and the connected
  * components in [[graft.dedup.Clustering]] (the reference's graph side
  * stops at build/merge; traversal queries ran inside its graph DB, e.g.
  * Titan/Gremlin traversals — here they are plain co-keyed DataFrame
  * rounds).
  *
  * Frontier expansion, not visited-set re-scans: round k joins ONLY the
  * nodes first reached at distance k−1 against the adjacency, drops
  * already-visited targets with an anti-join, and appends the survivors at
  * distance k. Each round is a shuffle proportional to the frontier's
  * out-edges, every node enters the visited set exactly once, and the loop
  * exits as soon as a frontier comes back empty (the same count that
  * materializes the round). Lineage is truncated per round
  * ([[graft.ops.IterTrunc]]) so the plan stays flat across iterations.
  *
  * [[hopLevels]] (visited keyed by node) and [[taggedHopLevels]] (visited
  * keyed by (src, node) — per-landmark distances) share ONE expansion loop
  * parameterized by the visited key; BfsSpec's collapse-law test pins
  * their equivalence (min over sources of tagged ≡ multi-source).
  */
object Bfs {

  /** Hop levels: one row per node reachable within `maxHops` of any
    * source, with its exact minimum hop distance (sources at 0).
    *
    * @param edges two-column DataFrame of edges (any names); traversed
    *              src→dst, or both ways when `undirected`
    * @param sources one-column DataFrame of start node ids
    * @param checkpointDir cluster-visible dir for fault-tolerant lineage
    *              truncation (None = localCheckpoint) — [[graft.ops.IterTrunc]]
    * @return (node, dist) — unreached nodes are absent, not null-padded */
  def hopLevels(edges: DataFrame, sources: DataFrame, maxHops: Int,
      undirected: Boolean = true,
      checkpointDir: Option[String] = None): DataFrame =
    expand(edges,
      sources.toDF("node").distinct().withColumn("dist", lit(0)),
      keyCols = Seq("node"), maxHops = maxHops, undirected = undirected,
      checkpointDir = checkpointDir, tag = "bfs")

  /** Tagged (per-source) hop levels: one row per (source, node) pair
    * reachable within `maxHops`, with the exact minimum hop distance —
    * the state [[hopLevels]] collapses to a min is kept per source here.
    * This is the landmark/pivot BFS of sampled-closeness centrality
    * (Eppstein–Wang): run the frontier expansion once with a composite
    * (src, node) visited key instead of |sources| separate traversals.
    * Each round's shuffle is the union of all sources' frontier out-edges
    * co-keyed on the adjacency — rounds stay O(effective diameter) and
    * driver state stays one frontier count per round, independent of the
    * landmark count. */
  def taggedHopLevels(edges: DataFrame, sources: DataFrame, maxHops: Int,
      undirected: Boolean = true,
      checkpointDir: Option[String] = None): DataFrame =
    expand(edges,
      sources.toDF("src").distinct()
        .select(col("src"), col("src").as("node"), lit(0).as("dist")),
      keyCols = Seq("src", "node"), maxHops = maxHops,
      undirected = undirected, checkpointDir = checkpointDir,
      tag = "bfs_tagged")

  /** The ONE frontier-expansion loop. `visited0` must carry
    * `keyCols :+ dist`, with the traversal position named `node` (the
    * last key column); any other key columns (e.g. `src`) ride along as
    * tags. */
  private def expand(edges: DataFrame, visited0: DataFrame,
      keyCols: Seq[String], maxHops: Int, undirected: Boolean,
      checkpointDir: Option[String], tag: String): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    require(keyCols.last == "node", "the traversal key must end in `node`")
    val spark = edges.sparkSession
    val trunc = new graft.ops.IterTrunc(spark, checkpointDir, tag)

    val e0 = edges.toDF("u", "v").filter(col("u") =!= col("v"))
    val adj = trunc.pin(
      (if (undirected) e0.union(e0.select(col("v"), col("u"))) else e0)
        .distinct())

    val carry = keyCols.init
    // ONE materialization per hop (r16): each distance-k shell is pinned
    // as it is discovered, and the visited set is the lazy UNION of the
    // already-materialized shells — the old per-round visited-union
    // channel write re-materialized every previously visited row each hop
    // (2 actions and ~|visited| extra write volume per round). The
    // anti-join and the final result read the same rows either way; the
    // plan grows one pinned-RDD scan per hop, bounded by the hop count.
    // Shells are PINNED (never eager-deleted): every later round's
    // anti-join still reads them — exactly the bytes the old single
    // visited table held.
    var (first, frontierSize) =
      graft.ops.IterTrunc.counted(trunc.pin, visited0)
    var visited = first
    var frontier = first.select(keyCols.map(col): _*)
    var k = 0
    while (frontierSize > 0 && k < maxHops) {
      k += 1
      // frontier's successors not yet visited = the distance-k shell;
      // distinct() before the anti-join so a (tag, node) reached over many
      // edges enters once (and the anti-join probe stays small)
      val (next, nextSize) = graft.ops.IterTrunc.counted(trunc.pin,
        adj.join(frontier, adj("u") === frontier("node"))
          .select(carry.map(frontier(_)) :+ adj("v").as("node"): _*).distinct()
          .join(visited.select(keyCols.map(col): _*), keyCols, "left_anti")
          .withColumn("dist", lit(k)))
      frontierSize = nextSize
      if (frontierSize > 0) {
        visited = visited.union(next)
        frontier = next.select(keyCols.map(col): _*)
      }
    }
    visited
  }
}
