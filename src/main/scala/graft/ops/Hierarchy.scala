package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive hierarchy explosion — the `WITH RECURSIVE` surface Spark SQL
  * does not ship: explode a (child, parent) edge table from a root into
  * (node, depth, path) rows with the materialized ancestor path (org
  * charts, bills of material, category trees).
  *
  * Frontier iteration like [[graft.graph.Bfs]]: each round joins the
  * children table against the previous frontier on the parent key (one
  * co-keyed equi-join), extends the path string, and appends to a
  * channel-truncated accumulator. Rounds = tree depth; cycles or depth
  * past `maxDepth` fail loudly (a silent truncation would return a
  * partial closure that looks complete).
  *
  * Reference analog: none — its SQL surface (Q1) has no recursion; this
  * belongs to the warehouse-parity extension set like MERGE INTO (u16).
  */
object Hierarchy {

  /** `children`: (childCol, parentCol) acyclic edges. Returns one row per
    * node reachable from `rootId`: node, depth (root = 0), path
    * ("root/…/node", '/'-joined ids). */
  def explode(children: DataFrame, childCol: String, parentCol: String,
      rootId: Long, maxDepth: Int = 64,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val trunc = new IterTrunc(children.sparkSession, checkpointDir, "hier")
    val edges = trunc.pin(children
      .select(col(childCol).cast("long").as("child"),
        col(parentCol).cast("long").as("parent")))

    def expand(frontier: DataFrame): DataFrame = edges
      .join(frontier, edges("parent") === frontier("node"))
      .select(edges("child").as("node"), (frontier("depth") + 1).as("depth"),
        concat(frontier("path"), lit("/"), edges("child")).as("path"))

    // each round's frontier is PINNED (never deleted) and the closure is
    // unioned ONCE after the loop — a channel-accumulated closure would
    // rewrite O(depth × rows) bytes for a result that is only read at the
    // end (unlike Bfs, nothing inside the loop consumes the accumulator)
    var frontier = trunc.pin(edges.sparkSession.range(1)
      .select(lit(rootId).as("node"), lit(0).as("depth"),
        lit(rootId.toString).as("path")))
    val rounds = scala.collection.mutable.ListBuffer(frontier)
    var depth = 0
    var n = 1L
    while (n > 0 && depth < maxDepth) {
      frontier = trunc.pin(expand(frontier))
      n = frontier.count()
      if (n > 0) rounds += frontier
      depth += 1
    }
    // nodes AT depth == maxDepth are legitimate (already accumulated);
    // only a frontier that would expand FURTHER means cycle/overdepth
    if (n > 0 && expand(frontier).limit(1).count() > 0) sys.error(
      s"Hierarchy: frontier still expanding past depth $maxDepth — cycle " +
        "or tree deeper than maxDepth; a truncated closure is not an answer")
    rounds.reduce(_ unionByName _)
  }
}
