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
    val frontChan = trunc.channel()
    val accChan = trunc.channel()

    var frontier = frontChan(edges.sparkSession.range(1)
      .select(lit(rootId).as("node"), lit(0).as("depth"),
        lit(rootId.toString).as("path")))
    var acc = accChan(frontier)
    var depth = 0
    var n = 1L
    while (n > 0 && depth < maxDepth) {
      frontier = frontChan(edges
        .join(frontier, edges("parent") === frontier("node"))
        .select(edges("child").as("node"), (frontier("depth") + 1).as("depth"),
          concat(frontier("path"), lit("/"), edges("child")).as("path")))
      n = frontier.count()
      if (n > 0) acc = accChan(acc.unionByName(frontier))
      depth += 1
    }
    if (n > 0) sys.error(
      s"Hierarchy: frontier still non-empty at depth $maxDepth — cycle or " +
        "tree deeper than maxDepth; a truncated closure is not an answer")
    acc
  }
}
