package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dsl.{QueryCompiler, QueryComponent}

/** Reverse search (percolation): match each incoming record against a
  * REGISTRY of stored DSL queries — the alerting workload the reference
  * delegated to Elasticsearch's percolator (stored queries evaluated
  * against every new document as it lands; the reference's bucket
  * pipelines raised alerts exactly this way, by round-tripping documents
  * through ES).
  *
  * On this engine the registry compiles ONCE on the driver into N
  * codegen'd boolean Columns fused into a single array projection over ONE
  * scan: no per-query pass over the data, no join against a query table,
  * no UDF. A record's matches come out as exploded (record, query_id)
  * pairs; non-matching records disappear at the explode (empty array after
  * `array_compact`), so output size is the match count, not records ×
  * queries.
  *
  * Scale: the registry is PLAN-side state — hundreds of stored queries
  * fuse into one whole-stage-codegen'd projection (thousands would shard
  * into a few unioned projections); the data side never shuffles to match,
  * so percolation is embarrassingly parallel over the scan and drops into
  * Structured Streaming unchanged (stateless narrow — q:st25).
  */
object Percolator {

  /** @param df       records to percolate
    * @param stored   the registry: (query_id, compiled-against-df DSL query)
    * @param idCols   record-identifying columns to carry into the output
    * @return one row per (record, matching stored query):
    *         idCols :+ query_id, no row for non-matching records */
  def matches(df: DataFrame, stored: Seq[(String, QueryComponent)],
      idCols: Seq[String]): DataFrame = {
    require(stored.nonEmpty, "percolator needs at least one stored query")
    val ids = stored.map(_._1)
    require(ids.distinct.size == ids.size,
      s"duplicate stored query ids: ${ids.diff(ids.distinct).distinct}")
    // meta riders (limit/orderBy/includes/excludes) have no meaning in a
    // per-record match — honoring a limit would need global state, and
    // silently ignoring it would under-deliver alerts. Reject at plan
    // time, RECURSIVELY: compileWith discards nested components' meta
    // too, so a limit buried inside a Query.or(...) must also fail here.
    def anyMeta(q: graft.dsl.QueryComponent): Boolean = q match {
      case m: graft.dsl.MultiQuery =>
        !m.meta.isEmpty || m.components.exists(anyMeta)
      case other => !other.meta.isEmpty
    }
    val withMeta = stored.collect { case (id, q) if anyMeta(q) => id }
    require(withMeta.isEmpty,
      s"stored queries must be pure predicates (no limit/orderBy/" +
        s"includes/excludes, at any nesting level): $withMeta")
    // one fused projection: qid where the query matches, NULL where not
    // (NULL-safe: a NULL-valued predicate is a non-match, the same
    // exclusion a WHERE clause applies)
    val tagged: Seq[Column] = stored.map { case (qid, q) =>
      when(QueryCompiler.compileFor(df, q), lit(qid))
        .otherwise(lit(null).cast("string"))
    }
    df.select(idCols.map(col) :+
      explode(array_compact(array(tagged: _*))).as("query_id"): _*)
  }
}
