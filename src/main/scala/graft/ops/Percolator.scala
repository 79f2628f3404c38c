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
  * fuse into one whole-stage-codegen'd projection; past `maxPerProjection`
  * the registry SHARDS into a union of fused projections so each generated
  * class stays under janino's method-size/constant-pool limits (an
  * oversized single projection would silently fall back to interpreted
  * mode — a ~10x scan slowdown). Each shard's projection prunes to idCols
  * plus only the columns ITS queries reference, so the unioned scans
  * re-read a column-pruned slice, not N full passes. The data side never
  * shuffles to match, so percolation is embarrassingly parallel over the
  * scan and drops into Structured Streaming unchanged (stateless narrow —
  * q:st25; self-union of one streaming source is supported).
  */
object Percolator {

  /** Load a registry persisted as (query_id, QueryJson) rows — the
    * deployment shape: stored queries live in a bucket-store table, are
    * collected to the driver (the registry IS plan-side state, bounded by
    * construction — thousands of rows, not data-sized) and compiled into
    * [[matches]]' fused projections. A malformed row fails loudly with
    * its query_id. */
  def registryFromTable(df: org.apache.spark.sql.DataFrame,
      idCol: String = "query_id",
      jsonCol: String = "query_json"): Seq[(String, QueryComponent)] = {
    // the two columns must be strings AT PLAN TIME — a wrong-typed column
    // would otherwise surface as a bare ClassCastException mid-collect,
    // without the "stored query" context the contract promises
    Seq(idCol, jsonCol).foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == org.apache.spark.sql.types.StringType,
        s"percolator registry column '$c' must be STRING, got ${dt.sql}")
    }
    df.select(idCol, jsonCol).collect().toSeq.map { r =>
      require(!r.isNullAt(0), "percolator registry row with NULL query id")
      val id = r.getString(0)
      // widened catch: ANY per-row failure (NULL json included) is a
      // malformed stored row and must carry the row's id
      try {
        require(!r.isNullAt(1), "NULL query_json")
        (id, graft.dsl.QueryJson.parse(r.getString(1)))
      } catch { case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"stored query '$id' failed to parse: ${e.getMessage}")
      }
    }
  }

  /** @param df       records to percolate
    * @param stored   the registry: (query_id, compiled-against-df DSL query)
    * @param idCols   record-identifying columns to carry into the output
    * @param maxPerProjection  max stored queries fused into one generated
    *        projection; larger registries become a union of shards. 256
    *        keeps each class comfortably inside janino's 64K-constant-pool
    *        / method-size budget while amortizing the scan.
    * @return one row per (record, matching stored query):
    *         idCols :+ query_id, no row for non-matching records */
  def matches(df: DataFrame, stored: Seq[(String, QueryComponent)],
      idCols: Seq[String], maxPerProjection: Int = 256): DataFrame = {
    require(stored.nonEmpty, "percolator needs at least one stored query")
    require(maxPerProjection >= 1,
      s"maxPerProjection must be >= 1, got $maxPerProjection")
    // the output frame is idCols :+ query_id — a clash or duplicate would
    // emit a duplicate-column frame that only fails downstream; reject at
    // plan time like every other contract violation here
    require(!idCols.contains("query_id"),
      "idCols must not contain the reserved output column name 'query_id'")
    require(idCols.distinct == idCols,
      s"duplicate idCols: ${idCols.diff(idCols.distinct).distinct}")
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
    // one fused projection per shard: qid where the query matches, NULL
    // where not (NULL-safe: a NULL-valued predicate is a non-match, the
    // same exclusion a WHERE clause applies). Non-matches are dropped by
    // an isNotNull filter AFTER the explode rather than array_compact
    // BEFORE it: array_compact is a higher-order function (ArrayFilter,
    // CodegenFallback) that would exile the entire stage from whole-stage
    // codegen, while explode+filter pipelines inside one generated loop —
    // the null entries never materialize. Shards union by position —
    // every shard emits the identical idCols :+ query_id schema.
    val shards = stored.grouped(maxPerProjection).map { group =>
      val tagged: Seq[Column] = group.map { case (qid, q) =>
        when(QueryCompiler.compileFor(df, q), lit(qid))
          .otherwise(lit(null).cast("string"))
      }
      df.select(idCols.map(col) :+
          explode(array(tagged: _*)).as("query_id"): _*)
        .where(col("query_id").isNotNull)
    }
    shards.reduce(_ union _)
  }
}
