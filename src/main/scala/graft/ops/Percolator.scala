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
  * Scale: the registry is PLAN-side state, and the input is scanned ONCE
  * no matter how large it grows. Registries of ≤`maxPerProjection` stored
  * queries fuse into one whole-stage-codegen'd explode projection; larger
  * ones plan as the custom [[graft.plans.PercolateNode]] operator, which
  * compiles each ≤`maxPerProjection` shard into its own row-based
  * codegen'd projection (separate generated class — no janino collapse,
  * no interpreted fallback) over a single column-pruned scan
  * (`unionShards = true` keeps the legacy one-scan-per-shard union; its
  * only win is per-shard column pruning — see SCALE.md for the measured
  * tradeoff). The data side never shuffles to match, so percolation is
  * embarrassingly parallel over the scan and drops into Structured
  * Streaming unchanged (stateless narrow — q:st25).
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
    // without the "stored query" context the contract promises. Resolution
    // is session-cased (the same rule df.select applies), not StructType's
    // always-case-sensitive apply
    val resolver = df.sparkSession.sessionState.conf.resolver
    Seq(idCol, jsonCol).foreach { c =>
      val fld = df.schema.find(f => resolver(f.name, c)).getOrElse(
        throw new IllegalArgumentException(
          s"percolator registry column '$c' does not exist"))
      require(fld.dataType == org.apache.spark.sql.types.StringType,
        s"percolator registry column '$c' must be STRING, got ${fld.dataType.sql}")
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
        // keep the cause: a null-message NPE must stay diagnosable
        throw new IllegalArgumentException(
          s"stored query '$id' failed to parse: ${e.getMessage}", e)
      }
    }
  }

  /** @param df       records to percolate
    * @param stored   the registry: (query_id, compiled-against-df DSL query)
    * @param idCols   record-identifying columns to carry into the output
    * @param maxPerProjection  stored queries per match-array group. Each
    *        group becomes one `array(when..)` subtree, which Catalyst's
    *        splitExpressions carves into its own generated method (and,
    *        past the class-size threshold, its own nested class with its
    *        own constant pool) — the knob bounds generated-code locality,
    *        not the number of scans.
    * @param unionShards  legacy layout: one SCAN per group, unioned. Each
    *        scan column-prunes to the columns its own group references, so
    *        a registry whose queries cluster by column set can read less
    *        per pass — but the input is read `ceil(n/maxPerProjection)`
    *        times, which loses at scale (measured: see SCALE.md). Default
    *        false: one group stays the fused explode projection; more
    *        groups plan as the single-scan [[graft.plans.PercolateNode]]
    *        custom operator (per-group row-based codegen'd projections).
    * @return one row per (record, matching stored query):
    *         idCols :+ query_id, no row for non-matching records */
  def matches(df: DataFrame, stored: Seq[(String, QueryComponent)],
      idCols: Seq[String], maxPerProjection: Int = 256,
      unionShards: Boolean = false): DataFrame = {
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
    // per-group fused match array: qid where the query matches, NULL
    // where not (NULL-safe: a NULL-valued predicate is a non-match, the
    // same exclusion a WHERE clause applies). Non-matches are dropped by
    // an isNotNull filter AFTER the explode rather than array_compact
    // BEFORE it: array_compact is a higher-order function (ArrayFilter,
    // CodegenFallback) that would exile the entire stage from whole-stage
    // codegen, while explode+filter pipelines inside one generated loop —
    // the null entries never materialize.
    def tagged(group: Seq[(String, QueryComponent)]): Seq[Column] =
      group.map { case (qid, q) =>
        when(QueryCompiler.compileFor(df, q), lit(qid))
          .otherwise(lit(null).cast("string"))
      }
    val groups = stored.grouped(maxPerProjection).toSeq
    if (groups.size == 1 || unionShards) {
      // one group: a single fused explode+filter projection that pipelines
      // inside whole-stage codegen with whatever consumes the matches.
      // unionShards: the legacy layout — the same projection once per
      // group, unioned by position (a 1-element reduce inserts no Union)
      groups.map { group =>
        df.select(idCols.map(col) :+
            explode(array(tagged(group): _*)).as("query_id"): _*)
          .where(col("query_id").isNotNull)
      }.reduce(_ union _)
    } else {
      // large registry, single pass: the custom [[graft.plans.PercolateNode]]
      // operator. A giant fused projection is NOT an option — whole-stage
      // codegen inlines every expression into one doConsume and refuses to
      // split when inputs are pipelined local vars, so ~600 predicates
      // overflow janino's 64KB method limit and the stage silently drops
      // to interpreted eval. The custom exec compiles each ≤maxPerProjection
      // shard into its own row-based UnsafeProjection (own class, split
      // methods) and scans the input exactly once.
      singlePass(df, stored, idCols, maxPerProjection)
    }
  }

  /** Build the [[graft.plans.PercolateNode]] plan: predicates are analyzed
    * exactly as a `select` would be (type coercion included) by round-
    * tripping them through a probe projection, then grouped into shards
    * over a column-pruned child. */
  private def singlePass(df: DataFrame, stored: Seq[(String, QueryComponent)],
      idCols: Seq[String], maxPerProjection: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spark = df.sparkSession
    // a session built WITHOUT GraftExtensions must still plan the node —
    // self-register the strategy via the session's experimental hook
    // (IncrementalExecution honors it too); a duplicate alongside the
    // extension-injected copy is harmless (the planner takes the first
    // non-empty match), but don't stack one per call. The check-then-append
    // is a read-modify-write of a shared var, so serialize concurrent
    // matches() calls on the experimental-methods object itself (the same
    // monitor any third-party writer coordinating on it would use).
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies
          .exists(_.isInstanceOf[graft.plans.PercolateStrategy]))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.PercolateStrategy(spark)
    }
    val probe = df.select(stored.zipWithIndex.map { case ((_, q), i) =>
      QueryCompiler.compileFor(df, q).as(s"__graft_p$i")
    }: _*)
    val (aliased, childPlan) = probe.queryExecution.analyzed match {
      case p: Project => (p.projectList, p.child)
      case other => throw new IllegalStateException(
        s"percolator probe did not analyze to a Project: ${other.nodeName}")
    }
    val preds = aliased.map {
      case a: Alias => a.child
      case e => e
    }
    val resolver = spark.sessionState.conf.resolver
    val idAttrs = idCols.map { n =>
      // all matches, not the first: a duplicate-named column (e.g. from a
      // join) must fail loudly here exactly as df.select(col(n)) would on
      // the fused path — never silently bind one side
      childPlan.output.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(s"unknown idCol '$n'")
        case many => throw new IllegalArgumentException(
          s"ambiguous idCol '$n': ${many.size} columns match")
      }
    }
    // prune the scan to idCols + the columns the registry references,
    // in child-output order (deterministic plan, parquet ReadSchema prunes)
    val refs = org.apache.spark.sql.catalyst.expressions.AttributeSet(
      idAttrs ++ preds.flatMap(_.references))
    val pruned =
      if (refs.size == childPlan.output.size) childPlan
      else Project(childPlan.output.filter(refs.contains), childPlan)
    val qidAttr = AttributeReference("query_id",
      org.apache.spark.sql.types.StringType, nullable = false)()
    ColumnBridge.ofRows(spark, graft.plans.PercolateNode(
      preds.grouped(maxPerProjection).toSeq, stored.map(_._1),
      idAttrs, qidAttr, pruned))
  }
}
