package graft.sources

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.dsl.{Query, QueryCompiler, SingleQuery}

/** S7: the legacy V1 document-DB input — a JSON "query + control fields"
  * object (`aleph2_document_service_v1/.../utils/LegacyV1HadoopUtils.java:
  * 52-190`): control keys `:tmin`, `:tmax`, `:fields`, `:limit`, `:splits`,
  * `:docsPerSplit` ride alongside ordinary field equality predicates; the
  * service injected source-ACL + soft-delete filters before running.
  *
  * Spark-first mapping: control keys → time-range filter, projection, limit,
  * `repartition(splits)`; remaining keys → DSL equality clauses; the
  * ACL/soft-delete injection seam is an extra predicate AND-ed in (the
  * `getFilteredRepo` overlay). Split sizing beyond partition count is
  * Spark's own scheduling.
  */
final case class LegacyQuery(
    filters: Map[String, Any] = Map.empty,
    tmin: Option[java.sql.Timestamp] = None,
    tmax: Option[java.sql.Timestamp] = None,
    fields: Seq[String] = Nil,
    limit: Option[Int] = None,
    splits: Option[Int] = None)

object LegacyQuerySource {

  /** Parse the legacy control-object form (flat key→value map with `:`-
    * prefixed control keys; values already typed by the caller). */
  def parse(obj: Map[String, Any]): LegacyQuery = {
    def ts(v: Any): java.sql.Timestamp = v match {
      case t: java.sql.Timestamp => t
      case l: Long => new java.sql.Timestamp(l)
      case s: String => java.sql.Timestamp.valueOf(s)
      case other => throw new IllegalArgumentException(s"bad time: $other")
    }
    LegacyQuery(
      filters = obj.view.filterKeys(!_.startsWith(":")).toMap,
      tmin = obj.get(":tmin").map(ts),
      tmax = obj.get(":tmax").map(ts),
      fields = obj.get(":fields").map(_.asInstanceOf[Seq[String]]).getOrElse(Nil),
      limit = obj.get(":limit").map(_.asInstanceOf[Number].intValue()),
      splits = obj.get(":splits").map(_.asInstanceOf[Number].intValue()))
  }

  /** Apply to a table: equality filters + time range on `timeField` +
    * injected extra predicate (ACL / soft-delete seam) + projection + limit
    * + split repartition. */
  def run(df: DataFrame, q: LegacyQuery, timeField: String,
      injected: Option[Column] = None): DataFrame = {
    var dsl: SingleQuery = q.filters.foldLeft(Query.allOf()) {
      case (acc, (f, v)) => acc.when(f, v)
    }
    q.tmin.foreach(t => dsl = dsl.rangeAbove(timeField, t))
    q.tmax.foreach(t => dsl = dsl.rangeBelow(timeField, t))
    var out = df.filter(QueryCompiler.compile(dsl) && injected.getOrElse(lit(true)))
    if (q.fields.nonEmpty) out = out.select(q.fields.map(col): _*)
    q.limit.foreach(n => out = out.limit(n))
    q.splits.foreach(n => out = out.repartition(n))
    out
  }
}
