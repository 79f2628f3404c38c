package graft.pipeline

import org.apache.spark.sql.DataFrame

/** X4 re-expression — the user-"script" stage surface.
  *
  * The reference ran user JavaScript per record through a Nashorn
  * interpreter (`aleph2_analytic_services_spark/.../assets/
  * SparkJsInterpreterTopology.java:76-170`, engine eval `:123-160`): the
  * script saw each input record and called an emit callback 0..N times,
  * because the platform's compiled surface was closed to users. Spark's
  * open runtime-authored surface is SQL expression strings — same
  * late-binding (strings supplied at job submission, not compile time), but
  * compiled by Catalyst into codegen'd projections instead of interpreted
  * per record, so pushdown/pruning/whole-stage codegen all still apply. At
  * 100 TB an interpreter in the row loop is exactly what you don't want;
  * this keeps the user-script contract without paying for one.
  *
  * Contract mapping:
  *  - stage-level `where`  = the script returning without emitting;
  *  - each [[Emit]]        = one `emit(obj)` call site: a full projection of
  *    the input record (any SQL expressions), optionally guarded by its own
  *    condition (`if (cond) emit(...)`);
  *  - several emits per record = union of the emit projections (all emits
  *    must project union-compatible schemas, checked by the analyzer);
  *  - 1→N explosion inside one emit = `explode(...)` in the projection.
  */
final case class Emit(exprs: Seq[String], where: Option[String] = None)

final case class ExprStage(emits: Seq[Emit], where: Option[String] = None) {
  require(emits.nonEmpty, "an ExprStage needs at least one emit")

  def run(df: DataFrame): DataFrame = {
    val base = where.map(df.filter).getOrElse(df)
    emits.map { em =>
      em.where.map(base.filter).getOrElse(base).selectExpr(em.exprs: _*)
    }.reduce(_.unionByName(_))
  }
}
