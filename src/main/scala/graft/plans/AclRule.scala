package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** Bucket-ACL predicate registry: table/view name → boolean SQL predicate
  * enforced on every read of that name (SURVEY §4 "custom Catalyst,
  * optional": the reference's auth/project overlay `getFilteredRepo`,
  * `aleph2_crud_service_mongodb/.../MongoDbCrudService.java:207-213` — its
  * ES twin is unimplemented, `ElasticsearchCrudService.java:364-369`; the
  * legacy V1 source hard-injects the same community-ACL shape,
  * `aleph2_document_service_v1/.../LegacyV1HadoopUtils.java:52-190`).
  *
  * Enforcement at the PLAN level (not a wrapper API) means no query path —
  * DSL, SQL surface, or raw `spark.table` — can bypass it, and because the
  * predicate lands directly above the relation Catalyst pushes it into the
  * parquet scan like any user filter.
  */
object AclRegistry {
  private val acls = TrieMap.empty[String, String]
  def setAcl(table: String, predicateSql: String): Unit =
    acls.put(table.toLowerCase, predicateSql)
  def clearAcl(table: String): Unit = acls.remove(table.toLowerCase)
  def clear(): Unit = acls.clear()
  def get(table: String): Option[String] = acls.get(table.toLowerCase)
}

/** Analyzer rule: wrap each resolved `SubqueryAlias` whose name carries an
  * ACL with a Filter on that predicate. Idempotent under the resolution
  * fixpoint (skips when the identical filter is already in place), so it
  * composes with view nesting and self-joins (each aliased occurrence gets
  * its own copy, which is exactly row-level-security semantics). */
case class AclInjectionRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case s @ SubqueryAlias(id, child) if child.resolved =>
        AclRegistry.get(id.name) match {
          case Some(predSql) =>
            child match {
              // idempotency marker: the injected Filter is tagged, and tags
              // survive the later rewrites of its condition (type coercion
              // casts literals; DeduplicateRelations re-instances exprIds on
              // self-join duplicates) that defeat any structural comparison
              case f: Filter if f.getTagValue(AclInjectionRule.InjectedTag).isDefined => s
              case _ =>
                val f = Filter(resolveAgainst(predSql, child), child)
                f.setTagValue(AclInjectionRule.InjectedTag, ())
                s.copy(child = f)
            }
          case None => s
        }
    }

  /** Parse the predicate and bind its attributes to the child's output —
    * self-contained resolution so the rule is order-independent within the
    * analyzer batch. */
  private def resolveAgainst(predSql: String, child: LogicalPlan): Expression = {
    val resolver = spark.sessionState.conf.resolver
    spark.sessionState.sqlParser.parseExpression(predSql).transformUp {
      case ua: UnresolvedAttribute =>
        child.output.find(a => resolver(a.name, ua.name)).getOrElse(
          throw new IllegalArgumentException(
            s"ACL predicate '$predSql' references unknown column '${ua.name}'"))
    }
  }
}

/** Session extension entry point:
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(AclInjectionRule.apply)
    ext.injectPlannerStrategy(PercolateStrategy.apply)
  }
}

object AclInjectionRule {
  val InjectedTag: org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit] =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.acl.injected")
}
