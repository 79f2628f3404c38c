package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AclRegistry

/** Plan-level ACL injection (the reference's getFilteredRepo overlay as a
  * SparkSessionExtensions resolution rule): every read path of an ACL'd
  * name is filtered, the predicate reaches the parquet scan, and clearing
  * the ACL restores full visibility. */
class AclSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def withAcl[A](table: String, pred: String)(body: => A): A = {
    AclRegistry.setAcl(table, pred)
    try body finally AclRegistry.clearAcl(table)
  }

  test("ACL filters every read path of the view and pushes to the scan") {
    Tables.t(spark, TestSession.sf, "orders").createOrReplaceTempView("acl_orders")
    val total = spark.table("acl_orders").count()
    val open = spark.table("acl_orders")
      .filter(col("o_orderstatus") === "O").count()
    assert(open > 0 && open < total)
    withAcl("acl_orders", "o_orderstatus = 'O'") {
      // raw table read
      assert(spark.table("acl_orders").count() === open)
      // SQL surface
      assert(spark.sql("SELECT count(*) AS n FROM acl_orders")
        .collect()(0).getLong(0) === open)
      // aggregation on top — predicate applies beneath
      val perPrio = spark.sql(
        "SELECT o_orderpriority, count(*) n FROM acl_orders GROUP BY 1")
        .collect().map(_.getLong(1)).sum
      assert(perPrio === open)
      // the injected predicate must reach the parquet scan as a pushed filter
      spark.catalog.clearCache()
      val plan = spark.table("acl_orders").queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("EqualTo(o_orderstatus,O)"),
        s"ACL predicate not pushed to scan:\n$plan")
    }
    // cleared → full visibility again
    assert(spark.table("acl_orders").count() === total)
  }

  test("self-join of an ACL'd view filters both sides") {
    Tables.t(spark, TestSession.sf, "orders").createOrReplaceTempView("acl_orders")
    withAcl("acl_orders", "o_orderkey <= 100") {
      val n = spark.sql(
        """SELECT count(*) AS n FROM acl_orders a
          |JOIN acl_orders b ON a.o_orderkey = b.o_orderkey""".stripMargin)
        .collect()(0).getLong(0)
      val direct = Tables.t(spark, TestSession.sf, "orders")
        .filter(col("o_orderkey") <= 100).count()
      assert(n === direct)
    }
  }

  test("ACL referencing an unknown column fails loudly, not silently") {
    Tables.t(spark, TestSession.sf, "nation").createOrReplaceTempView("acl_nation")
    withAcl("acl_nation", "no_such_col = 1") {
      val e = intercept[Exception](spark.table("acl_nation").count())
      assert(e.getMessage.contains("no_such_col"))
    }
  }
}
