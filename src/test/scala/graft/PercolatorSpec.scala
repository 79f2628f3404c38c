package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dsl.Query
import graft.ops.Percolator

/** Percolation semantics: multi-match fan-out, NULL-predicate exclusion
  * (a NULL-valued clause is a non-match, the WHERE-clause rule), no row
  * for non-matching records, and the duplicate-id guard. */
class PercolatorSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def df() = {
    val s = spark; import s.implicits._
    Seq[(Long, String, java.lang.Double)](
      (1L, "purchase", 150.0),
      (2L, "click", 2.0),
      (3L, "view", 50.0),
      (4L, "purchase", null)
    ).toDF("event_id", "event_type", "value")
  }

  private val registry = Seq(
    "q_buy" -> Query.allOf().when("event_type", "purchase"),
    "q_pricey" -> Query.allOf().rangeAbove("value", 100.0),
    "q_cheap_click" -> Query.allOf()
      .when("event_type", "click").rangeBelow("value", 5.0))

  test("multi-match fan-out; non-matching and NULL-valued rows excluded") {
    val out = Percolator.matches(df(), registry, Seq("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set(
      (1L, "q_buy"), (1L, "q_pricey"), // row 1 matches two stored queries
      (2L, "q_cheap_click"),
      (4L, "q_buy"))) // NULL value: q_pricey is a non-match, q_buy still hits
    // row 3 matches nothing -> absent entirely (no null-padded row)
  }

  test("duplicate stored-query ids are rejected at plan time") {
    val dup = registry :+ ("q_buy" -> Query.allOf().when("event_type", "x"))
    val e = intercept[IllegalArgumentException] {
      Percolator.matches(df(), dup, Seq("event_id"))
    }
    assert(e.getMessage.contains("q_buy"))
  }

  test("meta riders (limit/orderBy/projection) are rejected at plan time") {
    val withLimit = registry :+
      ("q_capped" -> Query.allOf().when("event_type", "error").limit(10))
    val e = intercept[IllegalArgumentException] {
      Percolator.matches(df(), withLimit, Seq("event_id"))
    }
    // a limit would need global state to honor; silently ignoring it
    // would under-deliver alerts — the guard must name the offender
    assert(e.getMessage.contains("q_capped"))
    // ...including one buried inside a MultiQuery component, which the
    // compiler would otherwise silently discard
    val nested = registry :+ ("q_nested" -> Query.or(
      Query.allOf().when("event_type", "error").limit(10),
      Query.allOf().when("event_type", "view")))
    val e2 = intercept[IllegalArgumentException] {
      Percolator.matches(df(), nested, Seq("event_id"))
    }
    assert(e2.getMessage.contains("q_nested"))
  }
}
