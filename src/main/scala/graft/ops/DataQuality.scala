package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality primitives for a landed corpus: column profiling and
  * rule-based expectation checks — the validation pass a pipeline runs
  * before promoting a snapshot (the reference's analog is per-record
  * handler-level validation in its harvest/enrichment handlers; here it is
  * whole-column aggregation in one scan).
  *
  * Scale: `profile` and `expectations` are each ONE aggregation job over
  * the table — no per-column scans, no driver-side iteration; the unpivot
  * to per-column/per-rule rows happens on the single aggregated row.
  * Referential checks ([[fkViolations]]) are an anti-join, broadcast when
  * the dimension is small.
  */
object DataQuality {

  /** Per-column stats — (col, n_rows, n_nulls, n_distinct, min_v, max_v) —
    * for the named columns, computed in one scan. min/max are rendered as
    * strings so heterogeneous column types fit one result schema. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct == cols, "duplicate columns requested")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such columns: ${missing.mkString(", ")}")
    // positional alias scheme (index, backquoted) so column names with
    // dots or other special characters can't break re-resolution
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(col(c)).as(s"__cnt_$i"),
      countDistinct(col(c)).as(s"__nd_$i"),
      min(col(c)).cast("string").as(s"__min_$i"),
      max(col(c)).cast("string").as(s"__max_$i"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__cnt_$i")).as("n_nulls"),
      col(s"__nd_$i").as("n_distinct"),
      col(s"__min_$i").as("min_v"),
      col(s"__max_$i").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Violation counts for named rules — (rule, n_violations) — where each
    * rule is a predicate that is TRUE for violating rows. One scan; a rule
    * over a null evaluates as non-violating unless the rule says
    * otherwise (use isNull explicitly for presence checks). */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "duplicate rule names")
    // coalesce OUTSIDE the sum too: over an empty frame sum() is NULL, and
    // an all-clean empty snapshot must report 0 violations (as the
    // count-based fkViolations shape already does), not null
    val aggs = rules.zipWithIndex.map { case ((_, p), i) =>
      coalesce(sum(when(coalesce(p, lit(false)), 1L).otherwise(0L)), lit(0L))
        .as(s"__v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("rule"), col(s"__v_$i").as("n_violations"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Referential-integrity rule: rows of `df` whose `fkCol` has no match in
    * `dim.dimKey`. Returns the same (rule, n_violations) shape so it unions
    * with [[expectations]]. The dimension side is broadcast when small —
    * exactly the plan a semi-join validation should have. */
  def fkViolations(df: DataFrame, fkCol: String, dim: DataFrame,
      dimKey: String, rule: String): DataFrame =
    df.join(dim.select(col(dimKey).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))
}
