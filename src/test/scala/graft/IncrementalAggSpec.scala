package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalAgg

/** IncrementalAgg edge semantics beyond q:cdc4's bulk contract: a key whose
  * last row is deleted drops out, a brand-new key appears from inserts
  * alone, an update leaves the count untouched, and maintenance equals
  * recomputation exactly (DECIMAL retraction). */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("delete-to-zero drops the key; insert-only key appears; update keeps count") {
    val s = spark
    import s.implicits._
    val oldAgg = Seq((1L, 2L, BigDecimal("30.00")), (2L, 1L, BigDecimal("5.00")))
      .toDF("k", "n", "total")
      .select(col("k"), col("n"), col("total").cast("decimal(18,2)").as("total"))
    val changes = Seq(
      ("d", 2L, Some(5.0), None),         // key 2's only row deleted
      ("i", 3L, None, Some(7.5)),         // key 3 born from an insert
      ("u", 1L, Some(10.0), Some(12.5))   // key 1 revalued, count unchanged
    ).toDF("op", "k", "old_v", "new_v")
    val got = IncrementalAgg.applyDelta(oldAgg, changes, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDecimal(2).toPlainString))).toMap
    assert(!got.contains(2L), "zero-count key must drop out")
    assert(got(3L) === ((1L, "7.50")))
    assert(got(1L) === ((2L, "32.50")))
  }

  test("maintenance equals recomputation on a random-ish changeset") {
    val s = spark
    import s.implicits._
    val base = spark.range(1, 301)
      .select(col("id"), (col("id") % 13).as("k"),
        (col("id") % 97 + 0.25).as("v"))
    val oldAgg = base.groupBy("k").agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,2)")).cast("decimal(18,2)").as("total"))
    val changes = base.filter(col("id") % 4 === 0)
      .select(lit("d").as("op"), col("k"), col("v").as("old_v"),
        lit(null).cast("double").as("new_v"))
      .unionByName(base.filter(col("id") % 4 === 1)
        .select(lit("u").as("op"), col("k"), col("v").as("old_v"),
          (col("v") * 2).as("new_v")))
      .unionByName(spark.range(1000, 1030)
        .select(lit("i").as("op"), (col("id") % 17 + 100).as("k"),
          lit(null).cast("double").as("old_v"), (col("id") + 0.5).as("new_v")))
    val maintained = IncrementalAgg.applyDelta(oldAgg, changes, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    // recompute from the post-change facts
    val recomputed = base.filter(col("id") % 4 =!= 0)
      .select(col("k"), when(col("id") % 4 === 1, col("v") * 2)
        .otherwise(col("v")).as("v"))
      .unionByName(spark.range(1000, 1030)
        .select((col("id") % 17 + 100).as("k"), (col("id") + 0.5).as("v")))
      .groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("decimal(18,2)").as("total"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    assert(maintained === recomputed)
  }
}
