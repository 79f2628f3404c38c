package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.top_k

/** Bounded-heap top-k aggregate: agreement with the window formulation,
  * partition-order independence, O(k)-state behavior on a hot key, null
  * handling, and the map-side partial plan shape. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("agrees with row_number window top-k on every key, any partitioning") {
    val rows = (1L to 500L).map(i => (i % 7, i * 37 % 101, i)) // (key, v, tiebreak id)
    for (nPart <- Seq(1, 3, 13)) {
      val df = rows.toDF("k", "v", "id").repartition(nPart)
      val got = df.groupBy("k")
        .agg(top_k(struct(col("v"), (-col("id")).as("ni")), 5).as("tk"))
        .select(col("k"), posexplode(col("tk")).as(Seq("pos", "t")))
        .select(col("k"), col("t.v").as("v"), (-col("t.ni")).as("id"),
          (col("pos") + 1).as("rnk"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("v").desc, col("id"))
      val want = rows.toDF("k", "v", "id")
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      assert(got.orderBy("k", "rnk").collect().toSeq ===
        want.select("k", "v", "id", "rnk").orderBy("k", "rnk").collect().toSeq,
        s"nPart=$nPart")
    }
  }

  test("a hot key yields exactly k results; k larger than the group is fine") {
    // 100k rows on ONE key: collect_list-style state would hold all of
    // them; the heap holds 3
    val hot = spark.range(100000).select(lit(0L).as("k"), col("id").as("v"))
    val r = hot.groupBy("k").agg(top_k(col("v"), 3).as("tk"))
      .select(col("tk")).head().getSeq[Long](0)
    assert(r === Seq(99999L, 99998L, 99997L))
    // k > group size: all elements, still descending
    val small = Seq((1L, 5L), (1L, 9L)).toDF("k", "v")
    assert(small.groupBy("k").agg(top_k(col("v"), 10).as("tk"))
      .head().getSeq[Long](1) === Seq(9L, 5L))
  }

  test("nulls are skipped; empty input gives an empty array") {
    val df = Seq[(Long, java.lang.Long)]((1L, 7L), (1L, null), (1L, 3L))
      .toDF("k", "v")
    assert(df.groupBy("k").agg(top_k(col("v"), 2).as("tk"))
      .head().getSeq[Long](1) === Seq(7L, 3L))
    val none = df.filter(col("v").isNull)
    assert(none.groupBy("k").agg(top_k(col("v"), 2).as("tk"))
      .head().getSeq[Long](1) === Seq.empty)
  }

  test("strings and structs order correctly through serialization") {
    val df = Seq((1L, "pear"), (1L, "apple"), (1L, "zucchini"), (1L, "fig"))
      .toDF("k", "s").repartition(4) // forces partial-buffer serialize/merge
    assert(df.groupBy("k").agg(top_k(col("s"), 2).as("tk"))
      .head().getSeq[String](1) === Seq("zucchini", "pear"))
  }

  test("k must be a positive literal; unorderable types are rejected") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    intercept[Exception] {
      df.groupBy("k").agg(top_k(col("v"), 0).as("tk")).collect()
    }
    intercept[Exception] {
      df.select(map(col("k"), col("v")).as("m"), col("k"))
        .groupBy("k").agg(top_k(col("m"), 2).as("tk")).collect()
    }
  }

  test("plan: ObjectHashAggregate with a map-side partial_top_k pass") {
    val df = Seq((1L, 2L), (2L, 3L)).toDF("k", "v")
      .groupBy("k").agg(top_k(col("v"), 2).as("tk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_top_k"), plan)
  }
}
