package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._
import graft.queries.PipelineQueries

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private lazy val docs = Tables.t(spark, TestSession.sf, "documents").cache()

  test("A1 narrow stage: flatMap semantics, no shuffle in plan") {
    val out = Pipeline.run(docs, Seq(
      PipelineStage(new PipelineQueries.DocFilterEnrichStage, StageConfig(batchSize = 10))))
    val expected = docs.filter(col("n_chars") >= 200).count()
    assert(out.count() === expected)
    assert(out.columns.contains("lang_uc"))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "narrow stage must not shuffle")
  }

  test("A3 grouped reduce matches groupBy aggregation") {
    val out = Pipeline.run(docs, Seq(
      PipelineStage(new PipelineQueries.DocGroupReduceStage,
        StageConfig(groupingFields = Seq("source", "lang"))))) // unsorted on purpose
    val expected = docs.groupBy("lang", "source")
      .agg(sum("n_chars").as("total_chars"), count(lit(1)).as("n_docs"))
    assert(out.count() === expected.count())
    val got = out.orderBy("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val exp = expected.orderBy("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === exp.toSeq)
  }

  test("A4 combiner on == combiner off (associativity gate)") {
    def run(useCombiner: Boolean) =
      Pipeline.run(docs.repartition(7), Seq(
        PipelineStage(new PipelineQueries.CombinableSumStage,
          StageConfig(groupingFields = Seq("lang"), useCombiner = useCombiner))))
        .select("doc_id", "lang", "n_chars").orderBy("lang").collect().toSeq
    assert(run(true) === run(false))
  }

  test("non-combinable module never runs as combiner") {
    // a module that is order/partition-sensitive (emits batch count) must
    // produce the single-group answer even with useCombiner requested
    class CountStage extends EnrichStage {
      def onObjectBatch(batch: Seq[Row], groupKey: Option[Row]): Iterator[Row] =
        Iterator(Row(batch.head.get(0), batch.head.get(1), batch.head.get(2),
          batch.head.get(3), batch.size.toLong))
    }
    val out = Pipeline.run(docs.repartition(5), Seq(
      PipelineStage(new CountStage,
        StageConfig(groupingFields = Seq("lang"), useCombiner = true))))
    val expected = docs.groupBy("lang").count()
    val got = out.select("lang", "n_chars").orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val exp = expected.orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exp)
  }

  test("combinable grouped stage folds a hot key through bounded chunks") {
    // one group of 500 rows >> batchSize: the grouped stage must fold
    // chunk-by-chunk (re-feeding the partial), emitting ONE final row —
    // never buffering the whole group
    class SumStage extends EnrichStage {
      override def combinable: Boolean = true
      def onObjectBatch(batch: Seq[Row], groupKey: Option[Row]): Iterator[Row] =
        Iterator(Row(batch.head.getString(0), batch.map(_.getLong(1)).sum))
    }
    val df = docs.select(lit("k").as("g"), col("n_chars"))
    val out = Pipeline.run(df.repartition(7), Seq(
      PipelineStage(new SumStage,
        StageConfig(batchSize = 37, groupingFields = Seq("g"), useCombiner = true))))
    val rows = out.collect()
    assert(rows.length === 1, "fold must collapse to one row per group")
    assert(rows.head.getLong(1) ===
      docs.agg(sum("n_chars")).head().getLong(0))
  }

  test("dot-path key extraction resolves nested structs") {
    val nested = docs.select(struct(col("lang"), struct(col("source").as("s")).as("inner")).as("meta"), col("n_chars"))
    val k = KeyExtractor.resolve(nested.head(), nested.schema, "meta.inner.s")
    assert(k.isInstanceOf[String])
  }

  test("non-associative hot key fails loudly at maxGroupBuffer, naming the key") {
    // whole-group contract: a skewed key must hit the explicit cap (with the
    // key name in the error), not an executor OOM
    class WholeGroupStage extends EnrichStage {
      def onObjectBatch(batch: Seq[Row], groupKey: Option[Row]): Iterator[Row] =
        Iterator(batch.head)
    }
    val hot = docs.select(lit("hotlang").as("g"), col("n_chars"))
    val ex = intercept[org.apache.spark.SparkException] {
      Pipeline.run(hot, Seq(
        PipelineStage(new WholeGroupStage,
          StageConfig(name = "whole", groupingFields = Seq("g"),
            maxGroupBuffer = 50)))).count()
    }
    val msg = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => String.valueOf(e.getMessage)).mkString(" | ")
    assert(msg.contains("hotlang") && msg.contains("maxGroupBuffer"),
      s"error must name the hot key: $msg")
    // under the cap the same stage runs fine
    val ok = Pipeline.run(hot, Seq(
      PipelineStage(new WholeGroupStage,
        StageConfig(name = "whole", groupingFields = Seq("g"))))).count()
    assert(ok === 1)
  }

  test("at most one grouping stage enforced") {
    intercept[IllegalArgumentException] {
      Pipeline.run(docs, Seq(
        PipelineStage(new PassthroughStage, StageConfig(groupingFields = Seq("lang"))),
        PipelineStage(new PassthroughStage, StageConfig(groupingFields = Seq("source")))))
    }
  }
}
