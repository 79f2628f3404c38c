package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bpe, GraftFunctions}

/** Pins the BPE trainer's merge choices on a hand-computed corpus (the
  * oracle can only see the roundtrip/compression verdicts), the shared
  * merge-pass semantics on overlap edge cases, and encode/decode inverses
  * including words untouched by any merge. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("mergePass: left-to-right, non-overlapping") {
    assert(Bpe.mergePass(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergePass(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
    assert(Bpe.mergePass(Vector("x", "y"), "a", "b") == Vector("x", "y"))
    assert(Bpe.mergePass(Vector("a", "b", "a", "b"), "a", "b") == Vector("ab", "ab"))
  }

  test("train learns the most frequent pair first, ties break lexicographically") {
    // corpus: "ab ab ab cd cd" — pair (a,b) freq 3 beats (c,d) freq 2;
    // every word also pairs its last char with </w>: (b,</w>) freq 3 ties
    // (a,b) at 3 → lexicographic tiebreak picks (a,b) first
    val docs = Seq("ab ab ab cd cd").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 3)
    assert(merges.head == (("a", "b")))
    assert(merges.contains(("ab", Bpe.Eow)) || merges.contains(("b", Bpe.Eow)))
    assert(merges.size == 3)
  }

  test("train stops early when no pair repeats") {
    val docs = Seq("xy").toDF("text") // every pair occurs once
    assert(Bpe.train(docs, "text", numMerges = 5).isEmpty)
  }

  test("encode applies merges in priority order; decode inverts") {
    val merges = Seq(("a", "b"), ("ab", Bpe.Eow), ("c", "d"))
    val out = Seq(("ab cd xab")).toDF("t")
      .select(GraftFunctions.bpe_encode(col("t"), merges).as("u"),
        GraftFunctions.bpe_decode(
          GraftFunctions.bpe_encode(col("t"), merges)).as("rt"))
    val (units, rt) = out.as[(Seq[String], String)].head()
    assert(units == Seq("ab</w>", "cd", "</w>", "x", "ab</w>"))
    assert(rt == "ab cd xab")
  }

  test("roundtrip holds with zero merges and on the real corpus slice") {
    val docs = Tables.t(spark, TestSession.sf, "documents").limit(50)
    val merges = Bpe.train(docs, "text", numMerges = 6)
    assert(merges.nonEmpty)
    val bad = docs.select(
        (GraftFunctions.bpe_decode(GraftFunctions.bpe_encode(col("text"), merges))
          === col("text")).as("ok"))
      .filter(!col("ok")).count()
    assert(bad == 0)
    val badEmpty = docs.select(
        (GraftFunctions.bpe_decode(GraftFunctions.bpe_encode(col("text"), Nil))
          === col("text")).as("ok"))
      .filter(!col("ok")).count()
    assert(badEmpty == 0)
  }
}
