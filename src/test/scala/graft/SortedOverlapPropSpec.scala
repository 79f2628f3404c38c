package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.OverlapExprFunctions.sorted_overlap

/** Property check of the merge-intersection verify expression against a
  * naive set-intersection reference: for random string multisets and
  * thresholds, (a) a returned non-negative count equals the exact distinct
  * intersection size, (b) -1 (early reject) appears ONLY when the true
  * count is below the threshold, and (c) any pair meeting the threshold
  * always gets its exact count — the invariant OverlapJoin's correctness
  * rests on. Evaluated through Spark (codegen path), not by calling the
  * eval directly. */
object SortedOverlapPropSpec extends Properties("SortedOverlap") {
  private lazy val spark = TestSession.spark

  private val genSet: Gen[Seq[String]] = for {
    n <- Gen.chooseNum(0, 30)
    // small alphabet on purpose: real overlaps at every threshold
    s <- Gen.listOfN(n, Gen.oneOf((1 to 12).map(i => s"e$i")))
  } yield s

  private val genCase: Gen[(Seq[String], Seq[String], Int)] = for {
    a <- genSet; b <- genSet; t <- Gen.chooseNum(0, 12)
  } yield (a, b, t)

  property("count exact or early-reject only below threshold (codegen path)") =
    Prop.forAll(Gen.listOfN(20, genCase)) { cases =>
      val s = spark
      import s.implicits._
      val df = cases.zipWithIndex
        .map { case ((a, b, t), i) => (i, a, b, t) }
        .toDF("i", "a", "b", "t")
        .select(col("i"), sorted_overlap(
          array_sort(array_distinct(col("a"))),
          array_sort(array_distinct(col("b"))), col("t")).as("ov"))
      val got = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      cases.zipWithIndex.forall { case ((a, b, t), i) =>
        val truth = (a.toSet & b.toSet).size
        val ov = got(i)
        if (truth >= t) ov == truth // threshold met -> EXACT, never rejected
        else ov == truth || ov == -1 // below: exact or early reject
      }
    }
}
