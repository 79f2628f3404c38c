package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalJoin

/** Maintained-join contract: applyDelta(vOld, …) must equal the
  * from-scratch join of the post-change tables, for change batches
  * touching either side, both sides, or neither. */
class IncrementalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  // A: (id, k, pay) unique on id; B: (bid, battr) unique on bid; join A.k = B.bid
  private def mkA(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("a_id", "k", "pay")
  private def mkB(rows: Seq[(Long, String)]) =
    rows.toDF("b_id", "battr")

  private val aOldRows = Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 20L, 3.0),
    (4L, 30L, 4.0), (5L, 40L, 5.0))
  private val bOldRows = Seq((10L, "x"), (20L, "y"), (30L, "z"))

  private def recompute(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame) =
    a.join(b, col("k") === col("b_id"))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("a_id", "k", "pay", "b_id", "battr")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))

  test("changes on both sides: maintained equals recomputed") {
    val aOld = mkA(aOldRows)
    val bOld = mkB(bOldRows)
    val vOld = recompute(aOld, bOld)
    // A: delete 2, update 3 (pay 3.0→33.0, and REKEYED 20→30), insert 6→40
    val aNew = mkA(Seq((1L, 10L, 1.0), (3L, 30L, 33.0), (4L, 30L, 4.0),
      (5L, 40L, 5.0), (6L, 40L, 6.0)))
    // B: delete 10, update 30 (z→Z), insert 40
    val bNew = mkB(Seq((20L, "y"), (30L, "Z"), (40L, "w")))
    val v = IncrementalJoin.applyDelta(vOld, aNew, bNew,
      Seq(2L, 3L, 6L).toDF("a_id"), Seq(10L, 30L, 40L).toDF("b_id"),
      aKey = "a_id", bKey = "b_id", joinExpr = "k = b_id")
    assert(sortedRows(v) === sortedRows(recompute(aNew, bNew)))
    assert(v.count() > 0)
  }

  test("one-sided change batches and the empty batch") {
    val aOld = mkA(aOldRows)
    val bOld = mkB(bOldRows)
    val vOld = recompute(aOld, bOld)
    // only A changes
    val aNew = mkA(aOldRows.filterNot(_._1 == 1L) :+ (7L, 20L, 7.0))
    val vA = IncrementalJoin.applyDelta(vOld, aNew, bOld,
      Seq(1L, 7L).toDF("a_id"), Seq.empty[Long].toDF("b_id"),
      "a_id", "b_id", "k = b_id")
    assert(sortedRows(vA) === sortedRows(recompute(aNew, bOld)))
    // only B changes
    val bNew = mkB(Seq((10L, "X"), (20L, "y"), (30L, "z"), (40L, "n")))
    val vB = IncrementalJoin.applyDelta(vOld, aOld, bNew,
      Seq.empty[Long].toDF("a_id"), Seq(10L, 40L).toDF("b_id"),
      "a_id", "b_id", "k = b_id")
    assert(sortedRows(vB) === sortedRows(recompute(aOld, bNew)))
    // empty batch: the view survives untouched
    val v0 = IncrementalJoin.applyDelta(vOld, aOld, bOld,
      Seq.empty[Long].toDF("a_id"), Seq.empty[Long].toDF("b_id"),
      "a_id", "b_id", "k = b_id")
    assert(sortedRows(v0) === sortedRows(vOld))
  }

  test("ΔA ⋈ ΔB pairs are produced exactly once") {
    // a changed A row joining a changed B row is the double-count trap:
    // term 2 (ΔA ⋈ B_new) must produce it, term 3 must exclude it
    val aOld = mkA(Seq((1L, 10L, 1.0)))
    val bOld = mkB(Seq((10L, "x")))
    val vOld = recompute(aOld, bOld)
    val aNew = mkA(Seq((1L, 10L, 1.0), (2L, 50L, 2.0)))
    val bNew = mkB(Seq((10L, "x"), (50L, "q")))
    val v = IncrementalJoin.applyDelta(vOld, aNew, bNew,
      Seq(2L).toDF("a_id"), Seq(50L).toDF("b_id"),
      "a_id", "b_id", "k = b_id")
    assert(v.filter(col("a_id") === 2L).count() === 1L)
    assert(sortedRows(v) === sortedRows(recompute(aNew, bNew)))
  }

  test("contract violations are rejected loudly") {
    val aOld = mkA(aOldRows)
    val bOld = mkB(bOldRows)
    val vOld = recompute(aOld, bOld)
    intercept[IllegalArgumentException] {
      IncrementalJoin.applyDelta(vOld, aOld, bOld,
        Seq(1L).toDF("wrong_name"), Seq.empty[Long].toDF("b_id"),
        "a_id", "b_id", "k = b_id")
    }
    intercept[IllegalArgumentException] {
      IncrementalJoin.applyDelta(vOld.drop("battr"), aOld, bOld,
        Seq(1L).toDF("a_id"), Seq.empty[Long].toDF("b_id"),
        "a_id", "b_id", "k = b_id")
    }
  }
}
