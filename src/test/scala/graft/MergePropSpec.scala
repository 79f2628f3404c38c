package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeInto

/** Randomized MERGE semantics: the distributed three-clause dispatch must
  * agree with a trivially-correct Map-based reference evaluator across
  * random targets, sources, and clause combinations (fixed seed). */
class MergePropSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("randomized merges agree with a Map-based reference (fixed seed)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(1234)

    for (trial <- 1 to 8) {
      val nT = 30 + rnd.nextInt(40)
      val targetRows = (0 until nT).map { _ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(1000).toDouble, rnd.nextInt(5).toString)
      }.distinctBy(_._1) // unique target keys
      // unique source keys: some overlapping the target's range, some not
      val srcRows = rnd.shuffle((0 until 120).toList).take(25)
        .map(k => (k.toLong, rnd.nextInt(1000).toDouble, rnd.nextBoolean()))
      val withInsert = rnd.nextBoolean()
      val withDelete = rnd.nextBoolean()

      // reference evaluator: plain Map operations
      val expected = scala.collection.mutable.Map[Long, (Double, String)]()
      targetRows.foreach { case (k, p, st) => expected(k) = (p, st) }
      srcRows.foreach { case (k, np, del) =>
        if (expected.contains(k)) {
          if (withDelete && del) expected.remove(k)
          else expected(k) = (np, expected(k)._2)
        } else if (withInsert) expected(k) = (np, null)
      }

      val got = MergeInto.merge(
          targetRows.toDF("k", "price", "status"),
          srcRows.toDF("k", "new_price", "del"),
          Seq("k"),
          matchedDelete = if (withDelete) Some(col("del")) else None,
          matchedUpdate = Map("price" -> col("new_price")),
          notMatchedInsert =
            if (withInsert) Some(Map("price" -> col("new_price"))) else None)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getDouble(1), if (r.isNullAt(2)) null else r.getString(2)))
        .toMap
      assert(got === expected.toMap,
        s"trial $trial (insert=$withInsert delete=$withDelete) diverged")
    }
  }
}
