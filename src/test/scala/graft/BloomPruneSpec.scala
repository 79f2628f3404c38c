package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BloomPrune

/** Bloom-prune invariants: no false negatives (every true match survives
  * the pre-filter), exactness of the follow-up semi-join, and the pruning
  * actually shrinking the probe side. */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("pruning drops no true match and the semi-join is exact") {
    val spark2 = spark
    import spark2.implicits._
    // probe keys 0..9999; build keeps multiples of 97 (selective)
    val probe = (0L until 10000L).toDF("k")
    val build = (0L until 10000L).filter(_ % 97 == 0).toDF("bk")

    val bf = BloomPrune.buildFilter(build, "bk", expectedNumItems = 1000L)
    val pruned = BloomPrune.prunedOnly(probe, "k", bf)
      .as[Long].collect().toSet
    val expected = (0L until 10000L).filter(_ % 97 == 0).toSet
    assert(expected.subsetOf(pruned), "bloom produced a false negative")
    // fpp=0.03 over ~9.9k non-members: expect far fewer than 10% leaks
    assert(pruned.size < 1500, s"bloom pruned nothing: ${pruned.size}")

    val exact = BloomPrune.semiJoin(probe, build, "k", "bk",
      expectedNumItems = 1000L).as[Long].collect().toSet
    assert(exact === expected)
  }

  test("null probe keys never match") {
    val spark2 = spark
    import spark2.implicits._
    val probe = Seq(Some(1L), None, Some(2L)).toDF("k")
    val build = Seq(1L).toDF("bk")
    val bf = BloomPrune.buildFilter(build, "bk", expectedNumItems = 10L)
    val got = BloomPrune.prunedOnly(probe, "k", bf)
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }
}
