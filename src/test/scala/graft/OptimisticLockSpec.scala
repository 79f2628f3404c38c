package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.OptimisticLock

/** CAS truth table on hand-built rows: version agreement applies + bumps,
  * stale versions conflict without mutating, absent keys pass through, and
  * the MergeInto-style contract guards reject malformed batches. */
class OptimisticLockSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def fixture = {
    val spark2 = spark
    import spark2.implicits._
    val target = Seq( // (k, price, version)
      (1L, 10.0, 2L), (2L, 20.0, 5L), (3L, 30.0, 2L), (4L, 40.0, 0L))
      .toDF("k", "price", "version")
    val batch = Seq( // (k, expected_version, new_price)
      (1L, 2L, 99.0), // version agrees → applied
      (2L, 4L, 88.0), // stale → conflict
      (9L, 1L, 77.0)) // no such key → batch row simply has no effect
      .toDF("k", "expected_version", "new_price")
    (target, batch)
  }

  test("applied bumps the version, conflict and untouched leave the row") {
    val (target, batch) = fixture
    val got = OptimisticLock.casUpdate(target, batch, Seq("k"),
        "version", "expected_version", Map("price" -> "new_price"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got === Seq(
      (1L, 99.0, 3L, "applied"),
      (2L, 20.0, 5L, "conflict"),
      (3L, 30.0, 2L, "untouched"),
      (4L, 40.0, 0L, "untouched")))
  }

  test("duplicate batch keys, colliding columns, and typos are rejected") {
    val (target, batch) = fixture
    val dup = intercept[IllegalArgumentException] {
      OptimisticLock.casUpdate(target, batch.unionByName(batch), Seq("k"),
        "version", "expected_version", Map("price" -> "new_price"))
    }
    assert(dup.getMessage.contains("multiple rows"))
    val collide = intercept[IllegalArgumentException] {
      OptimisticLock.casUpdate(target, target, Seq("k"),
        "version", "expected_version", Map.empty)
    }
    assert(collide.getMessage.contains("collide"))
    val typo = intercept[IllegalArgumentException] {
      OptimisticLock.casUpdate(target, batch, Seq("k"),
        "version", "expected_version", Map("pricee" -> "new_price"))
    }
    assert(typo.getMessage.contains("typo"))
    val missing = intercept[IllegalArgumentException] {
      OptimisticLock.casUpdate(target, batch, Seq("k"),
        "version", "expected_versionn", Map("price" -> "new_price"))
    }
    assert(missing.getMessage.contains("missing"))
  }
}
