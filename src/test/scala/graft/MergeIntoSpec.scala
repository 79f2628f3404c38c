package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeInto

/** Three-clause MERGE semantics on hand-built rows: every clause fires,
  * delete wins over update, unlisted insert columns go null, and the
  * no-insert mode drops source-only keys. */
class MergeIntoSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def fixture = {
    val spark2 = spark
    import spark2.implicits._
    val target = Seq( // (k, price, status)
      (1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"), (4L, 40.0, "D"))
      .toDF("k", "price", "status")
    val source = Seq( // (k, new_price, del)
      (2L, 99.0, false), // matched → update
      (3L, 0.0, true),   // matched + flag → delete
      (9L, 55.0, false)) // not matched → insert
      .toDF("k", "new_price", "del")
    (target, source)
  }

  test("update, delete, insert, and carry-over all dispatch correctly") {
    val (target, source) = fixture
    val got = MergeInto.merge(target, source, Seq("k"),
        matchedDelete = Some(col("del")),
        matchedUpdate = Map("price" -> col("new_price")),
        notMatchedInsert = Some(Map("price" -> col("new_price"))))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got === Seq(
      (1L, 10.0, "A"),  // untouched target row carries over
      (2L, 99.0, "B"),  // updated price, status carried
      (4L, 40.0, "D"),  // untouched (3 was deleted)
      (9L, 55.0, null))) // inserted; unlisted status → null
  }

  test("without an insert clause, source-only keys are ignored") {
    val (target, source) = fixture
    val got = MergeInto.merge(target, source, Seq("k"),
        matchedDelete = Some(col("del")),
        matchedUpdate = Map("price" -> col("new_price")))
      .orderBy("k").select("k").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 2L, 4L))
  }

  test("duplicate source keys and unknown clause columns are rejected") {
    val (target, source) = fixture
    val dup = intercept[IllegalArgumentException] {
      MergeInto.merge(target, source.unionByName(source), Seq("k"),
        matchedUpdate = Map("price" -> col("new_price")))
    }
    assert(dup.getMessage.contains("multiple rows"))
    val typo = intercept[IllegalArgumentException] {
      MergeInto.merge(target, source, Seq("k"),
        matchedUpdate = Map("pricee" -> col("new_price")))
    }
    assert(typo.getMessage.contains("typo"))
  }

  test("colliding non-key columns and reserved names are rejected") {
    val (target, _) = fixture
    val badSource = target // same column names → collision
    val ex = intercept[IllegalArgumentException] {
      MergeInto.merge(target, badSource, Seq("k"))
    }
    assert(ex.getMessage.contains("collide"))
  }
}
