package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.PartitionedStore

/** The partitioned-rewrite contract (SCALE.md §5's upgrade path, shipped):
  * refresh writes ONLY the touched partitions, commits all of them in one
  * atomic manifest rename, and a failed refresh leaves the store
  * byte-identical. */
class PartitionedRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def newStore(n: Int = 8) = {
    val root = Files.createTempDirectory("graft_pstore").toString
    new PartitionedStore(spark, root, Seq("k"), n)
  }

  private def state(rows: Seq[(Long, Long)]) = rows.toDF("k", "v")

  test("init + read round-trips, including EMPTY initial state") {
    val ps = newStore()
    ps.init(state(Seq((1L, 10L), (2L, 20L), (3L, 30L))))
    assert(ps.read().orderBy("k").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // an empty init must still read back (schema-carrying store): this is
    // the day-zero state of every maintained rollup
    val ps0 = newStore()
    ps0.init(state(Nil).filter(lit(false)))
    assert(ps0.read().count() === 0L)
    assert(ps0.read().columns.toSeq === Seq("k", "v"))
    assert(ps0.readPartitions(Seq(0, 3)).count() === 0L)
  }

  test("refresh rewrites touched partitions only — untouched bytes identical") {
    val ps = newStore()
    val rows = (0L until 64L).map(i => (i, i * 10))
    ps.init(state(rows))
    val before = ps.manifest()
    // delta touches keys 1 and 2 only
    val delta = state(Seq((1L, 999L), (2L, 888L)))
    val touched = ps.touchedBy(delta)
    assert(touched.nonEmpty && touched.size <= 2)
    val untouched = before.keySet -- touched.toSet
    // new content of the touched partitions: everything they held, with
    // the delta applied
    val cur = ps.readPartitions(touched)
    val newPart = cur.join(delta.withColumnRenamed("v", "nv"), Seq("k"), "left")
      .select(col("k"), coalesce(col("nv"), col("v")).as("v"))
    ps.refresh(touched, newPart)
    val after = ps.manifest()
    // untouched partitions: the exact SAME physical dirs (no I/O at all)
    untouched.foreach(i => assert(after(i) === before(i), s"partition $i moved"))
    touched.foreach(i => assert(after(i) !== before(i), s"partition $i not refreshed"))
    // values: only the two keys changed
    val m = ps.read().as[(Long, Long)].collect().toMap
    assert(m(1L) === 999L && m(2L) === 888L)
    assert(m(5L) === 50L && m.size === 64)
  }

  test("a poisoned refresh leaves manifest and data untouched") {
    val ps = newStore()
    ps.init(state(Seq((1L, 10L), (2L, 20L))))
    val before = ps.manifest()
    val touched = ps.touchedBy(state(Seq((1L, 0L))))
    val poisoned = ps.readPartitions(touched).select(col("k"),
      when(lit(true), expr("raise_error('poison')")).cast("long").as("v"))
    intercept[Exception] { ps.refresh(touched, poisoned) }
    assert(ps.manifest() === before)
    assert(ps.read().orderBy("k").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 20L)))
    // and no orphan refresh dirs survive
    val stamps = Files.list(Paths.get(ps.root)).iterator()
    var orphans = 0
    while (stamps.hasNext) {
      val p = stamps.next().getFileName.toString
      if (p.startsWith("refresh")) orphans += 1
    }
    assert(orphans === 0)
  }

  test("a refresh row routed to an undeclared partition fails loudly") {
    val ps = newStore()
    ps.init(state(Seq((1L, 10L), (2L, 20L), (3L, 30L))))
    val touched = ps.touchedBy(state(Seq((1L, 0L))))
    // smuggle in a row for a key whose partition was NOT declared touched
    val other = (2L to 100L).find(k =>
      !touched.contains(ps.touchedBy(state(Seq((k, 0L)))).head)).get
    val bad = ps.readPartitions(touched)
      .unionByName(state(Seq((other, 1L))))
    val e = intercept[Exception] { ps.refresh(touched, bad) }
    assert(e.getMessage != null)
    assert(ps.read().count() === 3) // store unharmed
  }

  test("a schema-drifting refresh is rejected BEFORE any write") {
    // a decayed type (lost DECIMAL cast, renamed column) must not commit
    // parquet the pinned-schema read path can never decode again
    val ps = newStore()
    ps.init(state(Seq((1L, 10L), (2L, 20L))))
    val touched = ps.touchedBy(state(Seq((1L, 0L))))
    val drifted = ps.readPartitions(touched)
      .select(col("k"), col("v").cast("double").as("v"))
    val e = intercept[IllegalArgumentException] {
      ps.refresh(touched, drifted)
    }
    assert(e.getMessage.contains("pinned schema"))
    assert(ps.read().count() === 2) // store untouched
  }

  test("partition routing agrees between state and delta by construction") {
    val ps = newStore(16)
    val keys = (0L until 200L).map(k => Tuple1(k)).toDF("k")
    val ids = keys.select(ps.partitionId.as("p")).distinct()
      .as[Int].collect().toSet
    assert(ids.subsetOf((0 until 16).toSet))
    assert(ids.size > 8) // xxhash64 spreads across most partitions
  }
}
