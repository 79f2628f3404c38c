package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{Ann, KMeans, RotatingIvfIndex, RotatingIvfPqIndex}

/** Online rebuild with serving continuity (q:ann17): the pointer swap is
  * the promote, serves resolve old-or-new generations atomically (never a
  * mix), appends land in the live generation, and stale generations are
  * reclaimed with one-predecessor grace. */
class RotatingIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private lazy val emb = Tables.t(spark, TestSession.sf, "embeddings").cache()

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "c_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def gens(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(root))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("gen")).toSet finally s.close()
  }

  test("build → serve is exact; rebuild with a RETRAINED quantizer swaps " +
      "atomically; appends land in the live generation; old gens reclaimed " +
      "with one-predecessor grace") {
    val root = Files.createTempDirectory("graft_rotivf").toString
    val rot = new RotatingIvfIndex(spark, root, nPartitions = 8)
    val half = emb.filter(col("vec_id") % 2 === 0)
    rot.build(half, KMeans.train(half, "vec_id", "embedding", k = 8, iters = 2))
    val q = emb.filter(col("vec_id") < 8)
    assert(pairs(rot.serve(q, k = 3, nprobe = 8)) ===
      pairs(Ann.bruteForceTopK(q, half, k = 3)))
    assert(gens(root).size === 1)
    val g1 = rot.currentGen()
    // drift past the ceiling names the online-rebuild remediation
    val shifted = emb.filter(col("vec_id") % 2 === 1)
      .withColumn("embedding", transform(col("embedding"), x => x + lit(25.0f)))
    val e = intercept[IllegalStateException] {
      rot.append(shifted, maxDriftRatio = 3.0)
    }
    assert(e.getMessage.contains("RotatingIvfIndex.rebuild"))
    // the rebuild: full corpus, retrained centroids, no blackout
    rot.rebuild(emb, KMeans.train(emb, "vec_id", "embedding", k = 8, iters = 2))
    assert(rot.currentGen() !== g1)
    assert(gens(root) === Set(g1, rot.currentGen()), "predecessor retained")
    assert(pairs(rot.serve(q, k = 3, nprobe = 8)) ===
      pairs(Ann.bruteForceTopK(q, emb, k = 3)))
    // append now lands in the NEW generation under ITS frozen quantizer
    val extra = emb.filter(col("vec_id") < 4)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val ratio = rot.append(extra)
    assert(ratio > 0.0 && ratio < 4.0)
    assert(rot.current()._1.store.read()
      .filter(col("vec_id") >= 1000000L).count() === extra.count())
    // a third generation reclaims the first (one-predecessor grace)
    val g2 = rot.currentGen()
    rot.rebuild(emb, KMeans.train(emb, "vec_id", "embedding", k = 8, iters = 2))
    assert(gens(root) === Set(g2, rot.currentGen()))
  }

  test("PQ rotator: retrain re-freezes quantizer AND codebooks together; " +
      "serves stay exact across the swap; appends land in the new " +
      "generation under its own frozen models") {
    val root = Files.createTempDirectory("graft_rotpq").toString
    val rot = new RotatingIvfPqIndex(spark, root, nPartitions = 8,
      m = 8, k = 16)
    val half = emb.filter(col("vec_id") % 2 === 0)
    rot.build(half, KMeans.train(half, "vec_id", "embedding", k = 8, iters = 2))
    val q = emb.filter(col("vec_id") < 8)
    assert(pairs(rot.serve(q, kTop = 3, nprobe = 8, rerank = Int.MaxValue))
      === pairs(Ann.bruteForceTopK(q, half, k = 3)))
    val g1 = rot.currentGen()
    // the swap: full corpus, retrained centroids, NEW codebooks trained on
    // the new residuals — all frozen inside the promoted generation
    rot.rebuild(emb, KMeans.train(emb, "vec_id", "embedding", k = 8, iters = 2))
    assert(rot.currentGen() !== g1)
    assert(gens(root) === Set(g1, rot.currentGen()), "predecessor retained")
    assert(pairs(rot.serve(q, kTop = 3, nprobe = 8, rerank = Int.MaxValue))
      === pairs(Ann.bruteForceTopK(q, emb, k = 3)))
    // append encodes under the NEW generation's frozen models and serves
    // exactly alongside the rebuilt corpus
    val extra = emb.filter(col("vec_id") < 4)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val ratio = rot.append(extra)
    assert(ratio > 0.0 && ratio < 4.0)
    assert(rot.current()._1.store.read()
      .filter(col("vec_id") >= 1000000L).count() === extra.count())
    // erasure + bounded-config recall still hold through the rotator
    assert(rot.remove(extra) === extra.count())
    val exact = rot.serve(q, kTop = 3, nprobe = 2, rerank = 16)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Ann.bruteForceTopK(q, emb, k = 3)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & want).size.toDouble / want.size
    assert(recall >= 0.5, s"post-rotation bounded recall@3 = $recall")
  }

  test("a serve racing a live rebuild reads the OLD generation or the NEW " +
      "one end-to-end — never a mix of quantizer and data") {
    val root = Files.createTempDirectory("graft_rotivf").toString
    val rot = new RotatingIvfIndex(spark, root, nPartitions = 4)
    val a = emb.filter(col("vec_id") % 2 === 0)
    rot.build(a, KMeans.train(a, "vec_id", "embedding", k = 4, iters = 2))
    val q = emb.filter(col("vec_id") < 4)
    val exactA = pairs(Ann.bruteForceTopK(q, a, k = 3))
    val exactB = pairs(Ann.bruteForceTopK(q, emb, k = 3))
    assert(exactA !== exactB, "race fixture degenerate: halves rank equal")
    @volatile var failure: Option[String] = None
    @volatile var sawOld = false
    @volatile var sawNew = false
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val server = new Thread(() => {
      try while (!done.get()) {
        val got = pairs(rot.serve(q, k = 3, nprobe = 4))
        if (got == exactA) sawOld = true
        else if (got == exactB) sawNew = true
        else { failure = Some(s"mixed serve result: $got"); done.set(true) }
      } catch { case t: Throwable =>
        failure = Some(s"serve threw during rebuild: $t"); done.set(true) }
    })
    server.start()
    try {
      // wait until the server has COMPLETED a pre-swap serve (a fixed
      // sleep would flake on a loaded machine whose first cold serve
      // outlives the rebuild), then swap under it
      val t0 = System.nanoTime()
      while (!sawOld && failure.isEmpty &&
        (System.nanoTime() - t0) < 120e9) Thread.sleep(50)
      assert(sawOld || failure.nonEmpty, "no serve completed in 120s")
      rot.rebuild(emb, KMeans.train(emb, "vec_id", "embedding", k = 4, iters = 2))
      // and let it observe the new one
      val t1 = System.nanoTime()
      while (!sawNew && failure.isEmpty &&
        (System.nanoTime() - t1) < 60e9) Thread.sleep(50)
    } finally { done.set(true); server.join(120000) }
    assert(failure.isEmpty, failure.getOrElse(""))
    assert(sawOld, "race never observed the pre-swap generation")
    assert(sawNew, "race never observed the post-swap generation")
  }
}
