package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{Ann, IvfPq, KMeans, Pq}

/** IVF-PQ composition: residual reconstruction identity, exhaustive-config
  * exactness (the oracle contract), and recall of a genuinely-approximate
  * configuration. */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def parts = {
    val e = Tables.t(spark, TestSession.sf, "embeddings")
    val cents = KMeans.train(e, "vec_id", "embedding", k = 4, iters = 2)
    val res = IvfPq.residuals(e, "vec_id", "embedding", cents)
    val books = Pq.train(res, "id", "res", m = 8, k = 16, iters = 2)
    val enc = Pq.encode(res, "res", books).select("id", "cent", "code")
    (e, cents, res, books, enc)
  }

  test("residuals are v - cv of the OPTIMAL cell (argmin l2, ties low)") {
    val (e, cents, res, _, _) = parts
    val cv = cents.select(col("cent_id").as("cent"), col("cent_vec").as("cv"))
    val joined = res.join(cv, "cent")
      .join(e.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")), "id")
    // stored residual is exactly the elementwise v - cv of the assigned cell
    val badRes = joined.filter(expr(
      "exists(zip_with(res, zip_with(v, cv, (a, b) -> a - b), " +
        "(x, y) -> x <> y), t -> t)"))
    assert(badRes.count() === 0)
    // the assigned cell minimizes l2 distance (ties to the lower cent id)
    import graft.functions.VectorFunctions.l2sq
    val best = res.select(col("id"), col("cent").as("assigned"))
      .join(broadcast(cv))
      .join(e.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")), "id")
      .groupBy("id", "assigned")
      .agg(min(struct(l2sq(col("v"), col("cv")).as("d2"),
        col("cent").as("bc"))).as("m"))
      .filter(col("m.bc") =!= col("assigned"))
    assert(best.count() === 0)
  }

  test("exhaustive config (nprobe=#cells, rerank=inf) equals exact top-k") {
    val (e, cents, _, books, enc) = parts
    val q = e.filter(col("vec_id") < 8)
    val exact = Ann.bruteForceTopK(q, e, k = 3)
      .select("q_id", "c_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = IvfPq.adcTopK(q, enc, e, cents, books, k = 3, nprobe = 4,
        rerank = Int.MaxValue)
      .select("q_id", "c_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === exact)
  }

  test("approximate config (nprobe=2, rerank=16) keeps useful recall") {
    val (e, cents, _, books, enc) = parts
    val q = e.filter(col("vec_id") < 8)
    val exact = Ann.bruteForceTopK(q, e, k = 3)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = IvfPq.adcTopK(q, enc, e, cents, books, k = 3, nprobe = 2,
        rerank = 16)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@3 = $recall")
  }
}
