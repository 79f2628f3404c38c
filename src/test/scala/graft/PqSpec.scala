package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{Ann, Pq}

/** Product quantization: encode validity, ADC ordering quality (recall vs
  * exact), determinism, and the exhaustive-rerank == brute-force identity
  * that backs the ann5 oracle. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private lazy val emb = Tables.t(spark, TestSession.sf, "embeddings").cache()

  private lazy val books = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
  private lazy val encoded = Pq.encode(emb, "embedding", books).cache()

  test("encode emits one in-range code per subspace, deterministically") {
    val m = books.m
    val bad = encoded.filter(size(col("code")) =!= m ||
      exists(col("code"), c => c < 0 || c >= books.k)).count()
    assert(bad === 0)
    // re-encoding yields identical codes (expression path, no RNG)
    val again = Pq.encode(emb, "embedding", books)
      .select("vec_id", "code").collect().map(r => r.get(0) -> r.getSeq[Int](1)).toMap
    encoded.select("vec_id", "code").collect()
      .foreach(r => assert(again(r.get(0)) === r.getSeq[Int](1)))
  }

  test("training is deterministic and reduces quantization error over iterations") {
    val b2 = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    assert(b2 === books)

    // true PQ objective: mean squared reconstruction error of every vector
    // against its own codes (encode = the argmin assignment, so this is
    // exactly the quantity Lloyd's rounds monotonically reduce)
    def qErr(b: Pq.Codebooks): Double = {
      val rows = Pq.encode(emb, "embedding", b)
        .select(col("embedding").cast("array<double>"), col("code")).collect()
      rows.map { r =>
        val v = r.getSeq[Double](0); val code = r.getSeq[Int](1)
        (0 until b.m).map { s =>
          val cv = b.cents(s)(code(s))
          (0 until b.subDim).map { d =>
            val diff = v(s * b.subDim + d) - cv(d); diff * diff
          }.sum
        }.sum
      }.sum / rows.length
    }
    val b0 = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 0)
    val (e0, e2) = (qErr(b0), qErr(books))
    assert(e2 <= e0 + 1e-9, s"quantization error increased: $e0 -> $e2")
  }

  test("exhaustive rerank equals exact brute force (the ann5 oracle identity)") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(queries, emb, k = 5)
      .orderBy("q_id", "rank").collect().toSeq
    val pq = Pq.adcTopK(queries, encoded, books, k = 5, rerank = Int.MaxValue)
      .orderBy("q_id", "rank").collect().toSeq
    assert(pq === exact)
  }

  test("approximate rerank keeps high recall and is deterministic") {
    val queries = emb.filter(col("vec_id") < 8)
    val k = 5
    val exact = Ann.bruteForceTopK(queries, emb, k)
      .select("q_id", "c_id").collect().map(r => (r.get(0), r.get(1))).toSet
    val approx = Pq.adcTopK(queries, encoded, books, k, rerank = 50)
      .select("q_id", "c_id").collect().map(r => (r.get(0), r.get(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@$k = $recall")
    // NOTE a query's own vector is NOT structurally guaranteed to survive a
    // small rerank cut: its ADC self-distance is its quantization error, and
    // >=rerank other codes can sit closer to the distance table. What IS
    // guaranteed is determinism: no RNG anywhere, ties broken by c_id
    val again = Pq.adcTopK(queries, encoded, books, k, rerank = 50)
      .orderBy("q_id", "rank").collect().toSeq
    assert(again === Pq.adcTopK(queries, encoded, books, k, rerank = 50)
      .orderBy("q_id", "rank").collect().toSeq)
  }
}
