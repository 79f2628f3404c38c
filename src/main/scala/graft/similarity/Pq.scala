package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions._

/** Product quantization for embedding similarity at corpus scale (the
  * memory-bound regime past IVF): split each `dim`-dimensional vector into
  * `m` contiguous subspaces, vector-quantize every subspace against its own
  * `k`-centroid codebook, and score candidates against a per-query
  * asymmetric distance table (ADC) — so a 64-dim float vector becomes `m`
  * small codes and the scan never touches raw corpus vectors.
  *
  * Distributed shapes (the part that must survive 100 TB):
  *
  *  - [[train]] mirrors [[KMeans]] but runs ALL `m` subspace Lloyd's loops in
  *    one job per iteration: explode each sampled vector into (sub, subvec)
  *    once, then a per-row argmin against that subspace's codebook literal
  *    ([[graft.functions.NearestCell]] — no join, no shuffle). Only
  *    m·k·(dim/m) = `dim·k` aggregated doubles ever reach the driver per
  *    iteration — same bounded driver state as the IVF trainer.
  *  - [[encode]] is a NARROW projection: the codebooks become an array
  *    literal and each subspace's nearest code is a native per-row argmin
  *    ([[graft.functions.NearestCell]]) — codegen'd expression work, no
  *    shuffle, no UDF; the corpus is never joined or re-keyed just to
  *    encode it.
  *  - [[adcTopK]] broadcasts the (small) query side WITH its precomputed
  *    m×k distance table; the corpus-side scan reads only the code column
  *    (`zip_with(code, dtab, ...)` + one fold), ranks per query, and
  *    exact-reranks only the `rerank` surviving candidates by true cosine.
  *
  * `rerank >= |corpus|` degenerates to exact brute-force ranking (every
  * candidate is reranked by true cosine) — the oracle-checkable
  * configuration that pins the train→encode→ADC→rerank integration, while
  * PqSpec pins recall for genuinely-approximate settings (small `rerank`).
  */
object Pq {

  /** Trained sub-codebooks: `(sub, cent, cv)` rows, `m·k` of them, ordered
    * init = subspace slices of the k lowest-id sample vectors. */
  final case class Codebooks(m: Int, k: Int, subDim: Int,
      cents: IndexedSeq[IndexedSeq[Seq[Double]]]) // cents(sub)(cent) = subvector

  /** Lloyd's per subspace, all subspaces in one job per iteration. Run on a
    * sample at scale (centroids from 10⁵ vectors quantize 10⁹+). */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
      iters: Int = 4): Codebooks = {
    val sample = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val dim = sample.select(size(col("vec"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m

    // (id, sub, svec): one narrow explode of the sample
    val subs = sample.select(col("id"),
        posexplode(subVectors(col("vec"), m, subDim)).as(Seq("sub", "svec")))

    // deterministic init: subspace slices of the k lowest-id vectors
    var cents: IndexedSeq[IndexedSeq[Seq[Double]]] = {
      val seed = sample.orderBy("id").limit(k).collect()
        .map(_.getSeq[Double](1)).toIndexedSeq
      require(seed.size == k, s"need at least $k vectors to init")
      IndexedSeq.tabulate(m)(s =>
        seed.map(v => v.slice(s * subDim, (s + 1) * subDim)))
    }

    for (_ <- 0 until iters) {
      // per-row argmin against this round's codebook literals — the same
      // (d2, cent) winner as the old broadcast-join + min(struct)
      // aggregate, with no shuffle of the exploded sample per round
      val allCbs = array((0 until m).map(s => codebookLit(cents(s))): _*)
      val assigned = subs.select(col("sub"),
        graft.functions.VectorExprFunctions
          .nearest_cell(col("svec"), element_at(allCbs, col("sub") + 1))
          .getField("cent").as("cent"),
        col("svec"))
      // (sub, cent, dim) partial sums — m·k·subDim rows to the driver
      val stats = assigned
        .select(col("sub"), col("cent"),
          posexplode(col("svec")).as(Seq("dim", "x")))
        .groupBy("sub", "cent", "dim")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(m, k)((s, c) => cents(s)(c).toArray)
      stats.foreach { r =>
        val (s, c, d) = (r.getInt(0), r.getInt(1), r.getInt(2))
        if (r.getLong(4) > 0) next(s)(c)(d) = r.getDouble(3) / r.getLong(4)
      }
      cents = next.map(_.map(_.toSeq: Seq[Double]).toIndexedSeq).toIndexedSeq
    }
    Codebooks(m, k, subDim, cents)
  }

  /** `array(slice(vec, 1, d), slice(vec, d+1, d), ...)` — the m subspace
    * views of one vector, computed once per row. */
  private def subVectors(vec: Column, m: Int, subDim: Int): Column =
    array((0 until m).map(s => slice(vec, s * subDim + 1, subDim)): _*)

  /** Codebooks as a (sub, cent, cv) frame — the training join's side AND
    * the persisted layout [[IvfPqIndex]] round-trips. */
  private[similarity] def codebookFrame(spark: SparkSession,
      cents: IndexedSeq[IndexedSeq[Seq[Double]]]): DataFrame = {
    val rows = for {
      (cb, s) <- cents.zipWithIndex
      (v, c) <- cb.zipWithIndex
    } yield Row(s, c, v)
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("sub", IntegerType, nullable = false),
        StructField("cent", IntegerType, nullable = false),
        StructField("cv", ArrayType(DoubleType), nullable = false))))
  }

  /** One subspace codebook as an array<struct<cent,cv>> literal, ordered by
    * cent id so positions are stable. */
  private[similarity] def codebookLit(cb: IndexedSeq[Seq[Double]]): Column =
    array(cb.zipWithIndex.map { case (v, c) =>
      struct(lit(c).as("cent"), typedLit(v).as("cv"))
    }: _*)

  /** NARROW encode: append `code` (array<int>, length m) — each subspace's
    * nearest codebook entry by squared L2, ties to the lower code (struct
    * min orders by (d2, cent)). Pure expression work against codebook
    * literals; no shuffle, no UDF. */
  def encode(df: DataFrame, vecCol: String, books: Codebooks): DataFrame = {
    val vec = col(vecCol).cast("array<double>")
    // native per-subspace argmin (one codegen'd primitive loop per sub)
    // replacing the interpreted `array_min(transform(...))` lambda: same
    // (d2, cent) winner — codebookLit is cent-ascending by construction
    val codes = (0 until books.m).map { s =>
      val sv = slice(vec, s * books.subDim + 1, books.subDim)
      graft.functions.VectorExprFunctions
        .nearest_cell(sv, codebookLit(books.cents(s))).getField("cent")
    }
    df.withColumn("code", array(codes: _*))
  }

  /** Per-query ADC distance table: dtab(sub)(cent) = l2sq(q_sub, cv) —
    * array<array<double>> of m·k doubles, computed once per query row. */
  private[similarity] def distanceTable(qVec: Column, books: Codebooks): Column =
    array((0 until books.m).map { s =>
      val sv = slice(qVec, s * books.subDim + 1, books.subDim)
      transform(codebookLit(books.cents(s)),
        c => l2sq(sv, c.getField("cv")))
    }: _*)

  /** ADC top-k: scan encoded corpus codes against each query's distance
    * table, keep the `rerank` best candidates per query by quantized
    * distance, exact-rerank those by true cosine. Queries (with their m×k
    * tables) are broadcast; the corpus-side scan genuinely reads ONLY
    * (id, code) — raw vectors are fetched by a c_id equi-join AFTER the
    * per-query group limit, so at most |queries|·rerank vectors are ever
    * read for reranking (the memory/IO bound PQ exists to provide). */
  def adcTopK(queries: DataFrame, encodedCorpus: DataFrame, books: Codebooks,
      k: Int, rerank: Int,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("q_id"),
      col(qVec).cast("array<double>").as("q_vec"),
      distanceTable(col(qVec).cast("array<double>"), books).as("dtab"))
    val c = encodedCorpus.select(col(cId).as("c_id"), col("code"))
    val scored = c.join(broadcast(q.select(col("q_id"), col("dtab"))))
      .withColumn("adc", graft.functions.VectorExprFunctions
        .pq_adc(col("code"), col("dtab")))
    // rerank = Int.MaxValue (the exhaustive oracle config) keeps EVERY
    // candidate: the per-query rank window would shuffle+sort the whole
    // scored candidate set by q_id only for a filter that passes all rows
    // (row_number can't even exceed Int.MaxValue) — skip it outright, the
    // exact rerank below is then the whole operator (guide §2.4)
    val candidates =
      if (rerank == Int.MaxValue) scored.select("q_id", "c_id")
      else {
        val wAdc = Window.partitionBy("q_id").orderBy(col("adc"), col("c_id"))
        scored
          .withColumn("crank", row_number().over(wAdc))
          .filter(col("crank") <= rerank)
          .select("q_id", "c_id")
      }
    // vector fetch AFTER the cut: candidate side is |queries|·rerank rows,
    // corpus side co-keys on c_id — an ordinary shuffle join, nothing
    // corpus-sized is broadcast or re-read with vectors attached. The
    // final k-rank is the bounded heap (Ann.rankTopK shape): reranked
    // candidates never cross a shuffle, only n_q·k ranked rows do
    val reranked = candidates
      .join(encodedCorpus.select(col(cId).as("c_id"),
        col(cVec).cast("array<double>").as("c_vec")), Seq("c_id"))
      .join(broadcast(q.select(col("q_id"), col("q_vec"))), Seq("q_id"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    Ann.rankTopK(reranked.select("q_id", "c_id", "sim"), k)
  }
}
