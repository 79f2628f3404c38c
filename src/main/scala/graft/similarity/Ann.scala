package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus, rank per query via window row_number (a
  *    per-query sort; fine while |queries|·|corpus| rows fit a shuffle —
  *    the LSH/IVF variants below are the scale path past that).
  *  - [[lshTopK]]: sign-random-projection LSH — bucket corpus and queries by
  *    hyperplane sign bits, rerank exactly *within* matching buckets. The
  *    scale path: the corpus-side shuffle is on small bucket keys, the
  *    cross-product is bounded per bucket, and recall/probing is tunable via
  *    `planes` (fewer bits → bigger buckets → higher recall).
  *  - [[ivfTopK]]: IVF-style coarse quantization — assign every vector to its
  *    nearest centroid, search only matching cells (with `nprobe` cells per
  *    query).
  *
  * All distance math is the bit-reproducible sequential fold from
  * [[graft.functions.VectorFunctions]].
  */
object Ann {

  /** Exact top-k by cosine: queries × corpus → rank ≤ k.
    * `queries` is expected to be small (broadcast); ties broken by corpus id
    * for determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
    val c = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"))
    val scored = c.join(broadcast(q))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "sim", "rank")
  }

  /** Exact cosine RADIUS search: every corpus item with `sim >= minSim`
    * per query — the retrieval primitive top-k can't express ("all near
    * neighbors", result count unbounded and data-dependent). Same
    * broadcast-queries shape as [[bruteForceTopK]], but radius search
    * needs no window and no per-query sort at all — the threshold is the
    * whole operator, so the plan is scan → broadcast product → filter,
    * fully codegen.
    *
    * `excludeSelf` drops id-equal pairs — correct ONLY when queries and
    * corpus share an id space (the self-sweep case). Pass false when the
    * two sides are different tables whose ids coincidentally overlap
    * (e.g. both numbered from 0), or real matches at equal ids vanish;
    * note [[bruteForceTopK]] never excludes, so the default here is the
    * self-sweep convention, not an invariant of the file. */
  def rangeSearch(queries: DataFrame, corpus: DataFrame, minSim: Double,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
    val c = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"))
    c.join(broadcast(q),
        if (excludeSelf) col("q_id") =!= col("c_id") else lit(true))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
      .filter(col("sim") >= minSim)
      .select("q_id", "c_id", "sim")
  }

  /** Hard-negative mining for contrastive training: per query, the k most
    * cosine-similar corpus items with a DIFFERENT label (the classic
    * in-batch-negatives upgrade — near neighbors that the label says are
    * wrong). Same broadcast-queries shape as [[bruteForceTopK]] with the
    * label-inequality predicate fused into the join, so excluded
    * same-label pairs never materialize a row. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "vec_id", qVec: String = "embedding",
      qLabel: String = "label", cId: String = "vec_id",
      cVec: String = "embedding", cLabel: String = "label"): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"),
      col(qLabel).as("q_label"))
    val c = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"),
      col(cLabel).as("c_label"))
    val scored = c.join(broadcast(q), col("c_label") =!= col("q_label"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "sim", "rank")
  }

  /** Sign bits under `planes` deterministic pseudo-random hyperplanes →
    * bucket id (long); coef(p, d) = ((p*31 + d)*2654435761 mod 2^31) / 2^31
    * - 0.5, reproducible in SQL. Computed by the native codegen'd
    * [[graft.functions.SignLshBucket]] — one pass over the vector instead
    * of `planes` interpreted lambda folds (bit-identical results). */
  def lshBucket(vec: Column, planes: Int): Column =
    graft.functions.VectorExprFunctions.sign_lsh_bucket(vec, planes)

  /** LSH-bucketed top-k: exact rerank within matching sign buckets.
    * Recall < 1 by construction; `planes` trades recall vs bucket size. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 8,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"),
      lshBucket(col(qVec), planes).as("bucket"))
    val c = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"),
      lshBucket(col(cVec), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "sim", "rank")
  }

  /** IVF-style: `centroids` (small, broadcast) define cells; every corpus
    * vector is assigned to its nearest centroid once (narrow projection +
    * small broadcast join); queries probe their `nprobe` nearest cells. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 2,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding",
      centId: String = "cent_id", centVec: String = "cent_vec"): DataFrame = {
    val cent = centroids.select(col(centId).as("cent"), col(centVec).as("cv"))
    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val scored = df.join(broadcast(cent))
        .withColumn("d2", l2sq(col(vec), col("cv")))
      val w = Window.partitionBy(id).orderBy(col("d2"), col("cent"))
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("cv", "d2", "crank")
    }
    val c = assign(corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec")),
      "c_id", "c_vec", 1)
    val q = assign(queries.select(col(qId).as("q_id"), col(qVec).as("q_vec")),
      "q_id", "q_vec", nprobe)
    val scored = c.join(broadcast(q), Seq("cent"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "sim", "rank")
  }
}
