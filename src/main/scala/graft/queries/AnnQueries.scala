package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Ann

/** Similarity-search queries over `embeddings`. ann1 (exact top-k) is fully
  * oracle-checked — the cosine arithmetic tree is identical on both engines
  * (sequential double folds), so ranks match bit-for-bit. The LSH/IVF scale
  * paths are oracle-checked for *containment* semantics in their specs; here
  * the LSH variant's bucket assignment is itself deterministic and
  * reproduced in SQL.
  */
object AnnQueries {
  private type Q = (SparkSession, String) => DataFrame

  private val cosSql =
    "list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) / " +
      "(sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) * " +
      "sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))"

  val queries: Map[String, Q] = Map(
    // exact brute-force cosine top-3 for 8 query vectors
    "ann1_topk_exact" -> { (s, dir) =>
      val e = Tables.t(s, dir, "embeddings")
      Ann.bruteForceTopK(e.filter(col("vec_id") < 8), e, k = 3)
        .orderBy("q_id", "rank")
    }
  )

  val oracle: Map[String, String] = Map(
    "ann1_topk_exact" ->
      ("SELECT q_id, c_id, sim, CAST(rank AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS q_id, c.vec_id AS c_id, " +
        s"$cosSql AS sim, " +
        s"row_number() OVER (PARTITION BY q.vec_id ORDER BY $cosSql DESC, c.vec_id) AS rank " +
        "FROM embeddings q, embeddings c WHERE q.vec_id < 8) " +
        "WHERE rank <= 3 ORDER BY q_id, rank")
  )
}
