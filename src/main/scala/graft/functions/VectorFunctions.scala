package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as pure `functions._` compositions — codegen'd
  * whole-stage expressions, no UDFs (SURVEY §2.10 stance: the scalar surface
  * is Spark's function library, extended compositionally).
  *
  * Accumulation is a sequential left-to-right fold (`aggregate`), which is
  * bit-reproducible and matches DuckDB's `list_dot_product` ordering — the
  * oracle comparisons rely on this.
  */
object VectorFunctions {

  /** Elementwise dot product of two float/double array columns (double
    * accumulation) — the native codegen'd [[VecDot]] expression; same
    * sequential left-to-right fold as the interpreted `aggregate` form it
    * replaced (bit-identical, incl. DuckDB's `list_dot_product`). */
  def dot(a: Column, b: Column): Column = VectorExprFunctions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, written exactly as dot/(sqrt(dot)*sqrt(dot)) so both
    * engines evaluate the identical arithmetic tree. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (for IVF-style coarse assignment), native. */
  def l2sq(a: Column, b: Column): Column = VectorExprFunctions.vec_l2sq(a, b)
}
