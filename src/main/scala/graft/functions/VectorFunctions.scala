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
    * accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, written exactly as dot/(sqrt(dot)*sqrt(dot)) so both
    * engines evaluate the identical arithmetic tree. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (for IVF-style coarse assignment). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)
}
