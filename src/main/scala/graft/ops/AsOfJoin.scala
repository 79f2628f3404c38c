package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join: attach to each left row the single right row
  * with the greatest `rightTs <= leftTs` for the same key — the
  * versioned-dimension / last-touch-attribution join that plain equi-joins
  * can't express and a range join would quadratically explode.
  *
  * Spark shape (the part that survives 100 TB): tag and UNION the two
  * sides, shuffle ONCE on the key, and within each key's partition carry
  * the latest right payload forward with `last(_, ignoreNulls)` over a
  * rows-frame window ordered by (ts, side, payload). Linear per key, no
  * per-row range probe, no key×key cross product; right rows order before
  * left rows at equal ts so "at-or-before" includes ties. Deterministic:
  * at identical (ts), the payload struct's leading column breaks the tie
  * (max wins), so put a unique id first in `payload`.
  */
object AsOfJoin {

  /** @param keyCols  equi-join key columns (same names on both sides)
    * @param leftTs   left event-time column
    * @param rightTs  right version-time column
    * @param payload  right columns to attach (null when no right row is
    *                 at-or-before); first column is the tie-break id.
    *                 Names must not collide with left columns. */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val collisions = payload.toSet & left.columns.toSet
    require(collisions.isEmpty, s"payload collides with left columns: $collisions")
    val leftStruct = StructType(left.schema.fields)
    val payloadStruct = StructType(
      payload.map(p => right.schema(right.schema.fieldIndex(p))))

    val lU = left.select(
      Seq(struct(left.columns.map(col).toSeq: _*).as("__left")) ++
        keyCols.map(col) ++ Seq(col(leftTs).as("__t"),
          lit(1).as("__side"), lit(null).cast(payloadStruct).as("__p")): _*)
    val rU = right.select(
      Seq(lit(null).cast(leftStruct).as("__left")) ++
        keyCols.map(col) ++ Seq(col(rightTs).as("__t"),
          lit(0).as("__side"), struct(payload.map(col): _*).as("__p")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__left.*"), col("__match.*"))
  }
}
