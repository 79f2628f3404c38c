package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — apply a CDC changeset to a
  * pre-aggregated table WITHOUT rescanning the base facts: the
  * materialized-rollup pattern that makes a 100 TB fact table's daily
  * refresh cost O(|delta| + |aggregate keys|) instead of O(base).
  *
  * The changeset is [[SnapshotDiff]]'s shape — rows (op ∈ i/u/d, key,
  * old value, new value) — and every contribution is signed: an insert
  * adds (+1, +new), a delete retracts (−1, −old), an update retracts the
  * old and adds the new (0, new − old). Signed deltas pre-aggregate per
  * key (map-side combined), then ONE co-keyed full-outer join merges them
  * into the old aggregate; keys whose count reaches zero drop out (their
  * last row was deleted). Value sums ride DECIMAL so retraction is exact —
  * float retraction drifts, and a maintained aggregate that drifts from
  * the recomputed truth is worse than no aggregate.
  *
  * Reference analog: none — its enrichment engine recomputes aggregates
  * per batch (SURVEY §2 A3); maintenance-under-delta belongs to the
  * warehouse-parity extension set like MERGE INTO (u16) and SCD2 (cdc3).
  */
object IncrementalAgg {

  /** `oldAgg`: (keyCols, n, total). `changes`: (op, keyCols, oldVal,
    * newVal) with op ∈ 'i' (oldVal null) / 'u' / 'd' (newVal null).
    * Returns the maintained (keyCols, n, total) — equal, by construction,
    * to re-aggregating the post-change fact table. */
  def applyDelta(oldAgg: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String = "op", oldValCol: String = "old_v",
      newValCol: String = "new_v"): DataFrame = {
    require(keyCols.nonEmpty, "applyDelta needs at least one key column")
    val op = col(opCol)
    def dec(c: Column) = c.cast("decimal(18,2)")
    val deltas = changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(op === "i", 1).when(op === "d", -1).otherwise(0)).as("__dn"),
        sum(when(op === "i", dec(col(newValCol)))
          .when(op === "d", -dec(col(oldValCol)))
          .otherwise(dec(col(newValCol)) - dec(col(oldValCol)))).as("__dt"))
    oldAgg
      .join(deltas, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(BigDecimal(0)).cast("decimal(18,2)")) +
          coalesce(col("__dt"), lit(BigDecimal(0)).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("total")): _*)
      .filter(col("n") > 0)
  }
}
