package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series operators: gap-based sessionization and time-grid gap
  * filling. The streaming sibling is `Streams.sessionize`
  * (flatMapGroupsWithState); this is the shape you run over a landed 100 TB
  * event log, where no cross-batch state is needed and the whole history is
  * one sorted pass per key.
  *
  * Scale: both operators shuffle ONCE on the key — sessionize's two window
  * functions share a (key, ts) sort so Catalyst plans a single exchange,
  * and the session-id aggregation on (key, session) is co-partitioned with
  * it (no second exchange for the groupBy's key prefix). Per-key state is a
  * sort buffer, not a hash of the whole key's history.
  */
object TimeSeries {

  /** Gap-based sessionization: rows of `events` with the same `keyCol`
    * belong to one session while consecutive (in `tsCol` order) rows are at
    * most `gapMicros` apart; a larger gap starts a new session. Emits one
    * row per session: (key, session_start, session_end, n_events).
    *
    * `tsCol` must be integral (epoch micros — the engine's internal event
    * time unit). Ties in ts are safe: a tied neighbor has gap 0 and can
    * never open a session, so the session assignment is order-invariant.
    *
    * Reference behavior: the closest reference shape is the Storm layer's
    * stateless per-record processing with state in external stores
    * (`EnrichmentPipelineService.java`) — sessionization there meant an
    * ES-side scripted upsert per event. Here it is two window functions
    * and an aggregation over one sort. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive: $gapMicros")
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(byKey)
    val opens = when(prev.isNull || col(tsCol) - prev > gapMicros, 1L)
      .otherwise(0L)
    val run = Window.partitionBy(keyCol).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__opens", opens)
      .withColumn("__sid", sum(col("__opens")).over(run))
      .groupBy(col(keyCol), col("__sid"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__sid")
  }

  /** Time-grid gap fill: given a frame with one row per (key, bucket)
    * (bucket integral, e.g. epoch micros of a day boundary), emit one row
    * per key for EVERY bucket in that key's [min, max] range stepped by
    * `step`, with missing buckets' value columns filled from `fill`
    * (typically zeros). Downstream windows (running totals, moving
    * averages) then see a dense series.
    *
    * The grid is generated per key with `sequence` + `explode` — narrow,
    * no driver state — and joined back co-partitioned on (key, bucket).
    * `maxSteps` guards a degenerate range (one stray epoch-0 row would
    * otherwise explode a key to millions of grid rows — fail loudly). */
  def gapFill(perBucket: DataFrame, keyCol: String, bucketCol: String,
      step: Long, fill: Map[String, Column], maxSteps: Int = 100000): DataFrame = {
    require(step > 0, s"step must be positive: $step")
    val reserved = Set("__b0", "__b1", "__ongrid")
    require(perBucket.columns.toSet.intersect(reserved).isEmpty,
      s"input columns must not be named ${reserved.mkString("/")} (reserved)")
    val guardMsg = lit(s"TimeSeries.gapFill: a key spans more than " +
      s"$maxSteps buckets of $step; widen step or split the range")
    val bounds = perBucket.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__b0"), max(col(bucketCol)).as("__b1"))
    // integral division (SQL `div`, not `/` which widens to double), not
    // `b1-b0 < step*maxSteps`: the multiply can wrap for extreme step
    // values (silently disabling the guard), and the subtraction form was
    // off by one (allowed maxSteps+1 grid points). Grid points =
    // (b1-b0) div step + 1, so require that quotient < maxSteps.
    val guardedEnd = when(
      expr(s"(__b1 - __b0) div ${step}L") < lit(maxSteps.toLong),
      col("__b1")).otherwise(raise_error(guardMsg).cast("long"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__b0"), guardedEnd, lit(step))).as(bucketCol))
      .withColumn("__ongrid", lit(1))
    // full outer, not left: an input bucket OFF the key's min + k·step
    // lattice would find no grid row and silently vanish from a left join
    // (its value lost from every downstream total). Misalignment is a
    // caller bug — fail loudly from inside the plan instead
    val misaligned = lit(s"TimeSeries.gapFill: input bucket not aligned " +
      s"to its key's min + k*$step lattice")
    // the check rides on bucketCol (which every consumer reads) rather
    // than a dedicated column Catalyst could prune away unused
    val bucketType = perBucket.schema(bucketCol).dataType
    val joined = grid.join(perBucket, Seq(keyCol, bucketCol), "full_outer")
      .withColumn(bucketCol,
        when(col("__ongrid").isNull, raise_error(misaligned).cast(bucketType))
          .otherwise(col(bucketCol)))
      .drop("__ongrid")
    fill.foldLeft(joined) { case (df, (c, v)) =>
      df.withColumn(c, coalesce(col(c), v))
    }
  }
}
