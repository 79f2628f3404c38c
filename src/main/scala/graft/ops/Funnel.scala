package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential-conversion funnel: for each key, the timestamp of the first
  * event matching step 1, then the first event matching step 2 STRICTLY
  * after it (within a conversion window), and so on — the product-analytics
  * "click → purchase → signup" measurement.
  *
  * Shape: one aggregate per step plus one co-keyed join per step — each
  * stage is `events ⋈ reached-so-far` on the key (shuffled equi-join; after
  * the first shuffle all stages reuse the key partitioning), then a
  * min-aggregate. No per-key event-list collection, no window over a key's
  * whole history, state per step is one timestamp per key. Keys that drop
  * out of the funnel stay in the result with nulls from their first
  * unreached step on.
  */
object Funnel {

  /** @param events  event log
    * @param keyCol  funnel entity (e.g. user id)
    * @param tsCol   integral event time (epoch micros)
    * @param steps   ordered (stepName, predicate) — predicates select each
    *                step's events; names become output columns `t_<name>`
    * @param windowMicros max allowed gap between consecutive steps (each
    *                step must land in (prev, prev + window])
    * @return one row per key that completed step 1:
    *         (keyCol, t_<step1>, t_<step2> …), later steps null once the
    *         funnel is abandoned */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      steps: Seq[(String, Column)], windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMicros > 0, s"windowMicros must be positive: $windowMicros")
    val (head, tail) = (steps.head, steps.tail)
    val first = events.filter(head._2)
      .groupBy(col(keyCol))
      .agg(min(col(tsCol)).as(s"t_${head._1}"))

    tail.foldLeft((first, s"t_${head._1}")) { case ((acc, prevT), (name, pred)) =>
      val stepT = s"t_$name"
      val reached = events.filter(pred).select(col(keyCol), col(tsCol))
        .join(acc.select(col(keyCol), col(prevT)), keyCol)
        .filter(col(tsCol) > col(prevT) &&
          col(tsCol) <= col(prevT) + windowMicros)
        .groupBy(col(keyCol))
        .agg(min(col(tsCol)).as(stepT))
      (acc.join(reached, Seq(keyCol), "left"), stepT)
    }._1
  }
}
