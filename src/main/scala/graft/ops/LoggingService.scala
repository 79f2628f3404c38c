package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Bucket
import graft.store.BucketStore

/** X7: structured logging service — log objects are ordinary records written
  * through the same bucket store, with per-subsystem level thresholds
  * (`aleph2_logging_service/.../utils/LoggingUtils.java:89-94` multi-writer,
  * `:105-138` log object build + level thresholds).
  *
  * Levels (ordered): TRACE < DEBUG < INFO < WARN < ERROR. A record passes if
  * its level ≥ the threshold configured for its subsystem (default
  * threshold for unknown subsystems).
  */
object LoggingService {
  val Levels: Seq[String] = Seq("TRACE", "DEBUG", "INFO", "WARN", "ERROR")
  private val rank: Map[String, Int] = Levels.zipWithIndex.toMap

  /** Build a log-record frame from (subsystem, level, message, ts) cols. */
  def logRecords(df: DataFrame, subsystem: String): DataFrame =
    df.withColumn("subsystem", lit(subsystem))

  /** Threshold filter: keep records at-or-above the configured level per
    * subsystem. Pure predicate — codegen'd, pushes to the scan. */
  def levelFilter(df: DataFrame, thresholds: Map[String, String],
      defaultLevel: String = "INFO"): DataFrame = {
    val rankCol = Levels.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (lvl, i)) => when(upper(col("level")) === lvl, i).otherwise(acc)
    }
    val thresholdCol = thresholds.foldLeft(lit(rank(defaultLevel))) {
      case (acc, (subsys, lvl)) =>
        when(col("subsystem") === subsys, rank(lvl)).otherwise(acc)
    }
    df.filter(rankCol >= thresholdCol)
  }

  /** Write accepted log records into the bucket's store (same write path as
    * any data — the "log buckets are buckets" stance of the reference). */
  def writeLogs(store: BucketStore, bucket: Bucket, records: DataFrame,
      thresholds: Map[String, String]): Unit =
    store.write(bucket, levelFilter(records, thresholds), stage = "json")
}
