package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 history build — collapse a stack of
  * keyed snapshots into effective-dated rows (the warehouse staple that
  * completes the CDC family: [[SnapshotDiff]] recovers one delta,
  * [[MergeInto]] applies it, Scd2 turns N snapshots into history).
  *
  * Gaps-and-islands: per key in version order, a run starts where the
  * attribute struct differs from its predecessor (null-safe struct
  * comparison, so NULL attr values neither start runs spuriously nor
  * merge distinct ones); run id = running sum of starts; one output row
  * per run with `valid_from` = first version, `valid_to` = next run's
  * start (NULL while current), `is_current` flag.
  *
  * Scale shape: two windows and one aggregation, all partitioned by the
  * dimension key — the natural co-key; no global sort, no collect. A
  * 100 TB fact table never enters; SCD2 runs on dimension snapshots.
  *
  * Reference analog: none — its stores overwrite or `_id`-dedup
  * (SURVEY §2 U/D3); effective-dating is extension surface.
  */
object Scd2 {

  def build(snapshots: DataFrame, keyCols: Seq[String], versionCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keyCols and attrCols required")
    val keyW = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    val attrs = struct(attrCols.map(col): _*)
    val runs = snapshots
      .withColumn("__start",
        when(lag(attrs, 1).over(keyW).isNull
          .or(!(attrs <=> lag(attrs, 1).over(keyW))), 1).otherwise(0))
      .withColumn("__run", sum(col("__start")).over(keyW))
    val byRun = runs
      .groupBy((keyCols :+ "__run").map(col): _*)
      .agg(min(col(versionCol)).as("valid_from"),
        attrCols.map(c => first(col(c)).as(c)): _*)
    val runW = Window.partitionBy(keyCols.map(col): _*).orderBy(col("valid_from"))
    byRun
      .withColumn("valid_to", lead(col("valid_from"), 1).over(runW))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .drop("__run")
  }
}
