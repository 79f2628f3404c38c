package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff (CDC extraction): compare two keyed snapshots of a table
  * and emit one row per changed key — `I` (new only), `D` (old only), or
  * `U` (present in both with different non-key values). The inverse of
  * MERGE: where [[MergeInto]] applies a changeset, this RECOVERS the
  * changeset between two table states (the pattern for feeding downstream
  * incremental consumers when the upstream rewrites whole snapshots).
  *
  * One co-keyed full-outer shuffle join; non-key columns are packed into a
  * struct per side before the join (no column-name collisions, and the
  * change test is a single null-safe struct comparison — Spark's `<=>`
  * compares structs field-wise). Unchanged keys are filtered out, so the
  * output is |changes|, not |table|.
  */
object SnapshotDiff {

  /** @param old  previous snapshot
    * @param neu  next snapshot (same schema)
    * @param keys key columns (unique per snapshot)
    * @return (op, keys…) with op ∈ {I, U, D}, one row per changed key */
  def diff(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame =
    changed(old, neu, keys).select(col("op") +: keys.map(col): _*)

  /** [[diff]] plus the NEW side's values — (op, keys…, new_&lt;c&gt; per
    * non-key column, null for D rows): the changeset an incremental
    * consumer can APPLY. Feeding it to [[MergeInto.merge]] (delete on D,
    * update on U, insert on I) reconstructs `neu` from `old` exactly —
    * the diff→apply closure q:cdc2 pins against the oracle. */
  def changeset(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKeys = old.columns.filterNot(keys.contains).toSeq
    changed(old, neu, keys)
      .select((col("op") +: keys.map(col)) ++
        nonKeys.map(c => col("__n").getField(c).as(s"new_$c")): _*)
  }

  private def changed(old: DataFrame, neu: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs key columns")
    require(old.columns.toSeq == neu.columns.toSeq,
      s"snapshot schemas differ: ${old.columns.mkString(",")} vs ${neu.columns.mkString(",")}")
    val nonKeys = old.columns.filterNot(keys.contains).toSeq
    require(nonKeys.nonEmpty, "snapshots have no non-key columns to compare")

    def packed(df: DataFrame, tag: String): DataFrame =
      df.select(keys.map(col) :+
        struct(nonKeys.map(col): _*).as(s"__$tag"): _*)

    packed(old, "o").join(packed(neu, "n"), keys, "full_outer")
      .withColumn("op",
        when(col("__n").isNull, "D")
          .when(col("__o").isNull, "I")
          .otherwise("U"))
      .filter(col("op") =!= "U" || !(col("__o") <=> col("__n")))
  }
}
