package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimistic-concurrency (compare-and-set) batch update — the set-at-a-time
  * analog of a document store's version-guarded write (Elasticsearch rejects
  * an index request whose `_version` trails the stored document's; the
  * reference's CRUD layer surfaces that per document as a failed future,
  * `ElasticsearchCrudService.java:241`'s OpType dispatch being the
  * create-side half of the same conflict contract). Here the whole batch
  * reconciles in ONE co-keyed equi-join:
  *
  *  - stored version == expected version → new values applied, version
  *    bumped, row tagged `applied`;
  *  - key matches but the version is stale → row untouched, tagged
  *    `conflict` (the caller's retry queue);
  *  - no key match → passthrough, tagged `untouched`.
  *
  * Scale: one equi-join on the key (broadcast when the CAS batch is small),
  * no window, no collect, no per-document round trips.
  */
object OptimisticLock {

  /** @param target  current table carrying `versionCol`
    * @param updates CAS batch: key columns + `expectedVersionCol` + the
    *                new-value columns named in `set`; key-unique (MERGE's
    *                cardinality rule — checked, a duplicate key would fan
    *                the target row out)
    * @param keys    equi-join key columns
    * @param set     target column → updates column holding its new value
    * @param checkUniqueKeys when true (default), EAGERLY runs one Spark
    *                job over the updates batch (a groupBy on the keys)
    *                before the plan is returned, to reject duplicate-key
    *                batches loudly instead of silently fanning target rows
    *                out. The batch is the SMALL side of a CAS (a retry
    *                queue, not a corpus), so the scan is cheap — but a
    *                caller that already guarantees uniqueness (e.g. the
    *                batch is itself the output of a groupBy on the keys)
    *                can pass false to keep plan construction lazy.
    * @return target schema + `cas_result` ∈ applied/conflict/untouched */
  def casUpdate(target: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String, expectedVersionCol: String,
      set: Map[String, String], checkUniqueKeys: Boolean = true): DataFrame = {
    val collisions =
      (target.columns.toSet & updates.columns.toSet) -- keys.toSet
    require(collisions.isEmpty, s"non-key columns collide: $collisions")
    require(!target.columns.contains("__cas") && !updates.columns.contains("__cas"),
      "input columns must not be named __cas (reserved by OptimisticLock)")
    val unknownTgt = set.keySet -- (target.columns.toSet -- keys.toSet - versionCol)
    require(unknownTgt.isEmpty,
      s"set targets are not non-key, non-version target columns (typo?): $unknownTgt")
    val unknownSrc = (set.values.toSet + expectedVersionCol) -- updates.columns.toSet
    require(unknownSrc.isEmpty,
      s"set sources / expected-version column missing from the batch: $unknownSrc")
    if (checkUniqueKeys) {
      val dup = updates.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).head(1)
      require(dup.isEmpty,
        "CAS batch has multiple rows for key " + dup.headOption.map(r =>
          keys.map(k => s"$k=${r.getAs[Any](k)}").mkString("(", ", ", ")"))
          .getOrElse(""))
    }

    val joined = target.join(updates.withColumn("__cas", lit(1)), keys, "left")
    val matched = col("__cas").isNotNull
    val applied = matched && col(versionCol) === col(expectedVersionCol)
    val outCols = target.columns.map {
      case c if set.contains(c) =>
        when(applied, col(set(c))).otherwise(col(c)).as(c)
      case c if c == versionCol =>
        when(applied, col(versionCol) + 1).otherwise(col(versionCol)).as(c)
      case c => col(c)
    }
    joined.select(outCols :+
      when(applied, "applied").when(matched, "conflict")
        .otherwise("untouched").as("cas_result"): _*)
  }
}
