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
    * @param updates CAS batch: key columns + `expectedVersionCol` (non-null
    *                by contract) + the new-value columns named in `set`;
    *                must be key-unique (a duplicate key would fan out the
    *                join — same cardinality contract as MergeInto's source)
    * @param keys    equi-join key columns
    * @param set     target column → updates column holding its new value
    * @return target schema + `cas_result` ∈ applied/conflict/untouched */
  def casUpdate(target: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String, expectedVersionCol: String,
      set: Map[String, String]): DataFrame = {
    val joined = target.join(updates, keys, "left")
    val matched = col(expectedVersionCol).isNotNull
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
