package graft.ops

import org.apache.spark.sql.DataFrame

import graft.model.Bucket
import graft.store.BucketStore

/** S11: multi-writer fan-out — the reference duplicates every `emitObject`
  * to all enabled data services (`MultiDataService.getMultiWriter`,
  * `aleph2_logging_service/.../utils/LoggingUtils.java:89-94`; used from
  * `SparkSqlTopology.java:104` etc.).
  *
  * Spark-first shape: compute ONCE into the canonical (primary) target, then
  * feed every secondary sink from the materialized primary — the upstream
  * plan never runs twice, and each secondary write is a cheap re-read of
  * columnar output (or the same micro-batch inside `foreachBatch` for
  * streams). */
object MultiWriter {

  /** Write `df` to the primary (bucket, stage), then fan out the
    * materialized result to each secondary target. */
  def emitAll(store: BucketStore, df: DataFrame,
      primary: (Bucket, String),
      secondaries: Seq[(Bucket, String)] = Nil,
      sinks: Seq[DataFrame => Unit] = Nil): Unit = {
    store.write(primary._1, df, primary._2)
    val materialized = store.read(primary._1, primary._2)
    secondaries.foreach { case (b, stage) => store.write(b, materialized, stage) }
    sinks.foreach(_(materialized))
  }
}
