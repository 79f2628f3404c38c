package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver's synthetic tables (TESTDATA.md) and registers them as
  * temp views — the analog of the reference's per-input
  * `registerTempTable(bucket_signature)`
  * (`aleph2_search_index_service_elasticsearch/.../utils/ElasticsearchSparkUtils.java:104-130`),
  * except the catalog IS the engine here so the name is just the table name.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize a timestamp column to session-tz `TimestampType` micros
    * regardless of how the driver generated the parquet. Two layouts have
    * shipped: TIMESTAMP(NANOS) — which, under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[GraftSession]]),
    * arrives as a nano `LongType` we floor to micros, the same truncation
    * DuckDB applies casting ns→µs — and native `timestamp[us]` without a
    * zone, which Spark infers as `TimestampNTZType`; the session zone is
    * pinned to UTC so the NTZ→LTZ cast is instant-preserving and
    * `unix_micros` on our side equals DuckDB's `epoch_us` on the raw file.
    * Every consumer (batch and streaming) must funnel raw reads through
    * here rather than hand-converting. */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.fields.find(_.name == colName).map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn(colName, col(colName).cast("timestamp"))
      case _ => df
    }
  }

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Register every table as a temp view for the SQL surface (Q1). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
