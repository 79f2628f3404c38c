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

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true` (see
    * [[GraftSession]]): the driver's `events.parquet` carries
    * TIMESTAMP(NANOS) which Spark has no native type for. We read nanos as
    * long and floor-convert to micros — the same truncation DuckDB applies
    * when casting ns→its micro timestamps, so oracle comparisons line up. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (cur, f) =>
      if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
        cur.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      else cur
    }
  }

  /** Register every table as a temp view for the SQL surface (Q1). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
