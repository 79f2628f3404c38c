package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** S1/S2/S4 sources (SURVEY §2.1), Spark-first:
  *
  *  - S1 multi-file scan: `spark.read` over a bucket directory — Spark's own
  *    file batching (`maxPartitionBytes`, AQE coalesce) replaces the
  *    reference's combine-small-files input format
  *    (`UpdatedCombineFileInputFormat.java`); `maxRecords` test cap = limit.
  *  - S2 JSON: json-lines files or a JSON string column (`from_json`),
  *    schema inferred (`schema_of_json`) or declared — the reference's
  *    `BeJsonParser.java` dispatch collapses into Spark's reader.
  *  - S4 binary: whole files as one record with path/length/mtime metadata
  *    (`binaryFile` format — the reference's `BeStreamParser.java` shape).
  */
object Sources {

  /** S1: read a directory of json-lines files as records. */
  def jsonDir(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** S2: parse a JSON string column with a declared schema. */
  def parseJsonColumn(df: DataFrame, column: String, schema: DataType): DataFrame =
    df.withColumn(column + "_parsed", from_json(col(column), schema))

  /** S2: parse with schema inferred from the data itself (samples one
    * record's shape per the `schema_of_json` contract). */
  def parseJsonColumnInferred(df: DataFrame, column: String, sampleJson: String): DataFrame =
    df.withColumn(column + "_parsed", from_json(col(column), schema_of_json(sampleJson)))

  /** ST6/dirty-data: parse a JSON column, shunting malformed records to a
    * quarantine flag instead of failing the job — the Spark-native analog of
    * the reference's mapping-failure shunt (auto-type retry loop,
    * `ElasticsearchCrudService.java:465-574`): `_quarantined = true` rows
    * keep the raw payload for later repair; good rows carry the parsed
    * struct. Split with the two helpers below (one scan each, or cache). */
  def parseJsonQuarantine(df: DataFrame, column: String, schema: StructType): DataFrame = {
    // PERMISSIVE from_json yields a null-FIELDED struct on malformed input,
    // so detection needs the corrupt-record channel, not a null check.
    val corrupt = "_corrupt_record"
    val schemaWithCorrupt = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    import scala.jdk.CollectionConverters._
    df.withColumn(column + "_parsed",
        from_json(col(column), schemaWithCorrupt,
          Map("columnNameOfCorruptRecord" -> corrupt).asJava))
      .withColumn("_quarantined",
        col(column).isNotNull &&
          col(column + "_parsed").getField(corrupt).isNotNull)
  }

  def goodRecords(parsed: DataFrame): DataFrame =
    parsed.filter(!col("_quarantined"))

  def quarantinedRecords(parsed: DataFrame): DataFrame =
    parsed.filter(col("_quarantined"))

  /** S4: read whole files as binary records (path, modificationTime, length,
    * content). */
  def binaryFiles(spark: SparkSession, path: String, glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }
}
