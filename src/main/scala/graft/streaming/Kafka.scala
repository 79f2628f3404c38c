package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}
import org.apache.spark.sql.types.StructType

/** Kafka streaming entry + transient-topic sink wiring (SURVEY §2.1 S8 /
  * §2.8 ST3). The reference's streaming entry points are Kafka-backed spouts
  * and its transient outputs are intermediate topics
  * (`aleph2_analytic_services_storm/.../StreamingEnrichmentContextService.java:202-236`,
  * `assets/TransientStreamingOutputBolt.java`); on this engine both are the
  * built-in `kafka` source/sink for Structured Streaming.
  *
  * The connector jar ships separately from Spark core, so `load()`/`start()`
  * are left to the caller; everything up to them — option construction,
  * validation, topic naming, and the record encode/decode transforms — is
  * plain Spark and unit-tested without a broker.
  *
  * Scale: the kafka source parallelizes by topic-partition (one Spark task
  * per partition slice); `maxOffsetsPerTrigger` bounds micro-batch size so a
  * backlogged topic can't produce an unboundedly large batch.
  */
object Kafka {

  /** Source config: exactly one of `topics` (subscribe) or `topicPattern`
    * (subscribePattern) must be given. */
  final case class SourceConfig(
      bootstrapServers: String,
      topics: Seq[String] = Nil,
      topicPattern: Option[String] = None,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true,
      extra: Map[String, String] = Map.empty)

  final case class SinkConfig(
      bootstrapServers: String,
      topic: String,
      extra: Map[String, String] = Map.empty)

  /** The reference names intermediate topics by job
    * (`{bucket}_{job}__transient`-style); keep that convention. */
  def transientTopic(bucketPath: String, jobName: String): String =
    (bucketPath.stripPrefix("/").replace('/', '_') + "_" + jobName +
      "__transient").replaceAll("[^A-Za-z0-9._-]", "_")

  def sourceOptions(cfg: SourceConfig): Map[String, String] = {
    require(cfg.bootstrapServers.nonEmpty, "bootstrapServers is required")
    require(cfg.topics.nonEmpty ^ cfg.topicPattern.nonEmpty,
      "exactly one of topics / topicPattern must be set")
    require(Set("earliest", "latest").contains(cfg.startingOffsets) ||
      cfg.startingOffsets.startsWith("{"),
      "startingOffsets must be earliest, latest, or a per-partition JSON map")
    val subscribe: Map[String, String] =
      if (cfg.topics.nonEmpty) Map("subscribe" -> cfg.topics.mkString(","))
      else Map("subscribePattern" -> cfg.topicPattern.get)
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString) ++
      subscribe ++
      cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      cfg.extra
  }

  def sinkOptions(cfg: SinkConfig): Map[String, String] = {
    require(cfg.bootstrapServers.nonEmpty, "bootstrapServers is required")
    require(cfg.topic.nonEmpty, "topic is required")
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "topic" -> cfg.topic) ++ cfg.extra
  }

  /** S8: a fully-configured kafka stream reader; caller runs `.load()`
    * (requires the spark-sql-kafka connector on the classpath). */
  def kafkaStream(spark: SparkSession, cfg: SourceConfig): DataStreamReader =
    spark.readStream.format("kafka").options(sourceOptions(cfg))

  /** ST3: a fully-configured transient-topic writer for an enriched stream;
    * caller sets checkpoint/trigger and runs `.start()`. */
  def writeTransient(df: DataFrame, cfg: SinkConfig): DataStreamWriter[org.apache.spark.sql.Row] =
    toSinkRecords(df).writeStream.format("kafka").options(sinkOptions(cfg))

  /** JSON codec options: micros-precision timestamps (to_json's default
    * format truncates to millis, which would silently corrupt event times
    * through a topic round-trip). */
  val JsonOptions: Map[String, String] =
    Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Encode arbitrary rows to the kafka sink contract: `key` (binary,
    * optional) + `value` (binary JSON of the full record). Pure column work —
    * codegen'd, no UDFs. */
  def toSinkRecords(df: DataFrame, keyCol: Option[String] = None): DataFrame = {
    val value = to_json(struct(df.columns.map(col): _*), JsonOptions)
      .cast("binary").as("value")
    keyCol match {
      case Some(k) => df.select(col(k).cast("string").cast("binary").as("key"), value)
      case None    => df.select(value)
    }
  }

  /** Decode kafka-shaped records (key/value binary + metadata) back to typed
    * columns via `from_json` with an explicit schema. Works identically on
    * the streaming source output and on any batch DataFrame with the same
    * shape (how the tests drive it brokerless). */
  def parseSourceRecords(df: DataFrame, schema: StructType): DataFrame =
    df.select(from_json(col("value").cast("string"), schema,
        JsonOptions).as("r"))
      .select(col("r.*"))
}
