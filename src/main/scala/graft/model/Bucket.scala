package graft.model

import org.apache.spark.sql.types._

/** Bucket = named dataset + schema bundle — the engine's unit of data
  * management, mirroring the reference's `DataBucketBean.data_schema()`
  * consumed at e.g. `ElasticsearchIndexUtils.java:87-95` (bucket→index name),
  * `ElasticsearchHiveUtils.java:100-140` (warehouse schema),
  * `HfdsDataWriteService.java:265-272` (storage schema).
  *
  * Physical layout (see [[graft.store.BucketStore]]): one directory root per
  * bucket holding `raw/ json/ processed/` stage dirs, each with a `current`
  * and optional named secondary buffers (ping-pong promote).
  */
final case class Bucket(
    fullName: String, // e.g. "/test/events" — slash-path like the reference
    dataSchema: DataSchema = DataSchema()) {
  /** Stable table-ish signature: the analog of the reference's
    * `getBaseIndexName` (slashes → underscores, lowercase). */
  def signature: String =
    fullName.stripPrefix("/").replaceAll("[/\\s]+", "_").toLowerCase
}

final case class DataSchema(
    temporal: Option[TemporalSchema] = None,
    columnar: Option[ColumnarSchema] = None,
    document: Option[DocumentSchema] = None,
    storage: Option[StorageSchema] = None,
    searchIndex: Option[SearchIndexSchema] = None,
    dataWarehouse: Option[WarehouseSchema] = None)

/** Time-slicing config (`temporal_schema`): drives the partition column the
  * store derives at write time — the Spark-native replacement for the
  * reference's time-sliced index/dir routing
  * (`ElasticsearchContextUtils.java:50-132`, grouping periods;
  * `HfdsDataWriteService.java:509-525`, per-record time extraction). */
final case class TemporalSchema(
    timeField: String,
    groupingPeriod: GroupingPeriod = GroupingPeriod.Daily)

sealed abstract class GroupingPeriod(val name: String, val pattern: String)
object GroupingPeriod {
  /** Partition value = UTC-truncated string; lexicographic order == time
    * order, so range predicates prune partitions. */
  case object Hourly extends GroupingPeriod("hourly", "yyyy-MM-dd-HH")
  case object Daily extends GroupingPeriod("daily", "yyyy-MM-dd")
  case object Weekly extends GroupingPeriod("weekly", "YYYY-'w'ww")
  case object Monthly extends GroupingPeriod("monthly", "yyyy-MM")
  case object Yearly extends GroupingPeriod("yearly", "yyyy")
  val all: Seq[GroupingPeriod] = Seq(Hourly, Daily, Weekly, Monthly, Yearly)
  def of(name: String): GroupingPeriod =
    all.find(_.name == name).getOrElse(Daily)
}

/** Columnar schema (`columnar_schema`): in the reference this generated ES
  * doc_values per field (`ElasticsearchIndexUtils.java:416-437,639-720`);
  * over Parquet, storage is already columnar, so the include/exclude lists
  * become a column selection/stats policy applied on write. */
final case class ColumnarSchema(
    fieldIncludeList: Seq[String] = Nil,
    fieldExcludeList: Seq[String] = Nil,
    fieldIncludePatternList: Seq[String] = Nil,
    fieldExcludePatternList: Seq[String] = Nil)

/** Document schema: dedup fields + policy (D1-D3). */
final case class DocumentSchema(
    deduplicationFields: Seq[String] = Nil,
    deduplicationPolicy: DedupPolicy = DedupPolicy.KeepFirst)

sealed trait DedupPolicy
object DedupPolicy {
  /** winner = first by deterministic order (reference SimpleGraphMergeService
    * keep-first behavior) */
  case object KeepFirst extends DedupPolicy
  case object KeepLast extends DedupPolicy
  /** custom merge of the candidate group — X3 merge-module seam */
  final case class Custom(merge: (Seq[org.apache.spark.sql.Row]) => org.apache.spark.sql.Row)
    extends DedupPolicy
}

/** Storage schema per stage (raw/json/processed): codec + retention — the
  * analog of `storage_schema` consumed at `HfdsDataWriteService.java:265-272`
  * and retention at `HdfsStorageService.java:593-601`. */
final case class StorageSchema(
    enabled: Boolean = true,
    codec: Option[String] = None, // parquet compression: snappy/gzip/zstd
    existAgeMax: Option[java.time.Duration] = None)

final case class SearchIndexSchema(
    tokenizeByDefault: Boolean = true,
    typeOverride: Map[String, String] = Map.empty,
    /** collide policy (`ElasticsearchIndexUtils.java:115-128`):
      * "new_type" → widen/quarantine, "error" → reject */
    collidePolicy: String = "new_type")

/** Warehouse schema: declared fixed types (`ElasticsearchHiveUtils.java:86-91`)
  * → Spark DDL via [[TypeMapping]]. */
final case class WarehouseSchema(mainTable: Map[String, String] = Map.empty)

/** Declared-type vocabulary → Spark SQL types (SURVEY §1.2). */
object TypeMapping {
  def toSparkType(t: String): DataType = {
    val up = t.trim.toUpperCase
    up match {
      case "TINYINT" => ByteType
      case "SMALLINT" => ShortType
      case "INT" | "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "BOOLEAN" => BooleanType
      case "FLOAT" => FloatType
      case "DOUBLE" => DoubleType
      case "STRING" => StringType
      case "BINARY" => BinaryType
      case "TIMESTAMP" => TimestampType
      case "DATE" => DateType
      case s if s.startsWith("DECIMAL") =>
        val ps = "\\d+".r.findAllIn(s).toSeq.map(_.toInt)
        if (ps.size >= 2) DecimalType(ps(0), ps(1))
        else if (ps.size == 1) DecimalType(ps(0), 0)
        else DecimalType(38, 18)
      case s if s.startsWith("VARCHAR") || s.startsWith("CHAR") => StringType
      case s if s.startsWith("ARRAY<") && s.endsWith(">") =>
        ArrayType(toSparkType(s.stripPrefix("ARRAY<").stripSuffix(">")))
      case s if s.startsWith("STRUCT<") && s.endsWith(">") =>
        val body = s.stripPrefix("STRUCT<").stripSuffix(">")
        StructType(splitTopLevel(body).map { f =>
          val Array(n, ft) = f.split(":", 2)
          StructField(n.trim.toLowerCase, toSparkType(ft))
        })
      // UNIONTYPE<> has no Spark equivalent → struct of nullable alternatives
      case s if s.startsWith("UNIONTYPE<") && s.endsWith(">") =>
        val alts = splitTopLevel(s.stripPrefix("UNIONTYPE<").stripSuffix(">"))
        StructType(alts.zipWithIndex.map { case (a, i) =>
          StructField(s"alt$i", toSparkType(a))
        })
      case other => throw new IllegalArgumentException(s"unknown declared type: $other")
    }
  }

  /** split "a:INT,b:STRUCT<x:INT,y:INT>" on top-level commas only */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '<' => depth += 1; cur += '<'
      case '>' => depth -= 1; cur += '>'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.toSeq
  }
}
