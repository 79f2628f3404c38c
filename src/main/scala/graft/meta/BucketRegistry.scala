package graft.meta

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.crud.CrudService
import graft.dsl.Query
import graft.model._
import graft.store.BucketStore

/** Bucket/library metadata registry — the engine's management DB
  * (the reference ships a whole module for bucket CRUD + sync,
  * `aleph2_management_db_service_mongodb/.../MongoDbManagementDbService.java`;
  * bucket stores at `.../MongoDbManagementDbService.java` getDataBucketStore).
  *
  * Implementation principle: the registry IS a bucket (`/meta/buckets`) and
  * its CRUD IS the engine's own [[CrudService]] — one storage/query path for
  * data and metadata alike. Each registered bucket is one flat row
  * (`_id` = full path), so registry lookups are ordinary pushed-down scans
  * and `list` by path prefix is a `startswith` filter, not a directory walk.
  *
  * Declarative schema fields round-trip; a function-valued
  * `DedupPolicy.Custom` records as policy name `custom` and reads back as
  * KeepFirst (the reference stores module *class names*, not closures —
  * same limitation, made explicit here).
  */
final class BucketRegistry(store: BucketStore) {
  import BucketRegistry._

  private val metaBucket = Bucket(MetaPath)
  private val crud = new CrudService(store, metaBucket)

  /** Upsert one bucket's descriptor row. */
  def register(b: Bucket): Unit = registerAll(Seq(b))

  /** Bulk upsert — ONE table rewrite for N buckets (use this for batches;
    * per-bucket register would rewrite the registry N times). */
  def registerAll(bs: Seq[Bucket]): Unit = {
    require(bs.nonEmpty, "no buckets")
    val s = SparkSession.active
    val rows = bs.map(toRow)
    val df = s.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    crud.storeObjects(df, replacePresent = true)
  }

  /** Lookup by full path. */
  def get(fullName: String): Option[Bucket] =
    crud.getObjectById(fullName).map(fromRow)

  /** All descriptor rows under a path prefix — a queryable DataFrame (the
    * mgmt-DB "list buckets" surface). */
  def list(pathPrefix: String = "/"): DataFrame =
    crud.getObjectsBySpec(Query.allOf())
      .filter(col("full_name").startsWith(pathPrefix))

  /** Remove a bucket's registration; true iff it existed. */
  def unregister(fullName: String): Boolean =
    crud.deleteObjectById(fullName)
}

object BucketRegistry {
  val MetaPath = "/meta/buckets"

  /** Flat descriptor schema: every declarative DataSchema field as a plain
    * column (maps/lists join to sorted strings so rows stay scalar). */
  val schema: StructType = StructType(Seq(
    StructField("_id", StringType, nullable = false),
    StructField("full_name", StringType, nullable = false),
    StructField("signature", StringType, nullable = false),
    StructField("time_field", StringType),
    StructField("grouping_period", StringType),
    StructField("codec", StringType),
    StructField("exist_age_sec", LongType),
    StructField("storage_enabled", BooleanType),
    StructField("tokenize_default", BooleanType),
    StructField("collide_policy", StringType),
    StructField("type_override", StringType),
    StructField("dedup_fields", StringType),
    StructField("dedup_policy", StringType),
    StructField("columnar_include", StringType),
    StructField("columnar_exclude", StringType),
    StructField("columnar_include_patterns", StringType),
    StructField("columnar_exclude_patterns", StringType),
    StructField("warehouse_cols", StringType)))

  // entry separator is ';' — ',' appears inside legitimate values like the
  // warehouse type DECIMAL(18,6), which would corrupt the round-trip
  private def joinMap(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (k, v) => s"$k:$v" }.mkString(";")
  private def splitMap(s: String): Map[String, String] =
    if (s == null || s.isEmpty) Map.empty
    else s.split(';').map { kv =>
      val Array(k, v) = kv.split(":", 2); k -> v
    }.toMap
  private def joinSeq(xs: Seq[String]): String = xs.mkString(";")
  private def splitSeq(s: String): Seq[String] =
    if (s == null || s.isEmpty) Nil else s.split(';').toSeq

  def toRow(b: Bucket): Row = {
    val d = b.dataSchema
    Row(
      b.fullName,
      b.fullName,
      b.signature,
      d.temporal.map(_.timeField).orNull,
      d.temporal.map(_.groupingPeriod.name).orNull,
      d.storage.flatMap(_.codec).orNull,
      d.storage.flatMap(_.existAgeMax).map(_.getSeconds)
        .map(Long.box).orNull,
      d.storage.map(s => Boolean.box(s.enabled)).orNull,
      d.searchIndex.map(s => Boolean.box(s.tokenizeByDefault)).orNull,
      d.searchIndex.map(_.collidePolicy).orNull,
      d.searchIndex.map(s => joinMap(s.typeOverride)).orNull,
      d.document.map(doc => joinSeq(doc.deduplicationFields)).orNull,
      d.document.map(_.deduplicationPolicy match {
        case DedupPolicy.KeepFirst => "keep_first"
        case DedupPolicy.KeepLast => "keep_last"
        case _: DedupPolicy.Custom => "custom"
      }).orNull,
      d.columnar.map(c => joinSeq(c.fieldIncludeList)).orNull,
      d.columnar.map(c => joinSeq(c.fieldExcludeList)).orNull,
      d.columnar.map(c => joinSeq(c.fieldIncludePatternList)).orNull,
      d.columnar.map(c => joinSeq(c.fieldExcludePatternList)).orNull,
      d.dataWarehouse.map(w => joinMap(w.mainTable)).orNull)
  }

  def fromRow(r: Row): Bucket = {
    def s(n: String): Option[String] = Option(r.getAs[String](n))
    val temporal = s("time_field").map(tf =>
      TemporalSchema(tf, GroupingPeriod.of(s("grouping_period").getOrElse("daily"))))
    val storage =
      if (s("codec").isEmpty && r.isNullAt(r.fieldIndex("exist_age_sec")) &&
        r.isNullAt(r.fieldIndex("storage_enabled"))) None
      else Some(StorageSchema(
        enabled = if (r.isNullAt(r.fieldIndex("storage_enabled"))) true
          else r.getAs[Boolean]("storage_enabled"),
        codec = s("codec"),
        existAgeMax = if (r.isNullAt(r.fieldIndex("exist_age_sec"))) None
          else Some(java.time.Duration.ofSeconds(r.getAs[Long]("exist_age_sec")))))
    val search =
      if (r.isNullAt(r.fieldIndex("tokenize_default")) &&
        s("collide_policy").isEmpty) None
      else Some(SearchIndexSchema(
        tokenizeByDefault = if (r.isNullAt(r.fieldIndex("tokenize_default"))) true
          else r.getAs[Boolean]("tokenize_default"),
        typeOverride = splitMap(r.getAs[String]("type_override")),
        collidePolicy = s("collide_policy").getOrElse("new_type")))
    val doc = s("dedup_policy").map(p => DocumentSchema(
      deduplicationFields = splitSeq(r.getAs[String]("dedup_fields")),
      deduplicationPolicy = p match {
        case "keep_last" => DedupPolicy.KeepLast
        case _ => DedupPolicy.KeepFirst
      }))
    val columnar =
      if (s("columnar_include").isEmpty && s("columnar_exclude").isEmpty &&
        s("columnar_include_patterns").isEmpty &&
        s("columnar_exclude_patterns").isEmpty) None
      else Some(ColumnarSchema(
        fieldIncludeList = splitSeq(r.getAs[String]("columnar_include")),
        fieldExcludeList = splitSeq(r.getAs[String]("columnar_exclude")),
        fieldIncludePatternList = splitSeq(r.getAs[String]("columnar_include_patterns")),
        fieldExcludePatternList = splitSeq(r.getAs[String]("columnar_exclude_patterns"))))
    val wh = s("warehouse_cols").map(w => WarehouseSchema(splitMap(w)))
    Bucket(r.getAs[String]("full_name"), DataSchema(
      temporal = temporal, columnar = columnar, document = doc,
      storage = storage, searchIndex = search, dataWarehouse = wh))
  }
}
