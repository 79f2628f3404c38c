package graft.sql

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import graft.model.TypeMapping

/** Structural warehouse schema: the reference declares a warehouse table as a
  * nested JSON structure (`data_warehouse_schema.main_table.table_format`) and
  * compiles it to Hive DDL — `ElasticsearchHiveUtils.generatePartialHiveSchema`
  * (`aleph2_search_index_service_elasticsearch/.../utils/ElasticsearchHiveUtils.java:253-320`,
  * shapes exercised by `sample_hive_schema.json`). Shape vocabulary:
  *
  *  - `"BIGINT"`             primitive declared type (incl. `DECIMAL(p,s)`)
  *  - `{ "f": <shape> ... }` struct (at top level: the table's column list)
  *  - `[ <shape> ]`          array of one element type
  *  - `[ {}, <s1>, <s2> ]`   union of the tail alternatives (`{}` sentinel)
  *  - `[ "K", <shape> ]`     map (exactly two entries, textual key type)
  *
  * Two compilations:
  *  - [[hiveDdl]] — the reference-identical Hive DDL string (`STRUCT<>`,
  *    `ARRAY<>`, `UNIONTYPE<>`, `MAP<>`), golden-tested against the
  *    reference's hand-checked output format;
  *  - [[toStructType]] — the Spark-native schema: `UNIONTYPE` has no Spark
  *    equivalent so it lowers to a struct of nullable `alt<i>` fields
  *    (SURVEY §1.2), maps/arrays/structs map natively. This is what
  *    `CREATE TABLE ... USING parquet` actually registers.
  */
object HiveSchema {

  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  private def isUnion(a: JsonNode): Boolean =
    a.isArray && a.size > 1 && a.get(0).isObject && a.get(0).isEmpty

  private def isMap(a: JsonNode): Boolean =
    a.isArray && a.size == 2 && a.get(0).isTextual

  /** Reference-format Hive DDL fragment for one shape. Top level renders the
    * column list `(name TYPE,...)`; nested structs render `STRUCT<f: T,...>`
    * — same separators/spacing as the reference generator so its golden
    * strings match. */
  def hiveDdl(node: JsonNode, topLevel: Boolean = true): String = node match {
    case t if t.isTextual =>
      TypeMapping.toSparkType(t.asText()) // vocabulary check (throws on junk)
      t.asText()
    case a if isUnion(a) =>
      (1 until a.size).map(i => " " + hiveDdl(a.get(i), topLevel = false))
        .mkString("UNIONTYPE<", ",", ">")
    case a if isMap(a) =>
      s"MAP<${hiveDdl(a.get(0), topLevel = false)}, ${hiveDdl(a.get(1), topLevel = false)}>"
    case a if a.isArray && a.size == 1 =>
      s"ARRAY<${hiveDdl(a.get(0), topLevel = false)}>"
    case o if o.isObject =>
      val fields = new scala.collection.mutable.ArrayBuffer[String]
      o.fields().forEachRemaining { e =>
        val sep = if (topLevel) " " else ": "
        fields += s"${e.getKey}$sep${hiveDdl(e.getValue, topLevel = false)}"
      }
      if (topLevel) fields.mkString("(", ",", ")")
      else fields.mkString("STRUCT<", ",", ">")
    case other =>
      throw new IllegalArgumentException(s"unrecognized schema element: $other")
  }

  /** Spark type for one shape; `UNIONTYPE` → struct of nullable alternatives. */
  def toSparkType(node: JsonNode): DataType = node match {
    case t if t.isTextual => TypeMapping.toSparkType(t.asText())
    case a if isUnion(a) =>
      StructType((1 until a.size).map(i =>
        StructField(s"alt${i - 1}", toSparkType(a.get(i)), nullable = true)))
    case a if isMap(a) =>
      MapType(toSparkType(a.get(0)), toSparkType(a.get(1)))
    case a if a.isArray && a.size == 1 =>
      ArrayType(toSparkType(a.get(0)))
    case o if o.isObject => toStructType(o)
    case other =>
      throw new IllegalArgumentException(s"unrecognized schema element: $other")
  }

  /** Top-level object → the table's Spark schema. */
  def toStructType(top: JsonNode): StructType = {
    require(top.isObject, s"table_format must be a JSON object, got: $top")
    val fields = new scala.collection.mutable.ArrayBuffer[StructField]
    top.fields().forEachRemaining { e =>
      fields += StructField(e.getKey, toSparkType(e.getValue), nullable = true)
    }
    StructType(fields.toSeq)
  }
}
