package graft.model

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dynamic-schema ingest: merging ragged batches under a collide policy —
  * SURVEY §1.3 / §7 hard-part 1.
  *
  * The reference's semantics (ES auto-mapping): schemas are inferred by
  * default with optional declared overrides; a type collision on ingest is
  * handled per `CollidePolicy` (`ElasticsearchIndexUtils.java:115-128`):
  * `new_type` shunts the record to an auto-incremented type (retry loop,
  * `ElasticsearchCrudService.java:401-433,465-574`), `error` rejects.
  *
  * Spark-native re-expression: batches are DataFrames; a collision is a
  * field whose types aren't in the same widening chain.
  *
  *  - `new_type` → numeric/temporal widening where lossless
  *    (byte→short→int→long→double; float→double; date→timestamp), and for
  *    true conflicts (e.g. long vs string, struct vs atom) the field falls
  *    back to its JSON-string form in place (the variant-style fallback
  *    column) — nothing is dropped, and the record stays queryable via
  *    `get_json_object`/`from_json` downstream.
  *  - `error` → IllegalArgumentException naming the field (reject).
  */
object SchemaEvolution {

  /** Widened common type, or None if the pair truly conflicts. */
  def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (NullType, y) => Some(y)
    case (x, NullType) => Some(x)
    case (x: NumericType, y: NumericType) =>
      val order: Seq[DataType] =
        Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
      (order.indexOf(x), order.indexOf(y)) match {
        case (ix, iy) if ix >= 0 && iy >= 0 =>
          // int-family + float-family meets at double to avoid precision loss
          val winner = order(math.max(ix, iy))
          if ((ix <= 3) != (iy <= 3)) Some(DoubleType) else Some(winner)
        case _ => None // decimals: keep explicit, treat as conflict for now
      }
    case (DateType, TimestampType) | (TimestampType, DateType) => Some(TimestampType)
    case (x: StructType, y: StructType) => Some(mergeStructs(x, y))
    case (ArrayType(xe, xn), ArrayType(ye, yn)) =>
      widen(xe, ye).map(e => ArrayType(e, xn || yn))
    case _ => None
  }

  /** Merge two struct schemas field-by-field; conflicting fields widen to
    * StringType (the JSON-string variant fallback). */
  def mergeStructs(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case Some(fb) =>
          StructField(fa.name,
            widen(fa.dataType, fb.dataType).getOrElse(StringType),
            fa.nullable || fb.nullable)
        case None => fa.copy(nullable = true)
      }
    }
    val extra = b.fields.filterNot(f => a.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(merged ++ extra)
  }

  /** Fields of `a`/`b` that cannot widen (true collisions), recursing into
    * nested structs so an inner conflict reports its dotted path — under the
    * 'error' policy a nested conflict must reject, not silently fall back to
    * the StringType variant column. */
  def collisions(a: StructType, b: StructType, prefix: String = ""): Seq[String] =
    a.fields.flatMap { fa =>
      b.fields.find(_.name == fa.name).toSeq.flatMap { fb =>
        (fa.dataType, fb.dataType) match {
          case (x: StructType, y: StructType) =>
            collisions(x, y, prefix + fa.name + ".")
          case (ArrayType(x: StructType, _), ArrayType(y: StructType, _)) =>
            collisions(x, y, prefix + fa.name + ".")
          case (x, y) if widen(x, y).isEmpty => Seq(prefix + fa.name)
          case _ => Nil
        }
      }
    }.toSeq

  /** Conform a frame to the target schema: widenable fields cast natively;
    * conflict fields serialize to their JSON form (variant fallback);
    * missing fields become typed nulls. Column order follows `target`. */
  def conformTo(df: DataFrame, target: StructType): DataFrame = {
    val cols: Seq[Column] = target.fields.toSeq.map { tf =>
      if (!df.columns.contains(tf.name))
        lit(null).cast(tf.dataType).as(tf.name)
      else {
        val cur = df.schema(tf.name).dataType
        if (cur == tf.dataType) col(tf.name)
        else if (widen(cur, tf.dataType).contains(tf.dataType))
          col(tf.name).cast(tf.dataType).as(tf.name)
        else if (tf.dataType == StringType) {
          // variant fallback: JSON-serialize complex values, plain cast atoms
          cur match {
            case _: StructType | _: ArrayType | _: MapType =>
              to_json(col(tf.name)).as(tf.name)
            case _ => col(tf.name).cast(StringType).as(tf.name)
          }
        } else col(tf.name).cast(tf.dataType).as(tf.name)
      }
    }
    df.select(cols: _*)
  }

  /** Ingest-union of ragged batches under the bucket's collide policy.
    * Declared overrides (per-bucket fixed fields) win over inference. */
  def unionWithPolicy(batches: Seq[DataFrame], policy: String = "new_type",
      declaredOverrides: Map[String, DataType] = Map.empty): DataFrame = {
    require(batches.nonEmpty, "no batches")
    val schemas = batches.map(_.schema)
    if (policy == "error") {
      // fold against the RUNNING merged schema — adjacent-pair checking
      // would miss a conflict between batches 1 and 3 bridged by a batch
      // that lacks the field
      schemas.tail.foldLeft(schemas.head) { (acc, next) =>
        val bad = collisions(acc, next)
        if (bad.nonEmpty)
          throw new IllegalArgumentException(
            s"collide policy 'error': conflicting fields ${bad.mkString(", ")}")
        mergeStructs(acc, next)
      }
    }
    val merged0 = schemas.reduce(mergeStructs)
    val merged = StructType(merged0.fields.map(f =>
      declaredOverrides.get(f.name).map(t => f.copy(dataType = t)).getOrElse(f)))
    batches.map(conformTo(_, merged)).reduce(_.unionByName(_))
  }
}
