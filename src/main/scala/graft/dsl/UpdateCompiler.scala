package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles the update DSL to a table *rewrite*: every op becomes a
  * per-column expression guarded by the match predicate, evaluated in one
  * declarative pass over the table (no driver-side loops — the rewrite is a
  * single Catalyst plan that scales with executors).
  *
  * Semantics source: `MongoDbUtils.createUpdateObject`
  * (`aleph2_crud_service_mongodb/.../utils/MongoDbUtils.java:273-336`) and its
  * application in `MongoDbCrudService.updateObjectsBySpec`
  * (`MongoDbCrudService.java:493-525`).
  */
object UpdateCompiler {

  private def guarded(pred: Column, updated: Column, orig: Column): Column =
    when(coalesce(pred, lit(false)), updated).otherwise(orig)

  /** Rewrite `df` so rows matching `pred` have `u` applied (U1-U8).
    * Rows matching a [[DeleteDoc]] sentinel are dropped (U8).
    * Non-matching rows pass through byte-identical.
    *
    * The match predicate is materialized ONCE (as a hidden column) before
    * the op fold: Mongo matches each document against its original state,
    * so a later op's guard must not re-evaluate the predicate over columns
    * already rewritten by earlier ops (e.g. an unset of a predicate column
    * followed by any other op). */
  def applyUpdate(df: DataFrame, pred: Column, u: UpdateComponent): DataFrame = {
    if (u.ops.contains(DeleteDoc))
      return df.filter(!coalesce(pred, lit(false)))
    val matchCol = "__graft_match"
    val seeded = df.withColumn(matchCol, coalesce(pred, lit(false)))
    applyOps(seeded, col(matchCol), u).drop(matchCol)
  }

  /** Write `updated` at dot-path `f`: top-level fields use withColumn;
    * nested paths rewrite the containing struct via `withField` (Mongo's
    * `$set {"a.b": v}` mutates the nested field — a flat column named
    * "a.b" would be wrong). Reads at dot-paths are native (`col("a.b")`). */
  private def writeAt(df: DataFrame, f: String, updated: Column): DataFrame =
    if (!f.contains('.')) df.withColumn(f, updated)
    else {
      val Array(top, rest) = f.split("\\.", 2)
      df.withColumn(top, col(top).withField(rest, updated))
    }

  private def hasPath(df: DataFrame, f: String): Boolean =
    if (!f.contains('.')) df.columns.contains(f)
    else df.columns.contains(f.split("\\.", 2)(0))

  /** Resolve a dot-path's type through nested structs. */
  private def nestedType(schema: org.apache.spark.sql.types.StructType,
      f: String): Option[org.apache.spark.sql.types.DataType] =
    f.split('.').foldLeft(Option(schema: org.apache.spark.sql.types.DataType)) {
      case (Some(s: org.apache.spark.sql.types.StructType), part) =>
        s.fields.find(_.name == part).map(_.dataType)
      case _ => None
    }

  /** THE element-field resolver for array-element queries ($pull /
    * $set+arrayFilters): "" is the element itself, dot paths walk nested
    * struct fields — one definition so the two positional verbs can never
    * fork their path semantics. */
  private def elemResolver(x: Column): String => Column =
    name => if (name.isEmpty) x else name.split('.').foldLeft(x)(_.getField(_))

  private def applyOps(df: DataFrame, pred: Column, u: UpdateComponent): DataFrame = {
    u.ops.foldLeft(df) { (cur, op) =>
      op match {
        case SetField(f, v) =>
          val orig = if (hasPath(cur, f)) col(f) else lit(null)
          writeAt(cur, f, guarded(pred, lit(v), orig))
        case UnsetField(f) =>
          // schema-fixed engine: unset = typed null at any depth (dropping a
          // nested field per-row would fork the struct type across rows);
          // the oracle's CASE ... THEN NULL mirrors this exactly
          if (!hasPath(cur, f)) cur
          else nestedType(cur.schema, f) match {
            case None => cur
            case Some(t) =>
              writeAt(cur, f, guarded(pred, lit(null).cast(t), col(f)))
          }
        case Increment(f, by) =>
          writeAt(cur, f, guarded(pred, coalesce(col(f), lit(0)) + lit(by), col(f)))
        case AddItems(f, vs, dedup) if vs.nonEmpty =>
          val items = array(vs.map(lit): _*)
          val emptyT = org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.catalyst.expressions.Literal(vs.head).dataType)
          val appended =
            if (dedup) array_union(coalesce(col(f), items), items) // $addToSet
            else concat(coalesce(col(f), array().cast(emptyT)), items) // $push
          writeAt(cur, f, guarded(pred, appended, col(f)))
        case AddItems(_, _, _) => cur
        case RemoveItems(f, vs) => // $pullAll
          writeAt(cur, f,
            guarded(pred, array_except(col(f), array(vs.map(lit): _*)), col(f)))
        case RemoveMatching(f, q) => // $pull with nested query on elements
          val keep = (x: Column) =>
            !QueryCompiler.compileWith(q, elemResolver(x))
          writeAt(cur, f, guarded(pred, filter(col(f), keep), col(f)))
        case SetMatching(f, q, sub, v) => // $set + arrayFilters ($[e])
          // transform, not rebuild: withField patches ONE sub-field (dot
          // paths included) and preserves every other element field; a
          // NULL-predicate element is a non-match and passes unchanged
          val patched = transform(col(f), x => {
            val ep = QueryCompiler.compileWith(q, elemResolver(x))
            val curSub = sub.split('.').foldLeft(x)(_.getField(_))
            x.withField(sub,
              when(coalesce(ep, lit(false)), lit(v)).otherwise(curSub))
          })
          writeAt(cur, f, guarded(pred, patched, col(f)))
        case DeleteDoc => cur // handled above
      }
    }
  }

  /** U11 `deleteObjectsBySpec` — rewrite keeping non-matching rows; with
    * meta (sort+limit) = the reference's "top-k delete"
    * (`MongoDbCrudService.java:600-631`): delete only the top-k matches. */
  def deleteBySpec(df: DataFrame, q: QueryComponent): DataFrame = {
    val pred = QueryCompiler.compile(q)
    q.meta.limit match {
      case None => df.filter(!coalesce(pred, lit(false)))
      case Some(k) =>
        // top-k victims then anti-join back — TakeOrderedAndProject handles
        // the sort+limit without a global sort of the full table. Victims
        // are identified by a surrogate row id, not all-column equality:
        // null-unsafe equality would let any victim with a NULL column
        // survive, and exact-duplicate rows would ALL be removed (> k).
        // monotonically_increasing_id is stable here because both join
        // branches share the one scan/partition layout.
        val sid = "__graft_sid"
        val withId = df.withColumn(sid, monotonically_increasing_id())
        var victims = withId.filter(coalesce(pred, lit(false)))
        if (q.meta.orderBy.nonEmpty)
          victims = victims.orderBy(q.meta.orderBy.map { case (f, dir) =>
            if (dir < 0) col(f).desc else col(f).asc
          }: _*)
        withId.join(victims.limit(k).select(sid), Seq(sid), "left_anti")
          .drop(sid)
    }
  }
}
