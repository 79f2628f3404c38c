package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles the backend-neutral query DSL to Catalyst `Column` trees — the
  * Spark analog of the reference's two hand-written translators
  * (`ElasticsearchUtils.convertToElasticsearchFilter`,
  * `aleph2_crud_service_elasticsearch/.../utils/ElasticsearchUtils.java:81-253`;
  * `MongoDbUtils.convertToMongoQuery`,
  * `aleph2_crud_service_mongodb/.../utils/MongoDbUtils.java:67-222`).
  *
  * Because the output is a declarative `Column` predicate applied to a
  * DataFrame, Catalyst gets full predicate pushdown / partition pruning /
  * column pruning for free — the reference had to hand-build each of those
  * (e.g. `interpretObviousDateRange`, `ElasticsearchUtils.java:261-292`, is
  * subsumed by partition pruning on the time-partition column).
  */
object QueryCompiler {

  /** Convert a DSL value to a literal Column. Dates are polymorphic on input
    * in the reference (`ElasticsearchUtils.java:298-305` `toLongDate`):
    * epoch-long handled by caller context; we pass through native types and
    * coerce java.time types to their SQL equivalents. */
  private def normalize(v: Any): Any = v match {
    case i: java.time.Instant => java.sql.Timestamp.from(i)
    case d: java.time.LocalDate => java.sql.Date.valueOf(d)
    case d: java.util.Date if !d.isInstanceOf[java.sql.Date] &&
        !d.isInstanceOf[java.sql.Timestamp] =>
      new java.sql.Timestamp(d.getTime)
    case other => other
  }

  private def toLit(v: Any): Column = v match {
    case c: Column => c
    case other => lit(normalize(other))
  }

  /** Dot-path field access (F11). `col("a.b.c")` resolves nested struct
    * fields natively in Catalyst (`GetStructField`). A val so metadata-field
    * validation can tell table-level resolution apart from the array-element
    * resolvers `compileWith` gets from `$pull`-style nested queries (an
    * element struct may legitimately carry its own `_id` field). */
  private val topLevel: String => Column = (f: String) => col(f)

  /** Metadata fields with restricted operator support. The reference routes
    * `withAny("_id",…)` to an ids filter and REJECTS `withAll`/`exists` on
    * `_id`/`_type` (`ElasticsearchUtils.java:129-144,157-159,179-190`) —
    * `_id` is a scalar key, so set-containment and presence tests are
    * user-error; surfacing the rejection keeps DSL programs portable. */
  private val MetaFields = Set("_id", "_type")

  private def validate(c: Clause): Clause = c match {
    case AllOf(f, _) if MetaFields(f) =>
      throw new IllegalArgumentException(
        s"withAll is not supported on metadata field $f (scalar key)")
    case Present(f, _) if MetaFields(f) =>
      throw new IllegalArgumentException(
        s"exists/notExists is not supported on metadata field $f")
    case RangeClause(f, _, _, _, _) if MetaFields(f) =>
      // the reference gates _id ranges behind an explicit `id_ranges_ok`
      // opt-in (`ElasticsearchUtils.java:157-159`) because id order is a
      // storage artifact; range on a natural key column instead
      throw new IllegalArgumentException(
        s"range queries on metadata field $f are not supported " +
          "(query a natural key column instead)")
    case ok => ok
  }

  def compileClause(c: Clause): Column = compileClause(c, topLevel)

  def compileClause(c0: Clause, field: String => Column): Column =
    (if (field eq topLevel) validate(c0) else c0) match {
    case Eq(f, v, false) => field(f) === toLit(v)
    case Eq(f, v, true) => !(field(f) <=> toLit(v)) // whenNot: null-safe negation
    case AnyOf(f, vs) =>
      // In expression (not an OR chain) so the parquet source gets an In
      // pushdown filter — the analog of ES termsFilter execution("or").
      field(f).isin(vs.map(normalize): _*)
    case AllOf(f, vs) =>
      // array field must contain every value (ES termsFilter execution("and"),
      // Mongo $all). array_intersect is order/dup-insensitive.
      size(array_intersect(field(f), array(vs.map(toLit): _*))) === lit(vs.distinct.size)
    case Present(f, true) => field(f).isNotNull
    case Present(f, false) => field(f).isNull
    case RangeClause(f, lo, loInc, hi, hiInc) =>
      val loC = lo.map(v => if (loInc) field(f) >= toLit(v) else field(f) > toLit(v))
      val hiC = hi.map(v => if (hiInc) field(f) <= toLit(v) else field(f) < toLit(v))
      (loC, hiC) match {
        case (Some(a), Some(b)) => a && b
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case (None, None) => lit(true)
      }
  }

  /** QueryComponent tree → one Column predicate (recursive, F7). */
  /** Schema-directed date coercion. The reference's DSL accepts epoch-millis
    * longs anywhere a date is expected (`ElasticsearchUtils.java:298-305`
    * `toLongDate`); a bare Long is ambiguous at the AST level — it is also a
    * perfectly good value for a numeric column — so the rewrite happens here,
    * where the target DataFrame's schema disambiguates: Long values in
    * clauses on timestamp/date-typed columns (dot-paths resolved through
    * nested structs) become epoch-millis Timestamps, keeping the row
    * predicate consistent with [[TimeSlice]]'s partition-pruning
    * interpretation of the same literal. Everything else passes through. */
  def coerceDates(df: DataFrame, q: QueryComponent): QueryComponent = {
    import org.apache.spark.sql.types._
    def pathType(t: DataType, path: List[String]): Option[DataType] = (t, path) match {
      case (dt, Nil) => Some(dt)
      case (s: StructType, h :: rest) =>
        s.fields.find(_.name == h).flatMap(f => pathType(f.dataType, rest))
      case _ => None
    }
    def isTime(field: String): Boolean =
      pathType(df.schema, field.split('.').toList).exists {
        case TimestampType | TimestampNTZType | DateType => true
        case _ => false
      }
    def cv(f: String, v: Any): Any = v match {
      // java.sql.{Timestamp, Date} are lit()-supported as-is — and Timestamp
      // must NOT fall into the util.Date case below (getTime drops nanos)
      case t: java.sql.Timestamp => t
      case d: java.sql.Date => d
      // the reference's toLongDate accepts java.util.Date / Instant /
      // LocalDate too; Spark's lit() does not, so map them to Timestamp on
      // time-typed columns (TimeSlice already prunes on the same values)
      case d: java.util.Date if isTime(f) => new java.sql.Timestamp(d.getTime)
      case i: java.time.Instant if isTime(f) => java.sql.Timestamp.from(i)
      // UTC midnight, NOT the JVM-default-zone midnight: TimeSlice.toInstant
      // interprets the same LocalDate at UTC for partition pruning, and a
      // zone mismatch here would prune partitions the compiled predicate
      // still matches (silent row loss on non-UTC hosts)
      case ld: java.time.LocalDate if isTime(f) =>
        java.sql.Timestamp.from(ld.atStartOfDay(java.time.ZoneOffset.UTC).toInstant)
      case l: Long if isTime(f) => new java.sql.Timestamp(l)
      case other => other
    }
    def cc(c: Clause): Clause = c match {
      case Eq(f, v, n) => Eq(f, cv(f, v), n)
      case AnyOf(f, vs) => AnyOf(f, vs.map(cv(f, _)))
      case AllOf(f, vs) => AllOf(f, vs.map(cv(f, _)))
      case RangeClause(f, lo, li, hi, hi2) =>
        RangeClause(f, lo.map(cv(f, _)), li, hi.map(cv(f, _)), hi2)
      case p: Present => p
    }
    q match {
      case s: SingleQuery => s.copy(clauses = s.clauses.map(cc))
      case m: MultiQuery => m.copy(components = m.components.map(coerceDates(df, _)))
    }
  }

  /** [[compile]] with the target schema in hand — see [[coerceDates]]. */
  def compileFor(df: DataFrame, q: QueryComponent): Column =
    compile(coerceDates(df, q))

  def compile(q: QueryComponent): Column = compileWith(q, topLevel)

  /** Same, with a custom field resolver — used to evaluate a nested query
    * against array *elements* (update DSL U7 `$pull`-with-query), where the
    * reference nests a QueryComponent inside the update
    * (`MongoDbUtils.java:325-326`). */
  def compileWith(q: QueryComponent, field: String => Column): Column = q match {
    case SingleQuery(Nil, _, _) => lit(true)
    case SingleQuery(cs, any, _) =>
      cs.map(compileClause(_, field)).reduce((a, b) => if (any) a || b else a && b)
    case MultiQuery(_, Nil, _) => lit(true)
    case MultiQuery(and, qs, _) =>
      qs.map(compileWith(_, field)).reduce((a, b) => if (and) a && b else a || b)
  }

  /** Apply predicate + meta (sort F9, limit F8, projection F10) to a frame —
    * the full read path of `getObjectsBySpec`
    * (`ElasticsearchCrudService.java:750-799`). */
  def run(df: DataFrame, q: QueryComponent): DataFrame = {
    var out = df.filter(compileFor(df, q))
    val m = q.meta
    if (m.orderBy.nonEmpty)
      out = out.orderBy(m.orderBy.map { case (f, dir) =>
        if (dir < 0) col(f).desc else col(f).asc
      }: _*)
    m.limit.foreach(n => out = out.limit(n))
    if (m.includes.nonEmpty) out = out.select(m.includes.map(col): _*)
    else if (m.excludes.nonEmpty) out = out.drop(m.excludes: _*)
    out
  }
}
