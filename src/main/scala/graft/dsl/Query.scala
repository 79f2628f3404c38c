package graft.dsl

/** Backend-neutral CRUD query DSL — the algebra of the reference's
  * `QueryComponent` tree (Aleph2 core `CrudUtils`), whose translations live in
  * `aleph2_crud_service_elasticsearch/.../utils/ElasticsearchUtils.java:124-253`
  * and `aleph2_crud_service_mongodb/.../utils/MongoDbUtils.java:104-222`.
  *
  * A [[SingleQuery]] is a conjunction (or, with `anyOf`, a disjunction) of
  * per-field clauses; a [[MultiQuery]] composes sub-queries with AND/OR,
  * arbitrarily nested (F7). Limit / multi-field sort / projection ride along
  * as [[QueryMeta]] (F8-F10).
  *
  * This is a pure immutable AST: compilation to Spark happens in
  * [[QueryCompiler]] so the same tree can be unit-tested algebraically, like
  * the reference's translator enumeration tests (`TestElasticsearchUtils`).
  */
sealed trait Clause { def field: String }
/** F1/F2 `when`/`whenNot` — term equality, optionally negated. */
final case class Eq(field: String, value: Any, negated: Boolean = false) extends Clause
/** F3 `withAny` — membership (`any_of`). */
final case class AnyOf(field: String, values: Seq[Any]) extends Clause
/** F4 `withAll` — array field must contain all values (`all_of`). */
final case class AllOf(field: String, values: Seq[Any]) extends Clause
/** F5 `withPresent`/`withNotPresent` — field existence. */
final case class Present(field: String, present: Boolean = true) extends Clause
/** F6 — the four open/closed range variants; either bound optional.
  * `loInc`/`hiInc` mirror `range_closed_*` vs `range_open_*`. */
final case class RangeClause(
    field: String,
    lo: Option[Any], loInc: Boolean,
    hi: Option[Any], hiInc: Boolean) extends Clause

/** F8-F10 riders: limit, multi-field ±sort, include/exclude projection. */
final case class QueryMeta(
    limit: Option[Int] = None,
    orderBy: Seq[(String, Int)] = Nil, // (field, +1 asc / -1 desc)
    includes: Seq[String] = Nil,
    excludes: Seq[String] = Nil) {
  def isEmpty: Boolean =
    limit.isEmpty && orderBy.isEmpty && includes.isEmpty && excludes.isEmpty
}

sealed trait QueryComponent { def meta: QueryMeta }

/** Field-clause conjunction/disjunction (`SingleQueryComponent`). */
final case class SingleQuery(
    clauses: Seq[Clause],
    anyOf: Boolean = false,
    meta: QueryMeta = QueryMeta()) extends QueryComponent {

  private def add(c: Clause): SingleQuery = copy(clauses = clauses :+ c)
  def when(field: String, v: Any): SingleQuery = add(Eq(field, v))
  def whenNot(field: String, v: Any): SingleQuery = add(Eq(field, v, negated = true))
  def withAny(field: String, vs: Seq[Any]): SingleQuery = add(AnyOf(field, vs))
  def withAll(field: String, vs: Seq[Any]): SingleQuery = add(AllOf(field, vs))
  def withPresent(field: String): SingleQuery = add(Present(field))
  def withNotPresent(field: String): SingleQuery = add(Present(field, present = false))
  def rangeAbove(field: String, lo: Any, inclusive: Boolean = true): SingleQuery =
    add(RangeClause(field, Some(lo), inclusive, None, hiInc = false))
  def rangeBelow(field: String, hi: Any, inclusive: Boolean = false): SingleQuery =
    add(RangeClause(field, None, loInc = false, Some(hi), inclusive))
  def rangeIn(field: String, lo: Any, hi: Any,
      loInc: Boolean = true, hiInc: Boolean = false): SingleQuery =
    add(RangeClause(field, Some(lo), loInc, Some(hi), hiInc))

  def limit(n: Int): SingleQuery = copy(meta = meta.copy(limit = Some(n)))
  def orderBy(fields: (String, Int)*): SingleQuery =
    copy(meta = meta.copy(orderBy = meta.orderBy ++ fields))
  def withFields(fields: String*): SingleQuery =
    copy(meta = meta.copy(includes = meta.includes ++ fields))
  def withoutFields(fields: String*): SingleQuery =
    copy(meta = meta.copy(excludes = meta.excludes ++ fields))
}

/** AND/OR of sub-queries (`MultiQueryComponent`), recursive. */
final case class MultiQuery(
    and: Boolean,
    components: Seq[QueryComponent],
    meta: QueryMeta = QueryMeta()) extends QueryComponent {
  def also(q: QueryComponent): MultiQuery = copy(components = components :+ q)
  def limit(n: Int): MultiQuery = copy(meta = meta.copy(limit = Some(n)))
  def orderBy(fields: (String, Int)*): MultiQuery =
    copy(meta = meta.copy(orderBy = meta.orderBy ++ fields))
}

object Query {
  /** `CrudUtils.allOf()` analog — conjunction of field clauses. */
  def allOf(): SingleQuery = SingleQuery(Nil, anyOf = false)
  /** `CrudUtils.anyOf()` analog — disjunction of field clauses. */
  def anyOf(): SingleQuery = SingleQuery(Nil, anyOf = true)
  /** `CrudUtils.allOf(q1, q2, ...)` — AND of sub-queries. */
  def and(qs: QueryComponent*): MultiQuery = MultiQuery(and = true, qs)
  /** `CrudUtils.anyOf(q1, q2, ...)` — OR of sub-queries. */
  def or(qs: QueryComponent*): MultiQuery = MultiQuery(and = false, qs)
}
