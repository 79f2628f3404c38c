package graft.dsl

import java.time.Instant

/** F12: date-range extraction from a query DSL tree — the Spark-side analog
  * of the reference's `interpretObviousDateRange`
  * (`aleph2_crud_service_elasticsearch/.../utils/ElasticsearchUtils.java:261-292`,
  * used by `ElasticsearchContext.java:199-236` to enumerate only the
  * time-sliced indexes a query can touch). Here the same extraction feeds a
  * predicate on the bucket store's time-PARTITION column, so Catalyst
  * prunes partition directories instead of index names.
  *
  * The extracted interval is a sound OVER-approximation of the instants the
  * query can match on `timeField`: AND contexts intersect child intervals,
  * OR contexts union them, and any clause the walker can't reason about
  * (other fields, negations, non-temporal values) widens to unbounded.
  * Exact row-level edges (inclusive vs exclusive, sub-partition precision)
  * are enforced by the compiled row predicate; pruning only needs the
  * partition superset to be correct, never tight.
  */
object TimeSlice {

  /** (earliest, latest) instant the query can match; `None` = unbounded. */
  type Bounds = (Option[Instant], Option[Instant])

  val Unbounded: Bounds = (None, None)

  /** Polymorphic date input, mirroring [[QueryCompiler]]'s `normalize` plus
    * the reference's epoch-long form (`ElasticsearchUtils.java:298-305`
    * `toLongDate`). Unconvertible values → None (the clause then widens to
    * unbounded rather than mis-pruning). */
  private def toInstant(v: Any): Option[Instant] = v match {
    case i: Instant             => Some(i)
    case t: java.sql.Timestamp  => Some(t.toInstant)
    case d: java.time.LocalDate => Some(d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant)
    case d: java.util.Date      => Some(Instant.ofEpochMilli(d.getTime))
    case l: Long                => Some(Instant.ofEpochMilli(l))
    case _                      => None
  }

  private def earlier(a: Instant, b: Instant): Instant = if (a.isBefore(b)) a else b
  private def later(a: Instant, b: Instant): Instant = if (a.isAfter(b)) a else b

  /** AND of two intervals: tightest bounds win; None = -/+infinity. */
  private def intersect(a: Bounds, b: Bounds): Bounds = (
    (a._1.toSeq ++ b._1.toSeq).reduceOption(later),
    (a._2.toSeq ++ b._2.toSeq).reduceOption(earlier))

  /** OR of two intervals: a branch unbounded on a side unbounds the union. */
  private def union(a: Bounds, b: Bounds): Bounds = (
    for { x <- a._1; y <- b._1 } yield earlier(x, y),
    for { x <- a._2; y <- b._2 } yield later(x, y))

  private def clauseBounds(c: Clause, timeField: String): Bounds = c match {
    case RangeClause(f, lo, _, hi, _) if f == timeField =>
      // inclusivity intentionally dropped — see object doc (superset rule)
      (lo.flatMap(toInstant), hi.flatMap(toInstant))
    case Eq(f, v, false) if f == timeField =>
      val i = toInstant(v); (i, i)
    case AnyOf(f, vs) if f == timeField && vs.nonEmpty =>
      val is = vs.map(toInstant)
      if (is.exists(_.isEmpty)) Unbounded
      else (Some(is.flatten.reduce(earlier)), Some(is.flatten.reduce(later)))
    case _ => Unbounded // negations, other fields, presence tests
  }

  /** Walk the query tree and return the implied interval for `timeField`. */
  def bounds(q: QueryComponent, timeField: String): Bounds = q match {
    case SingleQuery(Nil, _, _) => Unbounded
    case SingleQuery(cs, any, _) =>
      cs.map(clauseBounds(_, timeField))
        .reduce((a, b) => if (any) union(a, b) else intersect(a, b))
    case MultiQuery(_, Nil, _) => Unbounded
    case MultiQuery(and, qs, _) =>
      qs.map(bounds(_, timeField))
        .reduce((a, b) => if (and) intersect(a, b) else union(a, b))
  }
}
