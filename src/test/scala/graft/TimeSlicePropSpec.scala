package graft

import java.time.Instant

import org.scalacheck.{Gen, Prop, Properties}

import graft.dsl._

/** Property-based check of F12's soundness core: `TimeSlice.bounds` promises
  * a sound OVER-approximation of the instants a query can match
  * (`TimeSlice.scala:13-19` — "pruning only needs the partition superset to
  * be correct, never tight"). That is exactly a ScalaCheck law:
  *
  *   for every query tree q and every row r,
  *     compiled(q) accepts r  ⇒  r.ts ∈ [bounds(q)._1, bounds(q)._2]
  *
  * The generator covers everything the walker special-cases — time ranges
  * with mixed value encodings (Instant / Timestamp / epoch-Long /
  * LocalDate), time Eq/AnyOf, NEGATED time clauses (must widen, never
  * narrow), clauses on other fields, and and/or/MultiQuery nesting — so a
  * future edit that flips union/intersect or forgets the widening default
  * shrinks the interval and fails here on the first excluded-but-matching
  * row. The accepting side is the REAL compiled predicate (via
  * `compileFor`, so date coercion runs too), evaluated on an in-memory
  * frame of instants straddling the generated range.
  */
object TimeSlicePropSpec extends Properties("TimeSlice") {
  private lazy val spark = TestSession.spark

  private val T0 = Instant.parse("2024-01-01T00:00:00Z")
  private def at(h: Long): Instant = T0.plusSeconds(h * 3600)

  // rows at hourly instants over ~40 days, with a non-time distractor column
  private lazy val rows: Seq[(Long, Instant, String)] =
    (0L until 1000L by 7L).map(h => (h, at(h), if (h % 3 == 0) "A" else "B"))

  private lazy val df = {
    val s = spark
    import s.implicits._
    rows.map { case (id, ts, st) => (id, java.sql.Timestamp.from(ts), st) }
      .toDF("id", "ts", "status").cache()
  }

  // ---- generators ----------------------------------------------------------

  /** One instant, encoded in a random form the DSL accepts. */
  private val genTimeValue: Gen[(Instant, Any)] = for {
    h <- Gen.chooseNum(0L, 1000L)
    enc <- Gen.chooseNum(0, 3)
  } yield {
    val i = at(h)
    enc match {
      case 0 => (i, i)
      case 1 => (i, java.sql.Timestamp.from(i))
      case 2 => (i, i.toEpochMilli)
      case _ => // LocalDate truncates to midnight — re-derive the instant
        val d = i.atZone(java.time.ZoneOffset.UTC).toLocalDate
        (d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant, d)
    }
  }

  private val genTimeClause: Gen[Clause] = Gen.oneOf(
    for {
      lo <- Gen.option(genTimeValue)
      hi <- Gen.option(genTimeValue)
      loInc <- Gen.oneOf(true, false)
      hiInc <- Gen.oneOf(true, false)
    } yield RangeClause("ts", lo.map(_._2), loInc, hi.map(_._2), hiInc),
    for { (_, v) <- genTimeValue; n <- Gen.oneOf(true, false) }
      yield Eq("ts", v, n), // negated time-eq must widen to unbounded
    for { vs <- Gen.nonEmptyListOf(genTimeValue) } yield AnyOf("ts", vs.map(_._2)))

  private val genOtherClause: Gen[Clause] = Gen.oneOf(
    for { v <- Gen.oneOf("A", "B", "C"); n <- Gen.oneOf(true, false) }
      yield Eq("status", v, n),
    for {
      lo <- Gen.option(Gen.chooseNum(0L, 1000L))
      hi <- Gen.option(Gen.chooseNum(0L, 1000L))
    } yield RangeClause("id", lo, true, hi, true),
    Gen.const(Present("status", true)))

  private val genSingle: Gen[QueryComponent] = for {
    nT <- Gen.chooseNum(0, 2)
    nO <- Gen.chooseNum(0, 2)
    ts <- Gen.listOfN(nT, genTimeClause)
    os <- Gen.listOfN(nO, genOtherClause)
    any <- Gen.oneOf(true, false)
  } yield SingleQuery(scala.util.Random.shuffle(ts ++ os), any)

  private val genQuery: Gen[QueryComponent] = Gen.oneOf(
    genSingle,
    for {
      n <- Gen.chooseNum(1, 3)
      qs <- Gen.listOfN(n, genSingle)
      and <- Gen.oneOf(true, false)
    } yield MultiQuery(and, qs))

  // ---- the superset law ----------------------------------------------------

  private def contains(b: TimeSlice.Bounds, i: Instant): Boolean =
    b._1.forall(lo => !i.isBefore(lo)) && b._2.forall(hi => !i.isAfter(hi))

  property("every compiled-accepted row's ts lies inside bounds(q)") =
    Prop.forAllNoShrink(genQuery) { q =>
      val b = TimeSlice.bounds(q, "ts")
      val accepted = df.filter(QueryCompiler.compileFor(df, q))
        .select("id").collect().map(_.getLong(0)).toSet
      val byId = rows.map(r => r._1 -> r._2).toMap
      val escapees = accepted.filterNot(id => contains(b, byId(id)))
      if (escapees.nonEmpty)
        println(s"UNSOUND bounds $b for $q: accepted ts outside interval, " +
          s"ids=${escapees.take(5)}")
      escapees.isEmpty
    }

  /** Anti-triviality guard: on pure time-range conjunctions the walker must
    * actually NARROW (a bounds() that always returns Unbounded would pass
    * the soundness law vacuously). */
  property("a two-sided time range on an AND context yields finite bounds") =
    Prop.forAllNoShrink(for {
      lo <- genTimeValue; hi <- genTimeValue
    } yield (lo, hi)) { case ((loI, loV), (hiI, hiV)) =>
      val q = SingleQuery(Seq(RangeClause("ts", Some(loV), true, Some(hiV), true)), anyOf = false)
      TimeSlice.bounds(q, "ts") == ((Some(loI), Some(hiI)))
    }
}
