package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.dsl._

/** `QueryJson.parse(QueryJson.stringify(q)) == q` EXACTLY, over randomized
  * query trees covering every clause type, every tagged value type, nested
  * composition, and meta riders — the wire-fidelity contract a persisted
  * percolation registry rests on. */
object QueryJsonSpec extends Properties("QueryJson") {

  private val genValue: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(identity[Any]),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(identity[Any]),
    // doubles from the full range INCLUDING integral ones — the type tag
    // must keep 5.0 (double) distinct from 5L through the round-trip.
    // ±Infinity join the pool (they ride the dedicated "dx" string tag — a
    // JSON number can't carry them); NaN round-trips bit-exactly too but
    // can't sit in THIS property: Scala == on boxed doubles is numeric, so
    // NaN != NaN would falsify the AST-exact compare — the dedicated
    // property below pins it via doubleToLongBits
    Gen.chooseNum(-1e12, 1e12).map(identity[Any]),
    Gen.oneOf(Double.PositiveInfinity, Double.NegativeInfinity)
      .map(identity[Any]),
    Gen.oneOf(true, false).map(identity[Any]),
    Gen.chooseNum(0L, 4102444800000000L).map { us =>
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t: Any
    })

  private val genField: Gen[String] =
    Gen.oneOf("a", "nested.path", "f1", "with space", "unié")

  private val genClause: Gen[Clause] = Gen.oneOf(
    for { f <- genField; v <- genValue; n <- Gen.oneOf(true, false) }
      yield Eq(f, v, n),
    for { f <- genField; n <- Gen.chooseNum(0, 4);
          vs <- Gen.listOfN(n, genValue) } yield AnyOf(f, vs),
    for { f <- genField; n <- Gen.chooseNum(0, 4);
          vs <- Gen.listOfN(n, genValue) } yield AllOf(f, vs),
    for { f <- genField; p <- Gen.oneOf(true, false) } yield Present(f, p),
    for {
      f <- genField
      lo <- Gen.option(genValue); hi <- Gen.option(genValue)
      loInc <- Gen.oneOf(true, false); hiInc <- Gen.oneOf(true, false)
    } yield RangeClause(f, lo, loInc, hi, hiInc))

  private val genMeta: Gen[QueryMeta] = for {
    limit <- Gen.option(Gen.chooseNum(0, 1000000))
    nOrd <- Gen.chooseNum(0, 3)
    ord <- Gen.listOfN(nOrd,
      for { f <- genField; d <- Gen.oneOf(1, -1) } yield (f, d))
    nInc <- Gen.chooseNum(0, 2)
    inc <- Gen.listOfN(nInc, genField)
    nExc <- Gen.chooseNum(0, 2)
    exc <- Gen.listOfN(nExc, genField)
  } yield QueryMeta(limit, ord, inc, exc)

  private val genSingle: Gen[QueryComponent] = for {
    n <- Gen.chooseNum(0, 4)
    cs <- Gen.listOfN(n, genClause)
    any <- Gen.oneOf(true, false)
    m <- genMeta
  } yield SingleQuery(cs, any, m)

  private def genTree(depth: Int): Gen[QueryComponent] =
    if (depth == 0) genSingle
    else Gen.oneOf(genSingle, for {
      n <- Gen.chooseNum(1, 3)
      cs <- Gen.listOfN(n, genTree(depth - 1))
      and <- Gen.oneOf(true, false)
      m <- genMeta
    } yield MultiQuery(and, cs, m))

  property("parse . stringify == identity (AST-exact)") =
    Prop.forAll(genTree(2)) { q =>
      QueryJson.parse(QueryJson.stringify(q)) == q
    }

  property("stringify is deterministic") = Prop.forAll(genTree(2)) { q =>
    QueryJson.stringify(q) == QueryJson.stringify(q)
  }

  property("non-finite doubles round-trip bit-exactly under the dx tag") =
    Prop.forAll(Gen.oneOf(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity)) { d =>
      val q = SingleQuery(List(Eq("f", d)), anyOf = false, QueryMeta())
      val wire = QueryJson.stringify(q)
      val back = QueryJson.parse(wire).asInstanceOf[SingleQuery]
        .clauses.head.asInstanceOf[Eq].value.asInstanceOf[Double]
      // bit compare — Scala == says NaN != NaN; stringify-fixpoint pins
      // the wire form too (a second serialize must reproduce the row)
      java.lang.Double.doubleToLongBits(back) ==
        java.lang.Double.doubleToLongBits(d) &&
        QueryJson.stringify(QueryJson.parse(wire)) == wire
    }

  property("malformed input fails loudly, never returns a guess") =
    Prop.forAll(Gen.oneOf(
      """{"op":"xor","components":[]}""",
      """{"clauses":[{"t":"eq","f":"a","v":5}]}""", // untagged value
      """{"clauses":[{"t":"wat","f":"a"}]}""",
      """[1,2,3]""")) { bad =>
      Prop.throws(classOf[Exception])(QueryJson.parse(bad))
    }
}
