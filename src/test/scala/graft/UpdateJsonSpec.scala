package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.dsl._

/** `UpdateJson.parse(UpdateJson.stringify(u)) == u` over randomized update
  * trees — every op type, QueryJson-tagged values (Long/Double/String/
  * Boolean — the canonical types), and embedded predicates. */
object UpdateJsonSpec extends Properties("UpdateJson") {

  private val genValue: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(identity[Any]),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(identity[Any]),
    Gen.chooseNum(-1e12, 1e12).map(identity[Any]),
    Gen.oneOf(true, false).map(identity[Any]))

  private val genField: Gen[String] = Gen.oneOf("a", "nested.path", "items")

  private val genPred: Gen[QueryComponent] = for {
    f <- genField; v <- genValue; neg <- Gen.oneOf(true, false)
  } yield SingleQuery(Seq(Eq(f, v, neg)))

  private val genNumber: Gen[Number] = Gen.oneOf(
    Gen.chooseNum(Long.MinValue, Long.MaxValue)
      .map(l => (l: java.lang.Long): Number),
    Gen.chooseNum(-1e9, 1e9).map(d => (d: java.lang.Double): Number))

  private val genOp: Gen[UpdateOp] = Gen.oneOf(
    for { f <- genField; v <- genValue } yield SetField(f, v),
    genField.map(UnsetField),
    for { f <- genField; by <- genNumber } yield Increment(f, by),
    for { f <- genField; n <- Gen.chooseNum(0, 3);
          vs <- Gen.listOfN(n, genValue); d <- Gen.oneOf(true, false) }
      yield AddItems(f, vs, d),
    for { f <- genField; n <- Gen.chooseNum(0, 3);
          vs <- Gen.listOfN(n, genValue) } yield RemoveItems(f, vs),
    for { f <- genField; p <- genPred } yield RemoveMatching(f, p),
    for { f <- genField; p <- genPred; sub <- genField; v <- genValue }
      yield SetMatching(f, p, sub, v),
    Gen.const(DeleteDoc: UpdateOp))

  private val genUpdate: Gen[UpdateComponent] = for {
    n <- Gen.chooseNum(0, 5)
    ops <- Gen.listOfN(n, genOp)
  } yield UpdateComponent(ops)

  property("parse . stringify == identity (AST-exact)") =
    Prop.forAll(genUpdate) { u =>
      UpdateJson.parse(UpdateJson.stringify(u)) == u
    }

  property("malformed input fails loudly") = Prop.forAll(Gen.oneOf(
    """[{"t":"wat"}]""",
    """[{"t":"inc","f":"a","by":{"s":"x"}}]""", // non-numeric increment
    """{"t":"set"}""")) { bad =>
    Prop.throws(classOf[Exception])(UpdateJson.parse(bad))
  }
}
