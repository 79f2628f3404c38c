package graft

import org.scalacheck.{Arbitrary, Gen, Prop, Properties}

import graft.js.Js

/** Property laws for the JS stage's record bridge (`Js.Json`) and value
  * semantics — the contract the x10/st21 oracles rely on:
  *
  *  1. parse(stringify(v)) reproduces v structurally for every JSON value
  *     (deep equality, key order preserved);
  *  2. stringify∘parse is IDEMPOTENT on its own output (a canonical form —
  *     a second round trip can never drift);
  *  3. numbers in the BIGINT-exact integer range print without a decimal
  *     point (what `from_json` on a typed schema depends on);
  *  4. strict equality is reflexive for scalars and `==` agrees with `===`
  *     on same-type operands.
  */
object JsPropSpec extends Properties("JsJson") {

  // ---- JSON value generator (bounded depth) --------------------------------

  private val genScalar: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Arbitrary.arbitrary[Boolean].map(b => b: Any),
    // doubles that JSON can represent (no NaN/Inf) incl. exact integers
    Gen.oneOf(
      Gen.chooseNum(-1000000L, 1000000L).map(_.toDouble),
      Gen.chooseNum(-1e9, 1e9),
      Gen.chooseNum(-9.0e15, 9.0e15).map(math.rint)),
    // strings incl. the escapes the serializer special-cases
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf('"', '\\', '\n', '\t', '\r', ' ', 'é', '→', '')))
      .map(_.mkString))

  private def genValue(depth: Int): Gen[Any] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      4 -> genScalar,
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(xs => Js.JsArray(xs: _*)),
      1 -> Gen.listOfN(3, Gen.zip(Gen.alphaNumStr, genValue(depth - 1)))
        .map(kvs => Js.JsObject(kvs.distinctBy(_._1): _*)))

  private val genJson: Gen[Any] = genValue(3)

  /** Structural deep equality over the interpreter's value types. */
  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Js.JsArray, y: Js.JsArray) =>
      x.items.length == y.items.length &&
        x.items.zip(y.items).forall { case (p, q) => deepEq(p, q) }
    case (x: Js.JsObject, y: Js.JsObject) =>
      x.fields.keys.toSeq == y.fields.keys.toSeq &&
        x.fields.forall { case (k, v) => deepEq(v, y.fields(k)) }
    case (x, y) => x == y
  }

  property("parse . stringify = identity (deep, key order preserved)") =
    Prop.forAll(genJson) { v =>
      deepEq(Js.Json.parse(Js.Json.stringify(v)), v)
    }

  property("stringify . parse is idempotent on serializer output") =
    Prop.forAll(genJson) { v =>
      val s = Js.Json.stringify(v)
      Js.Json.stringify(Js.Json.parse(s)) == s
    }

  property("integral doubles in the bigint range print without a point") =
    Prop.forAll(Gen.chooseNum(-9000000000000000L, 9000000000000000L)) { n =>
      Js.Json.numToString(n.toDouble) == n.toDouble.toLong.toString
    }

  property("strict equality is reflexive (except NaN, as in JS)") =
    Prop.forAll(genScalar) { v =>
      v == null || Js.strictEquals(v, v) ||
        (v match { case d: Double => d.isNaN; case _ => false })
    }

  property("== agrees with === on same-type operands") =
    Prop.forAll(genScalar, genScalar) { (a, b) =>
      val sameType = (a, b) match {
        case (_: Double, _: Double) | (_: String, _: String) |
             (_: Boolean, _: Boolean) | (null, null) => true
        case _ => false
      }
      !sameType || {
        // evaluate THROUGH the interpreter so the looseEquals path runs
        val env = Js.load(Js.parse(
          "function eq(a, b) { return (a == b) === (a === b); }"))
        Js.invoke(env, "eq", Seq(a, b)) == true
      }
    }
}
