package graft.dsl

import graft.js.Js
import graft.js.Js.{JsArray, JsObject}

import scala.collection.mutable

/** JSON wire form of the query DSL — the surface the reference used to move
  * `QueryComponent` trees between processes (Aleph2 core `CrudUtils`
  * serializes query beans as JSON; the ES/Mongo translators parse them back
  * — `ElasticsearchUtils.java:124`, `MongoDbUtils.java:104`). Here it is
  * what a PERSISTED percolation registry or a REST query surface stores:
  * `stringify` a tree, keep it in a table, `parse` it back and compile.
  *
  * Clause values carry a one-letter TYPE TAG (`{"l":"5"}` long — string
  * payload, a JSON number here is a double and loses longs past 2^53 —
  * `{"d":5.0}` double, `{"s":"x"}` string, `{"b":true}` bool,
  * `{"ts":"<epochMicros>"}` java.sql.Timestamp) so
  * `parse(stringify(q)) == q` EXACTLY — an untagged number would come back
  * as a double and silently change the compiled comparison's type.
  * QueryJsonSpec pins the round-trip as a property over randomized trees.
  * Int/Short/Byte values serialize under the long tag and parse back as
  * Long — the canonical integral type (the compiled predicate is
  * unchanged).
  *
  * Built on [[graft.js.Js.Json]] — the same strict, deterministic JSON
  * bridge the script stages use (one parser in the library, not two).
  */
object QueryJson {

  // ---- serialize ------------------------------------------------------------

  def stringify(q: QueryComponent): String = Js.Json.stringify(toJs(q))

  private[dsl] def toJs(q: QueryComponent): JsObject = q match {
    case SingleQuery(clauses, anyOf, meta) =>
      JsObject(
        "anyOf" -> anyOf,
        "clauses" -> new JsArray(mutable.ArrayBuffer(clauses.map(clauseJs): _*)),
        "meta" -> metaJs(meta))
    case MultiQuery(and, components, meta) =>
      JsObject(
        "op" -> (if (and) "and" else "or"),
        "components" -> new JsArray(
          mutable.ArrayBuffer(components.map(toJs): _*)),
        "meta" -> metaJs(meta))
  }

  private def clauseJs(c: Clause): JsObject = c match {
    case Eq(f, v, neg) =>
      JsObject("t" -> "eq", "f" -> f, "v" -> valueJs(v), "neg" -> neg)
    case AnyOf(f, vs) => JsObject("t" -> "any", "f" -> f,
      "vs" -> new JsArray(mutable.ArrayBuffer(vs.map(valueJs): _*)))
    case AllOf(f, vs) => JsObject("t" -> "all", "f" -> f,
      "vs" -> new JsArray(mutable.ArrayBuffer(vs.map(valueJs): _*)))
    case Present(f, p) => JsObject("t" -> "present", "f" -> f, "present" -> p)
    case RangeClause(f, lo, loInc, hi, hiInc) =>
      val o = JsObject("t" -> "range", "f" -> f,
        "loInc" -> loInc, "hiInc" -> hiInc)
      lo.foreach(v => o.fields("lo") = valueJs(v))
      hi.foreach(v => o.fields("hi") = valueJs(v))
      o
  }

  private def metaJs(m: QueryMeta): JsObject = {
    val o = JsObject()
    m.limit.foreach(l => o.fields("limit") = l.toDouble)
    if (m.orderBy.nonEmpty) o.fields("orderBy") = new JsArray(
      mutable.ArrayBuffer(m.orderBy.map { case (f, d) =>
        new JsArray(mutable.ArrayBuffer[Any](f, d.toDouble))
      }: _*))
    if (m.includes.nonEmpty) o.fields("includes") =
      new JsArray(mutable.ArrayBuffer[Any](m.includes: _*))
    if (m.excludes.nonEmpty) o.fields("excludes") =
      new JsArray(mutable.ArrayBuffer[Any](m.excludes: _*))
    o
  }

  private[dsl] def valueJs(v: Any): JsObject = v match {
    case null => JsObject("n" -> true)
    case b: Boolean => JsObject("b" -> b)
    case s: String => JsObject("s" -> s)
    // finite doubles ride as JSON numbers; NaN/±Infinity have no JSON
    // number form (stringify would emit null and poison the stored row at
    // write time), so they ride under a dedicated string tag instead —
    // the round trip stays exact either way
    case d: Double if java.lang.Double.isFinite(d) => JsObject("d" -> d)
    case d: Double => JsObject("dx" -> d.toString)
    case f: Float => valueJs(f.toDouble)
    // integral and timestamp payloads ride as STRINGS: a JSON number is a
    // double here and silently loses longs past 2^53
    case l: Long => JsObject("l" -> l.toString)
    case i: Int => JsObject("l" -> i.toString)
    case sh: Short => JsObject("l" -> sh.toString)
    case by: Byte => JsObject("l" -> by.toString)
    case t: java.sql.Timestamp =>
      // epoch micros round-trips the full Timestamp precision Spark keeps
      JsObject("ts" -> (t.getTime * 1000L +
        (t.getNanos % 1000000) / 1000L).toString)
    case other => throw new IllegalArgumentException(
      s"QueryJson cannot serialize value type ${other.getClass.getName}")
  }

  // ---- parse ----------------------------------------------------------------

  def parse(json: String): QueryComponent = fromJs(obj(Js.Json.parse(json)))

  private[dsl] def fromJs(o: JsObject): QueryComponent = {
    val meta = o.fields.get("meta").map(m => metaOf(obj(m)))
      .getOrElse(QueryMeta())
    if (o.fields.contains("op")) {
      val and = str(o.fields("op")) match {
        case "and" => true
        case "or" => false
        case bad => fail(s"unknown op '$bad'")
      }
      MultiQuery(and, arr(o.fields("components")).map(c => fromJs(obj(c))),
        meta)
    } else {
      val anyOf = o.fields.get("anyOf").exists(bool)
      SingleQuery(arr(o.fields("clauses")).map(c => clauseOf(obj(c))),
        anyOf, meta)
    }
  }

  private def clauseOf(o: JsObject): Clause = str(o.fields("t")) match {
    case "eq" => Eq(str(o.fields("f")), valueOf(obj(o.fields("v"))),
      o.fields.get("neg").exists(bool))
    case "any" => AnyOf(str(o.fields("f")),
      arr(o.fields("vs")).map(v => valueOf(obj(v))))
    case "all" => AllOf(str(o.fields("f")),
      arr(o.fields("vs")).map(v => valueOf(obj(v))))
    case "present" => Present(str(o.fields("f")),
      o.fields.get("present").forall(bool))
    case "range" => RangeClause(str(o.fields("f")),
      o.fields.get("lo").map(v => valueOf(obj(v))),
      o.fields.get("loInc").exists(bool),
      o.fields.get("hi").map(v => valueOf(obj(v))),
      o.fields.get("hiInc").exists(bool))
    case bad => fail(s"unknown clause type '$bad'")
  }

  private def metaOf(o: JsObject): QueryMeta = QueryMeta(
    limit = o.fields.get("limit").map(v => num(v).toInt),
    orderBy = o.fields.get("orderBy").map(a => arr(a).map { e =>
      val pair = arr(e)
      (str(pair(0)), num(pair(1)).toInt)
    }).getOrElse(Nil),
    includes = o.fields.get("includes").map(a => arr(a).map(str))
      .getOrElse(Nil),
    excludes = o.fields.get("excludes").map(a => arr(a).map(str))
      .getOrElse(Nil))

  private[dsl] def valueOf(o: JsObject): Any =
    if (o.fields.contains("n")) null
    else if (o.fields.contains("b")) bool(o.fields("b"))
    else if (o.fields.contains("s")) str(o.fields("s"))
    else if (o.fields.contains("d")) num(o.fields("d"))
    else if (o.fields.contains("dx")) str(o.fields("dx")) match {
      case "NaN" => Double.NaN
      case "Infinity" => Double.PositiveInfinity
      case "-Infinity" => Double.NegativeInfinity
      case bad => fail(s"unknown non-finite double payload '$bad'")
    }
    else if (o.fields.contains("l")) str(o.fields("l")).toLong
    else if (o.fields.contains("ts")) {
      val us = str(o.fields("ts")).toLong
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    } else fail(s"untyped clause value: ${Js.Json.stringify(o)}")

  // ---- JSON-shape accessors (loud on malformed input) -----------------------

  private[dsl] def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"QueryJson: $msg")
  private[dsl] def obj(v: Any): JsObject = v match {
    case o: JsObject => o
    case other => fail(s"expected object, got $other")
  }
  private[dsl] def arr(v: Any): Seq[Any] = v match {
    case a: JsArray => a.items.toSeq
    case other => fail(s"expected array, got $other")
  }
  private[dsl] def str(v: Any): String = v match {
    case s: String => s
    case other => fail(s"expected string, got $other")
  }
  private[dsl] def num(v: Any): Double = v match {
    case d: Double => d
    case other => fail(s"expected number, got $other")
  }
  private[dsl] def bool(v: Any): Boolean = v match {
    case b: Boolean => b
    case other => fail(s"expected boolean, got $other")
  }
}
