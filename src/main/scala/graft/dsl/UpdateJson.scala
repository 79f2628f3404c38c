package graft.dsl

import graft.js.Js
import graft.js.Js.{JsArray, JsObject}

import scala.collection.mutable

/** JSON wire form of the update DSL — [[QueryJson]]'s sibling for
  * `UpdateComponent` trees (the reference's CrudUtils serialized update
  * beans the same way; `MongoDbUtils.java:222-303` parses them back into
  * `$set`/`$unset`/`$inc`/`$push`/... operations). Values use QueryJson's
  * type tags; the embedded predicates of `removeMatching`/`setMatching`
  * nest QueryJson's query form verbatim — one wire format, not two.
  * UpdateJsonSpec pins `parse(stringify(u)) == u` over randomized trees
  * (with QueryJson's Int→Long integral canonicalization). */
object UpdateJson {
  import QueryJson.{arr, bool, fail, obj, str, valueJs, valueOf}

  def stringify(u: UpdateComponent): String =
    Js.Json.stringify(new JsArray(
      mutable.ArrayBuffer(u.ops.map(opJs): _*)))

  private def opJs(op: UpdateOp): JsObject = op match {
    case SetField(f, v) => JsObject("t" -> "set", "f" -> f, "v" -> valueJs(v))
    case UnsetField(f) => JsObject("t" -> "unset", "f" -> f)
    case Increment(f, by) =>
      JsObject("t" -> "inc", "f" -> f, "by" -> valueJs(by))
    case AddItems(f, vs, dedup) => JsObject("t" -> "add", "f" -> f,
      "vs" -> new JsArray(mutable.ArrayBuffer(vs.map(valueJs): _*)),
      "dedup" -> dedup)
    case RemoveItems(f, vs) => JsObject("t" -> "remove", "f" -> f,
      "vs" -> new JsArray(mutable.ArrayBuffer(vs.map(valueJs): _*)))
    case RemoveMatching(f, pred) =>
      JsObject("t" -> "removeMatching", "f" -> f,
        "pred" -> QueryJson.toJs(pred))
    case SetMatching(f, pred, sub, v) =>
      JsObject("t" -> "setMatching", "f" -> f,
        "pred" -> QueryJson.toJs(pred), "sub" -> sub, "v" -> valueJs(v))
    case DeleteDoc => JsObject("t" -> "delete")
  }

  def parse(json: String): UpdateComponent = Js.Json.parse(json) match {
    case a: JsArray => UpdateComponent(a.items.toSeq.map(o => opOf(obj(o))))
    case other => fail(s"expected update-op array, got $other")
  }

  private def opOf(o: JsObject): UpdateOp = str(o.fields("t")) match {
    case "set" => SetField(str(o.fields("f")), valueOf(obj(o.fields("v"))))
    case "unset" => UnsetField(str(o.fields("f")))
    case "inc" => valueOf(obj(o.fields("by"))) match {
      case n: Number => Increment(str(o.fields("f")), n)
      case bad => fail(s"inc needs a numeric 'by', got $bad")
    }
    case "add" => AddItems(str(o.fields("f")),
      arr(o.fields("vs")).map(v => valueOf(obj(v))),
      o.fields.get("dedup").exists(bool))
    case "remove" => RemoveItems(str(o.fields("f")),
      arr(o.fields("vs")).map(v => valueOf(obj(v))))
    case "removeMatching" => RemoveMatching(str(o.fields("f")),
      QueryJson.fromJs(obj(o.fields("pred"))))
    case "setMatching" => SetMatching(str(o.fields("f")),
      QueryJson.fromJs(obj(o.fields("pred"))),
      str(o.fields("sub")), valueOf(obj(o.fields("v"))))
    case "delete" => DeleteDoc
    case bad => fail(s"unknown update op '$bad'")
  }
}
