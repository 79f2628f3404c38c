package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders}

import graft.js.Js

/** The JS-LANGUAGE half of the reference's script stage: the reference
  * evaluates user-authored JavaScript over each record via a JSR-223 engine
  * (`aleph2_analytic_services_spark/.../assets/SparkJsInterpreterTopology.java:123-160`
  * — Nashorn, removed from Java 17; GraalVM-JS is not vendorable here).
  * [[JavaStage]] already covers arbitrary compiled user code; this stage
  * restores the actual JS surface with [[graft.js.Js]] — an original,
  * dependency-free, deterministic ES5-subset interpreter — so a reference
  * user's `function handle(doc) {...}` scripts run unchanged (modulo the
  * documented subset).
  *
  * Contract: the script defines `function handle(doc)`; `doc` is the
  * record parsed from `inCol`'s JSON. Return value → `outCol`:
  * object/array/scalar is re-serialized as JSON (stable field order,
  * integral doubles without a decimal point, so `from_json` on a typed
  * schema round-trips); `null`/`undefined` → SQL NULL (the skip sentinel).
  *
  * Scale shape (the JavaStage story, with parsing in place of javac):
  * the script PARSES ONCE on the driver — syntax errors surface at plan
  * time — and ships as a broadcast string; each executor JVM re-parses
  * once into an immutable AST (content-hashed LRU cache), and each
  * PARTITION evaluates the script body into its own fresh global
  * environment (per-partition isolation: concurrent tasks never share the
  * mutable environment, so a script that keeps top-level state is safe —
  * and such state is per-partition by construction, same as the
  * reference's per-executor engine instances). Rows then call `handle`
  * through the interpreter — narrow, no shuffle, no codegen (interpreter
  * speed; use [[ExprStage]]/[[JavaStage]] when the hot path matters).
  *
  * Determinism: the interpreter exposes no Date/random/regex; all number
  * math is IEEE doubles in source order (see [[graft.js.Js]]).
  */
object JsStage {

  /** Per-JVM parsed-AST cache: scripts are tiny but re-parsing per task is
    * pointless; content-hashed LRU, same bounds story as JavaStage's
    * loader cache. The cached AST is immutable — sharing is safe. */
  private val MaxScripts = 64
  private val astCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Seq[Js.Stmt]](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Seq[Js.Stmt]]): Boolean =
          size() > MaxScripts
      })

  private def key(script: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(script.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def astFor(script: String): Seq[Js.Stmt] =
    astCache.computeIfAbsent(key(script), _ => Js.parse(script))

  /** Driver-side plan-time validation shared by the stage forms (the map
    * form additionally checks its output column). */
  private def prologue(df: DataFrame, inCol: String,
      script: String, fnName: String): Int = {
    require(df.schema(inCol).dataType == org.apache.spark.sql.types.StringType,
      s"$inCol must be STRING (JSON records); " +
        s"got ${df.schema(inCol).dataType.simpleString}")
    val ast = Js.parse(script) // fail fast with the parser's position info
    require(ast.exists { case Js.FuncDecl(n, _, _) => n == fnName; case _ => false },
      s"script must declare `function $fnName(...)`")
    df.schema.fieldIndex(inCol)
  }

  /** Map form: `outCol` = JSON of `handle(doc)`, NULL when the script
    * returns null/undefined (or the input is NULL). */
  def stage(df: DataFrame, inCol: String, outCol: String, script: String,
      fnName: String = "handle"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists in the input schema")
    val inIdx = prologue(df, inCol, script, fnName)
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.StringType))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      Encoders.row(outSchema)
    val bcScript = df.sparkSession.sparkContext.broadcast(script)
    df.mapPartitions { it =>
      // fresh global env per partition: isolation for mutable script state
      lazy val env = Js.load(astFor(bcScript.value))
      it.map { r =>
        val in = r.getString(inIdx)
        val out =
          if (in == null) null
          else Js.invoke(env, fnName, Seq(Js.Json.parse(in))) match {
            case null | Js.Undefined => null
            case v => Js.Json.stringify(v)
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ out)
      }
    }
  }

  /** Filter form: keep rows where `handle(doc)` is truthy (JS truthiness;
    * NULL input rows are dropped — the predicate never sees them). */
  def filterStage(df: DataFrame, inCol: String, script: String,
      fnName: String = "handle"): DataFrame = {
    val inIdx = prologue(df, inCol, script, fnName)
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      Encoders.row(df.schema)
    val bcScript = df.sparkSession.sparkContext.broadcast(script)
    df.mapPartitions { it =>
      lazy val env = Js.load(astFor(bcScript.value))
      it.filter { r =>
        val in = r.getString(inIdx)
        in != null &&
          Js.truthy(Js.invoke(env, fnName, Seq(Js.Json.parse(in))))
      }
    }
  }
}
