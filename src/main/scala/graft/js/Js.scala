package graft.js

import scala.collection.mutable

/** A small, dependency-free, DETERMINISTIC JavaScript (ES5-expression
  * subset) lexer + parser + tree-walking interpreter — the script language
  * half of the reference's user-script stage
  * (`aleph2_analytic_services_spark/.../assets/SparkJsInterpreterTopology.java:123-160`
  * ran user JS through Nashorn, which Java 17 removed; [[graft.pipeline.JavaStage]]
  * covers the compiled-user-code half, this covers the JS-language half).
  *
  * Supported surface (documented contract, checked by JsSpec):
  *  - literals: numbers (doubles, JS semantics), single/double-quoted
  *    strings with escapes, booleans, null, array + object literals;
  *  - `var` declarations, assignment (`=`, `+=`, `-=`, `*=`, `/=`, `%=`),
  *    prefix/postfix `++`/`--`;
  *  - operators: `+ - * / %`, comparisons, `== != === !==`, `&& || !`,
  *    unary `-`/`+`/`typeof`, ternary, grouping;
  *  - member/index access and assignment (`a.b`, `a[i]`);
  *  - `function` declarations + expressions, closures, `return`;
  *  - `if`/`else`, `while`, C-style `for`, `for (k in obj)`, `break`,
  *    `continue`;
  *  - string methods (length, charAt, charCodeAt, indexOf, lastIndexOf,
  *    substring, slice, split, trim, replace, toUpperCase, toLowerCase,
  *    startsWith, endsWith, includes, match, search), array methods
  *    (length, push, pop, join, indexOf, includes, slice, concat,
  *    reverse, map, filter, reduce, sort), `Object.keys`,
  *    `Math.{abs,floor,ceil,round,sqrt,pow,min,max,log,exp}`,
  *    `JSON.{parse,stringify}`, `String`/`Number` conversion, `parseInt`
  *    (with radix and 0x), `parseFloat`, `isNaN`;
  *  - regular-expression literals (`/re/gims`) backed by
  *    `java.util.regex` (deterministic): `re.test/exec/source/flags`,
  *    and regex forms of `split`/`replace`/`match`/`search` (replace
  *    takes `$&`/`$1..$9`/`$$` substitutions or a callback). Documented
  *    deviations from ECMA-262: PATTERN SYNTAX IS JAVA'S (corner-case
  *    character-class/escape differences), `exec` is stateless (no
  *    `lastIndex`; always matches from 0 — iterate with `match` + `g`
  *    instead) and its result array carries no `.index` property;
  *  - `throw` / `try`-`catch`-`finally` (pure control flow): any value
  *    throws; runtime errors (member of null, not-a-function, unknown
  *    member — JS TypeErrors) are catchable as `{name, message}` objects,
  *    exactly as deterministic as the evaluation that raises them;
  *    `Error(msg)` and `RegExp(src, flags)` factories are callable plain
  *    or via `new` (each desugars to the factory call — `Date` below is
  *    the third and last `new` target; `new` on anything else fails at
  *    parse time).
  *
  *  - a deterministic UTC-only `Date` subset: `new Date(ms)` /
  *    `new Date(isoString)` / `Date.UTC(...)` / `Date.parse(iso)`,
  *    `getTime`, the `getUTC*` accessors and `toISOString`. The
  *    nondeterministic forms stay out — `Date.now()`, zero-argument
  *    `new Date()` and every LOCAL-time accessor fail loudly with a
  *    pointer at the deterministic twin.
  *
  * Deliberately ABSENT for determinism: wall-clock/local-time `Date`
  * forms (above), `Math.random`, prototypes, `this`, getters, `new`
  * beyond the three factories above, and the global object — a script
  * touching them fails loudly. Numbers
  * are IEEE doubles evaluated in source order, so results are
  * bit-identical across executors and runs. A per-invocation step budget
  * (50M loop iterations) turns a runaway loop into a loud JsError instead
  * of a hung executor task — the failure mode the stateless-`exec`
  * deviation would otherwise hand to `while (re.exec(s))` scripts.
  */
object Js {

  // ---- values ---------------------------------------------------------------

  /** JS `undefined` (distinct from `null`). */
  case object Undefined { override def toString = "undefined" }

  /** JS array: mutable, reference semantics. */
  final class JsArray(val items: mutable.ArrayBuffer[Any]) {
    override def toString: String = Json.stringify(this)
  }
  object JsArray {
    def apply(xs: Any*): JsArray = new JsArray(mutable.ArrayBuffer(xs: _*))
  }

  /** JS object: insertion-ordered, reference semantics. */
  final class JsObject(val fields: mutable.LinkedHashMap[String, Any]) {
    override def toString: String = Json.stringify(this)
  }
  object JsObject {
    def apply(kvs: (String, Any)*): JsObject =
      new JsObject(mutable.LinkedHashMap(kvs: _*))
  }

  /** Compiled regex value (reference semantics, like JS RegExp objects).
    * Pattern syntax is java.util.regex — deterministic, same matches on
    * every executor. The `g` flag only changes the match/replace/split
    * API behavior; compilation maps i→CASE_INSENSITIVE, m→MULTILINE,
    * s→DOTALL. */
  final class JsRegExp(val source: String, val flags: String) {
    val global: Boolean = flags.contains('g')
    def pattern: java.util.regex.Pattern = JsRegExp.compiled(source, flags)
    override def toString: String = s"/$source/$flags"
  }
  /** Deterministic UTC-only Date value: an epoch-millisecond instant.
    * Constructed only from EXPLICIT data — `new Date(ms)`, `new
    * Date(isoString)`, `Date.UTC(y, m, ...)`, `Date.parse(iso)`.
    * `Date.now()` / zero-argument `new Date()` stay absent by design
    * (wall clock = nondeterminism across executors and replays), and
    * only the UTC accessors exist (`getFullYear` & co. would tie the
    * result to the executor's timezone — the engine fails loudly and
    * points at the `getUTC*` twin). */
  final class JsDate(val ms: Long) {
    private[js] def odt: java.time.OffsetDateTime =
      java.time.Instant.ofEpochMilli(ms).atOffset(java.time.ZoneOffset.UTC)
    /** ECMA toISOString: always UTC, always 3 fraction digits, and the
      * expanded ±YYYYYY year form outside 0000-9999 (24.4.4.43's
      * "expanded years" — the clip keeps |year| ≤ 275,760 so six digits
      * always suffice). */
    def iso: String = {
      val o = odt
      val y = o.getYear
      // Locale.ROOT everywhere: a default locale with non-ASCII digits
      // (CLDR arabic numbering) would otherwise vary the output across
      // executors, breaking bit-identical determinism
      val yearStr =
        if (y >= 0 && y <= 9999)
          String.format(java.util.Locale.ROOT, "%04d", Int.box(y))
        else (if (y < 0) "-" else "+") +
          String.format(java.util.Locale.ROOT, "%06d", Int.box(math.abs(y)))
      yearStr + JsDate.TailFmt.format(o)
    }
    override def toString: String = iso
  }
  object JsDate {
    private val TailFmt = java.time.format.DateTimeFormatter
      .ofPattern("'-'MM'-'dd'T'HH:mm:ss.SSS'Z'", java.util.Locale.ROOT)
      .withDecimalStyle(java.time.format.DecimalStyle.STANDARD)
    /** ECMA TimeClip bound (±8.64e15 ms ≈ ±273,790 years). Real JS turns
      * an out-of-range time value into Invalid Date (and toISOString into
      * a RangeError); this engine fails LOUDLY at construction instead —
      * same information, no silent astronomically-distant instants. */
    private[js] def clip(ms: Long): Long = {
      if (math.abs(ms) > 8640000000000000L)
        throw new JsError(
          s"Date time value $ms outside the ECMA ±8.64e15 ms range")
      ms
    }
  }

  object JsRegExp {
    // per-JVM compile cache: RegexLit AST nodes are broadcast as strings
    // (java Pattern is not serializable) and compile once per executor
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
    private[js] def compiled(src: String, flags: String): java.util.regex.Pattern =
      cache.computeIfAbsent(flags + " " + src, { _ =>
        var f = 0
        if (flags.contains('i')) f |= java.util.regex.Pattern.CASE_INSENSITIVE
        if (flags.contains('m')) f |= java.util.regex.Pattern.MULTILINE
        if (flags.contains('s')) f |= java.util.regex.Pattern.DOTALL
        try java.util.regex.Pattern.compile(src, f)
        catch {
          case e: java.util.regex.PatternSyntaxException =>
            fail(s"invalid regex /$src/: ${e.getDescription}")
        }
      })
  }

  /** User function value: params + body + defining environment (closure). */
  final case class JsFunction(name: String, params: Seq[String],
      body: Seq[Stmt], env: Env)

  /** Host builtin exposed to scripts. */
  final case class Builtin(name: String, fn: Seq[Any] => Any)

  final class JsError(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new JsError(msg)

  // ---- AST ------------------------------------------------------------------

  sealed trait Expr
  final case class NumLit(v: Double) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  final case class ArrLit(items: Seq[Expr]) extends Expr
  final case class ObjLit(props: Seq[(String, Expr)]) extends Expr
  final case class Ident(name: String) extends Expr
  final case class Member(obj: Expr, name: String) extends Expr
  final case class Index(obj: Expr, idx: Expr) extends Expr
  final case class Call(fn: Expr, args: Seq[Expr]) extends Expr
  final case class Unary(op: String, e: Expr) extends Expr
  final case class Update(op: String, target: Expr, prefix: Boolean) extends Expr
  final case class Binary(op: String, l: Expr, r: Expr) extends Expr
  final case class Logical(op: String, l: Expr, r: Expr) extends Expr
  final case class Cond(c: Expr, t: Expr, f: Expr) extends Expr
  final case class Assign(op: String, target: Expr, value: Expr) extends Expr
  final case class FuncExpr(name: String, params: Seq[String], body: Seq[Stmt])
      extends Expr
  final case class RegexLit(pattern: String, flags: String) extends Expr

  sealed trait Stmt
  final case class ExprStmt(e: Expr) extends Stmt
  final case class VarDecl(vars: Seq[(String, Option[Expr])]) extends Stmt
  final case class If(c: Expr, t: Seq[Stmt], f: Seq[Stmt]) extends Stmt
  final case class While(c: Expr, body: Seq[Stmt]) extends Stmt
  final case class For(init: Option[Stmt], cond: Option[Expr],
      update: Option[Expr], body: Seq[Stmt]) extends Stmt
  final case class ForIn(name: String, obj: Expr, body: Seq[Stmt]) extends Stmt
  final case class Return(e: Option[Expr]) extends Stmt
  case object Break extends Stmt
  case object Continue extends Stmt
  final case class FuncDecl(name: String, params: Seq[String], body: Seq[Stmt])
      extends Stmt
  final case class Throw(e: Expr) extends Stmt
  final case class TryStmt(body: Seq[Stmt], param: Option[String],
      handler: Option[Seq[Stmt]], fin: Seq[Stmt]) extends Stmt

  // ---- lexer ----------------------------------------------------------------

  private final case class Tok(kind: String, text: String, pos: Int)

  private val keywords = Set("var", "function", "return", "if", "else",
    "while", "for", "in", "break", "continue", "true", "false", "null",
    "typeof", "undefined", "try", "catch", "finally", "throw", "new")

  /** Division/regex disambiguation: a `/` STARTS a regex literal unless
    * the previous token can end an operand (number, string, identifier,
    * the value keywords, or a closing `)`/`]` / postfix `++`/`--`) —
    * the standard single-token-lookbehind heuristic. */
  private def regexCanFollow(prev: Tok): Boolean = prev match {
    case null => true
    case Tok("num" | "str" | "regex" | "ident", _, _) => false
    case Tok("true" | "false" | "null" | "undefined", _, _) => false
    case Tok("punct", ")" | "]" | "++" | "--", _) => false
    case _ => true
  }

  private def lex(src: String): Vector[Tok] = {
    val out = mutable.ArrayBuffer.empty[Tok]
    var i = 0
    val n = src.length
    def err(m: String) = fail(s"js lex error at $i: $m")
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src(i + 1) == '*') {
        val end = src.indexOf("*/", i + 2)
        if (end < 0) err("unterminated block comment")
        i = end + 2
      } else if (c == '/' && regexCanFollow(out.lastOption.orNull)) {
        // regex literal: body to the unescaped closing '/', where '/'
        // inside a [...] class does not close; then letter flags
        val start = i
        i += 1
        val body = new StringBuilder
        var inClass = false
        var closed = false
        while (i < n && !closed) {
          val rc = src(i)
          if (rc == '\n') err("unterminated regex literal")
          else if (rc == '\\') {
            if (i + 1 >= n) err("unterminated regex escape")
            body += rc += src(i + 1); i += 2
          } else if (rc == '[') { inClass = true; body += rc; i += 1 }
          else if (rc == ']') { inClass = false; body += rc; i += 1 }
          else if (rc == '/' && !inClass) { closed = true; i += 1 }
          else { body += rc; i += 1 }
        }
        if (!closed) err("unterminated regex literal")
        val fStart = i
        while (i < n && src(i).isLetter) i += 1
        val flags = src.substring(fStart, i)
        val bad = flags.filterNot("gims".contains(_))
        if (bad.nonEmpty) err(s"unsupported regex flag(s) '$bad' (supported: gims)")
        if (flags.distinct != flags) err(s"duplicate regex flags '$flags'")
        // flags FIRST ("<flags> <body>"): the body may itself contain
        // spaces, the flags never do - the parser splits at the first one
        out += Tok("regex", flags + " " + body.result(), start)
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && src(i + 1).isDigit)) {
        val start = i
        while (i < n && src(i).isDigit) i += 1
        if (i < n && src(i) == '.') { i += 1; while (i < n && src(i).isDigit) i += 1 }
        if (i < n && (src(i) == 'e' || src(i) == 'E')) {
          i += 1
          if (i < n && (src(i) == '+' || src(i) == '-')) i += 1
          if (i >= n || !src(i).isDigit) err("malformed exponent")
          while (i < n && src(i).isDigit) i += 1
        }
        out += Tok("num", src.substring(start, i), start)
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        val start = i
        i += 1
        while (i < n && src(i) != quote) {
          if (src(i) == '\\') {
            if (i + 1 >= n) err("unterminated escape")
            src(i + 1) match {
              case 'n' => sb += '\n'; i += 2
              case 't' => sb += '\t'; i += 2
              case 'r' => sb += '\r'; i += 2
              case '\\' => sb += '\\'; i += 2
              case '\'' => sb += '\''; i += 2
              case '"' => sb += '"'; i += 2
              case '/' => sb += '/'; i += 2
              case 'u' =>
                if (i + 5 >= n) err("unterminated \\u escape")
                val hex = src.substring(i + 2, i + 6)
                sb += (try Integer.parseInt(hex, 16).toChar
                  catch { case _: NumberFormatException => err(s"bad \\u$hex") })
                i += 6
              case other => err(s"unsupported escape \\$other")
            }
          } else { sb += src(i); i += 1 }
        }
        if (i >= n) err("unterminated string")
        i += 1
        out += Tok("str", sb.result(), start)
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_' || src(i) == '$')) i += 1
        val w = src.substring(start, i)
        out += Tok(if (keywords(w)) w else "ident", w, start)
      } else {
        val three = if (i + 3 <= n) src.substring(i, i + 3) else ""
        val two = if (i + 2 <= n) src.substring(i, i + 2) else ""
        if (three == "===" || three == "!==") { out += Tok("punct", three, i); i += 3 }
        else if (Set("==", "!=", "<=", ">=", "&&", "||", "+=", "-=", "*=",
            "/=", "%=", "++", "--")(two)) { out += Tok("punct", two, i); i += 2 }
        else if ("+-*/%<>=!?:;,.(){}[]".indexOf(c) >= 0) {
          out += Tok("punct", c.toString, i); i += 1
        } else err(s"unexpected character '$c'")
      }
    }
    out += Tok("eof", "", n)
    out.toVector
  }

  // ---- parser (Pratt) -------------------------------------------------------

  /** Parse a whole script (a statement list). Throws [[JsError]] with a
    * position on malformed input — surfacing at PLAN time on the driver. */
  def parse(src: String): Seq[Stmt] = new Parser(lex(src)).script()

  private final class Parser(toks: Vector[Tok]) {
    private var p = 0
    private def peek: Tok = toks(p)
    private def at(kind: String, text: String = null): Boolean =
      peek.kind == kind && (text == null || peek.text == text)
    private def atPunct(text: String): Boolean = at("punct", text)
    private def next(): Tok = { val t = toks(p); p += 1; t }
    private def expect(kind: String, text: String = null): Tok = {
      if (!at(kind, text))
        fail(s"js parse error at ${peek.pos}: expected ${Option(text).getOrElse(kind)}, got '${peek.text}'")
      next()
    }
    private def expectPunct(text: String): Tok = expect("punct", text)

    def script(): Seq[Stmt] = {
      val out = Seq.newBuilder[Stmt]
      while (!at("eof")) out += statement()
      out.result()
    }

    private def block(): Seq[Stmt] = {
      expectPunct("{")
      val out = Seq.newBuilder[Stmt]
      while (!atPunct("}")) out += statement()
      expectPunct("}")
      out.result()
    }

    /** One statement; a trailing `;` is consumed when present (semicolons
      * are optional at `}`/EOF boundaries — enough ASI for real scripts). */
    private def statement(): Stmt = {
      val s = statementNoSemi()
      while (atPunct(";")) next()
      s
    }

    private def statementNoSemi(): Stmt = {
      if (at("var")) { next(); varDecl() }
      else if (at("function")) {
        next()
        val name = expect("ident").text
        val params = paramList()
        FuncDecl(name, params, block())
      }
      else if (at("return")) {
        next()
        if (atPunct(";") || atPunct("}") || at("eof")) Return(None)
        else Return(Some(expression()))
      }
      else if (at("if")) { next(); ifStmt() }
      else if (at("while")) {
        next(); expectPunct("(")
        val c = expression(); expectPunct(")")
        While(c, bodyOrSingle())
      }
      else if (at("for")) { next(); forStmt() }
      else if (at("break")) { next(); Break }
      else if (at("continue")) { next(); Continue }
      else if (at("throw")) { next(); Throw(expression()) }
      else if (at("try")) {
        next()
        val body = block()
        val (param, handler) =
          if (at("catch")) {
            next(); expectPunct("(")
            val p = expect("ident").text
            expectPunct(")")
            (Some(p), Some(block()))
          } else (None, None)
        val fin = if (at("finally")) { next(); block() } else Nil
        if (handler.isEmpty && fin.isEmpty)
          fail(s"js parse error at ${peek.pos}: try requires catch or finally")
        TryStmt(body, param, handler, fin)
      }
      else if (atPunct("{")) {
        // a bare block at statement position (JS block, not an object
        // literal): run its statements unconditionally
        val stmts = block()
        if (stmts.isEmpty) ExprStmt(NullLit) else If(BoolLit(true), stmts, Nil)
      }
      else ExprStmt(expression())
    }

    private def varDecl(): VarDecl = {
      val vars = Seq.newBuilder[(String, Option[Expr])]
      var more = true
      while (more) {
        val name = expect("ident").text
        val init = if (atPunct("=")) { next(); Some(assignment()) } else None
        vars += name -> init
        if (atPunct(",")) next() else more = false
      }
      VarDecl(vars.result())
    }

    private def ifStmt(): Stmt = {
      expectPunct("(")
      val c = expression()
      expectPunct(")")
      val t = bodyOrSingle()
      val f =
        if (at("else")) {
          next()
          if (at("if")) { next(); Seq(ifStmt()) } else bodyOrSingle()
        } else Nil
      If(c, t, f)
    }

    private def bodyOrSingle(): Seq[Stmt] =
      if (atPunct("{")) block() else Seq(statement())

    private def forStmt(): Stmt = {
      expectPunct("(")
      // for (var k in obj) / for (k in obj)
      val save = p
      if (at("var") || at("ident")) {
        val isVar = at("var")
        if (isVar) next()
        if (at("ident")) {
          val name = next().text
          if (at("in")) {
            next()
            val obj = expression()
            expectPunct(")")
            return ForIn(name, obj, bodyOrSingle())
          }
        }
        p = save // not for-in; rewind and parse C-style
      }
      val init: Option[Stmt] =
        if (atPunct(";")) None
        else if (at("var")) { next(); Some(varDecl()) }
        else Some(ExprStmt(expression()))
      expectPunct(";")
      val cond = if (atPunct(";")) None else Some(expression())
      expectPunct(";")
      val update = if (atPunct(")")) None else Some(expression())
      expectPunct(")")
      For(init, cond, update, bodyOrSingle())
    }

    private def paramList(): Seq[String] = {
      expectPunct("(")
      val out = Seq.newBuilder[String]
      if (!atPunct(")")) {
        out += expect("ident").text
        while (atPunct(",")) { next(); out += expect("ident").text }
      }
      expectPunct(")")
      out.result()
    }

    def expression(): Expr = assignment()

    private def assignment(): Expr = {
      val left = ternary()
      if (atPunct("=") || atPunct("+=") || atPunct("-=") || atPunct("*=") ||
          atPunct("/=") || atPunct("%=")) {
        val op = next().text
        left match {
          case _: Ident | _: Member | _: Index =>
            Assign(op, left, assignment())
          case _ => fail(s"js parse error: invalid assignment target")
        }
      } else left
    }

    private def ternary(): Expr = {
      val c = logicalOr()
      if (atPunct("?")) {
        next()
        val t = assignment()
        expectPunct(":")
        Cond(c, t, assignment())
      } else c
    }

    private def logicalOr(): Expr = {
      var l = logicalAnd()
      while (atPunct("||")) { next(); l = Logical("||", l, logicalAnd()) }
      l
    }
    private def logicalAnd(): Expr = {
      var l = equality()
      while (atPunct("&&")) { next(); l = Logical("&&", l, equality()) }
      l
    }
    private def equality(): Expr = {
      var l = relational()
      while (atPunct("==") || atPunct("!=") || atPunct("===") || atPunct("!==")) {
        val op = next().text; l = Binary(op, l, relational())
      }
      l
    }
    private def relational(): Expr = {
      var l = additive()
      while (atPunct("<") || atPunct("<=") || atPunct(">") || atPunct(">=")) {
        val op = next().text; l = Binary(op, l, additive())
      }
      l
    }
    private def additive(): Expr = {
      var l = multiplicative()
      while (atPunct("+") || atPunct("-")) {
        val op = next().text; l = Binary(op, l, multiplicative())
      }
      l
    }
    private def multiplicative(): Expr = {
      var l = unary()
      while (atPunct("*") || atPunct("/") || atPunct("%")) {
        val op = next().text; l = Binary(op, l, unary())
      }
      l
    }
    private def unary(): Expr = {
      if (atPunct("!")) { next(); Unary("!", unary()) }
      else if (atPunct("-")) { next(); Unary("-", unary()) }
      else if (atPunct("+")) { next(); Unary("+", unary()) }
      else if (at("typeof")) { next(); Unary("typeof", unary()) }
      else if (atPunct("++") || atPunct("--")) {
        val op = next().text
        val t = unary()
        t match {
          case _: Ident | _: Member | _: Index => Update(op, t, prefix = true)
          case _ => fail("js parse error: invalid ++/-- target")
        }
      }
      else postfix()
    }

    private def postfix(): Expr = {
      // `new Error(msg)` / `new RegExp(src, flags)` — the two constructor
      // forms real scripts use. Both desugar to the plain factory call
      // (no prototype machinery); any other `new` target fails loudly at
      // parse time, preserving the no-prototypes contract.
      var e = if (at("new")) {
        next()
        val callee = expect("ident").text
        if (callee != "Error" && callee != "RegExp" && callee != "Date")
          fail(s"js parse error: `new` is only supported for Error(...), " +
            s"RegExp(...) and Date(...), not $callee")
        expectPunct("(")
        val args = Seq.newBuilder[Expr]
        if (!atPunct(")")) {
          args += assignment()
          while (atPunct(",")) { next(); args += assignment() }
        }
        expectPunct(")")
        Call(Ident(callee), args.result())
      } else primary()
      var more = true
      while (more) {
        if (atPunct(".")) {
          next(); e = Member(e, expect("ident").text)
        } else if (atPunct("[")) {
          next(); val i = expression(); expectPunct("]"); e = Index(e, i)
        } else if (atPunct("(")) {
          next()
          val args = Seq.newBuilder[Expr]
          if (!atPunct(")")) {
            args += assignment()
            while (atPunct(",")) { next(); args += assignment() }
          }
          expectPunct(")")
          e = Call(e, args.result())
        } else if (atPunct("++") || atPunct("--")) {
          val op = next().text
          e match {
            case _: Ident | _: Member | _: Index =>
              e = Update(op, e, prefix = false)
            case _ => fail("js parse error: invalid ++/-- target")
          }
        } else more = false
      }
      e
    }

    private def primary(): Expr = {
      if (at("num")) NumLit(next().text.toDouble)
      else if (at("str")) StrLit(next().text)
      else if (at("regex")) {
        val t = next().text
        val sep = t.indexOf(' ') // "<flags> <body>", flags never contain one
        val lit = RegexLit(t.substring(sep + 1), t.substring(0, sep))
        // compile NOW: a bad pattern fails at parse (= plan) time on the
        // driver, not per-row on an executor
        JsRegExp.compiled(lit.pattern, lit.flags)
        lit
      }
      else if (at("true")) { next(); BoolLit(true) }
      else if (at("false")) { next(); BoolLit(false) }
      else if (at("null")) { next(); NullLit }
      else if (at("undefined")) { next(); Ident("undefined") }
      else if (at("ident")) Ident(next().text)
      else if (at("function")) {
        next()
        val name = if (at("ident")) next().text else ""
        FuncExpr(name, paramList(), block())
      }
      else if (atPunct("(")) {
        next(); val e = expression(); expectPunct(")"); e
      }
      else if (atPunct("[")) {
        next()
        val items = Seq.newBuilder[Expr]
        if (!atPunct("]")) {
          items += assignment()
          while (atPunct(",")) { next(); items += assignment() }
        }
        expectPunct("]")
        ArrLit(items.result())
      }
      else if (atPunct("{")) {
        next()
        val props = Seq.newBuilder[(String, Expr)]
        if (!atPunct("}")) {
          def prop(): Unit = {
            val key =
              if (at("str")) next().text
              else if (at("num")) Json.numToString(next().text.toDouble)
              else next().text // identifier or keyword used as a key
            expectPunct(":")
            props += key -> assignment()
          }
          prop()
          while (atPunct(",")) { next(); prop() }
        }
        expectPunct("}")
        ObjLit(props.result())
      }
      else fail(s"js parse error at ${peek.pos}: unexpected '${peek.text}'")
    }
  }

  // ---- environment ----------------------------------------------------------

  final class Env(parent: Option[Env]) {
    private val vars = mutable.HashMap.empty[String, Any]
    def declare(name: String, v: Any): Unit = vars(name) = v
    def get(name: String): Any =
      if (vars.contains(name)) vars(name)
      else parent match {
        case Some(e) => e.get(name)
        case None => fail(s"$name is not defined")
      }
    def set(name: String, v: Any): Unit =
      if (vars.contains(name)) vars(name) = v
      else parent match {
        case Some(e) => e.set(name, v)
        case None => fail(s"$name is not defined") // no implicit globals
      }
    def child(): Env = new Env(Some(this))
  }

  // control-flow signals (no stack traces: these are flow, not errors)
  private final class ReturnSig(val v: Any)
      extends RuntimeException(null, null, false, false)
  private final class BreakSig extends RuntimeException(null, null, false, false)
  private final class ContinueSig extends RuntimeException(null, null, false, false)
  /** A value thrown by script `throw` — catchable by script `try`. */
  private final class ThrowSig(val v: Any)
      extends RuntimeException(null, null, false, false)

  /** The `{name, message}` object a catch clause binds for an ENGINE
    * runtime error (member of null, not a function, … — JS TypeErrors). */
  private def errorObject(msg: String): JsObject =
    JsObject("name" -> "Error", "message" -> msg)

  /** Render an uncaught thrown value for the host-side JsError. */
  private def describeThrown(v: Any): String = v match {
    case o: JsObject if o.fields.contains("message") =>
      s"${o.fields.getOrElse("name", "Error")}: ${toStr(o.fields("message"))}"
    case other => toStr(other)
  }

  // ---- interpreter ----------------------------------------------------------

  /** Evaluate a script into a fresh global environment (with the standard
    * builtins) and return it — call [[invoke]] against it afterwards. */
  def load(stmts: Seq[Stmt]): Env = {
    val g = globalEnv()
    steps.set(0L) // top-level statements may loop; fresh budget like invoke
    // hoist function declarations (mutual recursion), then run the body
    stmts.foreach { case FuncDecl(n, ps, b) => g.declare(n, JsFunction(n, ps, b, g)); case _ => }
    try stmts.foreach { case _: FuncDecl => (); case s => exec(s, g) }
    catch {
      case _: ReturnSig => fail("return outside a function")
      case _: BreakSig | _: ContinueSig => fail("break/continue outside a loop")
      case t: ThrowSig => fail(s"uncaught exception: ${describeThrown(t.v)}")
    }
    g
  }

  /** Call a named function defined by the loaded script. A script
    * exception that escapes the call surfaces as a host JsError here —
    * the engine boundary, same contract as any other runtime failure. */
  /** Per-invocation step budget: every loop iteration costs one step and a
    * runaway script fails LOUDLY instead of hanging an executor task
    * forever. 50M steps is ~seconds of interpretation — orders of
    * magnitude past any per-record script, and deterministic (a count,
    * never a clock). The classic JS idiom this guards against in THIS
    * interpreter: `while ((m = re.exec(s)) !== null)` — exec here is
    * deliberately stateless (no lastIndex), so that loop never advances. */
  private val MaxSteps = 50000000L
  private val steps = new ThreadLocal[Long] { override def initialValue = 0L }
  private val budget =
    new ThreadLocal[Long] { override def initialValue = MaxSteps }
  /** Shrink the step budget inside `body` — test hook (JsSpec exercises
    * the runaway guard without burning 50M real iterations). */
  private[graft] def withStepBudget[T](n: Long)(body: => T): T = {
    val prev = budget.get(); budget.set(n)
    try body finally budget.set(prev)
  }
  private def tick(): Unit = {
    val n = steps.get() + 1
    steps.set(n)
    if (n > budget.get())
      fail(s"script exceeded ${budget.get()} loop iterations — runaway " +
        "loop? (note: regex exec here is stateless; iterate with match + " +
        "/g, not `while (re.exec(s))`)")
  }

  def invoke(env: Env, name: String, args: Seq[Any]): Any =
    env.get(name) match {
      case f: JsFunction =>
        steps.set(0L) // fresh budget per top-level invocation
        try callFunction(f, args)
        catch {
          case t: ThrowSig =>
            fail(s"uncaught exception: ${describeThrown(t.v)}")
        }
      case other => fail(s"$name is not a function (got ${typeOf(other)})")
    }

  def callFunction(f: JsFunction, args: Seq[Any]): Any = {
    val local = f.env.child()
    f.params.zipWithIndex.foreach { case (p, i) =>
      local.declare(p, if (i < args.length) args(i) else Undefined)
    }
    if (f.name.nonEmpty) local.declare(f.name, f) // named fn expr recursion
    try { f.body.foreach(exec(_, local)); Undefined }
    catch {
      case r: ReturnSig => r.v
      // a break/continue with no enclosing loop in THIS function must not
      // escape into (and silently terminate) a loop in the caller
      case _: BreakSig | _: ContinueSig =>
        fail("break/continue outside a loop")
    }
  }

  private def callValue(fv: Any, args: Seq[Any]): Any = fv match {
    case f: JsFunction => callFunction(f, args)
    case Builtin(_, fn) => fn(args)
    case other => fail(s"not a function: ${typeOf(other)}")
  }

  private def exec(s: Stmt, env: Env): Unit = s match {
    case ExprStmt(e) => eval(e, env)
    case VarDecl(vars) =>
      vars.foreach { case (n, init) =>
        env.declare(n, init.map(eval(_, env)).getOrElse(Undefined))
      }
    case If(c, t, f) =>
      if (truthy(eval(c, env))) t.foreach(exec(_, env))
      else f.foreach(exec(_, env))
    case While(c, body) =>
      while (truthy(eval(c, env))) {
        tick()
        try body.foreach(exec(_, env))
        catch {
          case _: ContinueSig => ()
          case _: BreakSig => return
        }
      }
    case For(init, cond, update, body) =>
      // ES5 `var` is FUNCTION-scoped: the loop variable (and any var in the
      // body) lives on after the loop — run directly in the enclosing env
      init.foreach(exec(_, env))
      while (cond.forall(c => truthy(eval(c, env)))) {
        tick()
        try body.foreach(exec(_, env))
        catch {
          case _: ContinueSig => ()
          case _: BreakSig => return
        }
        update.foreach(eval(_, env))
      }
    case ForIn(name, objE, body) =>
      val keys: Seq[Any] = eval(objE, env) match {
        case o: JsObject => o.fields.keys.toSeq
        case a: JsArray => a.items.indices.map(i => Json.numToString(i.toDouble))
        case Undefined | null => Nil
        case other => fail(s"for-in over ${typeOf(other)}")
      }
      env.declare(name, Undefined) // function-scoped, like the C-style for
      keys.foreach { k =>
        env.set(name, k)
        tick()
        try body.foreach(exec(_, env))
        catch {
          case _: ContinueSig => ()
          case _: BreakSig => return
        }
      }
    case Return(e) => throw new ReturnSig(e.map(eval(_, env)).getOrElse(Undefined))
    case Break => throw new BreakSig
    case Continue => throw new ContinueSig
    case FuncDecl(n, ps, b) => env.declare(n, JsFunction(n, ps, b, env))
    case Throw(e) => throw new ThrowSig(eval(e, env))
    case TryStmt(body, param, handler, fin) =>
      // Scala try/finally gives the JS contract directly: the finally
      // block runs on normal exit, on a caught/propagating exception, AND
      // on return/break/continue unwinding through the try — and anything
      // the finally block itself throws or returns supersedes.
      try {
        try body.foreach(exec(_, env))
        catch {
          case t: ThrowSig if handler.isDefined =>
            val h = env.child()
            param.foreach(h.declare(_, t.v))
            handler.get.foreach(exec(_, h))
          // engine runtime errors are JS TypeErrors — catchable, bound as
          // {name, message}; deterministic because the evaluation is
          case e: JsError if handler.isDefined =>
            val h = env.child()
            param.foreach(h.declare(_, errorObject(e.getMessage)))
            handler.get.foreach(exec(_, h))
        }
      } finally fin.foreach(exec(_, env))
  }

  def eval(e: Expr, env: Env): Any = e match {
    case NumLit(v) => v
    case StrLit(v) => v
    case BoolLit(v) => v
    case NullLit => null
    case ArrLit(items) => new JsArray(mutable.ArrayBuffer(items.map(eval(_, env)): _*))
    case ObjLit(props) =>
      new JsObject(mutable.LinkedHashMap(props.map { case (k, v) => k -> eval(v, env) }: _*))
    case Ident("undefined") => Undefined
    case Ident(n) => env.get(n)
    case Member(objE, name) => getMember(eval(objE, env), name)
    case Index(objE, idxE) =>
      readIndexed(eval(objE, env), eval(idxE, env))
    case Call(fnE, argEs) =>
      // JS order: the callee reference evaluates BEFORE the arguments
      val fv = fnE match {
        case Member(objE, name) => getMember(eval(objE, env), name)
        case Index(objE, idxE) => readIndexed(eval(objE, env), eval(idxE, env))
        case _ => eval(fnE, env)
      }
      callValue(fv, argEs.map(eval(_, env)))
    case Unary(op, inner) =>
      val v = eval(inner, env)
      op match {
        case "!" => !truthy(v)
        case "-" => -toNumber(v)
        case "+" => toNumber(v)
        case "typeof" => typeOf(v)
      }
    case Update(op, target, prefix) =>
      // resolve the reference ONCE: `a[i++]++` must not re-run i++
      val ref = resolveRef(target, env)
      val old = toNumber(readRef(ref))
      val neu = if (op == "++") old + 1 else old - 1
      writeRef(ref, neu)
      if (prefix) neu else old
    case Binary(op, lE, rE) => binary(op, eval(lE, env), eval(rE, env))
    case Logical("&&", lE, rE) =>
      val l = eval(lE, env); if (!truthy(l)) l else eval(rE, env)
    case Logical("||", lE, rE) =>
      val l = eval(lE, env); if (truthy(l)) l else eval(rE, env)
    case Logical(op, _, _) => fail(s"unknown logical op $op")
    case Cond(c, t, f) =>
      if (truthy(eval(c, env))) eval(t, env) else eval(f, env)
    case Assign("=", target, vE) =>
      val ref = resolveRef(target, env)
      val v = eval(vE, env); writeRef(ref, v); v
    case Assign(op, target, vE) =>
      // resolve once so `a[i++] += x` reads and writes the SAME element
      val ref = resolveRef(target, env)
      val v = binary(op.stripSuffix("="), readRef(ref), eval(vE, env))
      writeRef(ref, v); v
    case FuncExpr(name, ps, b) => JsFunction(name, ps, b, env)
    case RegexLit(p, f) => new JsRegExp(p, f) // fresh object per eval, like JS
  }

  /** A resolved assignment target: object/index sub-expressions evaluated
    * exactly once (JS reference semantics — `a[i++] += 1` is one i++). */
  private sealed trait Ref
  private final case class VarRef(name: String, env: Env) extends Ref
  private final case class PropRef(obj: Any, name: String) extends Ref
  private final case class ElemRef(obj: Any, idx: Any) extends Ref

  private def resolveRef(target: Expr, env: Env): Ref = target match {
    case Ident(n) => VarRef(n, env)
    case Member(objE, name) => PropRef(eval(objE, env), name)
    case Index(objE, idxE) => ElemRef(eval(objE, env), eval(idxE, env))
    case _ => fail("invalid assignment target")
  }

  private def readRef(ref: Ref): Any = ref match {
    case VarRef(n, env) => env.get(n)
    case PropRef(obj, name) => getMember(obj, name)
    case ElemRef(obj, idx) => readIndexed(obj, idx)
  }

  private def writeRef(ref: Ref, v: Any): Unit = ref match {
    case VarRef(n, env) => env.set(n, v)
    case PropRef(obj, name) => obj match {
      case o: JsObject => o.fields(name) = v
      case other => fail(s"cannot set .$name on ${typeOf(other)}")
    }
    case ElemRef(obj, idx) => obj match {
      case a: JsArray =>
        numericIndex(idx) match {
          case Some(i) if i >= 0 =>
            while (a.items.length <= i) a.items += Undefined
            a.items(i) = v
          case _ => fail(s"invalid array index '${toStr(idx)}' in assignment")
        }
      case o: JsObject => o.fields(toStr(idx)) = v
      case other => fail(s"cannot index-assign ${typeOf(other)}")
    }
  }

  /** `x[i]` read. Non-numeric keys on arrays/strings fall back to MEMBER
    * lookup (JS: `a['length']` is the length property, `a[1.5]`/`a[NaN]`
    * are absent properties → undefined — never a silent element 0). */
  private def readIndexed(obj: Any, idx: Any): Any = obj match {
    case o: JsObject => o.fields.getOrElse(toStr(idx), Undefined)
    case a: JsArray =>
      numericIndex(idx) match {
        case Some(i) => if (i >= 0 && i < a.items.length) a.items(i) else Undefined
        case None => idx match {
          // non-canonical digit strings ("01") are absent properties in JS,
          // not method names — undefined, not a loud unknown-member fail
          case s: String if s.nonEmpty && s.forall(_.isDigit) => Undefined
          case s: String => arrayMember(a, s)
          case d: Double if !d.isNaN => Undefined // fractional index
          case _ => Undefined
        }
      }
    case s: String =>
      numericIndex(idx) match {
        case Some(i) => if (i >= 0 && i < s.length) s.charAt(i).toString else Undefined
        case None => idx match {
          case k: String if k.nonEmpty && k.forall(_.isDigit) => Undefined
          case k: String => stringMember(s, k)
          case _ => Undefined
        }
      }
    case null => fail(s"cannot index null")
    case Undefined => fail(s"cannot index undefined")
    case other => fail(s"cannot index ${typeOf(other)}")
  }

  /** The integral index of `idx` if it IS one (a whole-number double, or a
    * string that is the canonical form of one); None otherwise. */
  private def numericIndex(idx: Any): Option[Int] = idx match {
    case d: Double if !d.isNaN && d == math.rint(d) &&
      math.abs(d) <= Int.MaxValue => Some(d.toInt)
    // ONLY the canonical decimal form is an index (JS: a["01"] and a[true]
    // are plain property reads → undefined, never element accesses)
    case s: String if s.nonEmpty && s.forall(_.isDigit) && s.length <= 9 &&
      (s.length == 1 || s.head != '0') => Some(s.toInt)
    case _ => None
  }

  // ---- semantics helpers ------------------------------------------------------

  def truthy(v: Any): Boolean = v match {
    case null | Undefined => false
    case b: Boolean => b
    case d: Double => !(d == 0.0 || d.isNaN)
    case s: String => s.nonEmpty
    case _ => true
  }

  def toNumber(v: Any): Double = v match {
    case d: Double => d
    case b: Boolean => if (b) 1.0 else 0.0
    case null => 0.0
    case Undefined => Double.NaN
    case s: String =>
      val t = s.trim
      if (t.isEmpty) 0.0
      else try t.toDouble catch { case _: NumberFormatException => Double.NaN }
    case d: JsDate => d.ms.toDouble // ECMA valueOf: arithmetic/compares work
    case _ => Double.NaN
  }

  def toStr(v: Any): String = v match {
    case s: String => s
    case d: Double => Json.numToString(d)
    case b: Boolean => b.toString
    case null => "null"
    case Undefined => "undefined"
    case a: JsArray => a.items.map {
      case null | Undefined => ""
      case x => toStr(x)
    }.mkString(",")
    case _: JsObject => "[object Object]"
    // deviation: ECMA formats dates in local time ("Fri Jan 05 2024 …");
    // the deterministic engine renders the ISO instant
    case d: JsDate => d.iso
    case f: JsFunction => s"function ${f.name}"
    case Builtin(n, _) => s"function $n"
    case other => String.valueOf(other)
  }

  def typeOf(v: Any): String = v match {
    case _: Double => "number"
    case _: String => "string"
    case _: Boolean => "boolean"
    case Undefined => "undefined"
    case _: JsFunction | _: Builtin => "function"
    case _ => "object" // null, arrays, objects — like JS
  }

  private def binary(op: String, l: Any, r: Any): Any = op match {
    case "+" =>
      (l, r) match {
        // ECMA: Date's default ToPrimitive hint is STRING, so `date + x`
        // concatenates (rendering the ISO form — the documented toString
        // deviation); '-' and the relational ops stay numeric (ms)
        case (a: JsDate, b) => a.iso + toStr(b)
        case (a, b: JsDate) => toStr(a) + b.iso
        case (a: String, b) => a + toStr(b)
        case (a, b: String) => toStr(a) + b
        case (a: JsArray, b) => toStr(a) + toStr(b)
        case (a, b: JsArray) => toStr(a) + toStr(b)
        case (a: JsObject, b) => toStr(a) + toStr(b)
        case (a, b: JsObject) => toStr(a) + toStr(b)
        case (a, b) => toNumber(a) + toNumber(b)
      }
    case "-" => toNumber(l) - toNumber(r)
    case "*" => toNumber(l) * toNumber(r)
    case "/" => toNumber(l) / toNumber(r)
    case "%" => toNumber(l) % toNumber(r)
    case "<" | "<=" | ">" | ">=" =>
      (l, r) match {
        case (a: String, b: String) =>
          val c = a.compareTo(b)
          op match {
            case "<" => c < 0; case "<=" => c <= 0
            case ">" => c > 0; case ">=" => c >= 0
          }
        case (a, b) =>
          val (x, y) = (toNumber(a), toNumber(b))
          op match {
            case "<" => x < y; case "<=" => x <= y
            case ">" => x > y; case ">=" => x >= y
          }
      }
    case "===" => strictEquals(l, r)
    case "!==" => !strictEquals(l, r)
    case "==" => looseEquals(l, r)
    case "!=" => !looseEquals(l, r)
    case other => fail(s"unknown operator $other")
  }

  def strictEquals(l: Any, r: Any): Boolean = (l, r) match {
    case (a: Double, b: Double) => a == b
    case (a: String, b: String) => a == b
    case (a: Boolean, b: Boolean) => a == b
    case (null, null) => true
    case (Undefined, Undefined) => true
    case (a: AnyRef, b: AnyRef) => a eq b // reference equality for obj/arr/fn
    case _ => false
  }

  private def looseEquals(l: Any, r: Any): Boolean = (l, r) match {
    case (null, Undefined) | (Undefined, null) => true
    case (a: Double, b: String) => a == toNumber(b)
    case (a: String, b: Double) => toNumber(a) == b
    case (a: Boolean, b) => looseEquals(toNumber(a), b)
    case (a, b: Boolean) => looseEquals(a, toNumber(b))
    case _ => strictEquals(l, r)
  }

  // ---- builtin library ------------------------------------------------------

  private def arg(args: Seq[Any], i: Int): Any =
    if (i < args.length) args(i) else Undefined

  private def getMember(obj: Any, name: String): Any = obj match {
    case s: String => stringMember(s, name)
    case a: JsArray => arrayMember(a, name)
    case r: JsRegExp => regexMember(r, name)
    case d: JsDate => dateMember(d, name)
    case b: Builtin if b.name == "Date" => dateStatic(name)
    case o: JsObject => o.fields.getOrElse(name, Undefined)
    case null => fail(s"cannot read .$name of null")
    case Undefined => fail(s"cannot read .$name of undefined")
    case other => fail(s"cannot read .$name of ${typeOf(other)}")
  }

  private def dateMember(d: JsDate, name: String): Any = name match {
    case "getTime" | "valueOf" => Builtin(name, _ => d.ms.toDouble)
    // toString renders the ISO form too — the documented deviation from
    // ECMA's locale-formatted (timezone-dependent) string
    case "toISOString" | "toJSON" | "toString" => Builtin(name, _ => d.iso)
    case "getUTCFullYear" => Builtin(name, _ => d.odt.getYear.toDouble)
    case "getUTCMonth" => Builtin(name, _ => (d.odt.getMonthValue - 1).toDouble)
    case "getUTCDate" => Builtin(name, _ => d.odt.getDayOfMonth.toDouble)
    // JS day-of-week is 0=Sunday; java.time ISO is 1=Monday..7=Sunday
    case "getUTCDay" => Builtin(name, _ => (d.odt.getDayOfWeek.getValue % 7).toDouble)
    case "getUTCHours" => Builtin(name, _ => d.odt.getHour.toDouble)
    case "getUTCMinutes" => Builtin(name, _ => d.odt.getMinute.toDouble)
    case "getUTCSeconds" => Builtin(name, _ => d.odt.getSecond.toDouble)
    case "getUTCMilliseconds" =>
      Builtin(name, _ => ((d.ms % 1000 + 1000) % 1000).toDouble)
    case "getFullYear" | "getMonth" | "getDate" | "getDay" | "getHours" |
        "getMinutes" | "getSeconds" | "getMilliseconds" |
        "getTimezoneOffset" | "toLocaleString" | "toLocaleDateString" =>
      fail(s"Date.$name is executor-timezone-dependent — use the getUTC* " +
        "twin (this engine is UTC-only for determinism)")
    case other => fail(s"unsupported Date member .$other")
  }

  private def dateStatic(name: String): Any = name match {
    case "UTC" => Builtin("UTC", a => {
      def n(i: Int, dflt: Double): Double = arg(a, i) match {
        case Undefined => dflt
        case v =>
          val x = toNumber(v)
          if (x.isNaN || x != Math.floor(x) || x.isInfinite)
            fail(s"Date.UTC argument $i must be an integral number")
          x
      }
      if (a.length < 2) fail("Date.UTC needs at least (year, month)")
      // every field bounded BEFORE .toInt — a huge argument must fail,
      // not Int-wrap into a plausible instant
      Seq.tabulate(7)(i => if (i < a.length) n(i, 0) else 0.0).foreach { x =>
        if (math.abs(x) > 1e9) fail("Date.UTC field out of plausible range")
      }
      // ECMA MakeFullYear: two-digit years map to 1900+y
      val y0 = n(0, 0).toInt
      val year = if (y0 >= 0 && y0 <= 99) 1900 + y0 else y0
      try {
        val base = java.time.LocalDateTime
          .of(year, n(1, 0).toInt + 1, n(2, 1).toInt,
            n(3, 0).toInt, n(4, 0).toInt, n(5, 0).toInt)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        JsDate.clip(base + n(6, 0).toLong).toDouble
      } catch {
        case e: java.time.DateTimeException =>
          // LOUD deviation from ECMA's silent field rollover
          fail(s"Date.UTC out-of-range field: ${e.getMessage}")
        case _: ArithmeticException => // toEpochMilli Long overflow
          fail("Date.UTC result outside the ECMA ±8.64e15 ms range")
      }
    })
    case "parse" => Builtin("parse", a =>
      parseIsoMs(toStr(arg(a, 0))).toDouble)
    case "now" => fail("Date.now() is wall-clock — nondeterministic across " +
      "executors and replays; pass the timestamp in as data instead")
    case other => fail(s"unsupported Date static .$other")
  }

  private def parseIsoMs(s: String): Long =
    try {
      JsDate.clip(
        if (s.length == 10) java.time.LocalDate.parse(s)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
        else java.time.OffsetDateTime.parse(s).toInstant.toEpochMilli)
    } catch {
      case e: java.time.format.DateTimeParseException =>
        fail(s"unparseable date '$s' (strict ISO-8601 only): ${e.getMessage}")
      case _: ArithmeticException =>
        fail(s"date '$s' outside the ECMA ±8.64e15 ms range")
    }

  private def regexMember(r: JsRegExp, name: String): Any = name match {
    case "source" => r.source
    case "flags" => r.flags
    case "global" => r.global
    case "ignoreCase" => r.flags.contains('i')
    case "multiline" => r.flags.contains('m')
    case "test" => Builtin("test", a => r.pattern.matcher(toStr(arg(a, 0))).find())
    case "exec" => Builtin("exec", a => {
      // STATELESS exec (no lastIndex): always the first match from 0.
      // Iterating all matches = s.match(/re/g); this keeps the value
      // deterministic and the classic while(exec) misuse impossible.
      val m = r.pattern.matcher(toStr(arg(a, 0)))
      if (!m.find()) null
      else new JsArray(mutable.ArrayBuffer((0 to m.groupCount).map { g =>
        val s = m.group(g)
        if (s == null) Undefined else (s: Any)
      }: _*))
    })
    case other => fail(s"unsupported regex member .$other")
  }

  /** `$&`/`$1..$9`/`$$` substitution for string-form regex replace. */
  private def regexSubst(repl: String, m: java.util.regex.Matcher): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < repl.length) {
      val c = repl.charAt(i)
      if (c == '$' && i + 1 < repl.length) {
        repl.charAt(i + 1) match {
          case '$' => sb += '$'; i += 2
          case '&' => sb ++= m.group(0); i += 2
          case d if d.isDigit =>
            val g = d - '0'
            if (g >= 1 && g <= m.groupCount) {
              val s = m.group(g)
              if (s != null) sb ++= s
              i += 2
            } else { sb += c; i += 1 } // out-of-range: literal, like JS
          case _ => sb += c; i += 1
        }
      } else { sb += c; i += 1 }
    }
    sb.result()
  }

  /** ES5 String.prototype.split with a regex separator (§15.5.4.14):
    * separators match ANCHORED at the cursor, captured groups are SPLICED
    * into the output (Java's Pattern.split silently drops them), an empty
    * match adjacent to the previous split point advances instead of
    * emitting an empty field, and ''.split(/matching-empty/) is []. */
  private def regexSplit(s: String, re: JsRegExp): Seq[Any] = {
    val m = re.pattern.matcher(s)
    // transparent + non-anchoring bounds: ^ must mean the TRUE string
    // start (JS), not "wherever the split cursor currently is"
    m.useTransparentBounds(true).useAnchoringBounds(false)
    def groupsOf: Seq[Any] = (1 to m.groupCount).map { g =>
      val gs = m.group(g)
      if (gs == null) (Undefined: Any) else (gs: Any)
    }
    if (s.isEmpty) {
      m.region(0, 0)
      return if (m.lookingAt()) Nil else Seq(s)
    }
    val out = mutable.ArrayBuffer.empty[Any]
    var p = 0 // start of the current unsplit run
    var q = 0 // match cursor
    while (q < s.length) {
      m.region(q, s.length)
      if (m.lookingAt()) {
        val e = m.end()
        if (e == p) q += 1 // empty match at the previous split point
        else {
          out += s.substring(p, q)
          out ++= groupsOf
          p = e
          q = math.max(e, q + (if (e == q) 1 else 0))
        }
      } else q += 1
    }
    out += s.substring(p)
    out.toSeq
  }

  /** Callback-form replace: fn(match, p1..pn) — JS argument shape minus
    * the trailing (offset, string) pair. */
  private def regexReplFn(fn: Any, m: java.util.regex.Matcher): String = {
    val args = (0 to m.groupCount).map { g =>
      val s = m.group(g)
      if (s == null) (Undefined: Any) else (s: Any)
    }
    toStr(callValue(fn, args))
  }

  private def clampIdx(i: Double, len: Int): Int = {
    val base = if (i < 0) len + i else i
    math.max(0, math.min(len.toDouble, base)).toInt
  }

  private def stringMember(s: String, name: String): Any = name match {
    case "length" => s.length.toDouble
    case "charAt" => Builtin("charAt", a => {
      val i = toNumber(arg(a, 0)).toInt
      if (i >= 0 && i < s.length) s.charAt(i).toString else ""
    })
    case "charCodeAt" => Builtin("charCodeAt", a => {
      val i = toNumber(arg(a, 0)).toInt
      if (i >= 0 && i < s.length) s.charAt(i).toDouble else Double.NaN
    })
    case "indexOf" => Builtin("indexOf", a => s.indexOf(toStr(arg(a, 0))).toDouble)
    case "lastIndexOf" =>
      Builtin("lastIndexOf", a => s.lastIndexOf(toStr(arg(a, 0))).toDouble)
    case "substring" => Builtin("substring", a => {
      val from = math.max(0, math.min(s.length, toNumber(arg(a, 0)).toInt))
      val to = arg(a, 1) match {
        case Undefined => s.length
        case v => math.max(0, math.min(s.length, toNumber(v).toInt))
      }
      s.substring(math.min(from, to), math.max(from, to))
    })
    case "slice" => Builtin("slice", a => {
      val from = clampIdx(toNumber(arg(a, 0)), s.length)
      val to = arg(a, 1) match {
        case Undefined => s.length
        case v => clampIdx(toNumber(v), s.length)
      }
      if (from >= to) "" else s.substring(from, to)
    })
    case "split" => Builtin("split", a => {
      val limit = arg(a, 1) match {
        case Undefined => Int.MaxValue
        case v =>
          // ECMA-262 coerces limit via ToUint32: split(sep, -1) wraps to
          // 2^32-1 (keep all parts), NaN/Infinity -> 0; capped at
          // Int.MaxValue since no JsArray can exceed it anyway
          val n = toNumber(v)
          val u = if (n.isNaN || n.isInfinite) 0L
            else (math.signum(n) * math.floor(math.abs(n))).toLong &
              0xFFFFFFFFL
          math.min(u, Int.MaxValue.toLong).toInt
      }
      val parts: Seq[Any] = arg(a, 0) match {
        case sep: String =>
          if (sep.isEmpty) s.map(_.toString)
          else {
            // JS split keeps trailing empty fields (unlike Java's default)
            val out = mutable.ArrayBuffer.empty[String]
            var start = 0
            var idx = s.indexOf(sep)
            while (idx >= 0) {
              out += s.substring(start, idx)
              start = idx + sep.length
              idx = s.indexOf(sep, start)
            }
            out += s.substring(start)
            out.toSeq
          }
        case re: JsRegExp => regexSplit(s, re)
        case _ => Seq(s)
      }
      new JsArray(mutable.ArrayBuffer(parts.take(limit): _*))
    })
    case "trim" => Builtin("trim", _ => s.trim)
    case "toUpperCase" => Builtin("toUpperCase", _ => s.toUpperCase(java.util.Locale.ROOT))
    case "toLowerCase" => Builtin("toLowerCase", _ => s.toLowerCase(java.util.Locale.ROOT))
    case "replace" => Builtin("replace", a => arg(a, 0) match {
      case re: JsRegExp =>
        // g → all matches, else first; repl is a $-substitution string or
        // a callback fn(match, p1..pn)
        val m = re.pattern.matcher(s)
        val repl = arg(a, 1)
        val sb = new StringBuilder
        var last = 0
        var go = m.find()
        while (go) {
          sb ++= s.substring(last, m.start())
          sb ++= (repl match {
            case fn @ (_: JsFunction | _: Builtin) => regexReplFn(fn, m)
            case v => regexSubst(toStr(v), m)
          })
          last = m.end()
          // zero-width match must still advance, or this never terminates
          go = re.global && (if (m.end() > m.start()) m.find()
            else m.end() < s.length && m.find(m.end() + 1))
        }
        sb ++= s.substring(last)
        sb.result()
      case find0 =>
        // first occurrence only, literal string pattern (JS semantics)
        val find = toStr(find0); val repl = toStr(arg(a, 1))
        val i = s.indexOf(find)
        if (i < 0) s else s.substring(0, i) + repl + s.substring(i + find.length)
    })
    case "match" => Builtin("match", a => arg(a, 0) match {
      case re: JsRegExp if re.global =>
        // all full-match strings, or null when none (JS)
        val m = re.pattern.matcher(s)
        val out = mutable.ArrayBuffer.empty[Any]
        var pos = 0
        while (pos <= s.length && m.find(pos)) {
          out += m.group(0)
          pos = if (m.end() > m.start()) m.end() else m.end() + 1
        }
        if (out.isEmpty) null else new JsArray(out)
      case re: JsRegExp =>
        // exec shape: [full, groups...] or null
        val m = re.pattern.matcher(s)
        if (!m.find()) null
        else new JsArray(mutable.ArrayBuffer((0 to m.groupCount).map { g =>
          val gs = m.group(g)
          if (gs == null) (Undefined: Any) else (gs: Any)
        }: _*))
      case other => fail(s"match expects a regex, got ${typeOf(other)}")
    })
    case "search" => Builtin("search", a => arg(a, 0) match {
      case re: JsRegExp =>
        val m = re.pattern.matcher(s)
        if (m.find()) m.start().toDouble else -1.0
      case other => fail(s"search expects a regex, got ${typeOf(other)}")
    })
    case "startsWith" => Builtin("startsWith", a => s.startsWith(toStr(arg(a, 0))))
    case "endsWith" => Builtin("endsWith", a => s.endsWith(toStr(arg(a, 0))))
    case "includes" => Builtin("includes", a => s.contains(toStr(arg(a, 0))))
    case other => fail(s"unsupported string member .$other")
  }

  private def arrayMember(arr: JsArray, name: String): Any = name match {
    case "length" => arr.items.length.toDouble
    case "push" => Builtin("push", a => { arr.items ++= a; arr.items.length.toDouble })
    case "pop" => Builtin("pop", _ =>
      if (arr.items.isEmpty) Undefined else arr.items.remove(arr.items.length - 1))
    case "join" => Builtin("join", a => {
      val sep = arg(a, 0) match { case Undefined => ","; case v => toStr(v) }
      arr.items.map { case null | Undefined => ""; case x => toStr(x) }.mkString(sep)
    })
    case "indexOf" => Builtin("indexOf", a =>
      arr.items.indexWhere(strictEquals(_, arg(a, 0))).toDouble)
    case "includes" => Builtin("includes", a =>
      arr.items.exists(strictEquals(_, arg(a, 0))))
    case "slice" => Builtin("slice", a => {
      val from = arg(a, 0) match {
        case Undefined => 0; case v => clampIdx(toNumber(v), arr.items.length)
      }
      val to = arg(a, 1) match {
        case Undefined => arr.items.length
        case v => clampIdx(toNumber(v), arr.items.length)
      }
      new JsArray(mutable.ArrayBuffer(
        (if (from >= to) Nil else arr.items.slice(from, to).toSeq): _*))
    })
    case "concat" => Builtin("concat", a => {
      val out = mutable.ArrayBuffer(arr.items.toSeq: _*)
      a.foreach {
        case b: JsArray => out ++= b.items
        case v => out += v
      }
      new JsArray(out)
    })
    case "reverse" => Builtin("reverse", _ => {
      val rev = arr.items.reverse
      arr.items.clear(); arr.items ++= rev; arr
    })
    case "map" => Builtin("map", a => new JsArray(
      arr.items.zipWithIndex.map { case (v, i) =>
        callValue(arg(a, 0), Seq(v, i.toDouble)) }))
    case "filter" => Builtin("filter", a => new JsArray(
      arr.items.zipWithIndex
        .filter { case (v, i) => truthy(callValue(arg(a, 0), Seq(v, i.toDouble))) }
        .map(_._1)))
    case "reduce" => Builtin("reduce", a => {
      val fn = arg(a, 0)
      var (acc, start) = arg(a, 1) match {
        case Undefined =>
          if (arr.items.isEmpty) fail("reduce of empty array with no initial value")
          (arr.items(0), 1)
        case init => (init, 0)
      }
      (start until arr.items.length).foreach { i =>
        acc = callValue(fn, Seq(acc, arr.items(i), i.toDouble))
      }
      acc
    })
    case "sort" => Builtin("sort", a => {
      val sorted = arg(a, 0) match {
        case Undefined => arr.items.sortBy(toStr) // JS default: string order
        case cmp => arr.items.sortWith((x, y) => toNumber(callValue(cmp, Seq(x, y))) < 0)
      }
      arr.items.clear(); arr.items ++= sorted; arr
    })
    case other => fail(s"unsupported array member .$other")
  }

  private def globalEnv(): Env = {
    val g = new Env(None)
    g.declare("undefined", Undefined)
    g.declare("NaN", Double.NaN)
    g.declare("Infinity", Double.PositiveInfinity)
    g.declare("Math", JsObject(
      "abs" -> Builtin("abs", a => math.abs(toNumber(arg(a, 0)))),
      "floor" -> Builtin("floor", a => math.floor(toNumber(arg(a, 0)))),
      "ceil" -> Builtin("ceil", a => math.ceil(toNumber(arg(a, 0)))),
      "round" -> Builtin("round", a => math.floor(toNumber(arg(a, 0)) + 0.5)),
      "sqrt" -> Builtin("sqrt", a => math.sqrt(toNumber(arg(a, 0)))),
      "pow" -> Builtin("pow", a => math.pow(toNumber(arg(a, 0)), toNumber(arg(a, 1)))),
      "min" -> Builtin("min", a =>
        if (a.isEmpty) Double.PositiveInfinity else a.map(toNumber).min),
      "max" -> Builtin("max", a =>
        if (a.isEmpty) Double.NegativeInfinity else a.map(toNumber).max),
      "log" -> Builtin("log", a => math.log(toNumber(arg(a, 0)))),
      "exp" -> Builtin("exp", a => math.exp(toNumber(arg(a, 0))))))
    g.declare("JSON", JsObject(
      "parse" -> Builtin("parse", a => Json.parse(toStr(arg(a, 0)))),
      "stringify" -> Builtin("stringify", a => Json.stringify(arg(a, 0)))))
    g.declare("Object", JsObject(
      "keys" -> Builtin("keys", a => arg(a, 0) match {
        case o: JsObject => new JsArray(mutable.ArrayBuffer(o.fields.keys.toSeq: _*))
        case arr: JsArray => new JsArray(mutable.ArrayBuffer(
          arr.items.indices.map(i => Json.numToString(i.toDouble)): _*))
        case other => fail(s"Object.keys of ${typeOf(other)}")
      })))
    g.declare("String", Builtin("String", a => toStr(arg(a, 0))))
    g.declare("Number", Builtin("Number", a => toNumber(arg(a, 0))))
    g.declare("parseInt", Builtin("parseInt", a => {
      // Full JS parseInt: explicit radix 2..36, 0x/0X hex auto-detection,
      // longest valid-digit prefix, NaN on empty. Deterministic (pure
      // string → number), so it fits the interpreter's contract.
      var t = toStr(arg(a, 0)).trim
      val sign = if (t.startsWith("-")) { t = t.tail; -1.0 }
        else { if (t.startsWith("+")) t = t.tail; 1.0 }
      val rArg = arg(a, 1)
      var radix = if (rArg == Undefined || rArg == null) 0
        else toNumber(rArg).toInt
      if (radix == 16 || radix == 0) {
        if (t.length >= 2 && t.charAt(0) == '0' &&
          (t.charAt(1) == 'x' || t.charAt(1) == 'X')) {
          t = t.substring(2); radix = 16
        } else if (radix == 0) radix = 10
      }
      if (radix < 2 || radix > 36) Double.NaN
      else {
        // ASCII [0-9a-zA-Z] ONLY, per ECMA-262 — Character.digit would
        // also accept fullwidth/Devanagari digits and silently diverge
        // from a SQL oracle replaying the same parse
        def digitVal(c: Char): Int =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'z') c - 'a' + 10
          else if (c >= 'A' && c <= 'Z') c - 'A' + 10
          else -1
        val digits = t.takeWhile(c => { val d = digitVal(c); d >= 0 && d < radix })
        if (digits.isEmpty) Double.NaN
        else {
          // exact integer accumulation, then ONE rounding to double —
          // per-step double rounding (acc*radix+d) can differ in the
          // last ulp above 2^53 from ECMA's exact-then-round result
          val exact = digits.foldLeft(BigInt(0))((acc, c) =>
            acc * radix + digitVal(c))
          sign * exact.toDouble
        }
      }
    }))
    g.declare("parseFloat", Builtin("parseFloat", a => {
      // JS parseFloat: longest valid numeric PREFIX ("2.5rem" → 2.5)
      val t = toStr(arg(a, 0)).trim
      var i = 0
      if (i < t.length && (t(i) == '+' || t(i) == '-')) i += 1
      var sawDigit = false
      while (i < t.length && t(i).isDigit) { i += 1; sawDigit = true }
      if (i < t.length && t(i) == '.') {
        i += 1
        while (i < t.length && t(i).isDigit) { i += 1; sawDigit = true }
      }
      if (sawDigit && i < t.length && (t(i) == 'e' || t(i) == 'E')) {
        val save = i
        i += 1
        if (i < t.length && (t(i) == '+' || t(i) == '-')) i += 1
        var expDigit = false
        while (i < t.length && t(i).isDigit) { i += 1; expDigit = true }
        if (!expDigit) i = save
      }
      if (!sawDigit) Double.NaN else t.substring(0, i).toDouble
    }))
    g.declare("isNaN", Builtin("isNaN", a => toNumber(arg(a, 0)).isNaN))
    // Error factory: callable plain (`throw Error('x')`, valid JS) or via
    // `new Error('x')` — the parser desugars the `new` form to this call
    g.declare("Error", Builtin("Error", a => errorObject(arg(a, 0) match {
      case Undefined => ""
      case v => toStr(v)
    })))
    // RegExp factory: `RegExp(src, flags)` / `new RegExp(src, flags)` —
    // same value a /src/flags literal yields; pattern + flags validated
    // HERE (call time), the dynamic-source analog of the literal's
    // parse-time compile
    g.declare("RegExp", Builtin("RegExp", a => {
      val src = toStr(arg(a, 0))
      val flags = arg(a, 1) match { case Undefined => ""; case v => toStr(v) }
      val bad = flags.filterNot("gims".contains(_))
      if (bad.nonEmpty)
        fail(s"unsupported regex flag(s) '$bad' (supported: gims)")
      JsRegExp.compiled(src, flags) // loud failure on a bad pattern
      new JsRegExp(src, flags)
    }))
    // Date factory: `new Date(ms)` / `new Date(isoString)` only — the
    // zero-argument (wall-clock) and multi-argument (LOCAL-time) ECMA
    // forms are refused loudly; components go through Date.UTC
    g.declare("Date", Builtin("Date", a => {
      if (a.length > 1)
        fail("multi-argument Date(...) is LOCAL-time in JS (executor-" +
          "timezone-dependent) — build the instant with Date.UTC(...)")
      arg(a, 0) match {
        case Undefined => fail("Date() without arguments is wall-clock — " +
          "nondeterministic; pass an epoch-ms number or an ISO string")
        case d: Double =>
          if (d.isNaN || d.isInfinite) fail("Date(ms) needs a finite number")
          new JsDate(JsDate.clip(d.toLong))
        case s: String => new JsDate(parseIsoMs(s))
        case other => fail(s"Date(...) takes a number or an ISO string, " +
          s"not ${typeOf(other)}")
      }
    }))
    g
  }

  // ---- JSON bridge ------------------------------------------------------------

  /** Minimal strict JSON parser/serializer over the interpreter's value
    * types — the record bridge between Spark's `to_json` rows and scripts.
    * Serialization is insertion-ordered and formats integral doubles
    * without a decimal point (JS `JSON.stringify` number formatting for
    * the integer range that matters). */
  object Json {
    def numToString(d: Double): String =
      if (d.isNaN || d.isInfinite) "null" // JSON has no NaN/Inf (JS emits null)
      // every integral double in (-2^63, 2^63) converts exactly via toLong;
      // JS prints these without a decimal point up to 1e21, so the long
      // form is the JS-compatible one for the whole BIGINT range
      else if (d == math.rint(d) && math.abs(d) < 9.2e18) d.toLong.toString
      else d.toString

    def stringify(v: Any): String = v match {
      case null => "null"
      case Undefined => "null" // stringify(undefined) at top level is undefined in JS; inside containers it's null — null is the deterministic choice
      case b: Boolean => b.toString
      case d: Double => numToString(d)
      case s: String => quote(s)
      case a: JsArray => a.items.map(stringify).mkString("[", ",", "]")
      case o: JsObject =>
        o.fields.map { case (k, x) => quote(k) + ":" + stringify(x) }
          .mkString("{", ",", "}")
      case _: JsRegExp => "{}" // JS: a RegExp has no enumerable own props
      case d: JsDate => quote(d.iso) // JS: Date#toJSON → ISO string
      case other => fail(s"cannot stringify ${typeOf(other)}")
    }

    private def quote(s: String): String = {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      sb.append('"').result()
    }

    def parse(s: String): Any = {
      val p = new JsonParser(s)
      val v = p.value()
      p.skipWs()
      if (!p.atEnd) fail(s"trailing JSON content at ${p.pos}")
      v
    }

    private final class JsonParser(s: String) {
      var pos = 0
      def atEnd: Boolean = pos >= s.length
      def skipWs(): Unit = while (!atEnd && s(pos).isWhitespace) pos += 1
      private def err(m: String) = fail(s"JSON parse error at $pos: $m")
      private def expect(c: Char): Unit = {
        if (atEnd || s(pos) != c) err(s"expected '$c'")
        pos += 1
      }
      def value(): Any = {
        skipWs()
        if (atEnd) err("unexpected end")
        s(pos) match {
          case '{' =>
            pos += 1; skipWs()
            val fields = mutable.LinkedHashMap.empty[String, Any]
            if (!atEnd && s(pos) == '}') { pos += 1 }
            else {
              var more = true
              while (more) {
                skipWs()
                val k = str()
                skipWs(); expect(':')
                fields(k) = value()
                skipWs()
                if (!atEnd && s(pos) == ',') pos += 1
                else { expect('}'); more = false }
              }
            }
            new JsObject(fields)
          case '[' =>
            pos += 1; skipWs()
            val items = mutable.ArrayBuffer.empty[Any]
            if (!atEnd && s(pos) == ']') { pos += 1 }
            else {
              var more = true
              while (more) {
                items += value()
                skipWs()
                if (!atEnd && s(pos) == ',') pos += 1
                else { expect(']'); more = false }
              }
            }
            new JsArray(items)
          case '"' => str()
          case 't' =>
            if (s.startsWith("true", pos)) { pos += 4; true } else err("bad literal")
          case 'f' =>
            if (s.startsWith("false", pos)) { pos += 5; false } else err("bad literal")
          case 'n' =>
            if (s.startsWith("null", pos)) { pos += 4; null } else err("bad literal")
          case c if c == '-' || c.isDigit =>
            val start = pos
            if (s(pos) == '-') pos += 1
            if (atEnd || !s(pos).isDigit) err("digit expected") // rejects '-', '-.5'
            while (!atEnd && s(pos).isDigit) pos += 1
            if (!atEnd && s(pos) == '.') {
              pos += 1
              if (atEnd || !s(pos).isDigit) err("digit expected after '.'")
              while (!atEnd && s(pos).isDigit) pos += 1
            }
            if (!atEnd && (s(pos) == 'e' || s(pos) == 'E')) {
              pos += 1
              if (!atEnd && (s(pos) == '+' || s(pos) == '-')) pos += 1
              if (atEnd || !s(pos).isDigit) err("digit expected in exponent")
              while (!atEnd && s(pos).isDigit) pos += 1
            }
            s.substring(start, pos).toDouble
          case other => err(s"unexpected '$other'")
        }
      }
      private def str(): String = {
        expect('"')
        val sb = new StringBuilder
        while (!atEnd && s(pos) != '"') {
          if (s(pos) == '\\') {
            if (pos + 1 >= s.length) err("unterminated escape")
            s(pos + 1) match {
              case '"' => sb += '"'; pos += 2
              case '\\' => sb += '\\'; pos += 2
              case '/' => sb += '/'; pos += 2
              case 'n' => sb += '\n'; pos += 2
              case 't' => sb += '\t'; pos += 2
              case 'r' => sb += '\r'; pos += 2
              case 'b' => sb += '\b'; pos += 2
              case 'f' => sb += '\f'; pos += 2
              case 'u' =>
                if (pos + 5 >= s.length) err("unterminated \\u")
                val hex = s.substring(pos + 2, pos + 6)
                sb += (try Integer.parseInt(hex, 16).toChar
                  catch { case _: NumberFormatException => err(s"bad \\u$hex") })
                pos += 6
              case other => err(s"bad escape \\$other")
            }
          } else { sb += s(pos); pos += 1 }
        }
        expect('"')
        sb.result()
      }
    }
  }
}
