package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.js.Js

/** Language-surface contract of the [[graft.js.Js]] interpreter (pure, no
  * Spark) plus the [[graft.pipeline.JsStage]] Spark plumbing: map form with
  * null-skip sentinel, filter form, plan-time syntax errors. */
class JsSpec extends AnyFunSuite {

  /** Evaluate `expr` in a script that returns it from main(). */
  private def run(script: String): Any =
    Js.invoke(Js.load(Js.parse(script)), "main", Nil)

  private def evalExpr(e: String): Any = run(s"function main() { return $e; }")

  test("arithmetic, precedence, unary, ternary") {
    assert(evalExpr("1 + 2 * 3") === 7.0)
    assert(evalExpr("(1 + 2) * 3") === 9.0)
    assert(evalExpr("7 % 3") === 1.0)
    assert(evalExpr("-3 + +2") === -1.0)
    assert(evalExpr("1 < 2 ? 'y' : 'n'") === "y")
    assert(evalExpr("10 / 4") === 2.5)
  }

  test("string concat, number formatting, comparisons") {
    assert(evalExpr("'a' + 'b'") === "ab")
    assert(evalExpr("'n=' + 3") === "n=3")          // integral: no .0
    assert(evalExpr("'n=' + 2.5") === "n=2.5")
    assert(evalExpr("'b' > 'a'") === true)          // string order
    assert(evalExpr("'10' < '9'") === true)         // string-string compares as strings
    assert(evalExpr("10 < '9'") === false)          // mixed coerces to number
  }

  test("equality: strict vs loose") {
    assert(evalExpr("1 === 1") === true)
    assert(evalExpr("'1' === 1") === false)
    assert(evalExpr("'1' == 1") === true)
    assert(evalExpr("null == undefined") === true)
    assert(evalExpr("null === undefined") === false)
    assert(evalExpr("true == 1") === true)
    assert(evalExpr("[1] === [1]") === false)       // reference equality
  }

  test("truthiness and logical operators return operands") {
    assert(evalExpr("'' || 'fallback'") === "fallback")
    assert(evalExpr("'x' && 'y'") === "y")
    assert(evalExpr("0 && 'y'") === 0.0)
    assert(evalExpr("!0") === true)
    assert(evalExpr("!!'s'") === true)
  }

  test("var, assignment operators, ++/--") {
    assert(run("function main() { var x = 1, y = 2; x += y; x *= 3; return x; }") === 9.0)
    assert(run("function main() { var i = 5; var a = i++; return a + '|' + i; }") === "5|6")
    assert(run("function main() { var i = 5; var a = ++i; return a + '|' + i; }") === "6|6")
  }

  test("if/else chains, while, for, break, continue") {
    assert(run(
      """function main() {
        |  var n = 0;
        |  for (var i = 0; i < 10; i++) {
        |    if (i == 3) continue;
        |    if (i == 7) break;
        |    n += i;
        |  }
        |  return n; // 0+1+2+4+5+6
        |}""".stripMargin) === 18.0)
    assert(run(
      """function main() {
        |  var i = 0, s = '';
        |  while (i < 3) { s += i; i++; }
        |  return s;
        |}""".stripMargin) === "012")
    assert(run(
      """function main(x) {
        |  if (x > 0) return 'pos'; else if (x < 0) return 'neg';
        |  return 'zero';
        |}""".stripMargin) === "zero")
  }

  test("functions: closures, recursion, higher-order, hoisting") {
    assert(run(
      """function main() {
        |  // declared AFTER use: top-level declarations hoist
        |  return fib(10);
        |}
        |function fib(n) { return n < 2 ? n : fib(n - 1) + fib(n - 2); }
        |""".stripMargin) === 55.0)
    assert(run(
      """function main() {
        |  var add = function (a) { return function (b) { return a + b; }; };
        |  var add3 = add(3);
        |  return add3(4);
        |}""".stripMargin) === 7.0)
    assert(run(
      """function main() {
        |  var counter = function () {
        |    var n = 0;
        |    return function () { n++; return n; };
        |  }();
        |  counter(); counter();
        |  return counter();
        |}""".stripMargin) === 3.0)
  }

  test("objects and arrays: literals, access, mutation, for-in") {
    assert(run(
      """function main() {
        |  var o = { a: 1, 'b c': 2 };
        |  o.d = o.a + o['b c'];
        |  var ks = [];
        |  for (var k in o) ks.push(k);
        |  return ks.join('|') + '=' + o.d;
        |}""".stripMargin) === "a|b c|d=3")
    assert(run(
      """function main() {
        |  var a = [3, 1, 2];
        |  a.push(4);
        |  a[0] = 5;
        |  return a.join(',') + '#' + a.length;
        |}""".stripMargin) === "5,1,2,4#4")
    assert(evalExpr("({ x: 1 }).missing === undefined") === true)
  }

  test("string methods") {
    assert(evalExpr("'Hello World'.toUpperCase()") === "HELLO WORLD")
    assert(evalExpr("'Hello'.toLowerCase()") === "hello")
    assert(evalExpr("'a,b,,c'.split(',').length") === 4.0) // trailing/empty kept
    assert(evalExpr("'a b'.split('').length") === 3.0)
    // ECMA ToUint32 limit coercion: -1 wraps to 2^32-1 (keep all parts)
    assert(evalExpr("'a,b,c'.split(',', -1).length") === 3.0)
    assert(evalExpr("'a,b,c'.split(',', 2).length") === 2.0)
    assert(evalExpr("'a,b,c'.split(',', 0).length") === 0.0)
    assert(evalExpr("'hello'.indexOf('ll')") === 2.0)
    assert(evalExpr("'hello'.substring(1, 3)") === "el")
    assert(evalExpr("'hello'.slice(-3)") === "llo")
    assert(evalExpr("'  x '.trim()") === "x")
    assert(evalExpr("'aXbXc'.replace('X', '-')") === "a-bXc") // first only
    assert(evalExpr("'abc'.charAt(1)") === "b")
    assert(evalExpr("'abc'.charCodeAt(0)") === 97.0)
    assert(evalExpr("'abc'.startsWith('ab') && 'abc'.endsWith('c') && 'abc'.includes('b')") === true)
    assert(evalExpr("'abc'[1]") === "b")
  }

  test("array methods: slice/concat/reverse/indexOf/map/filter/reduce/sort") {
    assert(evalExpr("[1,2,3,4].slice(1, 3).join('')") === "23")
    assert(evalExpr("[1,2].concat([3], 4).join('')") === "1234")
    assert(evalExpr("[1,2,3].reverse().join('')") === "321")
    assert(evalExpr("[5,6,7].indexOf(6)") === 1.0)
    assert(evalExpr("[1,2,3].map(function (x) { return x * 2; }).join(',')") === "2,4,6")
    assert(evalExpr("[1,2,3,4].filter(function (x) { return x % 2 == 0; }).join(',')") === "2,4")
    assert(evalExpr("[1,2,3].reduce(function (a, b) { return a + b; }, 10)") === 16.0)
    assert(evalExpr("[1,2,3].reduce(function (a, b) { return a + b; })") === 6.0)
    assert(evalExpr("[3,1,2].sort(function (a, b) { return a - b; }).join('')") === "123")
    assert(evalExpr("[10,9,1].sort().join(',')") === "1,10,9") // default: string order
  }

  test("globals: Math, JSON, Object.keys, conversions") {
    assert(evalExpr("Math.max(1, 5, 3) + Math.min(2, 0)") === 5.0)
    assert(evalExpr("Math.floor(2.7) + Math.ceil(2.1) + Math.round(2.5)") === 8.0)
    assert(evalExpr("Math.pow(2, 10)") === 1024.0)
    assert(evalExpr("Math.abs(-3) + Math.sqrt(16)") === 7.0)
    assert(evalExpr("Object.keys({ a: 1, b: 2 }).join('')") === "ab")
    assert(evalExpr("String(42)") === "42")
    assert(evalExpr("Number('3') + 1") === 4.0)
    assert(evalExpr("parseInt('42px')") === 42.0)
    assert(evalExpr("parseInt('ff', 16)") === 255.0)
    assert(evalExpr("parseInt('0x10')") === 16.0)
    assert(evalExpr("parseInt('-0X1A')") === -26.0)
    assert(evalExpr("parseInt('101', 2)") === 5.0)
    assert(evalExpr("parseInt('z', 36)") === 35.0)
    assert(evalExpr("isNaN(parseInt('10', 1))") === true)
    assert(evalExpr("isNaN(parseInt('g', 16))") === true)
    assert(evalExpr("isNaN(parseInt('３'))") === true) // fullwidth digit: ASCII only, per ECMA
    // above 2^53 the exact-integer-then-round path must agree with the
    // double literal (per-step double rounding would drift an ulp)
    assert(evalExpr("parseInt('18446744073709551616')") === math.pow(2, 64))
    assert(evalExpr("parseInt('ffffffffffffffff', 16)") === math.pow(2, 64))
    assert(evalExpr("parseFloat('2.5rem')") === 2.5)
    assert(evalExpr("isNaN(Number('x'))") === true)
    assert(evalExpr("typeof 1 + '|' + typeof 'x' + '|' + typeof true + '|' + typeof undefined + '|' + typeof null + '|' + typeof [] + '|' + typeof main")
      === "number|string|boolean|undefined|object|object|function")
  }

  test("JSON round-trip: parse and stringify") {
    assert(evalExpr("""JSON.parse('{"a": [1, "x", null, true]}').a[1]""") === "x")
    assert(evalExpr("""JSON.stringify({ b: 2, a: [1.5, 'q"t'] })""")
      === """{"b":2,"a":[1.5,"q\"t"]}""")  // insertion order, integral ints
    assert(evalExpr("""JSON.stringify(JSON.parse('{"n": 42}'))""") === """{"n":42}""")
  }

  test("bracket access: property names and non-integral indices never alias element 0") {
    assert(evalExpr("[10, 20]['length']") === 2.0)   // member, not a[0]
    assert(evalExpr("'abc'['length']") === 3.0)
    assert(evalExpr("[10, 20][1.5] === undefined") === true)
    assert(evalExpr("[10, 20][0/0] === undefined") === true)
    assert(evalExpr("[10, 20]['1']") === 20.0)        // canonical numeric string
    assert(evalExpr("[10, 20]['01'] === undefined") === true) // leading zero: property, not index
    assert(evalExpr("[10, 20][true] === undefined") === true) // booleans are property names
    assert(evalExpr("({ '1.5': 'x' })[1.5]") === "x") // object keys stringify
    intercept[Js.JsError](run(
      "function main() { var a = [1]; a[0/0] = 9; return a; }"))
  }

  test("compound assignment and ++ resolve the target reference exactly once") {
    assert(run(
      """function main() {
        |  var i = 0; var a = [1, 2, 3];
        |  a[i++] += 10;             // must read AND write a[0]
        |  return a.join(',') + '|' + i;
        |}""".stripMargin) === "11,2,3|1")
    assert(run(
      """function main() {
        |  var calls = 0; var o = { x: 5 };
        |  function f() { calls++; return o; }
        |  f().x++;
        |  return o.x + '|' + calls; // one call, not two
        |}""".stripMargin) === "6|1")
  }

  test("var is function-scoped: the loop variable survives the loop") {
    assert(run(
      """function main(xs) {
        |  for (var i = 0; i < 3; i++) { var last = i; }
        |  var ks = '';
        |  for (var k in { a: 1 }) { }
        |  return i + '|' + last + '|' + k;
        |}""".stripMargin) === "3|2|a")
  }

  test("break/continue cannot escape a function into the caller's loop") {
    intercept[Js.JsError](run(
      """function helper(x) { if (x) break; }
        |function main() {
        |  var n = 0;
        |  for (var i = 0; i < 5; i++) { helper(i == 2); n++; }
        |  return n;
        |}""".stripMargin))
    intercept[Js.JsError](Js.load(Js.parse("break;")))
  }

  test("callee evaluates before arguments (JS order)") {
    assert(run(
      """function main() {
        |  var s = '';
        |  var o = { m: function (x) { return 0; } };
        |  function callee() { s += 'f'; return o; }
        |  function arg() { s += 'g'; return 1; }
        |  callee().m(arg());
        |  return s;
        |}""".stripMargin) === "fg")
  }

  test("JSON parser rejects malformed numbers and bad escapes with JsError") {
    intercept[Js.JsError](evalExpr("JSON.parse('-')"))
    intercept[Js.JsError](evalExpr("JSON.parse('1e')"))
    intercept[Js.JsError](evalExpr("JSON.parse('-.5')"))
    intercept[Js.JsError](evalExpr("JSON.parse('\"\\\\uZZZZ\"')"))
    assert(evalExpr("JSON.parse('-0.5e2')") === -50.0)
  }

  test("stringify keeps the whole BIGINT integer range in plain notation") {
    assert(evalExpr("JSON.stringify(2000000000000000)") === "2000000000000000")
    assert(evalExpr("JSON.stringify(9007199254740992)") === "9007199254740992")
    assert(evalExpr("JSON.stringify(-3e15)") === "-3000000000000000")
  }

  test("determinism guards: no Date, no Math.random, no implicit globals") {
    intercept[Js.JsError](run("function main() { return Date.now(); }"))
    intercept[Js.JsError](run("function main() { return Math.random(); }"))
    intercept[Js.JsError](run("function main() { undeclared = 1; return 0; }"))
    intercept[Js.JsError](Js.parse("function main( { return 1; }"))
  }

  // ---- Spark plumbing -------------------------------------------------------

  private lazy val spark = TestSession.spark

  test("JsStage.stage maps JSON records; null/undefined returns → SQL NULL") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "", "de"),
      (3L, "one two", "fr"))
      .toDF("id", "text", "lang")
      .select(col("id"), to_json(struct(col("id"), col("text"), col("lang"))).as("rec"))
    val script =
      """function handle(doc) {
        |  if (doc.text === '') return null;
        |  var toks = doc.text.split(' ');
        |  return { id: doc.id, n: toks.length, shout: doc.lang.toUpperCase() };
        |}""".stripMargin
    val got = graft.pipeline.JsStage.stage(df, "rec", "out", script)
      .orderBy("id").select("out").collect().map(_.getString(0)).toSeq
    assert(got === Seq(
      """{"id":1,"n":3,"shout":"EN"}""",
      null,
      """{"id":3,"n":2,"shout":"FR"}"""))
  }

  test("JsStage.filterStage keeps truthy rows; syntax errors fail at plan time") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "keep me now"), (2L, "drop"), (3L, "also keep it"))
      .toDF("id", "text")
      .select(col("id"), to_json(struct(col("id"), col("text"))).as("rec"))
    val kept = graft.pipeline.JsStage.filterStage(df, "rec",
        "function handle(doc) { return doc.text.split(' ').length >= 3; }")
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(1L, 3L))
    intercept[Js.JsError](graft.pipeline.JsStage.stage(df, "rec", "out",
      "function handle(doc) { return doc. }"))
    intercept[IllegalArgumentException](graft.pipeline.JsStage.stage(df, "rec",
      "out", "function notHandle(doc) { return 1; }"))
  }

  test("regex literals: test/exec/source/flags, division stays division") {
    assert(evalExpr("/ab+c/.test('xabbbc')") === true)
    assert(evalExpr("/ab+c/.test('xac')") === false)
    assert(evalExpr("/AB/i.test('xaby')") === true)
    assert(evalExpr("/a./s.test('a\\n')") === true)
    assert(evalExpr("/^b/m.test('a\\nb')") === true)
    assert(evalExpr("/(\\d+)-(\\d+)/.exec('x 12-34 y').join('|')") === "12-34|12|34")
    assert(evalExpr("/zzz/.exec('abc') === null") === true)
    assert(evalExpr("/a(b)?c/.exec('ac')[1] === undefined") === true)
    assert(evalExpr("/x[/]y/.test('x/y')") === true) // '/' inside a class
    assert(evalExpr("/ab/.source + '|' + /ab/gi.flags") === "ab|gi")
    assert(evalExpr("/ab/g.global && !/ab/.global") === true)
    // the lookbehind heuristic: these are all DIVISION
    assert(evalExpr("10 / 2 / 5") === 1.0)
    assert(run("function main() { var x = 12; var y = 3; return x / y; }") === 4.0)
    assert(run("function main() { var a = [8]; return a[0] / 2; }") === 4.0)
    assert(run("function main() { return (6) / 3; }") === 2.0)
  }

  test("regex string methods: match, search, split, replace") {
    assert(evalExpr("'a1b22c333'.match(/\\d+/g).join(',')") === "1,22,333")
    assert(evalExpr("'a1b22'.match(/b(\\d+)/)[1]") === "22")
    assert(evalExpr("'abc'.match(/z/) === null && 'abc'.match(/z/g) === null") === true)
    assert(evalExpr("'hello world'.search(/o w/)") === 4.0)
    assert(evalExpr("'abc'.search(/z/)") === -1.0)
    assert(evalExpr("'a1b2c'.split(/\\d/).join('|')") === "a|b|c")
    assert(evalExpr("'a,b,'.split(/,/).length") === 3.0) // trailing empty kept
    assert(evalExpr("'a,b,c'.split(/,/, 2).join('|')") === "a|b")
    // ES5 splice semantics Java's Pattern.split gets wrong:
    assert(evalExpr("'a1b'.split(/(\\d)/).join('|')") === "a|1|b") // captures spliced
    assert(evalExpr("'ab'.split(/x*/).join('|')") === "a|b")       // no edge empties
    assert(evalExpr("''.split(/x*/).length") === 0.0)              // '' + empty match = []
    assert(evalExpr("''.split(/,/).length") === 1.0)
    assert(evalExpr("'aXb'.split(/^X/).length") === 1.0)           // ^ = true string start
    assert(evalExpr("'a1b'.split(/(x)?(\\d)/)[1] === undefined") === true) // non-part. group
    assert(evalExpr("'a-b-c'.replace(/-/, '_')") === "a_b-c")     // first only
    assert(evalExpr("'a-b-c'.replace(/-/g, '_')") === "a_b_c")    // all with g
    assert(evalExpr("'ab12cd'.replace(/(\\d)(\\d)/, '$2$1')") === "ab21cd")
    assert(evalExpr("'x1y'.replace(/\\d/, '[$&]')") === "x[1]y")
    assert(evalExpr("'cost: 5'.replace(/\\d/, '$$')") === "cost: $")
    // callback form: fn(match, p1...)
    assert(evalExpr(
      "'a1b2'.replace(/(\\d)/g, function(m, d) { return '<' + d + '>'; })")
      === "a<1>b<2>")
    // zero-width global replace terminates and interleaves
    assert(evalExpr("'ab'.replace(/x*/g, '-')") === "-a-b-")
  }

  test("regex errors: bad pattern at parse time, bad flags, JSON stringify") {
    intercept[Js.JsError](Js.parse("function main() { return /[/.test('a'); }"))
    intercept[Js.JsError](Js.parse("function main() { return /a(/.test('a'); }"))
    intercept[Js.JsError](Js.parse("function main() { return /a/y.test('a'); }"))
    assert(evalExpr("JSON.stringify({ r: /ab/g })") === """{"r":{}}""")
    assert(evalExpr("typeof /ab/") === "object")
    assert(evalExpr("String(/ab/gi)") === "/ab/gi")
  }

  test("throw / try-catch-finally: values, Error factory, engine TypeErrors") {
    assert(run(
      """function main() {
        |  try { throw 'boom'; } catch (e) { return 'caught:' + e; }
        |}""".stripMargin) === "caught:boom")
    assert(run(
      """function main() {
        |  try { throw Error('bad input'); }
        |  catch (e) { return e.name + '/' + e.message; }
        |}""".stripMargin) === "Error/bad input")
    // engine runtime error (member of null) is catchable as {name, message}
    assert(run(
      """function main() {
        |  var x = null;
        |  try { return x.field; } catch (e) { return 'te:' + e.name; }
        |}""".stripMargin) === "te:Error")
    // finally runs on both paths and return-through-try
    assert(run(
      """function main() {
        |  var log = [];
        |  try { log.push('t'); throw 1; }
        |  catch (e) { log.push('c'); }
        |  finally { log.push('f'); }
        |  try { log.push('t2'); } finally { log.push('f2'); }
        |  return log.join('');
        |}""".stripMargin) === "tcft2f2")
    assert(run(
      """function f() {
        |  try { return 'r'; } finally { sideEffect.push('fin'); }
        |}
        |var sideEffect = [];
        |function main() { var v = f(); return v + '|' + sideEffect.join(''); }
        |""".stripMargin) === "r|fin")
    // rethrow propagates; uncaught surfaces as a host JsError
    val e = intercept[Js.JsError](run(
      """function main() {
        |  try { throw Error('inner'); }
        |  catch (e) { throw e; }
        |}""".stripMargin))
    assert(e.getMessage.contains("inner"))
    // catch scope: the binding does not leak
    assert(run(
      """function main() {
        |  var e = 'outer';
        |  try { throw 'x'; } catch (e) {}
        |  return e;
        |}""".stripMargin) === "outer")
    // try without catch/finally is a parse error
    intercept[Js.JsError](Js.parse("function main() { try { } return 1; }"))
  }
  test("new Error / new RegExp / new Date: the supported constructor forms") {
    // `new Error(msg)` desugars to the Error factory call
    assert(evalExpr("new Error('boom').message") === "boom")
    assert(run("""function main() {
        |  try { throw new Error('bad doc'); }
        |  catch (e) { return e.name + ':' + e.message; }
        |}""".stripMargin) === "Error:bad doc")
    // `new RegExp(src, flags)` builds the same value a literal yields,
    // including from a DYNAMIC pattern string
    assert(evalExpr("new RegExp('a+b').test('aab')") === true)
    assert(evalExpr("new RegExp('^x$', 'i').test('X')") === true)
    assert(evalExpr("RegExp('\\\\d+').exec('ab12')[0]") === "12")
    assert(run("""function main() {
        |  var sep = '[;,]';
        |  return 'a;b,c'.split(new RegExp(sep)).join('|');
        |}""".stripMargin) === "a|b|c")
    // bad dynamic pattern / flags fail loudly at call time
    intercept[Js.JsError](evalExpr("new RegExp('a(')"))
    intercept[Js.JsError](evalExpr("new RegExp('a', 'y')"))
    // any other `new` target is a parse-time failure (no prototypes);
    // Date joined the supported set — zero-arg `new Date()` now fails at
    // EVAL time with the wall-clock message (Date test below)
    intercept[Js.JsError](Js.parse("function main() { return new Map(); }"))
    intercept[Js.JsError](Js.parse("function main() { return new Foo(1); }"))
  }
  test("Date: deterministic UTC subset; wall-clock/local forms fail loudly") {
    // construction from explicit data only
    assert(evalExpr("new Date(0).toISOString()") === "1970-01-01T00:00:00.000Z")
    assert(evalExpr("new Date('2024-03-05T06:07:08.009Z').getTime()") === 1709618828009.0)
    assert(evalExpr("new Date('2024-03-05').getUTCHours()") === 0.0)
    assert(evalExpr("Date.parse('1970-01-02T00:00:00Z')") === 86400000.0)
    // Date.UTC components (month 0-based), round-trip through accessors
    assert(evalExpr("Date.UTC(2024, 0, 5, 12, 30, 15, 250)") === 1704457815250.0)
    assert(evalExpr("new Date(Date.UTC(2024, 0, 5)).getUTCMonth()") === 0.0)
    assert(evalExpr("new Date(Date.UTC(2024, 0, 5)).getUTCDate()") === 5.0)
    // 2024-01-05 is a Friday; JS day-of-week is 0=Sunday
    assert(evalExpr("new Date(Date.UTC(2024, 0, 5)).getUTCDay()") === 5.0)
    assert(evalExpr("new Date(1250).getUTCMilliseconds()") === 250.0)
    // valueOf coercion: date arithmetic and compares work on epoch ms
    assert(evalExpr("new Date(5000) - new Date(2000)") === 3000.0)
    assert(evalExpr("new Date(1000) < new Date(2000)") === true)
    // JSON.stringify uses the ISO form (ECMA toJSON)
    assert(evalExpr("JSON.stringify({t: new Date(0)})") ===
      """{"t":"1970-01-01T00:00:00.000Z"}""")
    // every nondeterministic form is refused with a pointed message
    val noArg = intercept[Js.JsError](evalExpr("new Date()"))
    assert(noArg.getMessage.contains("wall-clock"))
    val now = intercept[Js.JsError](evalExpr("Date.now()"))
    assert(now.getMessage.contains("wall-clock"))
    val local = intercept[Js.JsError](evalExpr("new Date(0).getFullYear()"))
    assert(local.getMessage.contains("getUTC"))
    val multi = intercept[Js.JsError](evalExpr("new Date(2024, 0, 5)"))
    assert(multi.getMessage.contains("Date.UTC"))
    intercept[Js.JsError](evalExpr("new Date('03/05/2024')")) // non-ISO
    // ECMA rolls out-of-range fields over silently; this engine refuses
    intercept[Js.JsError](evalExpr("Date.UTC(2024, 12, 1)"))
    // toString renders the ISO form (the documented locale-free deviation)
    assert(evalExpr("new Date(0).toString()") === "1970-01-01T00:00:00.000Z")
    // ECMA expanded ±YYYYYY years outside 0000-9999, round-trippable
    assert(evalExpr("new Date(Date.UTC(10000, 0)).toISOString()") ===
      "+010000-01-01T00:00:00.000Z")
    // determinism across JVM default locales: an executor defaulting to a
    // non-ASCII numbering system (CLDR arabic digits) must render the SAME
    // bytes — iso formats with Locale.ROOT, never the default
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(
        java.util.Locale.forLanguageTag("ar-SA-u-nu-arab"))
      assert(evalExpr("new Date(0).toISOString()") ===
        "1970-01-01T00:00:00.000Z")
      assert(evalExpr("new Date(Date.UTC(10000, 0)).toISOString()") ===
        "+010000-01-01T00:00:00.000Z")
    } finally java.util.Locale.setDefault(saved)
    assert(evalExpr(
      "Date.parse(new Date(Date.UTC(10000, 0)).toISOString())") ===
      evalExpr("Date.UTC(10000, 0)"))
    // a year that overflows epoch-ms arithmetic is a catchable JsError,
    // not a raw JVM crash
    val ovf = intercept[Js.JsError](evalExpr("Date.UTC(300000000, 0)"))
    assert(ovf.getMessage.contains("8.64e15"))
    // ECMA MakeFullYear: two-digit years are 1900-relative
    assert(evalExpr("Date.UTC(99, 0, 1)") === 915148800000.0)
    // ECMA's + hint for dates is STRING: concatenation, not ms addition
    assert(evalExpr("new Date(0) + '!'") === "1970-01-01T00:00:00.000Z!")
    // TimeClip: beyond +-8.64e15 ms is a loud range error, never a
    // plausible-looking far-future instant
    val far = intercept[Js.JsError](evalExpr("new Date(9e15)"))
    assert(far.getMessage.contains("8.64e15"))
    intercept[Js.JsError](evalExpr("Date.UTC(4294969296, 0)"))
  }

  test("runaway loops fail loudly instead of hanging the executor") {
    // the guard exists for exactly the while(re.exec(s)) idiom our
    // stateless exec turns into an infinite loop
    Js.withStepBudget(10000) {
      val e = intercept[Js.JsError](run(
        "function main() { while (true) { } return 1; }"))
      assert(e.getMessage.contains("runaway"))
      val e2 = intercept[Js.JsError](run(
        "function main() { for (var i = 0; ; i++) { } return 1; }"))
      assert(e2.getMessage.contains("runaway"))
      // ...and the budget resets per invocation: a legitimate loop under
      // the cap still runs after a failed one
      assert(run(
        "function main() { var s = 0; for (var i = 0; i < 100; i++) s += i; return s; }")
        === 4950.0)
    }
  }
}
