package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.JavaStage

/** The runtime-compiled user stage: javac diagnostics at plan time, inner
  * classes shipped with the bundle, per-JVM loader caching, null
  * passthrough, and end-to-end mapping through Spark tasks. */
class JavaStageSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("compiles and maps through Spark tasks, null passes through") {
    val s2 = spark
    import s2.implicits._
    val src =
      """public class Up implements java.util.function.Function<String, String> {
        |  public String apply(String s) { return s.toUpperCase(); }
        |}""".stripMargin
    val out = JavaStage.stage(
        Seq((1L, "ab c"), (2L, null.asInstanceOf[String])).toDF("id", "t"),
        "t", "u", "Up", src)
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "ab c", "AB C"), (2L, null, null)))
  }

  test("flatStage: user emit callback yields 0..N rows per input") {
    val s2 = spark
    import s2.implicits._
    val src =
      """public class EmitTokens
        |    implements java.util.function.Function<String, java.util.List<String>> {
        |  public java.util.List<String> apply(String s) {
        |    java.util.List<String> out = new java.util.ArrayList<>();
        |    for (String t : s.split(" ", -1)) if (t.length() > 1) out.add(t);
        |    return out; // 0..N emits, like the reference's JS emit callback
        |  }
        |}""".stripMargin
    val out = JavaStage.flatStage(
        Seq((1L, "ab c de"), (2L, "x"), (3L, null.asInstanceOf[String]))
          .toDF("id", "t"),
        "t", "tok", "EmitTokens", src)
      .select("id", "tok").orderBy("id", "tok")
      .as[(Long, String)].collect().toSeq
    // id 1 emits 2 rows, id 2 emits none (all short), null emits none
    assert(out == Seq((1L, "ab"), (1L, "de")))

    // a user function returning NULL (emit-callback "skip") = 0 emits
    val nullSrc =
      """public class NullSkip
        |    implements java.util.function.Function<String, java.util.List<String>> {
        |  public java.util.List<String> apply(String s) { return null; }
        |}""".stripMargin
    assert(JavaStage.flatStage(Seq((1L, "x")).toDF("id", "t"),
      "t", "o", "NullSkip", nullSrc).count() === 0)
  }

  test("reduceStage: user BinaryOperator folds per key with null values dropped") {
    val s2 = spark
    import s2.implicits._
    val src =
      """public class Cat implements java.util.function.BinaryOperator<String> {
        |  public String apply(String a, String b) {
        |    // total-order max: longer wins, tie -> lexicographically greater
        |    if (a.length() != b.length()) return a.length() > b.length() ? a : b;
        |    return a.compareTo(b) >= 0 ? a : b;
        |  }
        |}""".stripMargin
    val df = Seq(("k1", "bb"), ("k1", "aaa"), ("k1", "ccc"), ("k2", "z"),
      ("k3", null.asInstanceOf[String]))
      .toDF("k", "v").repartition(4)
    val out = JavaStage.reduceStage(df, "k", "v", "Cat", src)
      .orderBy("k").as[(String, String)].collect().toSeq
    // k3 had only nulls -> disappears; k1's fold = the total-order max
    assert(out == Seq(("k1", "ccc"), ("k2", "z")))
  }

  test("reduceStage rejects non-string columns at plan time") {
    val s2 = spark
    import s2.implicits._
    val src =
      """public class Id implements java.util.function.BinaryOperator<String> {
        |  public String apply(String a, String b) { return a; }
        |}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      JavaStage.reduceStage(Seq((1, "x")).toDF("k", "v"), "k", "v", "Id", src)
    }
    assert(e.getMessage.contains("must be STRING"))
  }

  test("graft expressions are callable from spark.sql after register()") {
    graft.functions.GraftFunctions.register(spark)
    // escape-written literals: decomposed e+U+0301 in, composed U+00E9 out
    val r = spark.sql(
      "SELECT unicode_norm('e\u0301clair') AS n, strip_accents('e\u0301clair') AS st, " +
        "unicode_norm('\ufb01le', 'NFKC') AS k, poly_hash('ab') AS h")
      .collect().head
    assert(r.getString(0) == "\u00e9clair")
    assert(r.getString(1) == "eclair")
    assert(r.getString(2) == "file")
    assert(r.getLong(3) == (('a'.toLong * 31 + 'b') % 1000000007L))
    // arity and literal-form misuse fail with clear messages, not silently
    assert(intercept[Exception](spark.sql("SELECT poly_hash('a','b')").collect())
      .getMessage.contains("exactly 1 argument"))
    // non-foldable form arg (rand() is non-deterministic) -> clear error
    assert(intercept[Exception](
        spark.sql("SELECT unicode_norm('a', CAST(rand() AS STRING))").collect())
      .getMessage.contains("string literal"))
    // foldable-but-invalid form name surfaces the enum error at plan time
    assert(intercept[Exception](
        spark.sql("SELECT unicode_norm('a', 'nfc')").collect())
      .getMessage.contains("No enum constant"))
  }

  test("plan-time schema checks: non-string input and outCol collision") {
    val s2 = spark
    import s2.implicits._
    val df = Seq((1L, "x")).toDF("id", "t")
    val src =
      """public class Id implements java.util.function.Function<String, String> {
        |  public String apply(String s) { return s; }
        |}""".stripMargin
    val e1 = intercept[IllegalArgumentException] {
      JavaStage.stage(df, "id", "out", "Id", src)
    }
    assert(e1.getMessage.contains("must be STRING"))
    val e2 = intercept[IllegalArgumentException] {
      JavaStage.stage(df, "t", "t", "Id", src)
    }
    assert(e2.getMessage.contains("already exists"))
  }

  test("compile errors fail fast with javac line diagnostics") {
    val e = intercept[RuntimeException] {
      JavaStage.compile("Broken", "public class Broken { int x = }")
    }
    assert(e.getMessage.contains("failed to compile"))
    assert(e.getMessage.contains("line 1"))
  }

  test("inner and anonymous classes ride along in the bundle") {
    val src =
      """public class Outer implements java.util.function.Function<String, String> {
        |  private static class Helper {
        |    static String twice(String s) { return s + s; }
        |  }
        |  public String apply(String s) {
        |    Runnable r = new Runnable() { public void run() {} };
        |    r.run();
        |    return Helper.twice(s);
        |  }
        |}""".stripMargin
    val classes = JavaStage.compile("Outer", src)
    assert(classes.keySet.exists(_.contains("Outer$Helper")))
    assert(JavaStage.instantiate("Outer", classes).apply("xy") == "xyxy")
  }

  test("same bundle instantiates from one cached loader; different bundles coexist") {
    val srcA =
      """public class A implements java.util.function.Function<String, String> {
        |  public String apply(String s) { return "A" + s; }
        |}""".stripMargin
    val srcB =
      """public class A implements java.util.function.Function<String, String> {
        |  public String apply(String s) { return "B" + s; }
        |}""".stripMargin
    val ca = JavaStage.compile("A", srcA)
    val cb = JavaStage.compile("A", srcB)
    val fa1 = JavaStage.instantiate("A", ca)
    val fa2 = JavaStage.instantiate("A", ca)
    val fb = JavaStage.instantiate("A", cb)
    // same bundle -> same defined class (one loader), so same Class object
    assert(fa1.getClass eq fa2.getClass)
    // two SOURCES for the same class name coexist via distinct loaders
    assert(fa1.apply("x") == "Ax" && fb.apply("x") == "Bx")
    assert(fa1.getClass ne fb.getClass)
  }

  test("filterStage: predicate drops rows; NULL input is dropped unseen") {
    val spark = TestSession.spark
    import spark.implicits._
    val src =
      """public class LongOnly implements java.util.function.Predicate<String> {
        |  public boolean test(String s) {
        |    if (s == null) throw new IllegalStateException("saw null");
        |    return s.length() >= 3;
        |  }
        |}""".stripMargin
    val df = Seq((1L, "ab"), (2L, "abcd"), (3L, null.asInstanceOf[String]),
      (4L, "xyz")).toDF("id", "v")
    val out = JavaStage.filterStage(df, "v", "LongOnly", src)
      .select("id").as[Long].collect().sorted
    // null row dropped WITHOUT reaching the predicate (it would throw)
    assert(out.toSeq == Seq(2L, 4L))
  }
}
