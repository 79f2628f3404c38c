package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SegmentDedup
import graft.functions.{GraftFunctions, UnicodeNorm}

/** Edge semantics the corpus-level oracle can't reach: all-boilerplate
  * documents, trailing partial segments, reassembly order — plus the
  * UnicodeNorm expression's behavior beyond the ASCII+injection corpus
  * (precomposed input, non-BMP passthrough, NFKC compatibility folds). All
  * unicode is written as explicit \u escapes so the source encoding can
  * never silently change which normalization form the fixtures are in. */
class SegmentDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("segments: consecutive non-overlapping windows incl. trailing partial") {
    val out = Seq(("a b c d e f g h")).toDF("t")
      .select(SegmentDedup.segments(split(col("t"), " "), 3).as("s"))
      .as[Seq[String]].head()
    assert(out == Seq("a b c", "d e f", "g h"))
  }

  test("clean: drops corpus-frequent segments, keeps order, empties all-dup docs") {
    // "x y z" appears in 3 docs -> dropped at maxFreq=3; doc 3 is ONLY
    // boilerplate and must survive as an empty row (C4 cleaned-shard shape)
    val docs = Seq(
      (1L, "x y z a b c"),
      (2L, "p q r x y z d e"),
      (3L, "x y z"),
      (4L, "u v w")).toDF("doc_id", "text")
    val out = SegmentDedup.clean(docs, "doc_id", "text", n = 3, maxFreq = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a b c"), (2L, "p q r d e"), (3L, ""), (4L, "u v w")))
  }

  test("clean: nothing frequent -> lossless reassembly") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h")).toDF("doc_id", "text")
    val out = SegmentDedup.clean(docs, "doc_id", "text", n = 2, maxFreq = 2)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a b c d e"), (2L, "f g h")))
  }

  test("clean law: with an infinite frequency ceiling, reassembly is lossless (seeded random corpora)") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val docs = (1L to 20L).map { id =>
        val words = (0 until (1 + rnd.nextInt(15)))
          .map(_ => ('a' + rnd.nextInt(4)).toChar.toString * (1 + rnd.nextInt(3)))
        (id, words.mkString(" "))
      }
      val n = 1 + rnd.nextInt(4)
      val out = SegmentDedup.clean(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = n, maxFreq = Long.MaxValue)
        .as[(Long, String)].collect().toMap
      docs.foreach { case (id, text) =>
        assert(out(id) == text, s"n=$n lossless reassembly broke for '$text'")
      }
    }
  }

  test("UnicodeNorm: NFC composes, strip removes marks, non-BMP passes through") {
    val dEcl = "e\u0301clair" // decomposed e + combining acute
    val pEcl = "\u00e9clair" // precomposed e-acute
    val emoji = "na\u0308ive \ud83d\ude00" // decomposed a-umlaut + non-BMP emoji
    val ring = "A\u030a" // decomposed A-ring
    val rows = Seq(dEcl, pEcl, emoji, ring).toDF("s").select(
        GraftFunctions.unicode_norm(col("s")).as("nfc"),
        GraftFunctions.strip_accents(col("s")).as("st"))
      .as[(String, String)].collect().toSeq
    assert(rows(0) == (("\u00e9clair", "eclair")))
    assert(rows(1) == (("\u00e9clair", "eclair")))
    assert(rows(2) == (("n\u00e4ive \ud83d\ude00", "naive \ud83d\ude00")))
    assert(rows(3) == (("\u00c5", "A")))
  }

  test("UnicodeNorm: NFKC folds compatibility forms (ligature, fullwidth)") {
    assert(UnicodeNorm.run("\ufb01le \uff21", "NFKC", stripMarks = false)
      == "file A")
  }

  test("int8 quantization keeps cosine within bound on adversarial vectors") {
    // one dominant component (worst relative error on the small ones) and
    // a uniform vector (every component at full scale)
    val vs = Seq(
      (1L, Array(100.0f, 0.4f, -0.3f, 0.7f)),
      (2L, Array(1.0f, 1.0f, -1.0f, 1.0f)))
    val v = vs.toDF("vec_id", "embedding")
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / 127.0)
      .withColumn("dq", transform(col("v"),
        x => greatest(lit(-127.0), least(lit(127.0), round(x / col("scale")))) * col("scale")))
      .select(col("vec_id"),
        (graft.functions.VectorFunctions.dot(col("v"), col("dq")) /
          (graft.functions.VectorFunctions.norm(col("v")) *
            graft.functions.VectorFunctions.norm(col("dq")))).as("cos"))
      .as[(Long, Double)].collect().toMap
    assert(v(1L) >= 0.9995 && v(2L) >= 0.9995)
    assert(v.values.forall(_ <= 1.0 + 1e-12))
  }
}
