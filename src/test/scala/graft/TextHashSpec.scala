package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashFunctions._

/** Parity of the native text-hash expressions against the declarative
  * compositions they replaced — same shingles (order included), same hash
  * values, same null handling. Inputs include unicode, repeated tokens
  * (distinct path), short docs, empty strings and null tokens. */
class TextHashSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the quick brown fox", // dup shingles
      "a b", // shorter than n
      "", // one empty token
      "émoji 🦊 ünïcode tokens mixed in here too yes",
      "x x x x x x x x x x", // all-same tokens
      (1 to 60).map(i => s"tok$i").mkString(" ")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .withColumn("toks", split(col("text"), " "))
  }

  test("word_shingles == array_distinct(transform(sequence, concat_ws(slice))), order included") {
    val n = 5
    val oldWay = docs.select(col("id"),
      when(size(col("toks")) >= n,
        array_distinct(transform(sequence(lit(0), size(col("toks")) - lit(n)),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))))
        .otherwise(array().cast("array<string>")).as("sh"))
    val newWay = docs.select(col("id"),
      when(size(col("toks")) >= n, word_shingles(col("toks"), n))
        .otherwise(array().cast("array<string>")).as("sh"))
    val o = oldWay.orderBy("id").collect().map(_.getSeq[String](1))
    val nw = newWay.orderBy("id").collect().map(_.getSeq[String](1))
    assert(o.toSeq == nw.toSeq)
  }

  test("word_shingles skips null tokens like concat_ws") {
    val s = spark; import s.implicits._
    val d = Seq((1L, Seq[String]("a", null, "b", "c"))).toDF("id", "toks")
    val o = d.select(array_distinct(transform(
        sequence(lit(0), size(col("toks")) - lit(3)),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(3))))).as("sh"))
      .head.getSeq[String](0)
    val nw = d.select(word_shingles(col("toks"), 3).as("sh"))
      .head.getSeq[String](0)
    assert(o == nw && o == Seq("a b", "b c")) // null skipped inside windows
  }

  test("md5_int == conv(substring(md5, 1, 8), 16, 10) on strings incl. unicode/empty") {
    val vals = docs.select(explode(array(col("text"), col("id").cast("string"))).as("v"))
    val o = vals.select(conv(substring(md5(col("v")), 1, 8), 16, 10)
      .cast("long").as("h")).collect().map(_.getLong(0))
    val nw = vals.select(md5_int(col("v")).as("h")).collect().map(_.getLong(0))
    assert(o.toSeq == nw.toSeq)
  }

  test("shingle_hashes == transform(sh, baseHash) for md5 and poly, null elements null") {
    val s = spark; import s.implicits._
    val d = Seq((1L, Seq[String]("abc", null, "", "🦊 x", "longer shingle here")))
      .toDF("id", "sh")
    for (useMd5 <- Seq(true, false)) {
      val base: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => if (useMd5) conv(substring(md5(c), 1, 8), 16, 10).cast("long")
             else graft.functions.GraftFunctions.poly_hash(c)
      val o = d.select(transform(col("sh"), base).as("h")).head.getSeq[Any](0)
      val nw = d.select(shingle_hashes(col("sh"), useMd5).as("h")).head.getSeq[Any](0)
      assert(o == nw, s"useMd5=$useMd5")
      assert(nw(1) == null)
    }
  }

  test("word_windows == transform(sequence, concat_ws(slice)) with duplicates kept") {
    val n = 3
    val d = docs.filter(size(col("toks")) >= n)
    val o = d.select(col("id"), transform(sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))).as("w"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val nw = d.select(col("id"), word_windows(col("toks"), n).as("w"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(o.toSeq == nw.toSeq)
  }

  test("token_segments == transform(sequence((size-1) div n), slices), incl. empty and partial") {
    val s = spark; import s.implicits._
    val d = Seq((1L, Seq("a", "b", "c", "d", "e")), (2L, Seq("a")),
        (3L, Seq.empty[String]), (4L, Seq("a", "b", "c")))
      .toDF("id", "toks")
    val n = 3
    val o = d.select(col("id"),
        transform(sequence(lit(0), ((size(col("toks")) - 1) / n).cast("int")),
          i => concat_ws(" ", slice(col("toks"), i * lit(n) + 1, lit(n)))).as("sg"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val nw = d.select(col("id"), token_segments(col("toks"), n).as("sg"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(o.toSeq == nw.toSeq)
    assert(nw(2) == Seq("")) // empty input -> one empty segment (sequence edge)
  }

  test("char_grams == array_distinct(transform(sequence, substring)) incl. unicode") {
    val s = spark; import s.implicits._
    val d = Seq("abcabcabd", "ünïcode🦊grams", "aaaa", "exact")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
    val q = 4
    val o = d.select(col("id"), array_distinct(expr(
        s"transform(sequence(0, length(s) - $q), i -> substring(s, i + 1, $q))")).as("g"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val nw = d.select(col("id"),
        graft.functions.TextHashFunctions.char_grams(col("s"), q).as("g"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(o.toSeq == nw.toSeq)
  }

  test("band_hashes == transform(sequence, md5(concat_ws(slice casts)))") {
    val s = spark; import s.implicits._
    val d = Seq((1L, Seq(5L, 123456789L, 0L, 99L, 7L, 1000000006L, 42L, 8L)),
        (2L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)))
      .toDF("id", "sig")
    val (bands, r) = (4, 2)
    val o = d.select(col("id"), transform(sequence(lit(0), lit(bands - 1)), b =>
        md5(concat_ws(",", transform(slice(col("sig"), b * r + 1, lit(r)),
          x => x.cast("string"))))).as("bh"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val nw = d.select(col("id"), band_hashes(col("sig"), bands, r).as("bh"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(o.toSeq == nw.toSeq)
  }
}
