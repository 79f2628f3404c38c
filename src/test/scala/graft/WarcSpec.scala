package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc
import graft.sources.Warc.Record

/** WARC mux/demux hardening beyond the corpus round-trip: truncation
  * tolerance (real crawl files cut off mid-record), gzip auto-detection,
  * garbage/NULL handling, and multi-record framing with CRLF-bearing
  * bodies. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val recs = Seq(
    Record("http://a.example.com/1", 200, "hello world"),
    Record("http://b.example.com/2", 304, "body with\r\nCRLF inside"),
    Record("http://c.example.com/3", 200, ""))

  test("round-trip, both raw and gzipped (auto-detected)") {
    for (gz <- Seq(false, true)) {
      val bytes = Warc.writeArchive(recs, gzip = gz)
      assert(Warc.parseArchive(bytes).contains(recs), s"gzip=$gz")
    }
  }

  test("truncated archive keeps complete leading records, drops the partial tail") {
    val full = Warc.writeArchive(recs, gzip = false)
    // cut inside record 2's body: record 1 must survive intact
    val cut = java.util.Arrays.copyOf(full, full.length - 30)
    val got = Warc.parseArchive(cut).get
    assert(got.nonEmpty && got.head == recs.head && got.size < recs.size)
  }

  test("crafted Content-Length near Int.MaxValue hits the truncation path, not overflow") {
    val evil = ("WARC/1.0\r\nWARC-Target-URI: http://x\r\n" +
      "Content-Length: 2147483647\r\n\r\nshort").getBytes
    assert(Warc.parseArchive(evil).contains(Seq.empty)) // truncated, no throw
  }

  test("writer rejects CR/LF urls and null bodies at write time") {
    assert(intercept[IllegalArgumentException](
      Warc.writeArchive(Seq(Warc.Record("http://x\r\nInjected: 1", 200, "b")),
        gzip = false)).getMessage.contains("CR/LF"))
    assert(intercept[IllegalArgumentException](
      Warc.writeArchive(Seq(Warc.Record("http://x", 200, null)), gzip = false))
      .getMessage.contains("non-null"))
  }

  test("garbage, NULL, and corrupt gzip are unparseable (None), never throw") {
    assert(Warc.parseArchive(null).isEmpty)
    assert(Warc.parseArchive("not a warc at all".getBytes).isEmpty)
    val gz = Warc.writeArchive(recs, gzip = true)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x5a).toByte // corrupt the stream
    // corrupt DEFLATE either fails (None) or truncates; must not throw
    Warc.parseArchive(gz)
  }

  test("readArchives through Spark: typed rows, bad blobs contribute 0 rows") {
    val s2 = spark
    import s2.implicits._
    val good = Warc.writeArchive(recs, gzip = true)
    val df = Seq((1L, good), (2L, Array[Byte](1, 2, 3)),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val out = Warc.readArchives(df, "id", "content")
      .orderBy("url").collect()
    assert(out.length == recs.size)
    assert(out.map(_.getString(1)).toSeq == recs.map(_.url).sorted)
    assert(out.forall(_.getLong(0) == 1L))
  }
}
