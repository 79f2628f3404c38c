package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Zips
import graft.sources.Zips.Entry

/** ZIP mux/demux hardening beyond the corpus round-trip (q:s11):
  * truncation tolerance, garbage/NULL handling, directory-entry skipping,
  * writer-side misuse, and binary (non-UTF-8-text) payload fidelity. */
class ZipSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val entries = Seq(
    Entry("a/1.txt", "hello world".getBytes(UTF_8)),
    Entry("b/2.txt", "second entry with\nnewline".getBytes(UTF_8)),
    Entry("c/empty.txt", Array.emptyByteArray))

  private def names(es: Seq[Entry]) = es.map(_.name)

  test("round-trip preserves names, order, and exact bytes") {
    val got = Zips.parseZip(Zips.writeZip(entries)).get
    assert(names(got) == names(entries))
    got.zip(entries).foreach { case (g, e) =>
      assert(java.util.Arrays.equals(g.body, e.body), e.name)
    }
  }

  test("arbitrary binary payloads survive (DEFLATE is lossless)") {
    val blob = Array.tabulate[Byte](4096)(i => ((i * 131) ^ (i >> 3)).toByte)
    val got = Zips.parseZip(Zips.writeZip(Seq(Entry("bin", blob)))).get
    assert(got.sizeIs == 1 && java.util.Arrays.equals(got.head.body, blob))
  }

  test("truncated archive keeps complete leading entries, drops the tail") {
    val full = Zips.writeZip(entries)
    // cut at every length: whatever parses must be an exact prefix of the
    // original entries, byte-for-byte — and some cut must yield a strictly
    // partial (non-empty, non-total) parse
    var sawPartial = false
    for (len <- 1 until full.length) {
      val got = Zips.parseZip(java.util.Arrays.copyOf(full, len))
        .getOrElse(Seq.empty)
      assert(got.sizeIs <= entries.size, s"len=$len")
      got.zip(entries).foreach { case (g, e) =>
        assert(g.name == e.name && java.util.Arrays.equals(g.body, e.body),
          s"len=$len entry ${e.name}")
      }
      if (got.nonEmpty && got.size < entries.size) sawPartial = true
    }
    assert(sawPartial, "no cut produced a partial parse — test is vacuous")
  }

  test("garbage and NULL are unparseable (None), never throw") {
    assert(Zips.parseZip(null).isEmpty)
    assert(Zips.parseZip("PK but not really a zip".getBytes(UTF_8)).isEmpty)
    assert(Zips.parseZip(Array[Byte](0x50, 0x4b)).isEmpty)
  }

  test("directory entries are skipped") {
    // a directory entry is a name ending in '/' with no data
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("dir/"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("dir/file.txt"))
    zos.write("x".getBytes(UTF_8)); zos.closeEntry(); zos.close()
    assert(names(Zips.parseZip(bos.toByteArray).get) == Seq("dir/file.txt"))
  }

  test("writer rejects null and duplicate entry names at write time") {
    assert(intercept[IllegalArgumentException](
      Zips.writeZip(Seq(Entry(null, Array.emptyByteArray))))
      .getMessage.contains("non-null"))
    assert(intercept[IllegalArgumentException](
      Zips.writeZip(Seq(Entry("same", Array.emptyByteArray),
        Entry("same", "x".getBytes(UTF_8)))))
      .getMessage.contains("duplicate"))
  }

  test("readZips through Spark: typed rows, bad blobs contribute 0 rows") {
    val s2 = spark
    import s2.implicits._
    val good = Zips.writeZip(entries)
    val df = Seq((1L, good), (2L, Array[Byte](9, 9, 9)),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val out = Zips.readZips(df, "id", "content").orderBy("entry_name").collect()
    assert(out.map(_.getString(1)).toSeq == names(entries).sorted)
    assert(out.forall(_.getLong(0) == 1L))
    val byName = out.map(r => r.getString(1) -> r).toMap
    assert(byName("a/1.txt").getLong(2) == 11L)
    assert(byName("a/1.txt").getString(3) == "hello world")
  }
}
