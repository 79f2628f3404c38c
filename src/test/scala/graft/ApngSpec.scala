package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Apng, Multimodal}

/** APNG mux/demux + inter-frame composition: the engine's chunk walk and
  * output-buffer state machine checked against an INDEPENDENT text-side
  * simulation (the same recurrence the mm15 SQL oracle runs), plus the
  * malformed-input battery every codec here gets. */
class ApngSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  // deterministic printable payload with spaces landing inside OVER frames
  private def payload(n: Int): Array[Byte] =
    Array.tabulate[Byte](n) { i =>
      val c = 33 + ((i * 37 + 11) % 94) // printable, no space
      (if (i % 7 == 3) ' '.toInt else c).toByte
    }

  /** Text-side reference: the APNG dispose/blend recurrence on raw bytes,
    * sharing NOTHING with Apng.composedLumaSums but the spec. */
  private def referenceSums(p: Array[Byte]): Vector[Long] = {
    val base = 64
    val patch = 16
    val nExtras = math.min((p.length - base) / patch, 8)
    var canvas = Vector.tabulate(64)(i => (p(i) & 0xff).toLong) // 0 = transparent
    val sums = Vector.newBuilder[Long]
    sums += canvas.sum
    var state = canvas
    for (k <- 1 to nExtras) {
      val y0 = 2 * ((k - 1) % 4)
      val over = k % 2 == 1
      val rendered = Vector.tabulate(64) { pos =>
        val row = pos / 8
        if (row < y0 || row >= y0 + 2) state(pos)
        else {
          val b = p(base + (k - 1) * patch + (row - y0) * 8 + pos % 8) & 0xff
          if (over && b == ' '.toInt) state(pos) else b.toLong
        }
      }
      sums += rendered.sum
      state = (k % 3) match {
        case 1 => // BACKGROUND: clear the patch region
          Vector.tabulate(64) { pos =>
            val row = pos / 8
            if (row >= y0 && row < y0 + 2) 0L else rendered(pos)
          }
        case 2 => state // PREVIOUS: region reverts = pre-frame canvas
        case _ => rendered
      }
    }
    sums.result()
  }

  test("encode/parse round-trip: container facts and fcTL schedule") {
    val apng = Apng.ApngEncoder().encode(payload(192))
    val p = Apng.parse(apng).get
    assert(p.width === 8 && p.height === 8)
    assert(p.declaredFrames === 9 && p.frames.size === 9)
    assert(p.frames.map(_.idx) === Vector.range(0, 9))
    p.frames.foreach { f =>
      assert(f.delayNum === 2 + (f.idx % 5) && f.delayDen === 100)
      if (f.idx == 0) {
        assert(f.width === 8 && f.height === 8 && f.y === 0)
        assert(f.dispose === 0 && f.blend === 0)
      } else {
        assert(f.width === 8 && f.height === 2)
        assert(f.y === 2 * ((f.idx - 1) % 4))
        assert(f.dispose === f.idx % 3 && f.blend === f.idx % 2)
      }
    }
  }

  test("composed canvas luma sums match the independent text-side recurrence") {
    val bytes = payload(192)
    val p = Apng.parse(Apng.ApngEncoder().encode(bytes)).get
    val got = Apng.composedLumaSums(p).map(_.longValue)
    assert(got === referenceSums(bytes))
    // sanity: the schedule genuinely exercises all three dispose ops and
    // both blends with at least one transparent pixel
    assert(p.frames.map(_.dispose).toSet === Set(0, 1, 2))
    assert(p.frames.map(_.blend).toSet === Set(0, 1))
    assert(bytes.slice(64, 80).contains(' '.toByte))
  }

  test("every frame decodes through the real zlib path, pixels exact") {
    val bytes = payload(96) // frame 0 + 2 extras
    val p = Apng.parse(Apng.ApngEncoder().encode(bytes)).get
    assert(p.frames.size === 3)
    val f1 = p.frames(1) // OVER frame: space pixels transparent
    val img = Apng.decodeFrame(f1)
    for (q <- 0 until 16) {
      val b = bytes(64 + q) & 0xff
      val px = img.getRGB(q % 8, q / 8)
      if (b == ' '.toInt) assert((px >>> 24) === 0, s"pixel $q should be transparent")
      else {
        assert((px >>> 24) === 0xff)
        assert((px & 0xff) === b, s"pixel $q luma")
      }
    }
  }

  test("whole-frames-only and short payloads") {
    assert(Apng.ApngEncoder().encode(payload(63)).isEmpty) // < one canvas
    val p = Apng.parse(Apng.ApngEncoder().encode(payload(64 + 15))).get
    assert(p.frames.size === 1) // partial patch dropped
    val p2 = Apng.parse(Apng.ApngEncoder().encode(payload(64 + 16))).get
    assert(p2.frames.size === 2)
  }

  test("malformed inputs: garbage, plain PNG, CRC damage, truncation") {
    assert(Apng.parse(null).isEmpty)
    assert(Apng.parse(Array[Byte](1, 2, 3)).isEmpty)
    // a plain PNG (no acTL) is "not animated", not a 1-frame animation
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Apng.parse(bos.toByteArray).isEmpty)
    // CRC damage in a frame's fdAT truncates the frame list there
    val good = Apng.ApngEncoder().encode(payload(192))
    val full = Apng.parse(good).get.frames.size
    // flip a byte near the end (inside a late fdAT's data)
    val dam = good.clone()
    dam(dam.length - 30) = (dam(dam.length - 30) ^ 0x5a).toByte
    val t = Apng.parse(dam)
    assert(t.isDefined && t.get.frames.size < full)
    // byte-truncation likewise
    val cut = Apng.parse(good.dropRight(40))
    assert(cut.isDefined && cut.get.frames.size < full)
  }

  test("extractFrameFeatures: 1 record to N rows, garbage contributes 0") {
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("content", BinaryType)))
    val bytes = payload(192)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, Apng.ApngEncoder().encode(bytes)),
        Row(2, Array[Byte](9, 9, 9)),
        Row(3, null)), 2),
      schema)
    val rows = Apng.extractFrameFeatures(df, "id", "content")
      .collect().map(r => (r.getInt(0), r.getInt(4)) -> r).toMap
    assert(rows.keySet === (0 until 9).map(1 -> _).toSet)
    val ref = referenceSums(bytes)
    rows.foreach { case ((_, k), r) =>
      assert(r.getInt(1) === 8 && r.getInt(2) === 8 && r.getLong(3) === 9L)
      assert(r.getInt(6) === 2 + (k % 5)) // delay_cs
      assert(r.getLong(9) === ref(k), s"frame $k composed sum")
    }
  }
}
