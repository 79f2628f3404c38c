package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Fft, Multimodal, Spectrogram}

/** Pins the radix-2 FFT kernel against a naive O(n²) DFT and the framed
  * spectrogram path end-to-end through the real WAV round-trip. */
class FftSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  test("fft matches naive DFT on deterministic pseudo-random input") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(8, 64, 256)) {
      val x = Array.fill(n)(rnd.nextDouble() * 200 - 100)
      val re = x.clone()
      val im = new Array[Double](n)
      Fft.transform(re, im)
      val (er, ei) = naiveDft(x)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) < 1e-6, s"re[$k] n=$n")
        assert(math.abs(im(k) - ei(k)) < 1e-6, s"im[$k] n=$n")
      }
    }
  }

  test("impulse has flat spectrum; pure cosine concentrates on its bin") {
    val imp = new Array[Double](64)
    imp(0) = 1.0
    assert(Fft.magnitudes(imp).forall(m => math.abs(m - 1.0) < 1e-9))
    val cos5 = Array.tabulate(64)(i => math.cos(2 * math.Pi * 5 * i / 64))
    val mag = Fft.magnitudes(cos5)
    assert(math.abs(mag(5) - 32.0) < 1e-9)
    for (k <- mag.indices if k != 5) assert(mag(k) < 1e-9, s"leak at $k")
  }

  test("fft rejects non-power-of-two lengths") {
    intercept[IllegalArgumentException] {
      Fft.transform(new Array[Double](12), new Array[Double](12))
    }
  }

  test("spectrogram detects the hop sequence through the WAV round-trip") {
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("content", BinaryType)))
    val rows = Seq(
      Row(1, "0123".getBytes("US-ASCII")),   // 4 frames, one per tone
      Row(2, "33".getBytes("US-ASCII")),     // repeated top tone
      Row(3, "0x".getBytes("US-ASCII")),     // non-digit → 0 rows
      Row(4, null))                          // null → 0 rows
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val wav = Multimodal.resizeContent(
      Multimodal.resizeContent(df, "content", Spectrogram.HopToneGen()),
      "content", Multimodal.PcmWavEncoder(sampleRate = Spectrogram.Rate))
    val out = Spectrogram.extractSpectrogram(wav, "id", "content")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(3), r.getInt(4)))
      .toSeq.sorted
    val expected = Seq(
      (1, 0, 128L, 16), (1, 1, 128L, 24), (1, 2, 128L, 32), (1, 3, 128L, 40),
      (2, 0, 128L, 40), (2, 1, 128L, 40))
    assert(out == expected)
  }
}
