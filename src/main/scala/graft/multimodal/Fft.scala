package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Short-time spectral analysis over the REAL WAV round-trip: a hand-rolled
  * iterative radix-2 FFT turned into a framed spectrogram — the full-spectrum
  * sibling of [[Tone]]'s single-bin Goertzel, and the standard front door of
  * any audio-understanding pipeline (ASR features, audio fingerprinting,
  * music/speech discrimination). The reference treats audio as opaque bytes
  * end-to-end (`aleph2_analytic_services_hadoop/.../BeStreamParser.java:40`);
  * here the decode and the DSP are real, batched, and narrow.
  *
  * The test signal is a frequency-hopping square wave: content byte `j`
  * selects frame `j`'s tone from [[Spectrogram.Freqs]], each frame is
  * [[Spectrogram.FrameLen]] samples with integer-exact floor-phase synthesis
  * (the [[Tone.ToneGen]] formula). Every candidate completes an integer
  * number of cycles per frame (bin = f·N/rate ∈ {16,24,32,40} exactly), so
  * the fundamental lands on a single bin with no leakage; measured spectra
  * put the fundamental ≥2.4× the strongest harmonic in AMPLITUDE (≥5.8× in
  * power), so libm ulp noise cannot flip the per-frame argmax and the oracle
  * predicts `peak_bin` (and the exact high-sample count) from the integer
  * phase formula without replicating floating point.
  *
  * Scale shape: batched `mapPartitions` codec+DSP work, narrow — scales with
  * input bytes only, like every mm operator. Frame rows per record are
  * bounded by payload length / FrameLen (no unbounded explode).
  */
object Fft {

  /** In-place iterative radix-2 decimation-in-time FFT (forward, e^{-iwt}).
    * `re.length` must be a power of two; `im` the same length. */
  def transform(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && n > 0 && (n & (n - 1)) == 0,
      s"radix-2 FFT needs positive power-of-two length; got ${re.length}/${im.length}")
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterfly passes
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0
        var cwi = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val a = base + k
          val b = a + half
          val vr = re(b) * cwr - im(b) * cwi
          val vi = re(b) * cwi + im(b) * cwr
          re(b) = re(a) - vr; im(b) = im(a) - vi
          re(a) += vr; im(a) += vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Magnitude spectrum |X[0..n/2]| of a real signal (rfft layout). */
  def magnitudes(x: Array[Double]): Array[Double] = {
    val re = x.clone()
    val im = new Array[Double](x.length)
    transform(re, im)
    Array.tabulate(x.length / 2 + 1)(k => math.hypot(re(k), im(k)))
  }
}

object Spectrogram {

  /** Candidate hop tones (Hz). At [[Rate]] 8000 / [[FrameLen]] 256 each
    * lands exactly on bin f·256/8000 ∈ {16, 24, 32, 40} — no leakage. */
  val Freqs: Seq[Int] = Seq(500, 750, 1000, 1250)
  val Rate = 8000
  val FrameLen = 256
  val Amp = 50

  /** Bin index of each candidate's fundamental (exact by construction). */
  val Bins: Seq[Int] = Freqs.map(f => f * FrameLen / Rate)

  /** Each content byte = ASCII digit tone index for one [[FrameLen]]-sample
    * frame; frames concatenate into one PCM payload ([[Tone.ToneGen]]'s
    * integer phase formula per frame). Any non-digit byte → empty payload
    * (the unparseable-content contract: decodes to 0 rows downstream). */
  final case class HopToneGen(rate: Int = Rate, frameLen: Int = FrameLen,
      amp: Int = Amp) extends Multimodal.MediaTransform {
    def transformBatch(batch: Seq[Array[Byte]]): Seq[Array[Byte]] =
      batch.map { bytes =>
        if (bytes == null || bytes.isEmpty ||
            bytes.exists(b => b < '0' || b >= ('0' + Freqs.size))) {
          Array.emptyByteArray
        } else {
          val out = new Array[Byte](bytes.length * frameLen)
          var j = 0
          while (j < bytes.length) {
            val f = Freqs(bytes(j) - '0')
            var i = 0
            while (i < frameLen) {
              val high = (i.toLong * 2 * f / rate) % 2 == 0
              out(j * frameLen + i) = (if (high) 128 + amp else 128 - amp).toByte
              i += 1
            }
            j += 1
          }
          out
        }
      }
  }

  val FrameFeatureType: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("n_high", LongType),
    StructField("peak_bin", IntegerType)))

  /** Decode each WAV blob, split into [[FrameLen]]-sample frames (trailing
    * partial frame dropped), FFT each frame, and report the dominant
    * non-DC bin — one output row per (record, frame). Undecodable blobs
    * contribute 0 rows. */
  def extractSpectrogram(df: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    require(df.schema(contentCol).dataType == BinaryType,
      s"$contentCol must be BINARY; got " +
        df.schema(contentCol).dataType.simpleString)
    val src = df.select(col(idCol), col(contentCol))
    val idField = src.schema.head
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(StructType(idField +: FrameFeatureType.fields.toSeq))
    src.mapPartitions { it =>
      it.flatMap { r =>
        Multimodal.WavDecoder.samples8(r.getAs[Array[Byte]](1)) match {
          case Some(xs) if xs.length >= FrameLen =>
            val nFrames = xs.length / FrameLen
            Iterator.tabulate(nFrames) { j =>
              val frame = Array.tabulate(FrameLen)(i =>
                xs(j * FrameLen + i).toDouble)
              val mag = Fft.magnitudes(frame)
              var peak = 1
              var k = 2
              while (k < mag.length) {
                if (mag(k) > mag(peak)) peak = k
                k += 1
              }
              Row(r.get(0), j, FrameLen,
                frame.count(_ > 0).toLong, peak)
            }
          case _ => Iterator.empty
        }
      }
    }(enc)
  }
}
