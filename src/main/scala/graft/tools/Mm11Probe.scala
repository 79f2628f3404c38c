package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.multimodal.Multimodal

/** One-off breakdown of where q:mm11 spends its time at a given SF:
  * partition counts of each stage, then a SINGLE-THREADED driver-side
  * timing of the per-record chain (modulate → WAV-encode → javax.sound
  * decode → frame loop) over the same contents — separates Spark overhead
  * (scheduling, row codecs, partitioning) from raw per-record codec cost. */
object Mm11Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()

    val docs = Tables.t(spark, dir, "documents")
      .withColumn("content", substring(col("text"), 1, 400).cast("binary"))
    println(s"[probe] scan partitions: ${docs.rdd.getNumPartitions}")

    val contents = docs.select("content").collect().map(_.getAs[Array[Byte]](0))
    println(s"[probe] n docs: ${contents.length}")

    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    // warm-up (JIT) on a small prefix
    val warm = contents.take(500)
    val wMod = Multimodal.CharClassModulator.transformBatch(warm.toSeq)
    val wWav = Multimodal.PcmWavEncoder(8000).transformBatch(wMod)
    wWav.foreach(Multimodal.WavDecoder.samples8)

    var mod: Seq[Array[Byte]] = null
    var wav: Seq[Array[Byte]] = null
    var nFrames = 0L
    t("modulate (1 thread)") {
      mod = Multimodal.CharClassModulator.transformBatch(contents.toSeq)
    }
    t("wav-encode (1 thread)") {
      wav = Multimodal.PcmWavEncoder(8000).transformBatch(mod)
    }
    t("javax.sound decode (1 thread)") {
      wav.foreach { b => Multimodal.WavDecoder.samples8(b) }
    }
    t("decode+frames (1 thread)") {
      wav.foreach { b =>
        Multimodal.WavDecoder.samples8(b).foreach { ss =>
          ss.grouped(100).foreach { fr =>
            var e = 0L; var i = 0
            while (i < fr.length) { e += fr(i).toLong * fr(i); i += 1 }
            nFrames += 1
          }
        }
      }
    }
    println(s"[probe] frames: $nFrames")

    // the Spark-side stages, timed cumulatively
    t("spark: scan+modulate") {
      Multimodal.resizeContent(docs, "content", Multimodal.CharClassModulator)
        .count()
    }
    t("spark: +wav-encode") {
      Multimodal.resizeContent(
        Multimodal.resizeContent(docs, "content", Multimodal.CharClassModulator),
        "content", Multimodal.PcmWavEncoder(sampleRate = 8000)).count()
    }
    t("spark: full mm11 (no sort)") {
      val w = Multimodal.resizeContent(
        Multimodal.resizeContent(docs, "content", Multimodal.CharClassModulator),
        "content", Multimodal.PcmWavEncoder(sampleRate = 8000))
      Multimodal.extractAudioFrameFeatures(w, "doc_id", "content", frameLen = 100)
        .count()
    }
    spark.stop()
  }
}
