package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Minimal YUV4MPEG2 (Y4M) video codec — the video analog of the WAV path:
  * a pure-JDK container with NO entropy coding (an ASCII stream header,
  * then `FRAME\n` + fixed-size raw planes per frame), so real demux /
  * frame-sample / feature-extract runs with zero native libraries. The
  * reference treats video as opaque bytes (S4 passthrough,
  * `BeStreamParser.java:40`); this gives the engine an actually-decodable
  * video format end-to-end while compressed codecs (H.264 &c.) keep riding
  * the byte-level stand-ins.
  *
  * Layout per the public Y4M spec (mjpegtools):
  * `YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip A1:1 C420]\n` then per frame
  * `FRAME[ params]\n` + Y plane (w·h bytes) + U + V (subsampled per the
  * colorspace tag). All parsing here is sequential over one blob inside
  * `mapPartitions` — narrow, batch-amortized, no shuffle.
  */
object Y4m {

  private val Magic = "YUV4MPEG2"
  private val FrameMagic = "FRAME"

  final case class Header(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      colorspace: String, dataStart: Int) {
    def ySize: Int = width * height
    /** bytes per frame for the 8-bit colorspaces the JDK can hold raw */
    def frameSize: Int = colorspace match {
      case "C420" | "C420jpeg" | "C420mpeg2" | "C420paldv" => ySize * 3 / 2
      case "C422" => ySize * 2
      case "C444" => ySize * 3
      case "Cmono" => ySize
      case other => sys.error(s"unsupported colorspace $other")
    }
  }

  /** Encode payload bytes as a C420 Y4M stream: consecutive w·h-byte
    * chunks become Y planes (trailing partial chunk dropped), chroma
    * planes are neutral 128. Same [[Multimodal.MediaTransform]] seam as
    * the WAV/resize encoders: bytes in, bytes out, batched, narrow. */
  final case class Y4mEncoder(width: Int, height: Int,
      fpsNum: Int = 25, fpsDen: Int = 1) extends Multimodal.MediaTransform {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      "C420 chroma subsampling needs positive even dimensions")
    require(fpsNum > 0 && fpsDen > 0, "frame rate must be positive")

    def transformBatch(batch: Seq[Array[Byte]]): Seq[Array[Byte]] =
      batch.map(encode)

    def encode(payload: Array[Byte]): Array[Byte] = {
      val y = width * height
      val uv = y / 4
      val nFrames = payload.length / y
      val header =
        s"$Magic W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420\n"
          .getBytes("US-ASCII")
      val out = new java.io.ByteArrayOutputStream(
        header.length + nFrames * (FrameMagic.length + 1 + y + 2 * uv))
      out.write(header, 0, header.length)
      val chroma = new Array[Byte](uv)
      java.util.Arrays.fill(chroma, 128.toByte)
      var k = 0
      while (k < nFrames) {
        out.write((FrameMagic + "\n").getBytes("US-ASCII"), 0, FrameMagic.length + 1)
        out.write(payload, k * y, y)
        out.write(chroma, 0, uv)
        out.write(chroma, 0, uv)
        k += 1
      }
      out.toByteArray
    }
  }

  /** Parse the stream header; None when the bytes aren't Y4M or declare a
    * geometry/rate/colorspace this decoder can't size. */
  def parseHeader(bytes: Array[Byte]): Option[Header] = {
    if (bytes == null) return None // NULL content = unparseable, 0 rows
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) return None
    val line = new String(bytes, 0, nl, "US-ASCII")
    val toks = line.split(' ')
    if (toks.isEmpty || toks(0) != Magic) return None
    var w = -1; var h = -1; var num = -1; var den = -1
    var cs = "C420" // spec default when the C tag is absent
    try {
      toks.iterator.drop(1).filter(_.nonEmpty).foreach { t =>
        t.charAt(0) match {
          case 'W' => w = t.substring(1).toInt
          case 'H' => h = t.substring(1).toInt
          case 'F' =>
            val p = t.substring(1).split(':')
            num = p(0).toInt; den = p(1).toInt
          case 'C' => cs = t
          case _ => () // Ip/A/X tags don't affect sizing
        }
      }
    } catch { case _: RuntimeException => return None }
    if (w <= 0 || h <= 0 || num <= 0 || den <= 0) None
    else {
      val hd = Header(w, h, num, den, cs, nl + 1)
      try { hd.frameSize; Some(hd) }
      catch { case _: RuntimeException => None }
    }
  }

  /** Walk the frame markers, yielding (frame index, Y plane). Chroma
    * planes are skipped, not copied. Stops at the first malformed or
    * truncated frame (a partial tail never yields a phantom frame). */
  def frames(bytes: Array[Byte], hd: Header): Iterator[(Int, Array[Byte])] =
    new Iterator[(Int, Array[Byte])] {
      private var pos = hd.dataStart
      private var idx = 0
      private var nextFrame: Array[Byte] = advance()
      private def advance(): Array[Byte] = {
        val markerEnd = pos + FrameMagic.length
        if (markerEnd > bytes.length ||
          new String(bytes, pos, FrameMagic.length, "US-ASCII") != FrameMagic)
          return null
        // frame params (rare) run to the newline; planes follow it
        var nl = markerEnd
        while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
        if (nl >= bytes.length || nl + 1 + hd.frameSize > bytes.length)
          return null
        val y = java.util.Arrays.copyOfRange(bytes, nl + 1, nl + 1 + hd.ySize)
        pos = nl + 1 + hd.frameSize
        y
      }
      def hasNext: Boolean = nextFrame != null
      def next(): (Int, Array[Byte]) = {
        val out = (idx, nextFrame)
        idx += 1
        nextFrame = advance()
        out
      }
    }

  /** Container facts per video blob; all-null row when the bytes aren't a
    * parseable Y4M stream (quarantine undecodables upstream if needed). */
  val VideoFeatureType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("fps_num", IntegerType),
    StructField("fps_den", IntegerType),
    StructField("n_frames", LongType)))

  def videoFeatures(bytes: Array[Byte]): Row = parseHeader(bytes) match {
    case None => Row(null, null, null, null, null)
    case Some(hd) =>
      Row(hd.width, hd.height, hd.fpsNum, hd.fpsDen, frames(bytes, hd).size.toLong)
  }

  /** Video feature extraction over the REAL demuxer: one
    * [[VideoFeatureType]] row per record (narrow, no shuffle). */
  def extractVideoFeatures(df: DataFrame, idCol: String,
      contentCol: String): DataFrame =
    Multimodal.extractRowFeatures(df, idCol, contentCol, VideoFeatureType,
      videoFeatures)

  /** Real keyframe-style sampling through the generic
    * [[Multimodal.FrameSampler]] seam: every `everyN`-th decoded Y plane.
    * Un-parseable blobs yield no frames. */
  final case class Y4mFrameSampler(everyN: Int) extends Multimodal.FrameSampler {
    require(everyN > 0, "everyN must be positive")
    def sampleBatch(batch: Seq[Array[Byte]]): Seq[Seq[(Int, Array[Byte])]] =
      batch.map { bytes =>
        parseHeader(bytes) match {
          case None => Seq.empty
          case Some(hd) =>
            frames(bytes, hd).filter(_._1 % everyN == 0).toSeq
        }
      }
  }

  /** Per-sampled-frame features: (id, frame_idx, luma_sum) where luma_sum
    * is the exact integer sum of the frame's Y-plane bytes — the video
    * analog of [[Multimodal.WavDecoder]]'s amplitude sum, reproducible by
    * an oracle without float drift. 1 record → N rows, demux + sum inside
    * one mapPartitions pass (bounded by batch, no shuffle). */
  val FrameFeatureType: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("luma_sum", LongType)))

  /** Temporal (frame-to-frame) features: (id, frame_idx, delta_sum) where
    * delta_sum = Σ|Y_k[i] − Y_{k−1}[i]| — the classic scene-change /
    * motion-intensity signal. One pass per record inside mapPartitions
    * (narrow, no shuffle): frames decode sequentially and only the
    * previous Y plane is held, so memory is O(frame), not O(video). Rows
    * start at frame_idx 1; single-frame or undecodable records emit none. */
  val TemporalFeatureType: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("delta_sum", LongType)))

  def extractTemporalFeatures(df: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    val idField = df.schema(idIdx)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(StructType(
        idField +: TemporalFeatureType.fields.toSeq))
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](cIdx)
        // null content: parseHeader returns None (unparseable contract)
        parseHeader(bytes) match {
          case None => Iterator.empty[Row]
          case Some(hd) =>
            var prev: Array[Byte] = null
            frames(bytes, hd).flatMap { case (k, y) =>
              val out =
                if (prev == null) Iterator.empty[Row]
                else {
                  var sum = 0L
                  var i = 0
                  while (i < y.length) {
                    sum += math.abs((y(i) & 0xff) - (prev(i) & 0xff)); i += 1
                  }
                  Iterator.single(Row(r.get(idIdx), k, sum))
                }
              prev = y
              out
            }
        }
      }
    }(enc)
  }

  def extractFrameFeatures(df: DataFrame, idCol: String, contentCol: String,
      everyN: Int = 1): DataFrame = {
    val sampler = Y4mFrameSampler(everyN)
    val sampled = Multimodal.sampleFrames(df, idCol, contentCol, sampler)
    val idField = sampled.schema.head
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(StructType(
        idField +: FrameFeatureType.fields.toSeq))
    sampled.mapPartitions { it =>
      it.map { r =>
        val y = r.getAs[Array[Byte]](2) // (id, frame_idx, frame)
        var sum = 0L
        var i = 0
        while (i < y.length) { sum += y(i) & 0xff; i += 1 }
        Row(r.get(0), r.getInt(1), sum)
      }
    }(enc)
  }
}
