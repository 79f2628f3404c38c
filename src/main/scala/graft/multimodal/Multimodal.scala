package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with a
  * typed metadata struct, plus a batched decode/feature-extract seam.
  *
  * The decode itself is STUBBED (this container has no image/audio codecs)
  * behind [[FakeDecoder]] — a deterministic stand-in — but the Spark-side
  * plumbing is real and is what matters at 100 TB:
  *
  *  - media bytes stay in one `content: binary` column (never exploded into
  *    rows), with `media_meta` struct alongside;
  *  - decode / feature-extract runs in `mapPartitions` over *batches* of
  *    records (the JVM analog of a Pandas-UDF `mapInPandas`: the decoder is
  *    handed a batch iterator so vectorized/native libs amortize setup per
  *    batch, not per record);
  *  - batch size is a config; output schema is declared up front so the
  *    plan's schema is static regardless of decoder internals.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType), // image | audio | video | unknown
    StructField("n_bytes", LongType),
    StructField("content_hash", StringType)))

  /** Attach the metadata struct for a binary content column. */
  def withMediaMeta(df: DataFrame, contentCol: String, kind: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(kind).as("kind"),
      length(col(contentCol)).cast("long").as("n_bytes"),
      md5(col(contentCol)).as("content_hash")))

  /** Feature row produced per media record by a decoder. */
  val FeatureType: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("head_byte", IntegerType),
    StructField("byte_sum_mod", LongType)))

  /** Decoder contract: handed a whole batch (like a Pandas-UDF batch), must
    * return one feature row per input. Swap [[FakeDecoder]] for a real
    * codec-backed implementation in production. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[Array[Byte]]): Seq[Row]
  }

  /** Deterministic stand-in for the codec: features derived from raw bytes
    * only (length, first byte, byte-sum mod 1e9+7). A real implementation
    * would do image decode / resample / frame-sample here. */
  object FakeDecoder extends MediaDecoder {
    def decodeBatch(batch: Seq[Array[Byte]]): Seq[Row] =
      batch.map { bytes =>
        var sum = 0L
        bytes.foreach(b => sum = (sum + (b & 0xff)) % 1000000007L)
        Row(bytes.length.toLong,
          if (bytes.isEmpty) -1 else bytes(0) & 0xff,
          sum)
      }
  }

  /** Batch transform contract (resize/resample/transcode shape): bytes in,
    * bytes out, one output per input. */
  trait MediaTransform extends Serializable {
    def transformBatch(batch: Seq[Array[Byte]]): Seq[Array[Byte]]
  }

  /** Deterministic resize stand-in: truncate/zero-pad to `targetBytes`. A
    * real implementation decodes, scales to WxH, re-encodes — same
    * signature, same batching. */
  final case class FakeResizer(targetBytes: Int) extends MediaTransform {
    def transformBatch(batch: Seq[Array[Byte]]): Seq[Array[Byte]] =
      batch.map(b => java.util.Arrays.copyOf(b, targetBytes))
  }

  /** Resize/transcode: rewrite the content column in place via a batched
    * transform — narrow (mapPartitions), bytes never leave the binary
    * column, batch amortizes codec setup. */
  def resizeContent(df: DataFrame, contentCol: String,
      transform: MediaTransform, batchSize: Int = 64): DataFrame = {
    val contentIdx = df.schema.fieldIndex(contentCol)
    implicit val enc: Encoder[Row] = Encoders.row(df.schema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val out = transform.transformBatch(
          batch.map(_.getAs[Array[Byte]](contentIdx)))
        batch.iterator.zip(out.iterator).map { case (r, bytes) =>
          Row.fromSeq(r.toSeq.updated(contentIdx, bytes))
        }
      }
    }(enc)
  }

  /** Frame sampler contract: one media blob → 0..N (frame_idx, frame_bytes)
    * pairs (video frame-sampling shape). */
  trait FrameSampler extends Serializable {
    def sampleBatch(batch: Seq[Array[Byte]]): Seq[Seq[(Int, Array[Byte])]]
  }

  /** Deterministic stand-in: treat the blob as fixed-size `frameBytes`
    * chunks and keep every `everyN`-th chunk. A real implementation would
    * demux the container and decode keyframes — same 1-to-N shape. */
  final case class FakeFrameSampler(frameBytes: Int, everyN: Int) extends FrameSampler {
    def sampleBatch(batch: Seq[Array[Byte]]): Seq[Seq[(Int, Array[Byte])]] =
      batch.map { bytes =>
        bytes.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, i) if i % everyN == 0 => (i, chunk)
        }.toSeq
      }
  }

  /** Frame sampling: 1 record → N frame rows (id, frame_idx, frame). The
    * explode happens inside mapPartitions with bounded memory per batch —
    * frames of one record never need to co-reside with another record's. */
  def sampleFrames(df: DataFrame, idCol: String, contentCol: String,
      sampler: FrameSampler, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    val outSchema = StructType(Seq(
      df.schema(idIdx),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val frames = sampler.sampleBatch(
          batch.map(_.getAs[Array[Byte]](contentIdx)))
        batch.iterator.zip(frames.iterator).flatMap { case (r, fs) =>
          fs.map { case (i, bytes) => Row(r.get(idIdx), i, bytes) }
        }
      }
    }(enc)
  }

  /** Run the decoder over batches of `batchSize` records (mapPartitions —
    * narrow, no shuffle), appending the feature struct columns to the id
    * column. */
  def extractFeatures(df: DataFrame, idCol: String, contentCol: String,
      decoder: MediaDecoder = FakeDecoder, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    val outSchema = StructType(
      df.schema(idIdx) +: FeatureType.fields.toSeq)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val bytes = batch.map(r => r.getAs[Array[Byte]](contentIdx))
        val features = decoder.decodeBatch(bytes)
        batch.iterator.zip(features.iterator).map { case (r, f) =>
          Row.fromSeq(r.get(idIdx) +: f.toSeq)
        }
      }
    }(enc)
  }
}
