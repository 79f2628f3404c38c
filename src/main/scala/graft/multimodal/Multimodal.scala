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
