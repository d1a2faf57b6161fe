package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as opaque
 * `binary` columns with a typed metadata struct, and run decode /
 * feature-extraction as partition-batched functions.
 *
 * The actual media decode is STUBBED — this container has no image/audio
 * codecs — with a deterministic fake ([[fakeDecode]]) so the Spark-side
 * contract (schema, partitioning, batch shape, null handling) is real and
 * tested; swap `fakeDecode` for a JNI/codec call in production. The
 * mapPartitions boundary is where a real decoder would amortize per-batch
 * init (model load, codec contexts) — the same shape `mapInPandas` gives
 * Python pipelines.
 */
object Multimodal {

  /** Metadata carried alongside the opaque payload. */
  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_len", LongType)))

  /**
   * Wrap a text column as an opaque binary payload + metadata struct —
   * the shape a real ingestion job produces for media files.
   */
  def attachContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast("binary").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col(textCol).cast("binary")).cast("long").as("byte_len")).as("meta"))

  /**
   * STUB decoder: deterministic fake "media features" derived from the
   * payload length only. A real implementation decodes `content` (e.g.
   * libjpeg / ffmpeg via JNI) and returns true dimensions/frames.
   */
  def fakeDecode(content: Array[Byte]): (Int, Int, Int) = {
    val len = content.length
    (len % 640, (len * 7) % 480, 1 + len % 16)
  }

  /**
   * Partition-batched decode: content+meta -> decoded feature columns.
   * Runs as `mapPartitions` over InternalRow batches (zero shuffle; one
   * decoder context per partition).
   */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType)))
    val input = df.select(col(idCol).cast("long"), col("content"))
    input.mapPartitions { rows =>
      // per-partition decoder init would go here (codec context, model, ...)
      rows.map { r =>
        val id: java.lang.Long = if (r.isNullAt(0)) null else r.getLong(0)
        val content = r.getAs[Array[Byte]](1)
        if (content == null) {
          // undecodable payload: keep the row, null feature columns
          Row(id, null, null, null, null)
        } else {
          val (w, h, f) = fakeDecode(content)
          Row(id, content.length.toLong, w, h, f)
        }
      }
    }(Encoders.row(outSchema))
  }
}
