package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Media payloads are opaque `binary` columns with typed metadata — the
  * schema, partitioning and batch shape are real and tested; only the
  * codec itself is STUBBED (this container ships no image/audio libs), as
  * a deterministic fake clearly marked below. Swapping in a real decoder
  * changes one function body, not the pipeline.
  *
  * Decode runs per-partition over iterator batches (the Scala analogue of
  * `mapInPandas`: amortizes per-batch setup, streams rows, never
  * materializes a partition). Partition count is driven by input splits;
  * re-partition upstream by id for even batches when payload sizes skew.
  */
object Multimodal {

  case class MediaRow(id: Long, kind: String, content: Array[Byte],
                      meta: Map[String, String])
  case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
                           features: Array[Float])
  case class MediaFrame(id: Long, frame_no: Int, frame: Array[Byte])

  /** Synthesize a media table from documents (deterministic fake payload:
    * the UTF-8 text bytes standing in for an encoded image/audio blob).
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))

  /** ======== STUB ========
    * Deterministic fake decoder: a 16-bin byte histogram normalized to
    * unit L1 mass. A real implementation would decode the codec (JPEG /
    * WAV / MP4) and emit model-ready features; everything around this
    * function — schema, batching, partitioning — is production-shaped.
    */
  private def stubDecode(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < content.length) { hist((content(i) & 0xFF) % 16) += 1f; i += 1 }
    val n = math.max(1, content.length).toFloat
    hist.map(_ / n)
  }

  /** Decode/feature-extract: per-partition iterator processing. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.id, r.kind, r.content.length.toLong, stubDecode(r.content))
      }
    }
  }

  /** Frame sampling for `video` payloads: every `stride`-th 64-byte slice
    * of the payload stands in for a decoded frame (STUB — a real impl
    * would pull I-frames). Emits (id, frame_no, frame) rows.
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].filter(_.kind == "video").flatMap { r =>
      val frameSize = 64
      val nFrames = math.max(1, r.content.length / frameSize)
      (0 until nFrames by stride).map { f =>
        val from = f * frameSize
        val until = math.min(r.content.length, from + frameSize)
        MediaFrame(r.id, f, java.util.Arrays.copyOfRange(r.content, from, until))
      }
    }
  }

  /** Resize stub for images: truncate/pad payload to a fixed byte budget
    * (stands in for pixel resampling), preserving metadata.
    */
  def resizeImages(media: DataFrame, budget: Int = 256): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].map { r =>
      if (r.kind != "image" || r.content.length <= budget) r
      else r.copy(content = java.util.Arrays.copyOfRange(r.content, 0, budget),
        meta = r.meta + ("resized" -> "true"))
    }
  }
}
