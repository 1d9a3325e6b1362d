package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7): image/audio/video travel
  * as opaque `binary` columns next to a typed metadata struct; decode /
  * feature-extraction runs batched per partition (the Scala analogue of
  * `mapInPandas`), so a real decoder (JNI/FFI image lib) drops in behind
  * [[MediaCodec.decodeBatch]] without touching the Spark plumbing.
  *
  * The decode step itself is a DETERMINISTIC STUB — this container has
  * no image/audio libraries — but the schema, partitioning, batch shape
  * and executor-side lifecycle are real and tested.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)

  case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(media_id: Long, format: String, n_bytes: Int,
      features: Array[Float])

  /** Batch "decoder". STUB: derives a deterministic 8-float feature
    * vector from the payload bytes instead of decoding pixels/samples.
    * A real implementation would decode the whole batch in one native
    * call — which is exactly why the interface is batch-in/batch-out. */
  object MediaCodec {
    val batchSize = 64

    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val f = new Array[Float](8)
        var i = 0
        while (i < r.content.length) {
          f(i % 8) += (r.content(i) & 0xff) / 255.0f
          i += 1
        }
        MediaFeatures(r.media_id, r.meta.format, r.content.length, f)
      }
  }

  /** Synthesize a deterministic media table from any id column: payload
    * bytes are md5-expanded from the id (stand-in for real files read
    * from a binary source). */
  def syntheticMedia(df: DataFrame, idCol: String)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        unhex(concat(md5(col(idCol).cast("string")),
          md5(concat(col(idCol).cast("string"), lit("-2"))))).as("content"),
        struct(
          when(col(idCol) % 3 === 0, "png").when(col(idCol) % 3 === 1, "jpeg")
            .otherwise("wav").as("format"),
          (col(idCol) % 64 + 1).cast("int").as("width"),
          (col(idCol) % 48 + 1).cast("int").as("height"),
          (col(idCol) % 1000).cast("long").as("durationMs")).as("meta"))
      .as[MediaRecord]
  }

  /** Partition-wise batched feature extraction. Each executor thread
    * consumes its partition in [[MediaCodec.batchSize]] chunks — constant
    * memory per task regardless of partition size, no driver involvement.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(MediaCodec.batchSize).flatMap(b => MediaCodec.decodeBatch(b))
    }
  }
}
