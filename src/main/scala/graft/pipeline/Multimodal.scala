package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque binary
  * columns with typed metadata; decode / feature-extraction runs
  * partition-local over batches (the Scala analogue of an Arrow-batch
  * `mapInPandas` decode stage).
  *
  * The decode itself is STUBBED — this container ships no image/audio
  * codecs — with a deterministic fake (arithmetic on payload bytes), so
  * the Spark-side plumbing (schema, batching, partitioning, output
  * contract) is real and oracle-testable while the codec is swappable.
  */
object Multimodal {

  /** Binary media task: payload is the raw media bytes. */
  final case class MediaTask(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted metadata row — the schema a real decoder would emit. */
  final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                             width: Long, height: Long, frames: Long,
                             fingerprint: Long)

  /** Batch size for partition-local decode — mirrors the Arrow batch
    * shape a vectorized decoder would consume.
    */
  val DecodeBatch = 64

  /** STUB decode: replace the body of `decodeOne` with a real codec
    * (ImageIO / ffmpeg / soundfile) when available. Everything else —
    * batching, schema, distribution — is production-shaped.
    */
  def decodeMeta(tasks: Dataset[MediaTask]): Dataset[MediaMeta] = {
    import tasks.sparkSession.implicits._
    tasks.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        // a real decoder would hand `batch` to a vectorized native lib
        batch.iterator.map(decodeOne)
      }
    }
  }

  private def decodeOne(t: MediaTask): MediaMeta = {
    val nb = t.payload.length.toLong
    // ??? real codec goes here; deterministic fake below
    MediaMeta(
      doc_id = t.doc_id,
      media_type = t.media_type,
      n_bytes = nb,
      width = 64 + (t.doc_id * 7) % 448,
      height = 64 + nb % 448,
      frames = 1 + t.doc_id % 16,
      fingerprint = (nb * 2654435761L) % 1000003L)
  }

  /** Frame row emitted by [[sampleFrames]]. */
  final case class FrameMeta(doc_id: Long, frame_no: Long, fingerprint: Long)

  /** Frames sampled per media payload — the video path: one input row
    * fans out to up to `maxFrames` frame rows (flatMap inside the same
    * partition-local batched decode). STUB: frame count/fingerprint are
    * deterministic arithmetic standing in for a real demuxer.
    */
  def sampleFrames(tasks: Dataset[MediaTask], maxFrames: Int = 4): Dataset[FrameMeta] = {
    import tasks.sparkSession.implicits._
    tasks.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        batch.iterator.flatMap { t =>
          val nb = t.payload.length.toLong
          val frames = math.min(1 + t.doc_id % 16, maxFrames.toLong)
          // ??? real demuxer goes here; deterministic fake below
          (1L to frames).map(f =>
            FrameMeta(t.doc_id, f, (nb * 31 + f * 7919) % 1000003L))
        }
      }
    }
  }

  /** documents table → media tasks (text bytes standing in for media
    * payloads; the real pipeline reads binary columns directly).
    */
  def tasksFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaTask] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaTask]
  }
}
