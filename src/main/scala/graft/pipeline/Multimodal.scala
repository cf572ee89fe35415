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

  /** Decode stage: REAL ImageIO decode for image payloads (PNG/JPEG/
    * GIF/BMP — the JDK ships these readers, no extra dependency),
    * deterministic fake for everything else (video/audio codecs are
    * not in this container). Batching, schema, distribution are
    * production-shaped either way.
    */
  def decodeMeta(tasks: Dataset[MediaTask]): Dataset[MediaMeta] = {
    import tasks.sparkSession.implicits._
    tasks.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        // a real vectorized decoder would take `batch` whole
        batch.iterator.map(decodeOne)
      }
    }
  }

  /** JDK-readable image payload? Sniffed from FULL format signatures,
    * not the caller-supplied media_type and not 2–3 byte prefixes: a
    * text document whose UTF-8 bytes happen to start "BM" or "GIF"
    * must NOT be routed into ImageIO. PNG checks all 8 signature
    * bytes, GIF the 87a/89a version, JPEG the SOI+marker prefix, BMP
    * the 2-byte magic PLUS its little-endian file-size field matching
    * the payload length (ordinary text can't satisfy that).
    */
  private def isImage(p: Array[Byte]): Boolean = {
    def pngSig = p.length >= 8 && p(0) == 0x89.toByte && p(1) == 'P' &&
      p(2) == 'N' && p(3) == 'G' && p(4) == 0x0D.toByte &&
      p(5) == 0x0A.toByte && p(6) == 0x1A.toByte && p(7) == 0x0A.toByte
    def jpegSig = p.length >= 3 && p(0) == 0xFF.toByte &&
      p(1) == 0xD8.toByte && p(2) == 0xFF.toByte
    def gifSig = p.length >= 6 && p(0) == 'G' && p(1) == 'I' &&
      p(2) == 'F' && p(3) == '8' && (p(4) == '7' || p(4) == '9') &&
      p(5) == 'a'
    def bmpSig = p.length >= 26 && p(0) == 'B' && p(1) == 'M' && {
      val size = (p(2) & 0xFFL) | ((p(3) & 0xFFL) << 8) |
        ((p(4) & 0xFFL) << 16) | ((p(5) & 0xFFL) << 24)
      size == p.length.toLong
    }
    pngSig || jpegSig || gifSig || bmpSig
  }

  private def decodeOne(t: MediaTask): MediaMeta = {
    val nb = t.payload.length.toLong
    if (isImage(t.payload)) {
      // a payload that passes the sniff can still be truncated or
      // corrupt — any decoder failure falls through to the
      // deterministic fake instead of failing the executor task
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(t.payload))
      catch { case _: Throwable => null }
      if (img != null)
        return MediaMeta(
          doc_id = t.doc_id,
          media_type = t.media_type,
          n_bytes = nb,
          width = img.getWidth.toLong,
          height = img.getHeight.toLong,
          frames = 1L,
          fingerprint = (nb * 2654435761L) % 1000003L)
    }
    // ??? real video/audio codec goes here; deterministic fake below
    MediaMeta(
      doc_id = t.doc_id,
      media_type = t.media_type,
      n_bytes = nb,
      width = 64 + (t.doc_id * 7) % 448,
      height = 64 + nb % 448,
      frames = 1 + t.doc_id % 16,
      fingerprint = (nb * 2654435761L) % 1000003L)
  }

  /** Safe decode: sniffed payloads only, any decoder failure → None. */
  private def safeDecode(p: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!isImage(p)) None
    else try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(p)))
    catch { case _: Throwable => None }

  /** Resize output row — aspect-fit target dims + a resample checksum. */
  final case class ResizeMeta(doc_id: Long, media_type: String, n_bytes: Long,
                              out_w: Long, out_h: Long, checksum: Long)

  /** Aspect-fit (w, h) into a box×box target: the longer edge becomes
    * `box`, the shorter scales by the same exact integer ratio
    * (floor division — engine and oracle compute the identical dims).
    */
  def fitBox(w: Long, h: Long, box: Long): (Long, Long) =
    if (w >= h) (box, math.max(1L, h * box / w))
    else (math.max(1L, w * box / h), box)

  /** Resize stage: REAL bilinear Graphics2D resample for decodable
    * image payloads (checksum = Σ(R+G+B) over output pixels mod
    * 1000003 — deterministic: Java2D software rendering), the m1-style
    * deterministic fake for everything else. Same partition-local
    * batched shape as [[decodeMeta]].
    */
  def resizeMeta(tasks: Dataset[MediaTask], box: Int = 64): Dataset[ResizeMeta] = {
    import tasks.sparkSession.implicits._
    tasks.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        batch.iterator.map { t =>
          val nb = t.payload.length.toLong
          safeDecode(t.payload) match {
            case Some(img) =>
              val (ow, oh) = fitBox(img.getWidth.toLong, img.getHeight.toLong,
                box.toLong)
              val dst = new java.awt.image.BufferedImage(ow.toInt, oh.toInt,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, ow.toInt, oh.toInt, null)
              g.dispose()
              var s = 0L
              var y = 0
              while (y < oh.toInt) {
                var x = 0
                while (x < ow.toInt) {
                  val rgb = dst.getRGB(x, y)
                  s += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                  x += 1
                }
                y += 1
              }
              ResizeMeta(t.doc_id, t.media_type, nb, ow, oh, s % 1000003L)
            case None =>
              // fake dims mirror m1's fake (w, h), aspect-fit applied
              val w = 64 + (t.doc_id * 7) % 448
              val h = 64 + nb % 448
              val (ow, oh) = fitBox(w, h, box.toLong)
              ResizeMeta(t.doc_id, t.media_type, nb, ow, oh,
                (nb * 31 + ow * 7 + oh * 3) % 1000003L)
          }
        }
      }
    }
  }

  /** Perceptual-hash row: 64-bit aHash + same-hash mate count. */
  final case class PHashRow(doc_id: Long, media_type: String,
                            n_bytes: Long, phash: Long)

  /** Average-hash (aHash) perceptual fingerprint — the near-dup IMAGE
    * detection primitive (public aHash recipe: 8x8 grayscale
    * downsample, bit i = pixel_i > mean): REAL grid-sampled integer
    * luma for decodable images, the deterministic fake pixel formula
    * otherwise (this fixture's payloads are text, so the oracle
    * replays the fake; the real path is gated in ScalaTest with
    * constructed PNGs — identical images must collide, altered ones
    * must not). Integer arithmetic end to end: pixel grid, floor
    * mean, bit pack — bit 63 lands in the sign position, which the
    * SQL replay reproduces with an explicit -2^63 term. Downstream,
    * equal hashes bucket near-identical images exactly like p1's
    * content md5 buckets exact text — one partial-agg groupBy at any
    * corpus size.
    */
  def perceptualHash(tasks: Dataset[MediaTask]): Dataset[PHashRow] = {
    import tasks.sparkSession.implicits._
    tasks.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        batch.iterator.map { t =>
          val nb = t.payload.length.toLong
          val pix = new Array[Long](64)
          safeDecode(t.payload) match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              var i = 0
              while (i < 64) {
                val x = ((i % 8) * w) / 8
                val y = ((i / 8) * h) / 8
                val rgb = img.getRGB(x, y)
                pix(i) = (299L * ((rgb >> 16) & 0xFF) +
                  587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)) / 1000L
                i += 1
              }
            case None =>
              var i = 0
              while (i < 64) {
                pix(i) = (nb * (i + 3) + t.doc_id * (i % 7 + 1)) % 256
                i += 1
              }
          }
          val mean = pix.sum / 64
          var hash = 0L
          var i = 0
          while (i < 64) {
            if (pix(i) > mean) hash |= 1L << i
            i += 1
          }
          PHashRow(t.doc_id, t.media_type, nb, hash)
        }
      }
    }
  }

  /** Feature row — per-channel integer means + integer Rec.601 luma. */
  final case class ImageFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, ch1_mean: Long, ch2_mean: Long,
                                 ch3_mean: Long, luma: Long)

  /** Feature-extraction stage: REAL per-channel pixel means for
    * decodable images (exact integer division over Σchannel), the
    * deterministic fake otherwise. Integer arithmetic end to end so
    * the outputs are bit-stable cross-engine.
    */
  def extractFeatures(tasks: Dataset[MediaTask]): Dataset[ImageFeatures] = {
    import tasks.sparkSession.implicits._
    tasks.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        batch.iterator.map { t =>
          val nb = t.payload.length.toLong
          safeDecode(t.payload) match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF
                  sb += rgb & 0xFF
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              ImageFeatures(t.doc_id, t.media_type, nb,
                sr / n, sg / n, sb / n,
                (299L * sr + 587L * sg + 114L * sb) / (1000L * n))
            case None =>
              val c1 = (nb * 13) % 256
              val c2 = (nb * 17 + t.doc_id) % 256
              val c3 = (nb * 19 + 7 * t.doc_id) % 256
              ImageFeatures(t.doc_id, t.media_type, nb, c1, c2, c3,
                (299L * c1 + 587L * c2 + 114L * c3) / 1000L)
          }
        }
      }
    }
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
