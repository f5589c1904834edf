package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
 * processed in batch-shaped per-partition kernels.
 *
 * The container has no image/audio codecs, so the DECODE step is a
 * deterministic fake (clearly marked below); everything Spark-side — the
 * binary column handling, the schema of the extracted metadata struct, the
 * partition-batched kernel shape (the Scala analogue of `mapInPandas`:
 * `mapPartitions` over an iterator of rows, amortizing per-batch setup) —
 * is real and tested. Swapping in a real codec changes only `fakeDecode`.
 */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long, byte_len: Int, content_md5: String,
      width: Int, height: Int, n_frames: Int)

  /**
   * FAKE DECODER (deterministic stand-in for an image/video codec): derives
   * "decoded" dimensions from stable payload bytes. Real implementation
   * would parse the container header here.
   */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < math.min(payload.length, 64)) { h ^= payload(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    val width = 160 + ((h & 0x7fffffff) % 8).toInt * 80
    val height = 120 + (((h >>> 16) & 0x7fffffff) % 8).toInt * 60
    val frames = 1 + (((h >>> 32) & 0x7fffffff) % 30).toInt
    (width, height, frames)
  }

  /** Binary-payload table from documents (payload = UTF-8 bytes of text —
    * the stand-in for a WARC image/audio blob). */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Feature extraction over binary payloads: batch-shaped per-partition
    * kernel (decode setup once per partition, like a Pandas-UDF batch). */
  def extractMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5") // per-batch setup
        it.map { case (id, payload) =>
          digest.reset()
          val md5hex = digest.digest(payload).map("%02x".format(_)).mkString
          val (w, h, f) = fakeDecode(payload)
          MediaMeta(id, payload.length, md5hex, w, h, f)
        }
      }.toDF()
  }

  /** Deterministic frame sampling: every `stride`-th frame index, exploded
    * to one row per sampled frame (UDTF/generator shape). */
  def sampleFrames(meta: DataFrame, stride: Int = 10): DataFrame =
    meta.select(col("doc_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Aspect-preserving resize PLANNING (the letterbox math every image
    * preprocessing pipeline runs before the pixel op): scale =
    * min(maxW/w, maxH/h) capped at 1.0 (never upscale), output dims
    * floored. Pure codegen'd projection; the pixel resample itself is the
    * codec-side stub. */
  def resizePlan(meta: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width").cast("double"),
      lit(maxH.toDouble) / col("height").cast("double"),
      lit(1.0))
    meta.select(col("doc_id"), col("width"), col("height"),
      round(scale, 6).as("scale"),
      floor(col("width") * scale).cast("int").as("out_w"),
      floor(col("height") * scale).cast("int").as("out_h"))
  }

  /** Per-frame feature extraction (the CNN-embedding stand-in): a
    * deterministic fake vector seeded by (content_md5, frame_idx) — the
    * real system swaps ONLY the vector computation; the batch-shaped
    * kernel, schema (`array<float>` + ids), and downstream compatibility
    * with the Similarity ANN operators are the real, tested plumbing.
    * Identical payloads yield identical features, so multimodal near-dups
    * surface through [[graft.ops.Similarity.annCandidatePairs]]. */
  def frameFeatures(spark: SparkSession, frames: DataFrame, meta: DataFrame,
      dim: Int = 16): DataFrame = {
    import spark.implicits._
    frames.join(meta.select(col("doc_id"), col("content_md5")), Seq("doc_id"))
      .select(col("doc_id"), col("frame_idx"), col("content_md5"))
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, frame, md5hex) =>
          // FAKE EMBEDDING: seeded by content hash + frame index
          var h = java.lang.Long.parseUnsignedLong(md5hex.substring(0, 16), 16) ^
            (frame.toLong * 0x9E3779B97F4A7C15L)
          val rng = new graft.kg.Gen.Rng(h)
          (id, frame, Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat))
        }
      }.toDF("doc_id", "frame_idx", "embedding")
  }
}
