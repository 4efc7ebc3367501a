package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder-prompt mandate): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct. The
  * Spark-side plumbing — schema, partition-parallel batch processing via
  * mapPartitions over typed Datasets (the JVM analog of mapInPandas batch
  * shape), deterministic output schema — is real and tested; the *codec*
  * step is a clearly-marked DETERMINISTIC STUB because no image/audio
  * libraries exist in this container. Swap [[StubCodec]] for a real decoder
  * (e.g. javacv / a JNI codec) without touching the pipeline.
  */
object MediaOps {

  /** Typed metadata carried next to every media blob. */
  final case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      width: Int,
      height: Int,
      durationMs: Long,
      codec: String)

  final case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      doc_id: Long,
      mediaType: String,
      featureDim: Int,
      features: Array[Float], // pooled embedding (stubbed)
      frames: Int, // frames sampled (video) / 1 (image)
      outWidth: Int, // post-"resize" dims
      outHeight: Int)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mediaType", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false),
      StructField("codec", StringType, nullable = false))), nullable = false)))

  /** ======================== STUB CODEC ========================
    * Deterministic fake decode: "pixels" are a splitmix64 stream seeded by
    * the blob's FNV hash; resize/pool/frame-sample operate on that stream.
    * A real build replaces exactly this object.
    */
  object StubCodec {
    @inline private def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    private def blobHash(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      h
    }

    /** "Decode + resize to (w,h) + mean-pool to dim features" — stub. */
    def decodeAndPool(bytes: Array[Byte], w: Int, h: Int, dim: Int,
        frame: Int): Array[Float] = {
      val seed = mix64(blobHash(bytes) ^ (frame.toLong << 32))
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        // deterministic "pooled pixel statistic" for cell d of a w×h grid
        out(d) = (mix64(seed + d * 0x9E3779B97F4A7C15L + w * 31L + h).toFloat /
          Long.MaxValue.toFloat)
        d += 1
      }
      out
    }

    /** Frame indexes sampled uniformly from a stubbed duration. */
    def sampleFrames(durationMs: Long, fps: Double, maxFrames: Int): Array[Int] = {
      val total = math.max(1, (durationMs * fps / 1000.0).toInt)
      val n = math.min(maxFrames, total)
      Array.tabulate(n)(i => (i.toLong * total / n).toInt)
    }
  }

  /** Synthesize an opaque media table from any binary-able column —
    * deterministic stand-in for real crawled media.
    */
  def synthesize(docs: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val mt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, payload, MediaMeta(mt,
          width = 64 + (id % 8).toInt * 32,
          height = 64 + (id % 5).toInt * 32,
          durationMs = if (mt == "image") 0L else 1000L + (id % 30) * 500L,
          codec = if (mt == "image") "stub-png" else if (mt == "audio") "stub-pcm" else "stub-h264"))
      }
  }

  /** decode → resize(targetW×targetH) → frame-sample → feature-extract →
    * mean-pool, batched per partition (constant-memory batch shape; the
    * mapInPandas analog). Null media → null-safe skip.
    */
  def extractFeatures(media: Dataset[MediaRow], targetW: Int = 224,
      targetH: Int = 224, dim: Int = 64, fps: Double = 1.0,
      maxFrames: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        if (row.media == null) Iterator.empty
        else {
          val frames: Array[Int] = row.meta.mediaType match {
            case "video" => StubCodec.sampleFrames(row.meta.durationMs, fps, maxFrames)
            case _       => Array(0)
          }
          val pooled = new Array[Float](dim)
          frames.foreach { f =>
            val feat = StubCodec.decodeAndPool(row.media, targetW, targetH, dim, f)
            var d = 0
            while (d < dim) { pooled(d) += feat(d) / frames.length; d += 1 }
          }
          Iterator.single(MediaFeatures(row.doc_id, row.meta.mediaType, dim,
            pooled, frames.length, targetW, targetH))
        }
      }
    }
  }
}
