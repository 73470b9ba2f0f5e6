package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark side — schema, batching, partitioning, operator signatures — is
  * real and tested. The codec itself is STUBBED with a deterministic fake
  * (this container ships no image/audio libraries); swap `decodeBytes` for a
  * real codec (e.g. via an `mapInArrow`/JNI stage) without touching the plan
  * shape.
  *
  * Scale notes: decode is per-row, zero-shuffle; binary payloads never pass
  * through a shuffle (metadata-only projections after decode); frame
  * sampling is an in-row `transform` over byte slices.
  */
object Multimodal {

  final case class MediaMeta(kind: String, sizeBytes: Long, width: Int,
      height: Int, durationMs: Long)
  final case class Decoded(mediaId: Long, meta: MediaMeta, features: Array[Float])

  /** STUB decode: deterministic pseudo-metadata + feature vector derived
    * from the payload bytes. Real implementation: image/audio codec here. */
  private[pipeline] def decodeBytes(id: Long, kind: String, bytes: Array[Byte]): Decoded = {
    // ??? <- real codec goes here; deterministic fake below keeps the
    // pipeline testable end-to-end without native libs.
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(h % 1024)
    val height = 64 + math.abs((h / 1024) % 1024)
    val features = Array.tabulate(16) { i =>
      val x = scala.util.hashing.MurmurHash3.productHash((h, i))
      x.toFloat / Int.MaxValue
    }
    Decoded(id, MediaMeta(kind, bytes.length.toLong, width, height,
      math.abs(h % 60000).toLong), features)
  }

  /** Decode a binary media column into metadata + features. mapPartitions so
    * a real codec can amortize per-partition init (model load, JNI handles),
    * exactly as a production decode stage would. */
  def decode(df: DataFrame, idCol: String = "media_id",
             binCol: String = "payload", kindCol: String = "kind"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src: Dataset[(Long, String, Array[Byte])] = df.select(
      col(idCol).cast("long"), col(kindCol), col(binCol)).as[(Long, String, Array[Byte])]
    src.mapPartitions { rows =>
      // per-partition codec init would happen here
      rows.map { case (id, kind, bytes) => decodeBytes(id, kind, bytes) }
    }.toDF()
  }

  /** Frame sampling as in-row byte slicing: every `stride`-th window of
    * `frameLen` bytes (a real video pipeline would slice at keyframe offsets
    * from the container index — same plan shape). */
  def sampleFrames(df: DataFrame, binCol: String, frameLen: Int, stride: Int,
                   maxFrames: Int = 8): DataFrame = {
    val n = length(col(binCol))
    val frameCount = least(floor(n / lit(stride)).cast("int") + 1, lit(maxFrames))
    df.withColumn("frames",
      transform(sequence(lit(0), frameCount - 1),
        i => col(binCol).substr(i * stride + 1, lit(frameLen))))
      .withColumn("n_frames", size(col("frames")))
  }

  /** Wrap a text/documents table as a fake media table — test fixture path
    * (binary payload = utf-8 bytes). */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
}
