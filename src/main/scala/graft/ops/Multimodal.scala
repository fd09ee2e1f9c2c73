package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns plus a typed metadata struct, and per-batch
  * decode/feature-extract runs as `mapPartitions` over the binary payloads
  * (the Scala analog of `mapInPandas` batch UDFs — one JVM-side iterator per
  * partition, no per-row overhead, trivially executor-parallel).
  *
  * The actual codec step is a STUB (this environment ships no image/audio
  * libraries): [[MediaStub.decode]] derives deterministic fake features from
  * the raw bytes. The Spark-side contract — schema, batch iteration,
  * partitioning, output shape — is real and tested; swapping the stub for
  * javacv/ffmpeg is a one-function change.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  final case class MediaMeta(
      format: String, width: Int, height: Int, channels: Int)

  final case class MediaRow(id: Long, media: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      id: Long,
      nBytes: Int,
      // stubbed "decoded" signal: 16-bin byte histogram as a unit vector
      histogram: Array[Float],
      thumbnailBytes: Int)

  object MediaStub {
    /** Deterministic fake decode: byte histogram normalized to unit L1. A
      * real implementation would decode pixels/samples here.
      */
    def decode(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xFF) >> 4) += 1.0f
        i += 1
      }
      if (bytes.length > 0) {
        var j = 0
        while (j < 16) { hist(j) /= bytes.length.toFloat; j += 1 }
      }
      hist
    }

    /** Deterministic fake resize: byte count after a stride-2 downsample. */
    def resizedSize(bytes: Array[Byte]): Int = (bytes.length + 1) / 2

    /** Deterministic fake frame sampling: every `stride`-th byte marks a
      * "frame" (a real implementation samples container keyframes).
      */
    def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
      bytes.grouped(stride).map(_.take(8)).toSeq
  }

  /** Wrap any table into the media schema, treating a string column's UTF-8
    * bytes as the payload — used to exercise the pipeline on the documents
    * fixture without real media files.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(
        lit("text/plain").as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        lit(1).as("channels")).as("meta"))

  final case class FrameRow(id: Long, frame_idx: Int, n_bytes: Int)

  /** Frame sampling as a generator op: one output row per sampled frame —
    * the explode-shaped twin of [[extractFeatures]] (a real video pipeline
    * emits keyframe payloads here; the stub emits 8-byte probes every
    * `stride` bytes).
    */
  def sampleFrameRows(
      spark: SparkSession, media: DataFrame, stride: Int): Dataset[FrameRow] = {
    import spark.implicits._
    require(stride > 0, "stride must be > 0")
    media.select(col("id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // null payload → no frames (the engine-wide skip-null media rule;
        // an unguarded bytes.grouped NPE'd mid-task with an opaque trace)
        it.flatMap { case (id, bytes) =>
          if (bytes == null) Iterator.empty
          else MediaStub.sampleFrames(bytes, stride).iterator.zipWithIndex.map {
            case (frame, i) => FrameRow(id, i, frame.length)
          }
        }
      }
  }

  /** Batch feature extraction over binary payloads: the mapPartitions batch
    * shape every real decoder plugs into.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // null payload rows are skipped, not crashed on (a real decoder
        // can't feature-extract an absent blob either)
        it.flatMap { case (id, bytes) =>
          if (bytes == null) None
          else Some(MediaFeatures(
            id,
            bytes.length,
            MediaStub.decode(bytes),
            MediaStub.resizedSize(bytes)))
        }
      }
  }
}
