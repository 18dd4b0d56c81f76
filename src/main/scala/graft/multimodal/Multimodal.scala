package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.8, north-star extension).
  *
  * Images/audio/video are opaque `binary` columns plus typed metadata;
  * decode / feature-extract / resize / frame-sample run as
  * partition-local batched transforms (`mapPartitions` over a typed
  * Dataset — the Scala analog of `mapInPandas`: fixed batch shape,
  * no per-row driver involvement, arbitrary library code inside).
  *
  * The decode step is a clearly-marked STUB: real codecs (JPEG/PCM/…)
  * are not available in this container, so a deterministic fake stands
  * in. Everything Spark-side — schema, batching, partitioning, typed
  * encoders — is real and tested.
  */
object Multimodal {

  /** An opaque media payload + metadata, the at-rest schema. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String)

  /** Features produced by the (stubbed) decoder. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, checksum: String)

  /** A fixed-rate frame sample from a (fake) video payload. */
  case class FrameSample(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Build a binary media column from the documents fixture (UTF-8
    * bytes stand in for encoded media).
    */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("fake/raw").as("format"))

  private def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString

  /** STUB decode + feature extraction. A real implementation would
    * decode the codec inside the batch loop (e.g. via javax.imageio);
    * here width/height are deterministic functions of the payload so
    * specs can assert exact values. Batched 64-at-a-time to mirror the
    * arrow-batch shape a Pandas-UDF pipeline would see.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { r =>
          val n = r.payload.length
          MediaFeatures(
            doc_id = r.doc_id,
            n_bytes = n,
            width = n % 64 + 16,
            height = (r.payload.headOption.getOrElse(0: Byte) & 0x1f) + 1,
            checksum = sha256Hex(r.payload))
        }
      }
    }
  }

  /** STUB resize: truncates the payload to `maxBytes` — the real
    * version would re-encode pixels; the plumbing (binary in, smaller
    * binary out, same partitioning) is identical.
    */
  def resize(spark: SparkSession, media: DataFrame, maxBytes: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].map(r =>
      r.copy(payload = r.payload.take(maxBytes), format = "fake/resized"))
  }

  /** STUB frame sampling: every `stride`-th 16-byte slice of the
    * payload becomes a "frame".
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      r.payload.grouped(16).zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 => FrameSample(r.doc_id, i, chunk)
      }
    }
  }

  /** Per-payload "waveform" statistics. */
  case class WaveStats(doc_id: Long, n_samples: Int, rms: Double,
      zero_crossings: Long, clip_frac: Double)

  /** Audio-shaped feature extraction: the payload bytes are treated as
    * a centered i8 sample stream (sample = byte − 64) and reduced to
    * RMS energy, strict zero-crossing count, and clipping fraction
    * (|s| ≥ 48) — the real DSP reductions a PCM decode feeds, run
    * partition-local over the typed Dataset with integer arithmetic
    * until the two final divisions (so the stub is exactly
    * reproducible — and oracle-checkable — from the source text).
    */
  def waveformStats(spark: SparkSession, media: DataFrame): Dataset[WaveStats] = {
    import spark.implicits._
    media.as[MediaRecord].map { r =>
      val n = r.payload.length
      var sumSq = 0L
      var zc = 0L
      var clip = 0L
      var prev = 0
      var i = 0
      while (i < n) {
        val s = (r.payload(i) & 0xff) - 64
        sumSq += s.toLong * s
        if (i > 0 && s * prev < 0) zc += 1
        if (math.abs(s) >= 48) clip += 1
        prev = s
        i += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
      val cf = if (n == 0) 0.0 else clip.toDouble / n
      WaveStats(r.doc_id, n, rms, zc, cf)
    }
  }
}
