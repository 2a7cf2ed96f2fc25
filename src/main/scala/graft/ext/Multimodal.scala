package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (SURVEY.md §2.12): image/audio/video payloads
 * travel as opaque `binary` columns alongside a typed metadata struct; the
 * decode / feature-extraction step runs partition-wise over batches so a
 * real codec drops in without touching the distributed plan.
 *
 * The actual codec is STUBBED (`decodeReal`) — no image/audio libraries
 * exist in this container — but everything around it is real and tested:
 * the schema, the partition-wise batched execution shape, and a
 * deterministic fake decode used by tests and the verification queries.
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  final case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)

  final case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(id: Long, nBytes: Long, checksum: Long, headByte: Int,
      frameCount: Int)

  /** REAL decode — requires a codec library (not present in this
    * environment). Swap this in for [[decodeFake]] in production. */
  def decodeReal(payload: Array[Byte], meta: MediaMeta): MediaFeatures = ???

  /** Deterministic fake decode: derives features from the raw bytes only.
    * Same signature and cost shape as a real codec call. */
  def decodeFake(id: Long, payload: Array[Byte], meta: MediaMeta): MediaFeatures = {
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    MediaFeatures(
      id = id,
      nBytes = payload.length.toLong,
      checksum = crc.getValue,
      headByte = if (payload.isEmpty) -1 else payload(0) & 0xFF,
      frameCount = (payload.length / math.max(1, meta.width * meta.height)).toInt)
  }

  /** Attach a synthetic binary payload + metadata to the `documents` fixture
    * (the container ships no real media): payload = UTF-8 bytes of `text`,
    * metadata derived deterministically from `doc_id`. Exercises the binary
    * column path end-to-end. */
  def withSyntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        (col("doc_id") * 40L).as("durationMs")).as("meta"))

  /** Partition-wise feature extraction: one codec context per partition, rows
    * streamed through it (the batch shape a real decoder needs — open once,
    * decode many). Distributed: no shuffle, runs where the bytes are. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real impl: initialize codec context here, once per partition
      rows.map(r => decodeFake(r.id, r.payload, r.meta))
    }
  }

  /** Fake resize: uniform byte striding down to at most `targetW×targetH`
    * bytes (byte 0 always survives — `(0·stride)=0`); payloads already
    * within budget pass through untouched. Deterministic, codec-free; a
    * real scaler slots in with the same signature. */
  def resizeFake(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    // Long budget: two individually-valid dims (65536×65536) overflow an Int
    // product to negative, which would flip the pass-through test and then
    // throw NegativeArraySizeException at task time. Past the compare,
    // target < payload.length <= Int.MaxValue, so the narrowing is safe.
    val target = (targetW.toLong * targetH).min(Int.MaxValue.toLong).toInt
    if (payload.length <= target) payload
    else {
      val out = new Array[Byte](target)
      val stride = payload.length.toDouble / target
      var i = 0
      while (i < target) { out(i) = payload((i * stride).toInt); i += 1 }
      out
    }
  }

  /** Resize stage: partition-wise like [[extractFeatures]] (one codec/scaler
    * context per partition, rows streamed through), payload re-sampled to
    * the target dims and the metadata struct updated. No shuffle; runs
    * where the bytes are. */
  def resize(spark: SparkSession, media: DataFrame, targetW: Int, targetH: Int)
      : Dataset[MediaRow] = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive: ${targetW}x$targetH")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real impl: initialize the scaler context here, once per partition
      rows.map(r => r.copy(
        payload = resizeFake(r.payload, targetW, targetH),
        meta = r.meta.copy(width = targetW, height = targetH)))
    }
  }

  /** Frame sampling plumbing: every `stride`-th fixed-size window of the
    * payload bytes stands in for a decoded frame (`frame_idx`, `frame`).
    * With a real codec the slice becomes a decoded frame buffer; the
    * explode/partitioning shape is identical. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col("payload")) / lit(frameBytes * stride)).cast("int")
    media.select(col("id"), col("payload"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))).as("frame_idx"))
      .select(col("id"), col("frame_idx"),
        substring(col("payload"), (col("frame_idx") * frameBytes * stride + 1).cast("int"), lit(frameBytes))
          .as("frame"))
  }
}
