package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (SURVEY.md §2.12): image/audio/video payloads
 * travel as opaque `binary` columns alongside a typed metadata struct; the
 * decode / feature-extraction step runs partition-wise over batches so any
 * codec drops in without touching the distributed plan.
 *
 * Two decoders ship: [[decodeReal]] — a REAL codec over the JDK's built-in
 * readers (`javax.imageio` for PNG/JPEG/BMP/GIF, `javax.sound.sampled` for
 * WAV/PCM; java.desktop, no external library) — and [[decodeFake]], a
 * deterministic byte-derived stand-in the DuckDB-gated queries use (an
 * oracle cannot decode a PNG; the real codec is spec-verified against
 * payloads encoded in-test by the same JDK).
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  final case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)

  final case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(id: Long, nBytes: Long, checksum: Long, headByte: Int,
      frameCount: Int)

  /** REAL decode over the JDK's own codecs — dispatched on `meta.mime`:
    *
    *  - image mimes → `javax.imageio.ImageIO` (PNG, JPEG, BMP, GIF readers
    *    ship with the JDK): `frameCount` = 1, `headByte` = the blue channel
    *    of the top-left pixel (a DECODED-pixel fact no byte heuristic can
    *    fake — it survives any lossless re-encode of the same image);
    *  - audio mimes → `javax.sound.sampled.AudioSystem` (WAV/PCM, AIFF, AU):
    *    `frameCount` = PCM sample frames, `headByte` = first payload byte.
    *
    * Undecodable payloads fail loudly — silent fallback to the fake would
    * report byte noise as media features. `checksum`/`nBytes` stay
    * raw-payload facts in both decoders, so fake-vs-real differ only where
    * decoding genuinely adds information. Headless-safe (no AWT display). */
  def decodeReal(id: Long, payload: Array[Byte], meta: MediaMeta): MediaFeatures = {
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    val mime = Option(meta.mime).getOrElse("").toLowerCase
    if (mime.startsWith("image/")) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"decodeReal: no JDK reader decoded this '$mime' payload")
      MediaFeatures(id, payload.length.toLong, crc.getValue,
        headByte = img.getRGB(0, 0) & 0xFF, frameCount = 1)
    } else if (mime.startsWith("audio/")) {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try MediaFeatures(id, payload.length.toLong, crc.getValue,
        headByte = if (payload.isEmpty) -1 else payload(0) & 0xFF,
        frameCount = math.min(in.getFrameLength, Int.MaxValue.toLong).toInt)
      finally in.close()
    } else throw new IllegalArgumentException(
      s"decodeReal: no codec for mime '${meta.mime}' (JDK readers cover image/* and audio/*)")
  }

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
    * decode many). Distributed: no shuffle, runs where the bytes are.
    * `decoder` defaults to [[decodeFake]] (the oracle-gated path over
    * synthetic payloads); pass `decodeReal` for actual media. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      decoder: (Long, Array[Byte], MediaMeta) => MediaFeatures = decodeFake)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // codec contexts (ImageIO reader instances etc.) initialize here,
      // once per partition, in a real high-volume deployment
      rows.map(r => decoder(r.id, r.payload, r.meta))
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
