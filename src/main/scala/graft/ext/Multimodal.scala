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
      try {
        // AudioSystem.NOT_SPECIFIED (-1) must not flow into frameCount as a
        // fake fact — fail loudly like every other undecodable payload
        require(in.getFrameLength >= 0,
          s"decodeReal: '$mime' stream reports no frame length (NOT_SPECIFIED)")
        MediaFeatures(id, payload.length.toLong, crc.getValue,
          headByte = if (payload.isEmpty) -1 else payload(0) & 0xFF,
          frameCount = math.min(in.getFrameLength, Int.MaxValue.toLong).toInt)
      } finally in.close()
    } else throw new IllegalArgumentException(
      s"decodeReal: no codec for mime '${meta.mime}' (JDK readers cover image/* and audio/*)")
  }

  /** Decoded geometry of one media payload — the facts only a REAL decode
    * can produce (an image's pixel grid, an audio stream's PCM frame count).
    * Zero-valued fields are the other modality's. */
  final case class MediaDecoded(id: Long, width: Int, height: Int, nPixels: Long,
      pcmFrames: Long)

  /** REAL decode to geometry, same JDK codec dispatch as [[decodeReal]]:
    * image mimes report the decoded pixel grid (`width`/`height`/`nPixels`),
    * audio mimes the PCM `pcmFrames` (NOT_SPECIFIED fails loudly).
    * Undecodable payloads throw — never byte-derived stand-in values. */
  def decodeInfo(id: Long, payload: Array[Byte], meta: MediaMeta): MediaDecoded = {
    val mime = Option(meta.mime).getOrElse("").toLowerCase
    if (mime.startsWith("image/")) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"decodeInfo: no JDK reader decoded this '$mime' payload")
      MediaDecoded(id, img.getWidth, img.getHeight, img.getWidth.toLong * img.getHeight, 0L)
    } else if (mime.startsWith("audio/")) {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        require(in.getFrameLength >= 0,
          s"decodeInfo: '$mime' stream reports no frame length (NOT_SPECIFIED)")
        MediaDecoded(id, 0, 0, 0L, in.getFrameLength)
      } finally in.close()
    } else throw new IllegalArgumentException(
      s"decodeInfo: no codec for mime '${meta.mime}' (JDK readers cover image/* and audio/*)")
  }

  /** Deterministic JDK-ENCODED media for the real-codec gate: a PNG whose
    * pixel grid is a pure function of `id` (width = id%5+3, height =
    * id%4+2, pixels hashed from (id,x,y)). Encoded by `ImageIO` itself, so
    * decoding it exercises a genuine PNG round-trip. */
  def encodePngDeterministic(id: Long): Array[Byte] = {
    val w = (id % 5 + 3).toInt
    val h = (id % 4 + 2).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((id * 2654435761L + x * 131 + y * 31) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic JDK-ENCODED media for the real-codec gate: an 8-bit
    * mono PCM WAV with exactly `id*10 + 50` sample frames, encoded by
    * `AudioSystem` itself. */
  def encodeWavDeterministic(id: Long): Array[Byte] = {
    val frames = (id * 10 + 50).toInt
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val data = Array.tabulate[Byte](frames)(i => ((id * 31 + i) & 0xFF).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    finally ais.close()
    out.toByteArray
  }

  /** Real-codec round trip, driver-gatable: for each input `id`, ENCODE a
    * deterministic payload with the JDK (even ids → PNG, odd ids → WAV),
    * then DECODE it with [[decodeInfo]] and emit the decoded geometry.
    * Because the grid/frame arithmetic is a pure function of `id`, a plain
    * SQL oracle can state the expected decoded facts — the row only
    * matches if the real codec actually decoded the payload. Runs
    * partition-wise (encoder+decoder contexts per partition, no shuffle,
    * no driver round-trip), so the same plan ships a billion payloads. */
  def decodeRealRoundTrip(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (payload, meta) =
          if (id % 2 == 0) (encodePngDeterministic(id), MediaMeta("image/png", 0, 0, 0L))
          else (encodeWavDeterministic(id), MediaMeta("audio/wav", 0, 0, 0L))
        decodeInfo(id, payload, meta)
      }
    }.toDF().select(col("id"), col("width"), col("height"),
      col("nPixels").as("n_pixels"), col("pcmFrames").as("pcm_frames"))
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

  /**
   * 64-bit perceptual average-hash (aHash, the pHash-family baseline) of
   * one REAL decoded image: sample an 8×8 grid of pixels at
   * `(⌊cx·w/8⌋, ⌊cy·h/8⌋)`, integer ITU-R 601 luminance per sample
   * (`(299r + 587g + 114b) / 1000`), threshold each sample against the
   * integer mean of the 64 (`≥ mean` ⇒ bit set, row-major bit order) —
   * every step integer arithmetic, so the hash is bit-deterministic on
   * any JVM. Visually near-identical images (recompressions, small
   * edits off the sample grid) land within a few hamming bits, which is
   * what [[graft.ext.Dedup.hammingPairs]] pairs on — the image analog of
   * the SimHash text family. Undecodable payloads throw, never a
   * byte-derived stand-in. */
  def averageHash64(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "averageHash64: no JDK reader decoded this image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val lum = new Array[Int](64)
    var i = 0
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val rgb = img.getRGB(cx * w / 8, cy * h / 8)
        lum(i) = ((rgb >> 16 & 0xFF) * 299 + (rgb >> 8 & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
        i += 1
        cx += 1
      }
      cy += 1
    }
    val mean = lum.sum / 64
    var hash = 0L
    var j = 0
    while (j < 64) { if (lum(j) >= mean) hash |= (1L << j); j += 1 }
    hash
  }

  /** Deterministic JDK-encoded PNG, LARGE variant (w = 16+id%8,
    * h = 16+id%4) for the perceptual-hash gate: at w,h ≥ 16 the aHash
    * sample grid `⌊c·dim/8⌋` only touches coordinates ≥ 2 (besides 0), so
    * pixel (1,1) is provably OFF-grid — `perturb` flips it, producing a
    * visually-near-identical twin whose aHash is bit-identical. */
  def encodePngDeterministicLarge(id: Long, perturb: Boolean): Array[Byte] = {
    val w = (16 + id % 8).toInt
    val h = (16 + id % 4).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((id * 2654435761L + x * 131 + y * 31) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    if (perturb) img.setRGB(1, 1, img.getRGB(1, 1) ^ 0x7F7F7F)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Perceptual near-dup contract, driver-gatable like
    * [[decodeRealRoundTrip]]: for each input `id`, ENCODE a deterministic
    * large PNG and an off-grid-perturbed twin (id → `−id−1`), hash both
    * through the REAL decode ([[imageHashes]]), pair with
    * [[graft.ext.Dedup.hammingPairs]] — and emit every PLANTED twin pair
    * the pairing missed. The oracle is the empty set: a row appears only
    * if the codec, the hash, or the banded pair search dropped a
    * near-identical image pair. */
  def imageNearDupRoundTrip(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    val media = ids.select(col("id").cast("long")).as[Long].flatMap { id =>
      Seq((id, encodePngDeterministicLarge(id, perturb = false)),
        (-id - 1, encodePngDeterministicLarge(id, perturb = true)))
    }.toDF("id", "payload")
    val pairs = graft.ext.Dedup.hammingPairs(imageHashes(spark, media), "id", "ahash", 3)
    val expected = ids.select((-col("id").cast("long") - 1).as("doc_a"),
      col("id").cast("long").as("doc_b"))
    expected.join(pairs.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_anti")
  }

  /** Perceptual hashes for a frame of `(id, payload)` image rows —
    * partition-wise like [[extractFeatures]] (ImageIO context per
    * partition, no shuffle, bytes never leave their executor). Output
    * `(idCol, ahash)`; feed to [[graft.ext.Dedup.hammingPairs]] for
    * near-dup pair search with exact recall at hamming ≤ 3. */
  def imageHashes(spark: SparkSession, media: DataFrame, idCol: String = "id",
      payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, payload) => (id, averageHash64(payload)) })
      .toDF(idCol, "ahash")
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
