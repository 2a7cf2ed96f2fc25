package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WET (WARC extracted-text) ingest — the Common Crawl interchange format
 * every large-scale text pipeline starts from (ISO 28500 WARC framing,
 * `WARC-Type: conversion` records carrying plain text; cf. the public
 * C4/CCNet/RefinedWeb pipelines, all of which open with a WET parse).
 *
 * Parsing is BYTE-exact: each record's text is cut by its
 * `Content-Length` header counted in BYTES of the UTF-8 stream — a
 * string-level split would corrupt any record whose text contains
 * multi-byte characters or blank lines (a blank line inside the content
 * is indistinguishable from the header terminator to a line-based
 * parser). That byte-level framing has no Catalyst expression, so the
 * parse runs partition-wise over `binaryFile` rows (one task per `.gz`
 * member — gzip is non-splittable regardless, so per-file parallelism is
 * already the ceiling; the standard Common Crawl layout is tens of
 * thousands of ~150 MB WET files, which spreads perfectly). Same
 * justification as [[graft.ext.Multimodal.decodeReal]]'s JDK codecs.
 *
 * Scale shape: no shuffle — read, inflate, frame, emit. Malformed
 * records fail LOUDLY with the file path and byte offset (a silently
 * skipped record is a corpus-count bug found months later).
 */
object Warc {

  /** One parsed WET conversion record. `lang` carries
    * `WARC-Identified-Content-Language` when present (the real WET header
    * for it), null otherwise. */
  final case class WetRecord(uri: String, date: String, lang: String, text: String)

  private val Gz = ".gz"

  /**
   * Parse a directory of WET files (gzipped or plain) into
   * `(uri, date, lang, text)` rows.
   */
  def readWet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    parsePartitions(
      spark.read.format("binaryFile").load(dir)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])])
      .toDF("uri", "date", "lang", "text")
  }

  /** The shared inflate+frame step over `(path, rawBytes)` rows — one task
    * per file; also legal on a STREAMING Dataset (typed map, no shuffle),
    * which [[graft.streaming.IngestStream.readWetDocs]] uses. */
  def parsePartitions(files: Dataset[(String, Array[Byte])]): Dataset[WetRecord] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.flatMap { case (path, raw) =>
      val bytes =
        if (path.endsWith(Gz)) {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(raw))
          try in.readAllBytes() finally in.close()
        } else raw
      parseWetStream(path, bytes)
    })
  }

  /** Frame one inflated WET stream into records (exposed for specs). */
  private[io] def parseWetStream(path: String, bytes: Array[Byte]): Iterator[WetRecord] =
    new Iterator[WetRecord] {
      private var pos = 0
      private def fail(msg: String) =
        throw new IllegalArgumentException(s"WET parse: $msg at $path:$pos")
      private def skipBlank(): Unit =
        while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      skipBlank()
      def hasNext: Boolean = pos < bytes.length
      def next(): WetRecord = {
        // header block: everything up to the first blank line, ASCII by spec
        val hdrEnd = indexOfBlankLine(bytes, pos)
        if (hdrEnd < 0) fail("record header without blank-line terminator")
        val header = new String(bytes, pos, hdrEnd - pos, "UTF-8")
        val lines = header.split("\r\n|\n")
        if (!lines.headOption.exists(_.startsWith("WARC/"))) fail(
          s"expected WARC/<version> record start, got '${lines.headOption.getOrElse("")}'")
        val hs = lines.tail.flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
        }.toMap
        val len = hs.getOrElse("content-length", fail("missing Content-Length")).toLong
        // content starts after the blank line; cut EXACTLY len bytes
        val contentStart = afterBlankLine(bytes, hdrEnd)
        if (contentStart + len > bytes.length) fail(
          s"Content-Length $len overruns the stream (${bytes.length - contentStart} left)")
        val text = new String(bytes, contentStart, len.toInt, "UTF-8")
        pos = contentStart + len.toInt
        skipBlank() // the inter-record blank lines (2 CRLFs by spec, tolerant)
        WetRecord(
          hs.getOrElse("warc-target-uri", null),
          hs.getOrElse("warc-date", null),
          hs.getOrElse("warc-identified-content-language", null),
          text)
      }
    }

  /** Byte index of the first CRLFCRLF or LFLF header terminator at/after
    * `from`, or −1. Returns the index where the terminator STARTS. */
  private def indexOfBlankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length - 1) {
      if (b(i) == '\n' && b(i + 1) == '\n') return i
      if (i < b.length - 3 && b(i) == '\r' && b(i + 1) == '\n' &&
        b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def afterBlankLine(b: Array[Byte], at: Int): Int =
    if (b(at) == '\r') at + 4 else at + 2

  /**
   * Encode `(uri, date, lang, text)` rows as standard WET conversion
   * records — the round-trip half the gate uses, and a usable delivery
   * format for WET-consuming downstream pipelines. One record string per
   * row (Content-Length in UTF-8 BYTES, computed codegen'd via
   * `octet_length`); the text writer's row separator supplies the final
   * newline of the two blank lines between records. Task-local file
   * rolling like every exporter here.
   */
  def writeWet(df: DataFrame, dir: String, uriCol: String, dateCol: String,
      langCol: String, textCol: String, maxRecordsPerShard: Int,
      compression: Option[String] = Some("gzip")): Unit = {
    require(maxRecordsPerShard > 0, s"maxRecordsPerShard must be positive: $maxRecordsPerShard")
    val crlf = lit("\r\n")
    val rec = concat(
      lit("WARC/1.0"), crlf,
      lit("WARC-Type: conversion"), crlf,
      lit("WARC-Target-URI: "), col(uriCol), crlf,
      lit("WARC-Date: "), col(dateCol), crlf,
      when(col(langCol).isNotNull,
        concat(lit("WARC-Identified-Content-Language: "), col(langCol), crlf))
        .otherwise(lit("")),
      lit("Content-Type: text/plain"), crlf,
      lit("Content-Length: "), octet_length(col(textCol)).cast("string"), crlf,
      crlf,
      col(textCol), crlf)
    val w = df.select(rec.as("value")).write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerShard.toLong.toString)
    compression.fold(w)(c => w.option("compression", c)).text(dir)
  }
}
