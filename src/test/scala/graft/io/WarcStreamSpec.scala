package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Pins the WET framer's O(record) memory contract (no SparkSession —
  * pure framer, so the suite also runs under a deliberately tiny heap:
  * `SPARK_DRIVER_MEM=512m sbt "testOnly graft.io.WarcStreamSpec"` passes,
  * which a whole-file design could not survive). */
class WarcStreamSpec extends AnyFunSuite {

  /** Lazily generates `n` WET records of `bodyBytes` ASCII bytes each as
    * one continuous stream — nothing larger than a single record ever
    * exists in memory. */
  private def syntheticWet(n: Int, bodyBytes: Int): java.io.InputStream = {
    val body = Array.fill[Byte](bodyBytes)('x')
    val e = new java.util.Enumeration[java.io.InputStream] {
      private var i = 0
      def hasMoreElements: Boolean = i < n
      def nextElement(): java.io.InputStream = {
        val hdr = (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
          s"WARC-Target-URI: urn:synth:$i\r\nContent-Length: $bodyBytes\r\n\r\n")
          .getBytes("UTF-8")
        i += 1
        new java.io.SequenceInputStream(
          new java.io.ByteArrayInputStream(hdr),
          new java.io.SequenceInputStream(
            new java.io.ByteArrayInputStream(body),
            new java.io.ByteArrayInputStream("\r\n\r\n".getBytes("UTF-8"))))
      }
    }
    new java.io.SequenceInputStream(e)
  }

  test("framer memory is O(record): a >2 GiB stream parses incrementally") {
    // 560 records x 4 MiB = 2.19 GiB of content — beyond the JVM array
    // limit, so the old whole-file design (readAllBytes -> Array[Byte])
    // cannot even REPRESENT this stream, heap size aside. The incremental
    // framer holds one 4 MiB record at a time.
    val n = 560
    val bodyBytes = 4 << 20
    var count = 0
    var lastUri: String = null
    Warc.parseWetInputStream("synthetic", syntheticWet(n, bodyBytes)).foreach { r =>
      require(r.text.length == bodyBytes, s"record $count framed ${r.text.length} chars")
      lastUri = r.uri
      count += 1
    }
    assert(count == n)
    assert(lastUri == s"urn:synth:${n - 1}")
  }

  test("mixed header-terminator dialects frame correctly (line-aware blank detection)") {
    // one stream, four records, four different blank-line spellings:
    // CRLF+CRLF, LF+LF, LF+CRLF (the old rolling-window miss), CRLF+LF
    def rec(i: Int, lineEnd: String, blank: String): String =
      s"WARC/1.0${lineEnd}WARC-Target-URI: urn:mix:$i${lineEnd}" +
        s"Content-Length: 5$lineEnd$blank" + s"body$i" + "\r\n\r\n"
    val s = rec(0, "\r\n", "\r\n") + rec(1, "\n", "\n") +
      rec(2, "\n", "\r\n") + rec(3, "\r\n", "\n")
    val got = Warc.parseWetInputStream("synthetic:mixed",
      new java.io.ByteArrayInputStream(s.getBytes("UTF-8"))).toList
    assert(got.map(_.uri) == (0 to 3).map(i => s"urn:mix:$i").toList)
    assert(got.map(_.text) == (0 to 3).map(i => s"body$i").toList)
  }

  test("framer failures are loud with inflated-byte offsets; stream is closed") {
    // truncated mid-content: Content-Length overrun with path:offset
    val good = "WARC/1.0\r\nWARC-Target-URI: u:1\r\nContent-Length: 10\r\n\r\nshort"
    val e = intercept[IllegalArgumentException](
      Warc.parseWetStream("t", good.getBytes("UTF-8")).toSeq)
    assert(e.getMessage.contains("overruns the stream"), e.getMessage)
    assert(e.getMessage.contains("t:"), e.getMessage)
    // a header that never terminates must fail at the bound, not buffer
    // the rest of the stream hunting for a blank line
    val endless = new java.io.InputStream { def read(): Int = 'A' }
    val e2 = intercept[IllegalArgumentException](
      Warc.parseWetInputStream("t", endless).next())
    assert(e2.getMessage.contains("exceeds"), e2.getMessage)
    // exhaustion closes the underlying stream exactly once
    var closes = 0
    val tracked = new java.io.ByteArrayInputStream(
      ("WARC/1.0\r\nWARC-Target-URI: u:2\r\nContent-Length: 2\r\n\r\nok\r\n\r\n")
        .getBytes("UTF-8")) {
      override def close(): Unit = { closes += 1; super.close() }
    }
    val it = Warc.parseWetInputStream("t", tracked)
    assert(it.next().text == "ok")
    assert(!it.hasNext)
    assert(closes == 1)
  }
}
