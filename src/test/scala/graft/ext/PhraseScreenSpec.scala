package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PhraseScreenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def screen(docs: Seq[(Long, String)], phrases: Seq[String],
      maxHits: Int = 0) =
    TextAnalysis.phraseScreen(docs.toDF("doc_id", "text"),
        phrases.toDF("phrase"), maxHits = maxHits)
      .as[(Long, Option[Int], Option[Long], Option[Boolean])]
      .collect().toList.sortBy(_._1)

  test("contiguous token runs match; substrings of tokens do not") {
    val out = screen(Seq(
      1L -> "click here to continue reading",   // "click here" hits
      2L -> "one clickhere glued token",        // token substring: no hit
      3L -> "click elsewhere here no run"),     // tokens present, run broken
      Seq("click here"))
    assert(out.map(r => (r._1, r._3.get, r._4.get)) ==
      List((1L, 1L, false), (2L, 0L, true), (3L, 0L, true)))
  }

  test("sliding occurrences overlap; phrase at doc end truncates safely") {
    val out = screen(Seq(
      1L -> "a a a",          // "a a" at pos 0 and 1 -> 2 hits
      2L -> "ends with a"),   // anchor at last token, run exceeds doc: 0
      Seq("a a"))
    assert(out.map(_._3.get) == List(2L, 0L))
  }

  test("case folding and duplicate spellings collapse to one sequence") {
    val one = screen(Seq(1L -> "Stop The Presses now"), Seq("stop the presses"))
    val dup = screen(Seq(1L -> "Stop The Presses now"),
      Seq("stop the presses", "  STOP   the Presses "))
    assert(one.head._3.contains(1L))
    assert(dup.head._3.contains(1L), "a doubled spelling must not double-count")
  }

  test("distinct phrases both count, even sharing an anchor token") {
    val out = screen(Seq(1L -> "the cat and the cat sat"),
      Seq("the cat", "the cat sat"))
    // "the cat" at pos 0 and 3, "the cat sat" at pos 3 -> 3 hits
    assert(out.head._3.contains(3L))
  }

  test("NULL text yields NULL metrics; empty phrase table keeps everything") {
    val out = screen(Seq(1L -> null.asInstanceOf[String], 2L -> "fine text here"),
      Seq("fine text"))
    assert(out(0) == ((1L, None, None, None)))
    val none = screen(Seq(1L -> "anything at all"), Seq("   ", null.asInstanceOf[String]))
    assert(none.head._3.contains(0L) && none.head._4.contains(true))
  }

  test("maxHits is an inclusive budget; negative refused") {
    val docs = Seq(1L -> "spam spam spam")
    assert(screen(docs, Seq("spam"), maxHits = 2).head._4.contains(false)) // 3 hits
    assert(screen(docs, Seq("spam"), maxHits = 3).head._4.contains(true))
    assertThrows[IllegalArgumentException](screen(docs, Seq("spam"), maxHits = -1))
  }
}
