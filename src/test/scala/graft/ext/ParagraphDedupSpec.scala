package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ParagraphDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Dedup.dedupParagraphsGlobal(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Int, Int)].collect().toList.sortBy(_._1)

  test("first occurrence survives corpus-wide; later docs lose the line") {
    val boiler = "Subscribe to our newsletter."
    val out = run(Seq(
      1L -> s"$boiler\nUnique alpha text here.",
      2L -> s"$boiler\nUnique beta text here.",
      3L -> s"Unique gamma text here.\n$boiler"))
    assert(out == List(
      (1L, s"$boiler\nUnique alpha text here.", 2, 2),
      (2L, "Unique beta text here.", 1, 2),
      (3L, "Unique gamma text here.", 1, 2)))
  }

  test("within-doc repeats keep only the first occurrence") {
    val out = run(Seq(1L -> "Echo line here.\nMiddle text stays.\nEcho line here."))
    assert(out == List((1L, "Echo line here.\nMiddle text stays.", 2, 3)))
  }

  test("digit folding: template lines with different numbers collapse") {
    val out = run(Seq(
      1L -> "Version 123 of the spec.",
      2L -> "Version 456 of the spec.",
      3L -> "Version 123a of the spec."))  // different after folding: '000a'
    assert(out == List(
      (1L, "Version 123 of the spec.", 1, 1),
      (3L, "Version 123a of the spec.", 1, 1)))
  }

  test("case folding: differently-cased copies collapse") {
    val out = run(Seq(1L -> "SHARED FOOTER LINE.", 2L -> "shared footer line."))
    assert(out == List((1L, "SHARED FOOTER LINE.", 1, 1)))
  }

  test("emptied docs vanish; NULL text and blank lines never surface") {
    val out = run(Seq(
      1L -> "Only content line.",
      2L -> "Only content line.",             // fully duplicated -> vanishes
      3L -> null.asInstanceOf[String],        // NULL -> vanishes
      4L -> "   \n\n  ",                      // all blank -> vanishes
      5L -> "Only content line.\nBut this one survives. "))
    assert(out == List(
      (1L, "Only content line.", 1, 1),
      (5L, "But this one survives.", 1, 2)))
  }

  test("winner is (doc, pos)-minimal: earlier position in the same doc wins") {
    // same normalized line twice in doc 1 (pos 0 and 2) and once in doc 0
    // (pos 1): doc 0 wins (lower id); both doc-1 copies drop
    val out = run(Seq(
      0L -> "Leading unique line stays.\nContended line here.",
      1L -> "Contended line here.\nMiddle unique line stays.\nContended line here."))
    assert(out == List(
      (0L, "Leading unique line stays.\nContended line here.", 2, 2),
      (1L, "Middle unique line stays.", 1, 3)))
  }

  test("output column name collision is impossible by construction") {
    // the output frame is built by select, not join-onto-caller — a caller
    // column named clean_text never collides because only (id, text) feed in
    val out = Dedup.dedupParagraphsGlobal(
      Seq((1L, "Some line of text here.", "x")).toDF("doc_id", "text", "clean_text"),
      "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "clean_text", "n_paras_kept", "n_paras_total"))
  }
}
