package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class C4CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clean(rows: Seq[(Long, String)], minWords: Int = 3, minLines: Int = 1) =
    TextAnalysis.c4Clean(rows.toDF("doc_id", "text"),
        minWordsPerLine = minWords, minLinesPerDoc = minLines)
      .as[(Long, String, Int)].collect().toList.sortBy(_._1)

  test("line rules: terminal punctuation, word floor, javascript, trim") {
    val doc = Seq(1L -> List(
      "This line survives every rule.",      // kept
      "Ends with a bang!",                   // kept (!)
      "A quoted ending counts too.\"",       // kept (")
      "no terminal punctuation",             // dropped: no terminal mark
      "Too short.",                          // dropped: 2 words < 3
      "Enable JavaScript to continue here.", // dropped: javascript (case-insensitive)
      "   Trimmed line still ends fine.   ", // kept, trimmed
      "").mkString("\n"))
    val out = clean(doc)
    assert(out == List((1L,
      List("This line survives every rule.", "Ends with a bang!",
        "A quoted ending counts too.\"", "Trimmed line still ends fine.")
        .mkString("\n"), 4)))
  }

  test("document rules: lorem ipsum, brace, min surviving lines, null text") {
    val rows = Seq(
      10L -> "Keep this sentence around today.\nAnd keep this one as well.",
      11L -> "Lorem ipsum dolor sit amet.\nAnd keep this one as well.",  // doc dropped
      12L -> "function f() { return 1; }\nAnd keep this one as well.",   // doc dropped: brace
      13L -> "Only one line survives here.\ntoo short",                  // < 2 kept lines
      14L -> null.asInstanceOf[String])                                  // null text dropped
    val out = clean(rows, minLines = 2)
    assert(out.map(_._1) == List(10L))
    assert(out.head._3 == 2)
  }

  test("custom policy: marks, word floor and substring lists are parameters") {
    val rows = Seq(1L -> "short one;\nlonger line ends here;\nbad cookie line ends here;")
    val out = clean(rows) // default policy: ';' not terminal -> everything dies
    assert(out.isEmpty)
    val custom = TextAnalysis.c4Clean(rows.toDF("doc_id", "text"),
        minWordsPerLine = 2, minLinesPerDoc = 1, terminalPunct = Seq(";"),
        dropLineSubstrings = Seq("cookie"), dropDocSubstrings = Nil)
      .as[(Long, String, Int)].collect().toList
    assert(custom == List((1L, "short one;\nlonger line ends here;", 2)))
  }
}
