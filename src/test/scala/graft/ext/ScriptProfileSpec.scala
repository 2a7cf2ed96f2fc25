package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[TextAnalysis.scriptProfile]]: exact class counts on hand-built
  * strings, the homoglyph mixed-script catch, alphabetical dominance
  * tiebreak, purity math, and the NULL/no-letter edges. */
class ScriptProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def profile(rows: (Long, String)*): Map[Long, Map[String, Any]] = {
    val df = TextAnalysis.scriptProfile(rows.toDF("doc_id", "text"))
    val names = df.columns
    df.collect().map(r => r.getLong(0) ->
      names.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap).toMap
  }

  test("exact class counts, dominance, and purity on a mixed doc") {
    // "pаypаl 42." = 4 latin (p,y,p,l) + 2 cyrillic а (U+0430) + 2 digits
    // + space + dot
    val m = profile(1L -> "pаypаl 42.")(1L)
    assert(m("n_chars") == 10)
    assert(m("latin") == 4)
    assert(m("cyrillic") == 2)
    assert(m("digit") == 2)
    assert(m("other") == 2) // the space and the dot
    assert(m("n_scripts") == 2L)
    assert(m("dominant_script") == "latin")
    assert(m("script_purity") == 0.666667) // round(4/6, 6)
  }

  test("pure CJK doc: single script, purity 1") {
    val m = profile(2L -> "数据处理")(2L)
    assert(m("cjk") == 4 && m("n_scripts") == 1L)
    assert(m("dominant_script") == "cjk" && m("script_purity") == 1.0)
  }

  test("dominance ties break alphabetically") {
    // 2 cyrillic vs 2 greek vs 2 latin — 'cyrillic' < 'greek' < 'latin'
    val m = profile(3L -> "аб αβ ab")(3L)
    assert(m("dominant_script") == "cyrillic")
    assert(m("n_scripts") == 3L)
  }

  test("no letters at all: NULL dominance and purity, counts still exact") {
    val m = profile(4L -> "123 !?")(4L)
    assert(m("digit") == 3 && m("other") == 3)
    assert(m("n_scripts") == 0L)
    assert(m("dominant_script") == null && m("script_purity") == null)
  }

  test("NULL text rows are excluded; empty text profiles as all-zero") {
    val out = profile(5L -> null, 6L -> "")
    assert(!out.contains(5L))
    val m = out(6L)
    assert(m("n_chars") == 0 && m("dominant_script") == null)
  }
}
