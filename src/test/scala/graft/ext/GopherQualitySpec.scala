package graft.ext

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Pins each Gopher/MassiveText document rule's edges on hand-built docs
  * (the `text_gopher_quality` gate checks the same arithmetic hash-exactly
  * against DuckDB over the hostile fixture; here each rule is isolated). */
class GopherQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a doc that passes every default rule (13 words x 6 lines = 78 words)
  private val healthy = (1 to 6).map(i =>
    s"The document line number $i should read well and have that plain shape.")
    .mkString("\n")

  private def metrics(rows: Seq[(Long, String)],
      minWords: Int = 50): Map[Long, Row] =
    TextAnalysis.gopherQuality(rows.toDF("doc_id", "text"), minWords = minWords)
      .collect().map(r => r.getLong(0) -> r).toMap

  private def keep(r: Row): Option[Boolean] =
    if (r.isNullAt(r.fieldIndex("keep"))) None
    else Some(r.getBoolean(r.fieldIndex("keep")))

  test("healthy doc passes; word-count floor and NULL text fail") {
    val out = metrics(Seq(1L -> healthy, 2L -> "Tiny doc.", 3L -> null))
    assert(keep(out(1L)).contains(true), out(1L).toString)
    assert(keep(out(2L)).contains(false)) // 2 words < 50
    assert(out(2L).getInt(out(2L).fieldIndex("n_words")) == 2)
    assert(keep(out(3L)).contains(false)) // NULL metrics, stop_hits 0 decides
    assert(out(3L).isNullAt(out(3L).fieldIndex("n_words")))
  }

  test("mean word length bounds in both directions") {
    val shortWords = (1 to 60).map(_ => "a b c").mkString(" ") // mean 1 < 3
    val longWords = (1 to 60)
      .map(_ => "internationalization electroencephalography").mkString(" ")
    val out = metrics(Seq(1L -> shortWords, 2L -> longWords), minWords = 10)
    assert(keep(out(1L)).contains(false))
    assert(out(1L).getDouble(out(1L).fieldIndex("mean_word_len")) == 1.0)
    assert(keep(out(2L)).contains(false)) // mean 21.5 > 10
  }

  test("symbol-to-word ratios: hash and ellipsis counted separately") {
    val hashy = healthy + "\n# # # # # # # # #" // 9 hashes / 87 words > 0.1
    val dotty = healthy + "\n" + (1 to 12).map(_ => "so...").mkString(" ")
    val out = metrics(Seq(1L -> hashy, 2L -> dotty), minWords = 10)
    assert(keep(out(1L)).contains(false))
    val h = out(1L).getDouble(out(1L).fieldIndex("hash_word_ratio"))
    assert(h > 0.1 && h < 0.12, h.toString)
    assert(keep(out(2L)).contains(false)) // 12 ellipses / 90 words > 0.1
    assert(out(2L).getDouble(out(2L).fieldIndex("ellipsis_word_ratio")) > 0.1)
  }

  test("bullet and ellipsis line fractions over trimmed non-empty lines") {
    val bullets = ((1 to 2).map(i => s"The plain line $i keeps the doc of that sort.") ++
      (1 to 28).map(i => s"• bullet $i")).mkString("\n") // 28/30 > 0.9
    val trailing = (1 to 10).map(i =>
      s"The drifting line $i of that doc just fades away...").mkString("\n")
    val out = metrics(Seq(1L -> bullets, 2L -> trailing), minWords = 10)
    assert(keep(out(1L)).contains(false))
    assert(out(1L).getDouble(out(1L).fieldIndex("bullet_line_frac")) > 0.9)
    assert(keep(out(2L)).contains(false)) // every line ends "..."
    assert(out(2L).getDouble(out(2L).fieldIndex("ellipsis_line_frac")) == 1.0)
  }

  test("alphabetic-word fraction and stopword floor") {
    val numeric = healthy + "\n" + (1 to 25).map(_.toString).mkString(" ")
    val noStops = (1 to 60).map(i => s"zumba$i klaxon$i vortex$i").mkString(" ")
    val out = metrics(Seq(1L -> numeric, 2L -> noStops), minWords = 10)
    assert(keep(out(1L)).contains(false)) // 78 alpha / 103 words < 0.8
    assert(out(1L).getDouble(out(1L).fieldIndex("alpha_word_frac")) < 0.8)
    assert(keep(out(2L)).contains(false))
    assert(out(2L).getInt(out(2L).fieldIndex("stop_hits")) == 0)
    // healthy text hits at least {the, and, have, that}
    val ok = metrics(Seq(3L -> healthy))(3L)
    assert(ok.getInt(ok.fieldIndex("stop_hits")) >= 4)
  }

  test("duplicate-line fraction and duplicate-line character fraction") {
    val dupHeavy = (Seq.fill(6)("This exact line repeats through the doc body.") ++
      Seq("A unique closing line stands apart with that.")).mkString("\n")
    val out = metrics(Seq(1L -> dupHeavy), minWords = 10)(1L)
    assert(keep(out).contains(false))
    // 2 distinct / 7 lines
    assert(math.abs(out.getDouble(out.fieldIndex("dup_line_frac")) - (1.0 - 2.0 / 7)) < 1e-12)
    val f = out.getDouble(out.fieldIndex("dup_line_char_frac"))
    assert(f > 0.8 && f < 1.0, f.toString) // 6 x 45 dup chars / (270 + 45)
    // blank lines are excluded from the denominator
    val blanks = metrics(Seq(2L -> (healthy + "\n\n\n   \n")), minWords = 10)(2L)
    assert(keep(blanks).contains(true))
    assert(blanks.getDouble(blanks.fieldIndex("dup_line_frac")) == 0.0)
  }

  test("thresholds and marker/stopword lists are parameters") {
    val doc = Seq(1L -> healthy)
    val strict = TextAnalysis.gopherQuality(doc.toDF("doc_id", "text"),
      minWords = 100).collect().head
    assert(!strict.getBoolean(strict.fieldIndex("keep"))) // 78 words < 100
    val customStops = TextAnalysis.gopherQuality(doc.toDF("doc_id", "text"),
      minWords = 10, gopherStopwords = Seq("zzzz"), minStopwordHits = 1)
      .collect().head
    assert(!customStops.getBoolean(customStops.fieldIndex("keep")))
    val customBullets = TextAnalysis.gopherQuality(
      Seq(2L -> (1 to 20).map(i => s"> quoted line $i with the usual have that of.")
        .mkString("\n")).toDF("doc_id", "text"),
      minWords = 10, bulletMarkers = Seq(">"), maxBulletLineFrac = 0.5)
      .collect().head
    assert(!customBullets.getBoolean(customBullets.fieldIndex("keep")))
  }
}
