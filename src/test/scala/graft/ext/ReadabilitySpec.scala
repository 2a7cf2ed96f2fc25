package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ReadabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(rows: Seq[(Long, String)]) =
    TextAnalysis.readability(rows.toDF("doc_id", "text"))
      .as[(Long, Option[Int], Option[Int], Option[Int], Option[Double], Option[Double])]
      .collect().toList.sortBy(_._1)

  test("hand-computed Flesch/FK on a known sentence pair") {
    // 5 words, 2 sentences, 5 syllables (all monosyllabic)
    val out = score(Seq(1L -> "The cat sat. It ran!")).head
    assert(out._2.contains(5) && out._3.contains(2) && out._4.contains(5))
    assert(out._5.contains(119.6975)) // 206.835 - 1.015*2.5 - 84.6*1
    assert(out._6.contains(-2.815))   // 0.39*2.5 + 11.8*1 - 15.59
  }

  test("syllable floor: y counts as a vowel, vowel-free words floor at 1") {
    val out = score(Seq(1L -> "rhythm tsktsk")).head
    assert(out._4.contains(2), "rhythm (y) = 1, tsktsk floors at 1")
  }

  test("separator runs count once; fragments floor at one sentence") {
    val bang = score(Seq(1L -> "Wow!! Really?!")).head
    assert(bang._3.contains(2), "!! and ?! are one separator each")
    val frag = score(Seq(1L -> "no terminal punctuation here")).head
    assert(frag._3.contains(1))
  }

  test("NULL text yields NULL metrics") {
    assert(score(Seq(1L -> null.asInstanceOf[String])).head ==
      ((1L, None, None, None, None, None)))
  }

  test("polysyllabic words raise the grade") {
    val simple = score(Seq(1L -> "The dog ran fast.")).head._6.get
    val complex = score(Seq(1L -> "Unquestionably extraordinary circumlocution materialized.")).head._6.get
    assert(complex > simple)
  }
}
