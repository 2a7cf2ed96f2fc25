package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[TextAnalysis.keywordsPerDoc]]: hand-computed TF-IDF ranks, the
  * rounded-score token tiebreak, the k cut, and bounds. */
class KeywordsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian")).toDF("doc_id", "text")

  test("hand-computed ranks, with ties broken by token") {
    val out = TextAnalysis.keywordsPerDoc(docs, k = 3)
      .as[(Long, Int, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // doc 1: apple tf=2 df=1 -> 2·ln3 ≈ 2.197225; banana tf=1 df=2 -> ln1.5
    assert(out((1L, 1))._1 == "apple")
    assert(out((1L, 1))._4 == BigDecimal(2 * math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out((1L, 2))._1 == "banana")
    // doc 2: banana and cherry tie at ln1.5 -> token asc breaks it
    assert(out((2L, 1))._1 == "banana" && out((2L, 2))._1 == "cherry")
    assert(out((2L, 1))._4 == out((2L, 2))._4)
    // doc 3: cherry 3·ln1.5 ≈ 1.216395 beats durian ln3 ≈ 1.098612
    assert(out((3L, 1))._1 == "cherry" && out((3L, 2))._1 == "durian")
    // the k cut: no rank above 3 anywhere, doc 2 has exactly 2 terms
    assert(out.keys.forall(_._2 <= 3))
    assert(!out.contains((2L, 3)))
  }

  test("k = 1 keeps only each doc's best term; bounds enforced") {
    val top = TextAnalysis.keywordsPerDoc(docs, k = 1)
      .as[(Long, Int, String, Long, Long, Double)].collect()
    assert(top.length == 3 && top.forall(_._2 == 1))
    intercept[IllegalArgumentException] {
      TextAnalysis.keywordsPerDoc(docs, k = 0)
    }
  }
}
