package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[TextAnalysis.knBigramSurprisal]] against hand-computed
  * interpolated Kneser–Ney probabilities on a reference small enough to
  * enumerate every count by eye. */
class KneserNeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // reference "a b a b c": bigrams (a,b)×2, (b,a), (b,c)
  //   c(a·)=2  N1+(a·)=1 ; c(b·)=2  N1+(b·)=2
  //   N1+(·a)=1  N1+(·b)=1  N1+(·c)=1 ; B=3 bigram types, V=3 vocab
  //   Pc(x) = (N1+(·x)+1)/(B+V) = 2/6 seen, 1/6 unseen
  private val reference = Seq((0L, "a b a b c"))
  private def score(docText: String, discount: Double = 0.75) =
    TextAnalysis.knBigramSurprisal(
        Seq((1L, docText)).toDF("doc_id", "text"),
        reference.toDF("doc_id", "text"), "doc_id", "text", discount)
      .as[(Long, Long, Double)].collect().toList

  test("seen bigram, unseen bigram in seen context, unseen context") {
    // doc "a b c d": (a,b) seen → (max(2−.75,0) + .75·1·(2/6)) / 2 = 0.75
    //                (b,c) seen-context → (.25 + .75·2·(2/6)) / 2 = 0.375
    //                (c,d) unseen context → Pc(d) = 1/6
    val out = score("a b c d")
    assert(out.map(r => (r._1, r._2)) == List((1L, 3L)))
    val expected = List(0.75, 0.375, 1.0 / 6.0).map(p => -math.log(p)).sum / 3.0
    assert(math.abs(out.head._3 - expected) < 1e-9)
  }

  test("discount sweeps the seen/backoff split; bounds enforced") {
    // at D→small the seen bigram keeps nearly all mass: p(a,b) → c12/c1 = 1
    val light = score("a b", discount = 0.01).head._3
    assert(math.abs(light - -math.log((1.99 + 0.01 * 1 * (2.0 / 6)) / 2)) < 1e-9)
    intercept[IllegalArgumentException] { score("a b", discount = 0.0) }
    intercept[IllegalArgumentException] { score("a b", discount = 1.0) }
  }

  test("docs with fewer than 2 tokens are absent; OOV floor stays finite") {
    assert(score("solo").isEmpty)
    // both words OOV: unseen context → Pc = 1/6, finite
    val out = score("x y")
    assert(math.abs(out.head._3 - -math.log(1.0 / 6.0)) < 1e-9)
  }

  test("an empty reference fails loudly instead of scoring -Infinity") {
    val e = intercept[Exception] {
      TextAnalysis.knBigramSurprisal(
          Seq((1L, "a b")).toDF("doc_id", "text"),
          Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
        .collect()
    }
    assert(e.getMessage.contains("empty reference") ||
      Option(e.getCause).exists(_.getMessage.contains("empty reference")))
  }
}
