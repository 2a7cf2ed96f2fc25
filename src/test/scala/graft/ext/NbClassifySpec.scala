package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class NbClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def classify(train: Seq[(Long, String, String)],
      test: Seq[(Long, String, String)]): Map[Long, (String, String, Boolean)] =
    TextAnalysis.nbClassify(
        train.toDF("doc_id", "text", "lang"), test.toDF("doc_id", "text", "lang"))
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("nbClassify: seen tokens dominate, priors break unseen docs, tie goes to the lower label") {
    val train = Seq(
      (0L, "bonjour le monde le", "fr"),
      (2L, "hello world the the the", "en"),
      (4L, "the quick fox", "en"))
    // doc 1: 'hello' only appears in en → en wins however the priors lean
    // doc 3: 'bonjour bonjour' → fr
    val got = classify(train, Seq(
      (1L, "hello", "en"), (3L, "bonjour bonjour", "fr")))
    assert(got(1L) == (("en", "en", true)))
    assert(got(3L) == (("fr", "fr", true)))

    // a fully UNSEEN doc scores ln(d_l/D) − n·ln(T_l + V) per label.
    // With V = 8 distinct train tokens, T_en = 8, T_fr = 4:
    //   en: ln(2/3) − 2·ln(16) ≈ −5.951; fr: ln(1/3) − 2·ln(12) ≈ −6.068
    //   → en (the prior edge beats fr's smaller token mass)
    val unseen = classify(train, Seq((5L, "zzz qqq", "fr")))
    assert(unseen(5L)._2 == "en" && !unseen(5L)._3)

    // exact tie: symmetric training, one-token test doc seen equally in
    // both → scores identical → label-ascending pick ("de" < "en")
    val sym = Seq((0L, "common", "de"), (1L, "common", "en"))
    val tied = classify(sym, Seq((2L, "common", "en")))
    assert(tied(2L)._2 == "de")
  }

  test("nbClassify: perfect recovery on a lexically separable corpus; robust to noise tokens") {
    import org.apache.spark.sql.functions._
    // 3 labels with DISJOINT core vocab + shared noise tokens; 60 train
    // and 30 test docs per label. NB must classify the test split
    // perfectly — separable vocab is exactly the regime NB is optimal in,
    // so any miss is an operator bug, not corpus noise.
    val vocab = Map("aa" -> Seq("apfel", "birne", "kirsche"),
      "bb" -> Seq("apple", "pear", "cherry"),
      "cc" -> Seq("pomme", "poire", "cerise"))
    val labels = vocab.keys.toSeq.sorted
    def doc(label: String, i: Int): String = {
      val core = vocab(label)
      val words = (0 until 6).map(j => core((i + j) % 3)) ++
        Seq("noise" + (i % 5), "shared") // tokens common to all labels
      words.mkString(" ")
    }
    val rows = for (l <- labels; i <- 0 until 90)
      yield (labels.indexOf(l) * 1000L + i, doc(l, i), l)
    val df = rows.toDF("doc_id", "text", "lang")
    val res = TextAnalysis.nbClassify(
      df.filter(col("doc_id") % 3 =!= 0), df.filter(col("doc_id") % 3 === 0))
    val (n, ok) = res.agg(count(lit(1)), sum(when(col("correct"), 1L).otherwise(0L)))
      .as[(Long, Long)].head()
    Dedup.unpersistAll()
    assert(n == 90, s"expected 90 test docs, got $n")
    assert(ok == n, s"separable corpus must classify perfectly: $ok of $n")
  }
}
