package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Profiling.corpusCard]] on a hand-computed fixture: NULL-text
  * accounting, exact duplicate detection via the content fingerprint
  * (token-SET identity, so reordered duplicates collapse), short-doc
  * counting, and the exact-division derived fractions. */
class CorpusCardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma", "en", "s0"),          // 3 tokens, short
    (2L, "gamma beta alpha", "en", "s1"),          // same token SET as doc 1
    (3L, ("w " * 30).trim, "de", "s0"),            // 30 tokens, not short
    (4L, "delta", "en", "s0"),                     // 1 token, short
    (5L, null.asInstanceOf[String], "fr", "s2")    // null text
  ).toDF("doc_id", "text", "lang", "source")

  test("hand-computed card: counts, mass, dup rate, fractions") {
    val row = Profiling.corpusCard(docs).collect()(0)
    val m = Profiling.corpusCard(docs).columns.zip(row.toSeq).toMap
    assert(m("n_docs") == 5L && m("n_null_text") == 1L)
    assert(m("n_langs") == 3L && m("n_sources") == 3L)
    assert(m("total_tokens") == 3L + 3 + 30 + 1)
    assert(m("total_chars") == 16L + 16 + 59 + 5)
    assert(m("n_short") == 3L)
    // docs 1 and 2 share a token set -> one fingerprint; 3 and 4 distinct
    assert(m("n_distinct_fingerprints") == 3L)
    assert(m("mean_tokens") == 37.0 / 4.0)
    assert(m("short_frac") == 3.0 / 4.0)
    assert(m("dup_frac") == 1.0 / 4.0)
  }

  test("bounds are enforced") {
    intercept[IllegalArgumentException] {
      Profiling.corpusCard(docs, minTokens = 0)
    }
  }
}
