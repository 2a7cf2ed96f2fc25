package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Similarity.hybridRrf]]'s fusion semantics: per-list ranks with
  * id tiebreaks, NULL ranks for single-list hits, the 1/(k0+rank) sum, and
  * the query-row singleton contract. */
class HybridRrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // texts chosen so BM25 retrieves docs 1, 2, 4 (doc 3 has no query term);
  // vectors chosen so the cosine order vs query [1,0,0] is 1 > 2 > 3 > 4
  private val docs = Seq(
    (1L, "fast fast hash join plus filler words here"),
    (2L, "fast hash and some other filler words here"),
    (3L, "nothing relevant in this document at all"),
    (4L, "join only appears here with filler words too")).toDF("doc_id", "text")
  private val emb = Seq(
    (0L, Array(1f, 0f, 0f)),   // the query row — excluded from candidates
    (1L, Array(1f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f)),
    (3L, Array(0.2f, 1f, 0f)),
    (4L, Array(-1f, 0f, 0f))).toDF("vec_id", "embedding")

  private def run(poolK: Int = 50, topK: Int = 20) =
    Similarity.hybridRrf(docs, emb, "fast hash join", 0L,
        poolK = poolK, topK = topK)
      .as[(Long, Option[Long], Option[Long], Double)].collect().toList

  test("fused ranks, NULL single-list ranks, and the 1/(60+r) sum") {
    val out = run()
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 4L))
    // vector ranks follow the planted cosine order; doc 3 is lex-NULL
    assert(byId(1L)._3.contains(1L) && byId(2L)._3.contains(2L) &&
      byId(3L)._3.contains(3L) && byId(4L)._3.contains(4L))
    assert(byId(3L)._2.isEmpty)
    // every fused score is exactly the sum of its reciprocal rank terms
    out.foreach { case (_, lr, vr, rrf) =>
      val expected = lr.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vr.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(rrf == expected)
    }
    // output comes back ordered by (rrf desc, id)
    assert(out.map(r => (-r._4, r._1)) == out.map(r => (-r._4, r._1)).sorted)
  }

  test("poolK truncates each list before fusion") {
    val out = run(poolK = 2)
    // vec pool keeps {1, 2}; lex pool keeps its top-2 — doc 3 (in neither) gone
    assert(!out.map(_._1).contains(3L))
    assert(out.forall { case (_, lr, vr, _) =>
      lr.forall(_ <= 2) && vr.forall(_ <= 2) })
  }

  test("topK caps the fused output") {
    assert(run(topK = 2).size == 2)
  }

  test("the query row must match exactly one embedding") {
    intercept[IllegalArgumentException] {
      Similarity.hybridRrf(docs, emb, "fast hash join", 99L)
    }
    intercept[IllegalArgumentException] {
      Similarity.hybridRrf(docs,
        emb.unionByName(Seq((0L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")),
        "fast hash join", 0L)
    }
  }
}
