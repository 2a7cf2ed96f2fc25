package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pack(df: org.apache.spark.sql.DataFrame, budget: Int, nShards: Int) =
    Packing.packTokenBudget(df, "doc_id", "n_tokens", budget, nShards)

  test("pack ids are the prefix-sum bins in (idHash, id) order within each shard") {
    val df = (1L to 200L).map(i => (i, (i % 37) + 1)).toDF("doc_id", "n_tokens")
    val out = pack(df, budget = 50, nShards = 4)
      .select("doc_id", "shard", "n_tokens", "pack_id")
      .as[(Long, Int, Long, Long)].collect()
    assert(out.length == 200)
    // recompute locally: same hash, same order, same bins
    val hashes = df.select(col("doc_id"), Sampling.idHash(col("doc_id")).as("h"))
      .as[(Long, Long)].collect().toMap
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(r => (hashes(r._1), r._1))
      var cum = 0L
      sorted.foreach { r =>
        assert(hashes(r._1) % 4 == shard, s"doc ${r._1} in wrong shard")
        assert(r._4 == cum / 50, s"doc ${r._1}: pack_id ${r._4} != ${cum / 50}")
        cum += r._3
      }
    }
  }

  test("packing is deterministic under repartitioning") {
    val df = (1L to 500L).map(i => (i, i % 91)).toDF("doc_id", "n_tokens")
    val a = pack(df.repartition(1), 100, 3).collect().toSet
    val b = pack(df.repartition(13), 100, 3).collect().toSet
    assert(a == b)
  }

  test("null and negative token counts are rejected up front") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(-1L)), (4L, Some(0L)))
      .toDF("doc_id", "n_tokens")
    val kept = pack(df, 10, 2).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("property: packing equals a local reference pack on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genDocs = Gen.resize(40, Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 500L), Gen.choose(0L, 64L)))).map(_.distinctBy(_._1))
    val genBudget = Gen.choose(1, 100)
    val genShards = Gen.choose(1, 5)
    val prop = Prop.forAll(genDocs, genBudget, genShards) { (ds, budget, nShards) =>
      val df = ds.toDF("doc_id", "n_tokens")
      val hashes = df.select(col("doc_id"), Sampling.idHash(col("doc_id")).as("h"))
        .as[(Long, Long)].collect().toMap
      // local reference: shard by hash, order by (hash, id), prefix-sum bins
      val expect = ds.groupBy(d => hashes(d._1) % nShards).flatMap { case (shard, docs) =>
        val sorted = docs.sortBy(d => (hashes(d._1), d._1))
        sorted.zip(sorted.map(_._2).scanLeft(0L)(_ + _)).map { case ((id, n), cum) =>
          (id, shard.toInt, n, cum / budget)
        }
      }.toSet
      val got = pack(df, budget, nShards)
        .as[(Long, Int, Long, Long)].collect().toSet
      got == expect
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop).passed)
  }

  test("a document straddling the budget boundary counts into the next bin") {
    // one shard, budget 10; sizes 6,6,6 → cum_before 0,6,12 → packs 0,0,1
    val df = Seq((1L, 6L), (2L, 6L), (3L, 6L)).toDF("doc_id", "n_tokens")
    val out = pack(df, 10, 1)
    val hashes = df.select(col("doc_id"), Sampling.idHash(col("doc_id")).as("h"))
      .as[(Long, Long)].collect().toMap
    val packs = out.select("doc_id", "pack_id").as[(Long, Long)].collect()
      .sortBy(r => (hashes(r._1), r._1)).map(_._2).toSeq
    assert(packs == Seq(0L, 0L, 1L))
  }
}
