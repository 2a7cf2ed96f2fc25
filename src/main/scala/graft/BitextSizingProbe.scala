package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scale-probe tool — NOT part of the driver contract (same family as
 * [[BuildScaled]]): measures the bitext-mining IVF sizing frontier on a
 * replica corpus. Two modes:
 *
 *  - default (`runMain graft.BitextSizingProbe /tmp/graft_sf3`): runs the
 *    exact |A|×|B| grid as ground truth, then pooled probes at several
 *    (nlist, nprobe, sampleSize) points, reporting wall time, mined-pair
 *    count, and PAIR RECALL vs the exact miner — the output-level
 *    contract. Feasible only while the exact grid is (≲ 30k per side).
 *  - `recall` (`runMain graft.BitextSizingProbe /tmp/graft_sf10 recall`):
 *    for corpora where the exact grid is out of reach, measures the pool's
 *    NN1 recall on a deterministic ~300-query sample of side A against
 *    brute force over side B (the quantizer-quality signal the miner
 *    drinks from), comparing the routed sizing's scaled training sample
 *    against a deliberately-starved fixed-4096 one.
 *
 * Sizing mirrors [[graft.ext.Similarity.bitextMarginMineRouted]] exactly
 * (`max(|A|,|B|)` basis, 4096-list cap, 8-per-centroid sample floor) so
 * every measured point is a configuration production actually runs.
 */
object BitextSizingProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_sf3")
    val recallMode = args.lift(1).contains("recall")
    val spark = io.Sessions.builder("local[32]", 64)
      .appName("graft-bitext-sizing-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = io.Tables.load(spark, base, "embeddings")
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val (na, nb) = (a.count(), b.count())
    println(s"[bitext-probe] corpus $base: sides ${na}x$nb")
    // the routed path's sizing, derived once so every point below is real
    val n = math.max(na, nb)
    val nlist = math.min(4096L, math.max(16L, 4L * math.sqrt(n.toDouble).toLong)).toInt
    val scaledSample = math.min(32768, math.max(4096, 8 * nlist))

    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[bitext-probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def pairSet(df: DataFrame): Set[(Long, Long)] = {
      val s = df.select("a_id", "b_id").as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).collect().toSet
      ext.Dedup.unpersistAll()
      s
    }

    if (recallMode) {
      // NN1 recall vs brute force on a deterministic query sample: the
      // pool-quality signal at scales where the exact grid is infeasible
      val sample = a.filter(xxhash64(col("vec_id")) % (na / 300 max 1) === 0)
      val ns = sample.count()
      val exact1 = timed(s"exact NN1 for $ns sampled queries (brute force)") {
        val s = ext.Similarity.topK(b, sample, "vec_id", "embedding", 1)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        ext.Dedup.unpersistAll(); s
      }
      for (smp <- Seq(4096, scaledSample).distinct) {
        val pooled1 = timed(s"pooled NN1 nlist=$nlist nprobe=32 sample=$smp") {
          val s = ext.Similarity.annTopK(b, sample, "vec_id", "embedding", 1,
              nlist = nlist, nprobe = 32, sampleSize = smp)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          ext.Dedup.unpersistAll(); s
        }
        val recall = exact1.intersect(pooled1).size.toDouble / exact1.size
        println(f"[bitext-probe]   NN1 recall=$recall%.4f")
      }
    } else {
      val exact = timed("exact grid") {
        pairSet(ext.Similarity.bitextMarginMine(a, b, "vec_id", "embedding", k = 4))
      }
      println(s"[bitext-probe] exact pairs: ${exact.size}")
      val sqrtN = math.sqrt(n.toDouble).toInt
      for ((nl, np, smp) <- Seq(
          (sqrtN, math.max(4, sqrtN / 16), 4096), // the pre-r20 routed sizing
          (nlist, 16, scaledSample),
          (nlist, 32, scaledSample),
          (nlist, 8, scaledSample))) {
        val mined = timed(s"pooled nlist=$nl nprobe=$np sample=$smp") {
          pairSet(ext.Similarity.bitextMarginMinePooled(a, b, "vec_id", "embedding",
            k = 4, nlist = nl, nprobe = np, sampleSize = smp))
        }
        val recall = if (exact.isEmpty) 1.0
          else mined.intersect(exact).size.toDouble / exact.size
        println(f"[bitext-probe]   pairs=${mined.size} pair-recall=$recall%.4f")
      }
    }
    spark.stop()
  }
}
