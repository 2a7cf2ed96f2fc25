package graft

import org.apache.spark.sql.functions._

/**
 * Scale-probe tool — NOT part of the driver contract (same family as
 * [[BuildScaled]]): measures the bitext-mining IVF sizing frontier on a
 * replica corpus, comparing the exact |A|×|B| grid against pooled probes
 * at several (nlist, nprobe) points. For each point it reports wall
 * time, mined-pair count, and PAIR RECALL vs the exact miner's output —
 * the output-level contract (NN1 recall understates miner agreement:
 * the mutual-NN1 test and the margin denominator both tolerate some
 * pool loss).
 *
 * Usage: `runMain graft.BitextSizingProbe /tmp/graft_sf3`
 */
object BitextSizingProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_sf3")
    val spark = io.Sessions.builder("local[32]", 64)
      .appName("graft-bitext-sizing-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = io.Tables.load(spark, base, "embeddings")
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val (na, nb) = (a.count(), b.count())
    println(s"[bitext-probe] corpus $base: sides ${na}x$nb")

    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[bitext-probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val exact = timed("exact grid") {
      val p = ext.Similarity.bitextMarginMine(a, b, "vec_id", "embedding", k = 4)
        .select("a_id", "b_id").as[(Long, Long)](
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong))
        .collect().toSet
      ext.Dedup.unpersistAll()
      p
    }
    println(s"[bitext-probe] exact pairs: ${exact.size}")

    for ((nlist, nprobe) <- Seq(
        (math.sqrt(na.toDouble).toInt, math.max(4, math.sqrt(na.toDouble).toInt / 16)),
        (4 * math.sqrt(na.toDouble).toInt, 16),
        (4 * math.sqrt(na.toDouble).toInt, 32),
        (4 * math.sqrt(na.toDouble).toInt, 8))) {
      val mined = timed(s"pooled nlist=$nlist nprobe=$nprobe") {
        val p = ext.Similarity.bitextMarginMinePooled(a, b, "vec_id", "embedding",
            k = 4, nlist = nlist, nprobe = nprobe)
          .select("a_id", "b_id").as[(Long, Long)](
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaLong))
          .collect().toSet
        ext.Dedup.unpersistAll()
        p
      }
      val recall = if (exact.isEmpty) 1.0
        else mined.intersect(exact).size.toDouble / exact.size
      println(f"[bitext-probe]   pairs=${mined.size} pair-recall=$recall%.4f")
    }
    spark.stop()
  }
}
