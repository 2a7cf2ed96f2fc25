package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterEach {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def afterEach(): Unit = Dedup.unpersistAll()

  private lazy val emb = graft.io.Tables.load(spark, TestSpark.Sf0001, "embeddings")

  test("kmeansAssign: every row assigned, cluster ids in [0, k)") {
    val k = 4
    val got = Clustering.kmeansAssign(emb, "vec_id", "embedding", k, iters = 2)
      .as[(Long, Long)].collect()
    assert(got.length == emb.count())
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.forall { case (_, c) => c >= 0 && c < k })
  }

  test("kmeansAssign separates two well-separated blobs at k = 2") {
    // blob A near (10, 0), blob B near (0, 10); seeds (ids 0, 1) land one in
    // each blob, so even the seed assignment is already the true partition —
    // and two Lloyd rounds must keep it (a fixed point of the recenter)
    val rows = (0 until 20).map { i =>
      val inA = i % 2 == 0
      val eps = (i % 5) * 0.01f
      (i.toLong, if (inA) Array(10.0f + eps, eps) else Array(eps, 10.0f + eps))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    val aCluster = got(0L)
    assert((0 until 20).forall { i =>
      if (i % 2 == 0) got(i.toLong) == aCluster else got(i.toLong) == 1 - aCluster
    })
  }

  test("kmeansAssign is invariant under repartitioning (determinism contract)") {
    val a = Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 8, iters = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Clustering.kmeansAssign(emb.repartition(13), "vec_id", "embedding", k = 8, iters = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("kmeansAssign with iters = 0 is pure seed assignment") {
    // each row lands on its nearest seed (the k lowest-id vectors)
    val got = Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 3, iters = 0)
      .as[(Long, Long)].collect()
    val seeds = emb.orderBy("vec_id").limit(3)
      .select(col("embedding").cast("array<double>")).as[Array[Double]].collect()
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    def cost(v: Array[Double], c: Array[Double]): Double = {
      val cc = c.map(x => x * x).sum
      val dot = v.zip(c).map { case (x, y) => x * y }.sum
      BigDecimal(cc - dot * 2.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { case (id, cl) =>
      val costs = seeds.map(cost(vecs(id), _))
      assert(costs.indexOf(costs.min) == cl, s"vec $id")
    }
  }

  test("kmeansAssign refuses non-positive k and negative iters") {
    intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 0, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 2, iters = -1)
    }
  }

  test("prototypePrune keeps the farthest fraction at the exact quantile cut") {
    // iters = 0 pins centroids to the seeds (vecs 0, 1), so every cost is
    // computable in plain Scala with the contract's exact arithmetic
    val rows = (0 until 20).map { i =>
      val inA = i % 2 == 0
      val eps = (i % 5) * 0.01f
      (i.toLong, if (inA) Array(10.0f + eps, eps) else Array(eps, 10.0f + eps))
    }
    val df = rows.toDF("vec_id", "embedding")
    def cost(v: Array[Double], c: Array[Double]): Double = {
      val cc = c.map(x => x * x).sum
      val dot = v.zip(c).map { case (x, y) => x * y }.sum
      BigDecimal(cc - dot * 2.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val seeds = rows.take(2).map(_._2.map(_.toDouble))
    val scored = rows.map { case (id, v) =>
      val cs = seeds.map(cost(v.map(_.toDouble), _))
      (id, cs.indexOf(cs.min).toLong, cs.min)
    }
    // interpolated percentile(cost, 0.5) per cluster, then cost >= threshold
    def thr(cs: Seq[Double]): Double = {
      val s = cs.sorted; val pos = (s.length - 1) * 0.5
      val lo = s(pos.toInt); val hi = s(math.ceil(pos).toInt)
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val expected = scored.groupBy(_._2).flatMap { case (_, members) =>
      val t = thr(members.map(_._3))
      members.filter(_._3 >= t)
    }.toSet
    val got = Clustering.prototypePrune(df, "vec_id", "embedding",
        k = 2, iters = 0, keepFraction = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
    // keepFraction = 1 keeps every row (threshold = the cluster minimum)
    assert(Clustering.prototypePrune(df, "vec_id", "embedding",
      k = 2, iters = 0, keepFraction = 1.0).count() == 20)
    intercept[IllegalArgumentException] {
      Clustering.prototypePrune(df, "vec_id", "embedding", 2, 0, keepFraction = 0.0)
    }
  }

  test("nearestLabelCentroid: separable labels classify perfectly, an outlier crosses") {
    import org.apache.spark.sql.functions.col
    // label 0 around (0,0), label 1 around (10,10); id 99 is labeled 0 but
    // sits ON the label-1 blob — the one predicted crossing
    val rows = Seq(
      (1L, Array(0.0, 0.1), 0L), (2L, Array(0.1, 0.0), 0L), (3L, Array(-0.1, 0.0), 0L),
      (11L, Array(10.0, 10.1), 1L), (12L, Array(10.1, 10.0), 1L), (13L, Array(9.9, 10.0), 1L),
      (99L, Array(10.0, 10.0), 0L))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Clustering.nearestLabelCentroid(df, "vec_id", "embedding", "label")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    Caches.unpersistAll()
    assert(got.size == 7)
    assert(got(99L) == (0L, 1L)) // true label 0, predicted 1
    assert(got.filter(_._1 != 99L).forall { case (_, (l, p)) => l == p })
    // determinism: repartitioned input yields the identical assignment
    val got2 = Clustering.nearestLabelCentroid(df.repartition(7, col("vec_id")),
        "vec_id", "embedding", "label")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    Caches.unpersistAll()
    assert(got2 == got)
  }
}
