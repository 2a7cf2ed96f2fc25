package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent scalar PageRank — the textbook loop over in-memory maps,
    * sharing no code with the operator. */
  private def referenceRank(edges: Seq[(String, String, Double)],
      iterations: Int, d: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val byDst = edges.groupBy(_._2)
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      val dm = nodes.filterNot(outW.contains).map(rank).sum
      rank = nodes.map { v =>
        val in = byDst.getOrElse(v, Nil)
          .map { case (u, _, w) => rank(u) * w / outW(u) }.sum
        v -> ((1 - d) / n + d * (in + dm / n))
      }.toMap
    }
    rank
  }

  private def run(edges: Seq[(String, String, Double)], iterations: Int,
      d: Double = 0.85, weighted: Boolean = true,
      localLimit: Long = 1000000L): Map[String, Double] = {
    val df = edges.toDF("s", "t", "w")
    val got = Graphs.pageRank(df, "s", "t", iterations, d,
        if (weighted) Some("w") else None, localEdgeLimit = localLimit)
      .as[(String, Double)].collect().toMap
    Caches.unpersistAll()
    got
  }

  private def assertClose(got: Map[String, Double], want: Map[String, Double]): Unit = {
    assert(got.keySet == want.keySet, s"nodes: ${got.keySet} vs ${want.keySet}")
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-12, s"$k: $v vs ${want(k)}")
    }
  }

  test("pageRank: two-node cycle is uniform; ranks always sum to 1") {
    val got = run(Seq(("a", "b", 1.0), ("b", "a", 1.0)), 7)
    assertClose(got, Map("a" -> 0.5, "b" -> 0.5))
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("pageRank: matches the scalar reference on a graph with hub, dangling node, and weights") {
    // c is dangling (mass redistributes); a→b carries 3× the weight of a→c
    val edges = Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0),
      ("b", "c", 1.0), ("d", "a", 2.0))
    for (iters <- Seq(0, 1, 5, 12)) {
      val got = run(edges, iters)
      assertClose(got, referenceRank(edges, iters, 0.85))
      assert(math.abs(got.values.sum - 1.0) < 1e-12, s"iters=$iters mass leak")
    }
  }

  test("pageRank: distributed path (localEdgeLimit=0) agrees with the local fast path") {
    // dangling node included so the distributed per-round mass job runs too
    val edges = Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0),
      ("b", "c", 1.0), ("d", "a", 2.0))
    val dist = run(edges, 6, localLimit = 0L)
    assertClose(dist, run(edges, 6))
    assertClose(dist, referenceRank(edges, 6, 0.85))
  }

  test("pageRank: unweighted treats parallel edges additively; weight merge matches") {
    // two parallel a→b edges unweighted ≡ one a→b edge of weight 2
    val parallel = Seq(("a", "b", 99.0), ("a", "b", 99.0), ("a", "c", 99.0),
      ("c", "a", 99.0), ("b", "a", 99.0))
    val merged = Seq(("a", "b", 2.0), ("a", "c", 1.0), ("c", "a", 1.0),
      ("b", "a", 1.0))
    assertClose(run(parallel, 6, weighted = false), run(merged, 6))
  }

  test("pageRank: iterations=0 is uniform; damping=0 is uniform teleport; edge hygiene") {
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0), ("c", "b", 1.0))
    assertClose(run(edges, 0), Map("a" -> 1.0 / 3, "b" -> 1.0 / 3, "c" -> 1.0 / 3))
    assertClose(run(edges, 9, d = 0.0), Map("a" -> 1.0 / 3, "b" -> 1.0 / 3, "c" -> 1.0 / 3))
    // NULL endpoints and non-positive weights drop; the edge (x,y) survives
    val dirty = Seq((null, "b", 1.0), ("a", null, 1.0), ("a", "b", 0.0),
      ("a", "b", -1.0), ("x", "y", 1.0)).toDF("s", "t", "w")
    val got = Graphs.pageRank(dirty, "s", "t", 3, 0.85, Some("w"))
      .as[(String, Double)].collect().toMap
    Caches.unpersistAll()
    assert(got.keySet == Set("x", "y"))
    intercept[IllegalArgumentException](Graphs.pageRank(dirty, "s", "t", -1))
    intercept[IllegalArgumentException](Graphs.pageRank(dirty, "s", "t", 1, 1.5))
  }

  test("pageRank: partitioning-invariant and deterministic across runs") {
    val edges = (0 until 40).map(i => (s"n${i % 10}", s"n${(i * 7 + 3) % 10}", 1.0 + i % 3))
    val a = run(edges, 8)
    val b = {
      val df = edges.toDF("s", "t", "w").repartition(13)
      val got = Graphs.pageRank(df, "s", "t", 8, 0.85, Some("w"))
        .as[(String, Double)].collect().toMap
      Caches.unpersistAll()
      got
    }
    assert(a.keySet == b.keySet)
    // partial-agg sum ORDER shifts with partitioning, so ulps may move;
    // anything past ulp scale means the assignment depended on layout
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"$k differs") }
  }
}
