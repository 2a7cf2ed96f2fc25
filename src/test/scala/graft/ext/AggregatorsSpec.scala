package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = graft.io.Tables.load(spark, TestSpark.Sf0001, "documents")

  test("FrequentItemsSketch: exact when capacity covers the distinct universe") {
    // with zero evictions Misra–Gries is exact under ANY merge order
    val df = Seq("a a a b b c", "b a c c", "a").toDF("text").repartition(3)
    val got = Aggregators.frequentTokens(spark, df, capacity = 100)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 5L, "b" -> 3L, "c" -> 3L))
  }

  test("TopKPairsAggregator: (score DESC, id ASC) order, ties to lower id, k bound, any partitioning") {
    val rows = Seq(
      (1L, 10L, 0.5), (1L, 3L, 0.9), (1L, 7L, 0.9), (1L, 2L, 0.9),
      (1L, 5L, 0.1), (1L, 9L, 0.7),
      (2L, 4L, 0.2)) // under-filled group: fewer rows than k
    val topk = udaf(new Aggregators.TopKPairsAggregator(4))
    // run under several partitionings: merge order must not matter
    Seq(1, 3, 7).foreach { parts =>
      val got = rows.toDF("g", "id", "s").repartition(parts)
        .groupBy("g").agg(topk(col("id"), col("s")).as("tk"))
        .as[(Long, Seq[(Long, Double)])].collect().toMap
      assert(got(1L) == Seq((2L, 0.9), (3L, 0.9), (7L, 0.9), (9L, 0.7)),
        s"parts=$parts: ${got(1L)}")
      assert(got(2L) == Seq((4L, 0.2)), s"parts=$parts under-filled group")
    }
  }

  test("FrequentItemsSketch: MG bounds hold vs exact counts on the fixture corpus") {
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val n = toks.count()
    val capacity = 200
    val err = n / (capacity + 1)
    val est = Aggregators.frequentTokens(spark, docs, capacity)
      .as[(String, Long)].collect().toMap
    val exact = toks.groupBy("tok").count().as[(String, Long)].collect().toMap
    assert(est.size <= capacity)
    // every item above the error threshold must be present in the summary
    exact.filter(_._2 > err).foreach { case (k, c) =>
      assert(est.contains(k), s"heavy hitter '$k' ($c > $err) missing") }
    // estimates never exceed truth and sit within the additive bound
    est.foreach { case (k, v) =>
      assert(v <= exact(k), s"'$k' overestimated: $v > ${exact(k)}")
      assert(v >= exact(k) - err, s"'$k' undershoots the bound: $v < ${exact(k)} - $err")
    }
  }

  test("FrequentItemsSketch rejects non-positive capacity") {
    intercept[IllegalArgumentException](new Aggregators.FrequentItemsSketch(0))
  }
}
