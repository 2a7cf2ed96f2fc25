package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Sampling.quantileNormalize]]: percent rank via distinct-value
  * cumsum (≡ SQL percent_rank incl. tie and single-row semantics) and the
  * interpolated global grid lookup. */
class QuantileNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // global non-null values (1,2,3,4,5,10): quantile grid at k=4 is
  // [1, 2.25, 3.5, 4.75, 10] ((n−1)·q interpolation)
  private val rows = Seq(
    (1L, Option("a"), Option(1.0)), (2L, Some("a"), Some(2.0)),
    (3L, Some("a"), Some(3.0)), (4L, Some("a"), Some(4.0)),
    (5L, Some("a"), Some(5.0)),
    (6L, Some("b"), Some(10.0)),             // single-row group → pr = 0
    (7L, None, Some(3.0)), (8L, Some("a"), None)) // excluded rows
    .toDF("id", "g", "v")

  private def run(df: org.apache.spark.sql.DataFrame = rows, gridK: Int = 4) =
    Sampling.quantileNormalize(df, "g", "v", gridK = gridK)
      .as[(Long, String, Double, Double)].collect().toList.sortBy(_._1)

  test("within-group ranks map onto the global interpolated grid") {
    val out = run()
    // group a: pr = 0, .25, .5, .75, 1 → grid cells 0..4
    assert(out.map(r => r._1 -> r._4).toMap ==
      Map(1L -> 1.0, 2L -> 2.25, 3L -> 3.5, 4L -> 4.75, 5L -> 10.0, 6L -> 1.0))
    // null-group and null-value rows are excluded, input columns preserved
    assert(out.map(_._1) == List(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("ties share the min-rank percent rank") {
    val tied = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 2.0), (4L, "a", 3.0))
      .toDF("id", "g", "v")
    val out = run(tied, gridK = 2)
    // pr = 0, 1/3, 1/3, 1 → grid cells round(pr·2) = 0, 1, 1, 2 of
    // quantiles [1, 2, 3]
    assert(out.map(_._4) == List(1.0, 2.0, 2.0, 3.0))
  }

  test("monotone within a group and bounds enforced") {
    val out = run()
    val a = out.filter(_._2 == "a").sortBy(_._3).map(_._4)
    assert(a == a.sorted)
    intercept[IllegalArgumentException] { run(gridK = 1) }
    intercept[IllegalArgumentException] {
      Sampling.quantileNormalize(rows.withColumnRenamed("v", "calibrated"),
        "g", "calibrated")
    }
  }
}
