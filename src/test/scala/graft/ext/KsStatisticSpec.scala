package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KsStatisticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ks(rows: Seq[(Double, String)], maxDistinct: Long = 1000000L) = {
    val r = Profiling.ksStatistic(rows.toDF("v", "g"), col("v"),
      col("g") === "a", col("g") === "b", maxDistinct).head()
    Caches.unpersistAll()
    (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Double]("ks_stat"), r.getAs[Double]("at_value"))
  }

  test("ksStatistic: hand-computed D, tie handling, argmax at the lowest attaining value") {
    // A = {1,2,3,4}, B = {3,4,5,6}: F_A−F_B per grid value
    // v=1: 1/4−0; v=2: 2/4−0 = 0.5 (max); v=3: 3/4−1/4 = 0.5 (tie);
    // v=4: 1−2/4 = 0.5 (tie); v=5: 1−3/4; v=6: 0 → D = 0.5 at v=2
    val a = Seq(1.0, 2.0, 3.0, 4.0).map((_, "a"))
    val b = Seq(3.0, 4.0, 5.0, 6.0).map((_, "b"))
    assert(ks(a ++ b) == ((4L, 4L, 0.5, 2.0)))

    // identical samples → D = 0 (attained everywhere, lowest value reported)
    val same = Seq(1.0, 2.0, 3.0).flatMap(v => Seq((v, "a"), (v, "b")))
    val (na, nb, d0, at0) = ks(same)
    assert(na == 3 && nb == 3 && d0 == 0.0 && at0 == 1.0)

    // disjoint supports → D = 1
    val disjoint = Seq((1.0, "a"), (2.0, "a"), (10.0, "b"))
    assert(ks(disjoint)._3 == 1.0)

    // duplicated observations weight the CDF step: A = {1,1,1,9}, B = {9}
    // at v=1: 3/4 − 0 = 0.75
    val weighted = Seq((1.0, "a"), (1.0, "a"), (1.0, "a"), (9.0, "a"), (9.0, "b"))
    assert(ks(weighted) == ((4L, 1L, 0.75, 1.0)))

    // rows matching neither predicate are ignored
    val extra = Seq((1.0, "a"), (2.0, "b"), (100.0, "c"))
    assert(ks(extra)._1 == 1L)
  }

  test("ksStatistic refuses empty samples and over-budget distinct grids loudly") {
    intercept[Exception](ks(Seq((1.0, "a"), (2.0, "a"))))
    intercept[Exception](ks(Seq((1.0, "a"), (2.0, "b"), (3.0, "b")), maxDistinct = 2))
    intercept[IllegalArgumentException](
      Profiling.ksStatistic(Seq((1.0, "a")).toDF("v", "g"), col("v"),
        col("g") === "a", col("g") === "b", maxDistinct = 1))
  }
}
