package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Profiling.zipfFit]]: an exactly-Zipfian fixture recovers slope −1
  * / R² 1 to the rounding contract, the rank cut takes the top frequencies,
  * and degenerate heads fail loudly instead of emitting NaN rows. */
class ZipfFitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Counts 12/6/4/3 at ranks 1..4: c·r = 12 for every rank, so
    * ln c = ln 12 − ln r EXACTLY — slope −1, intercept ln 12, R² 1. */
  private val zipfian = Seq(
    (1L, ("a " * 12).trim),
    (2L, ("b " * 6).trim),
    (3L, ("c " * 4).trim),
    (4L, ("d " * 3).trim)).toDF("doc_id", "text")

  test("an exactly-Zipfian head fits slope -1, intercept ln 12, R^2 1") {
    val Array(row) = Profiling.zipfFit(zipfian, "text", topRanks = 10)
      .as[(Long, Double, Double, Double)].collect()
    assert(row._1 == 4L)
    assert(math.abs(row._2 - -1.0) < 1e-6, s"slope ${row._2}")
    assert(math.abs(row._3 - math.log(12.0)) < 1e-6, s"intercept ${row._3}")
    assert(math.abs(row._4 - 1.0) < 1e-6, s"r2 ${row._4}")
  }

  test("topRanks cuts to the most frequent tokens (count desc, token asc)") {
    // rank 3 ties at count 4 between "c" and the injected "cc": the token
    // tiebreak admits "c" before "cc"; topRanks=3 must fit only a/b/c
    val withTie = zipfian.union(Seq((5L, ("cc " * 4).trim)).toDF("doc_id", "text"))
    val Array(row) = Profiling.zipfFit(withTie, "text", topRanks = 3)
      .as[(Long, Double, Double, Double)].collect()
    assert(row._1 == 3L)
    // a/b/c are still exactly Zipfian, so the cut fit stays slope −1
    assert(math.abs(row._2 - -1.0) < 1e-6, s"slope ${row._2}")
  }

  test("a flat head (all counts equal) fails loudly, never NaN") {
    val flat = Seq((1L, "x y z")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Profiling.zipfFit(flat, "text", topRanks = 3).collect()
    }
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(c => " " + msg(c)).getOrElse("")
    assert(msg(e).contains("degenerate frequency head"))
  }

  test("bounds: topRanks below 3 is refused") {
    intercept[IllegalArgumentException] {
      Profiling.zipfFit(zipfian, "text", topRanks = 2)
    }
  }
}
