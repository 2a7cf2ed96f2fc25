package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, "2024-01-01", 2L, 10.0),
    (1L, "2024-01-04", 1L, 40.0),
    (2L, "2024-01-02", 5L, 7.0))
    .toDF("k", "day", "n", "v")
    .withColumn("day", col("day").cast("timestamp_ntz"))

  test("dailyGridFill fills per-key gaps: fill cols carried forward, others null") {
    val got = TimeSeries.dailyGridFill(fixture, "k", "day", Seq("v"))
      .select(col("k"), col("day").cast("string"), col("n"), col("v"))
      .as[(Long, String, Option[Long], Double)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01 00:00:00", Some(2L), 10.0),
      (1L, "2024-01-02 00:00:00", None, 10.0), // fabricated: v forward-filled, n null
      (1L, "2024-01-03 00:00:00", None, 10.0),
      (1L, "2024-01-04 00:00:00", Some(1L), 40.0),
      (2L, "2024-01-02 00:00:00", Some(5L), 7.0))) // dense key: untouched
  }

  test("dailyGridFill plan: one window pass, no join against a fabricated grid") {
    val plan = TimeSeries.dailyGridFill(fixture, "k", "day", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"grid fill must not join:\n$plan")
    assert(plan.contains("Window"), s"expected the lead() window pass:\n$plan")
  }

  test("dailyGridFill rejects unknown or key/day fill columns") {
    intercept[IllegalArgumentException](
      TimeSeries.dailyGridFill(fixture, "k", "day", Seq("nope")))
    intercept[IllegalArgumentException](
      TimeSeries.dailyGridFill(fixture, "k", "day", Seq("day")))
    intercept[IllegalArgumentException](
      TimeSeries.dailyGridFill(fixture, "nope", "day", Nil))
  }

  test("dailyGridFill with date-typed days and no fill cols") {
    val d = fixture.withColumn("day", col("day").cast("date"))
    val got = TimeSeries.dailyGridFill(d, "k", "day", Nil)
      .select(col("k"), col("day").cast("string"), col("n"), col("v"))
      .as[(Long, String, Option[Long], Option[Double])].collect().toSet
    assert(got.size == 5)
    assert(got.contains((1L, "2024-01-02", None, None))) // nothing filled
    assert(got.contains((1L, "2024-01-04", Some(1L), Some(40.0))))
  }
}
