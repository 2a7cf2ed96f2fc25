package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Pins [[TimeSeries.rollingVolumeAnomaly]]: a planted 10× spike against an
  * alternating baseline, zero-count gap days entering the baseline, the
  * current-day exclusion, the min-baseline/zero-variance NULL verdicts, and
  * bounds. */
class VolumeAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")

  /** key "a": counts 4,6,4,6,4,6,4,6,4 on days 1–9, then a 50-event spike
    * on day 10; key "b": 3 events on day 1 and day 4 with a 2-day gap. */
  private val events = (
    (1 to 9).flatMap(d => Seq.fill(if (d % 2 == 1) 4 else 6)(("a", day(d)))) ++
    Seq.fill(50)(("a", day(10))) ++
    Seq.fill(3)(("b", day(1))) ++ Seq.fill(3)(("b", day(4)))
  ).toDF("k", "ts")

  private lazy val out = TimeSeries.rollingVolumeAnomaly(events, "k", "ts")
    .as[(String, Timestamp, Long, Long, Option[Double], Option[Double],
      Option[Double], Boolean)]
    .collect().map(r => (r._1, r._2.toLocalDateTime.getDayOfMonth) -> r).toMap

  test("a planted 10x spike is flagged against the trailing-7 baseline") {
    val (_, _, c, n, mean, std, z, anomaly) = out(("a", 10))
    assert(c == 50L && n == 7L)
    // baseline days 3..9 = 4,6,4,6,4,6,4 -> sx 34, sxx 172
    val m = 34.0 / 7.0
    val v = (7.0 * 172 - 34.0 * 34) / 49.0
    assert(math.abs(mean.get - BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(std.get - math.sqrt(v)) < 1e-6)
    assert(math.abs(z.get - (50.0 - m) / math.sqrt(v)) < 1e-5)
    assert(anomaly)
  }

  test("ordinary days against the same baseline are not flagged") {
    val (_, _, c, n, _, _, z, anomaly) = out(("a", 9))
    assert(c == 4L && n == 7L && !anomaly)
    assert(math.abs(z.get) < 2.0)
  }

  test("gap days densify to zero counts and enter the baseline") {
    assert(out(("b", 2))._3 == 0L) // fabricated day, zero events
    val (_, _, c, n, mean, std, z, anomaly) = out(("b", 4))
    assert(c == 3L && n == 3L)
    // baseline 3,0,0 -> mean 1, var (3*9-9)/9 = 2
    assert(mean.get == 1.0)
    assert(math.abs(std.get - math.sqrt(2.0)) < 1e-6)
    assert(math.abs(z.get - 2.0 / math.sqrt(2.0)) < 1e-6)
    assert(!anomaly)
  }

  test("thin or zero-variance baselines give NULL stats and no verdict") {
    val d1 = out(("a", 1)) // no trailing days at all
    assert(d1._4 == 0L && d1._5.isEmpty && d1._7.isEmpty && !d1._8)
    val d2 = out(("a", 2)) // 1 trailing day < minBaseline
    assert(d2._4 == 1L && d2._5.nonEmpty && d2._6.isEmpty && !d2._8)
    val b2 = out(("b", 2)) // baseline [3] then [3,0]: below minBaseline
    assert(b2._4 == 1L && b2._7.isEmpty && !b2._8)
  }

  test("bounds are enforced") {
    intercept[IllegalArgumentException] {
      TimeSeries.rollingVolumeAnomaly(events, "k", "ts", windowDays = 1)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.rollingVolumeAnomaly(events, "k", "ts", minBaseline = 8)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.rollingVolumeAnomaly(events, "k", "ts", zThreshold = 0.0)
    }
  }
}
