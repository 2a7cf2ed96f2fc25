package graft.time

import java.time.{LocalDate, LocalDateTime}

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

class WindowsSpec extends AnyFunSuite {

  private val cfg = Windows.ConfigWindow(Some("2024-02-01"), Some("2024-02-03"))
  private val noCfg = Windows.ConfigWindow(None, None)
  private val noon = LocalDateTime.of(2024, 3, 15, 12, 30)
  private val midnight = LocalDateTime.of(2024, 3, 15, 0, 59)

  test("day bounds: start-of-day to next-day minus 3 ms (TableCopyService.cs:111-112)") {
    val d = LocalDate.of(2024, 1, 7)
    assert(Windows.dayStart(d) == LocalDateTime.of(2024, 1, 7, 0, 0))
    assert(Windows.dayEnd(d) == LocalDateTime.of(2024, 1, 7, 23, 59, 59, 997000000))
    assert(Windows.fmtEnd(d) == "2024-01-07 23:59:59.997")
  }

  test("no mode: explicit config window required") {
    assert(Windows.derive(None, noon, cfg) ==
      (LocalDate.of(2024, 2, 1), LocalDate.of(2024, 2, 3)))
    assertThrows[IllegalArgumentException](Windows.derive(None, noon, noCfg))
    assertThrows[IllegalArgumentException](Windows.derive(Some(""), noon, noCfg))
  }

  test("hourly: today, except hour 0 rolls back to yesterday (BulkCopyManager.cs:55-67)") {
    assert(Windows.derive(Some("hourly"), noon, noCfg) ==
      (LocalDate.of(2024, 3, 15), LocalDate.of(2024, 3, 15)))
    assert(Windows.derive(Some("HOURLY"), midnight, noCfg) ==
      (LocalDate.of(2024, 3, 14), LocalDate.of(2024, 3, 14)))
  }

  test("daily: yesterday") {
    assert(Windows.derive(Some("daily"), noon, noCfg) ==
      (LocalDate.of(2024, 3, 14), LocalDate.of(2024, 3, 14)))
  }

  test("weekly: today-8 .. today-1") {
    assert(Windows.derive(Some("weekly"), noon, noCfg) ==
      (LocalDate.of(2024, 3, 7), LocalDate.of(2024, 3, 14)))
  }

  test("unknown mode: config fallback, fail-fast when absent") {
    assert(Windows.derive(Some("fortnightly"), noon, cfg) ==
      (LocalDate.of(2024, 2, 1), LocalDate.of(2024, 2, 3)))
    assertThrows[IllegalArgumentException](Windows.derive(Some("fortnightly"), noon, noCfg))
  }

  test("sproc midnight override (BulkCopyManager.cs:116-126)") {
    val w = (LocalDate.of(2024, 3, 1), LocalDate.of(2024, 3, 10))
    assert(Windows.sprocOverride(w, noon) == w)
    assert(Windows.sprocOverride(w, midnight) ==
      (LocalDate.of(2024, 3, 14), LocalDate.of(2024, 3, 14)))
  }

  test("property: dayEnd is always 86399.997 s after dayStart") {
    val prop = forAll(Gen.choose(0L, 40000L)) { epochDay =>
      val d = LocalDate.ofEpochDay(epochDay)
      java.time.Duration.between(Windows.dayStart(d), Windows.dayEnd(d)) ==
        java.time.Duration.ofMillis(86399997L)
    }
    assert(check(Parameters.default, prop).passed)
  }
}
