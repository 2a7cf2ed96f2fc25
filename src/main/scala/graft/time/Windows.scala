package graft.time

import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter

/**
 * Date-window derivation and day-bound arithmetic.
 *
 * Re-expresses the reference's only "planner": the schedule-mode switch in
 * `BulkCopyManager.cs:37-85` and the SQL Server datetime day bounds in
 * `TableCopyService.cs:111-112` (day end = `date + 1 day − 3 ms`, i.e.
 * `23:59:59.997`, the largest SQL Server `datetime` value within a day).
 *
 * Pure functions over `java.time`; the clock is always injected so every
 * branch (including the midnight rule) is unit-testable.
 */
object Windows {

  val DateFmt: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  /** Pattern matching the reference's parameter formatting and a Spark/DuckDB
    * timestamp literal (`yyyy-MM-dd HH:mm:ss.SSS`). */
  val TsFmt: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")

  /** Window start = day start (reference `DateTime.Parse(s).Date`,
    * `TableCopyService.cs:111`). */
  def dayStart(d: LocalDate): LocalDateTime = d.atStartOfDay

  /** Window end = `d + 1 day − 3 ms` = `23:59:59.997` (`TableCopyService.cs:112`).
    * Reproduced exactly so oracle SQL using the same bound hash-matches. */
  def dayEnd(d: LocalDate): LocalDateTime =
    d.plusDays(1).atStartOfDay.minusNanos(3_000_000L)

  def fmtStart(d: LocalDate): String = dayStart(d).format(TsFmt)
  def fmtEnd(d: LocalDate): String = dayEnd(d).format(TsFmt)

  /** Explicit config window, both ends optional (mirrors `DateFrom`/`DateTo`
    * in `appsettings.json:9-10`). */
  final case class ConfigWindow(dateFrom: Option[String], dateTo: Option[String])

  /**
   * Derive `[dateFrom, dateTo]` (inclusive day range) from the schedule mode
   * (`BulkCopyManager.cs:39-85`):
   *
   *  - null/empty mode  → explicit config window, REQUIRED (throws if absent, :44-50)
   *  - "hourly"         → today..today, but during hour 0 yesterday..yesterday
   *                       (midnight finalization of the previous day, :55-67)
   *  - "daily"          → yesterday..yesterday (:69-72)
   *  - "weekly"         → (today−8)..(today−1) (:74-77)
   *  - anything else    → fall back to the config window (:79-83); unlike the
   *                       reference (latent `DateTime.Parse(null)` crash at
   *                       `TableCopyService.cs:111`) we fail fast with a
   *                       descriptive error when the fallback window is absent.
   *
   * Mode comparison is case-insensitive (`BulkCopyManager.cs:53`
   * `ToLowerInvariant`).
   */
  def derive(scheduleMode: Option[String], now: LocalDateTime, cfg: ConfigWindow): (LocalDate, LocalDate) = {
    val today = now.toLocalDate
    def explicit(context: String): (LocalDate, LocalDate) = (cfg.dateFrom, cfg.dateTo) match {
      case (Some(f), Some(t)) => (LocalDate.parse(f, DateFmt), LocalDate.parse(t, DateFmt))
      case _ => throw new IllegalArgumentException(
        s"DateFrom/DateTo are required $context but were ${cfg.dateFrom}/${cfg.dateTo}")
    }
    scheduleMode.map(_.trim.toLowerCase).filter(_.nonEmpty) match {
      case None => explicit("when ScheduleMode is unset")
      case Some("hourly") =>
        if (now.getHour == 0) (today.minusDays(1), today.minusDays(1)) else (today, today)
      case Some("daily") => (today.minusDays(1), today.minusDays(1))
      case Some("weekly") => (today.minusDays(8), today.minusDays(1))
      case Some(other) => explicit(s"for unknown ScheduleMode '$other'")
    }
  }

  /** Sproc-dispatch override: each stored-proc run independently re-checks the
    * clock and collapses the window to yesterday..yesterday when hour == 0
    * (`BulkCopyManager.cs:116-126`). */
  def sprocOverride(window: (LocalDate, LocalDate), now: LocalDateTime): (LocalDate, LocalDate) =
    if (now.getHour == 0) {
      val y = now.toLocalDate.minusDays(1)
      (y, y)
    } else window
}
