package graft.proc

import java.time.LocalDate

import graft.time.Windows
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Named SQL transformation steps — the analog of the reference's `sproc`
 * table type (`StoreProcRunService.cs:7-37`): an opaque, named, parameterized
 * server-side transformation `EXEC name @StartDateParam, @EndDateParam`.
 *
 * Here a step is a SQL text template executed by `spark.sql` with the date
 * window substituted. Supported placeholders:
 *
 *  - `{start_date}` / `{end_date}`   — `yyyy-MM-dd` of the window days
 *  - `{start_ts}` / `{end_ts}`       — full day bounds (day start /
 *                                      day end − 3 ms) as timestamp literals
 *
 * Like the reference (dispatch at `BulkCopyManager.cs:114-134`), a failing
 * step ABORTS the run (exceptions propagate), unlike per-table copy errors
 * which are isolated.
 */
final class SqlStepRegistry(steps: Map[String, String]) {

  def names: Seq[String] = steps.keys.toSeq.sorted

  def sqlFor(name: String, from: LocalDate, to: LocalDate): String = {
    val template = steps.getOrElse(name,
      throw new NoSuchElementException(s"unknown SQL step '$name'; known: ${names.mkString(", ")}"))
    template
      .replace("{start_date}", from.format(Windows.DateFmt))
      .replace("{end_date}", to.format(Windows.DateFmt))
      .replace("{start_ts}", Windows.fmtStart(from))
      .replace("{end_ts}", Windows.fmtEnd(to))
  }

  /** Execute a step; referenced tables must be registered as temp views. */
  def run(spark: SparkSession, name: String, from: LocalDate, to: LocalDate): DataFrame =
    spark.sql(sqlFor(name, from, to))
}
