package graft.proc

import java.time.LocalDate

import graft.time.Windows
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Named SQL transformation steps — the analog of the reference's `sproc`
 * table type (`StoreProcRunService.cs:7-37`): an opaque, named, parameterized
 * server-side transformation `EXEC name @StartDateParam, @EndDateParam`.
 *
 * Here a step is a SQL text template with the date window substituted,
 * executed by `spark.sql` — or, when the template starts with the `jdbc:`
 * prefix, passed through to the TARGET database connection
 * ([[graft.store.Jdbc.call]]): the deployment whose downstream layers are
 * built by real stored procedures registers `"jdbc:CALL my_proc(?, ?)"`
 * and the window bounds bind positionally, the exact shape of the
 * reference's `EXEC name @StartDateParam, @EndDateParam`. Supported
 * placeholders (both kinds):
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

  private val JdbcPrefix = "jdbc:"

  def names: Seq[String] = steps.keys.toSeq.sorted

  /** True when the step executes on the target database connection rather
    * than in the Spark session. */
  def isJdbcStep(name: String): Boolean = template(name).startsWith(JdbcPrefix)

  private def template(name: String): String = steps.getOrElse(name,
    throw new NoSuchElementException(s"unknown SQL step '$name'; known: ${names.mkString(", ")}"))

  def sqlFor(name: String, from: LocalDate, to: LocalDate): String =
    template(name)
      .replace("{start_date}", from.format(Windows.DateFmt))
      .replace("{end_date}", to.format(Windows.DateFmt))
      .replace("{start_ts}", Windows.fmtStart(from))
      .replace("{end_ts}", Windows.fmtEnd(to))

  /** Execute a Spark-side step; referenced tables must be registered as temp
    * views. `jdbc:` steps are refused here — they have no DataFrame result
    * and need a target connection ([[runJdbc]]). */
  def run(spark: SparkSession, name: String, from: LocalDate, to: LocalDate): DataFrame = {
    require(!isJdbcStep(name),
      s"SQL step '$name' is a jdbc: passthrough — run it with runJdbc(name, from, to, cfg)")
    spark.sql(sqlFor(name, from, to))
  }

  /** Execute a `jdbc:` passthrough step on the target connection — the
    * reference's sproc dispatch (`StoreProcRunService.cs:16-31`). The window
    * binds either as text placeholders (substituted above) or as the two
    * positional `?` parameters (day start / day end − 3 ms). Returns the
    * statement's update count; failures propagate (abort-the-run). */
  def runJdbc(name: String, from: LocalDate, to: LocalDate,
      cfg: graft.store.Jdbc.JdbcConfig): Int = {
    require(isJdbcStep(name),
      s"SQL step '$name' is a Spark-side step — run it with run(spark, name, from, to)")
    graft.store.Jdbc.call(cfg, sqlFor(name, from, to).stripPrefix(JdbcPrefix).trim, from, to)
  }
}
