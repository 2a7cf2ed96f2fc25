package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dataset profiling (SURVEY.md §2.12) — the QA pass a training-data pipeline
 * runs before and after every transformation: per-column row/null/distinct
 * counts in long format, ONE aggregation pass over the data regardless of
 * column count (every metric is a partial-aggregable expression in a single
 * `agg`, reshaped to long rows afterward with `stack`). No driver-side
 * state; the single-row wide aggregate is the only thing that leaves the
 * executors.
 */
object Profiling {

  /** Per-column profile: `(col_name, n_rows, n_nulls, n_distinct)` — one row
    * per requested column. `n_nulls = count(*) − count(col)` so every metric
    * stays a plain BIGINT count in any engine; `n_distinct` is exact
    * (null excluded, matching SQL `count(DISTINCT col)`). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val bad = cols.filterNot(df.columns.toSet)
    require(bad.isEmpty, s"profile: no such columns: ${bad.mkString(", ")}")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __rows, __rows - `__nn_$c`, `__nd_$c`").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) as (col_name, n_rows, n_nulls, n_distinct)")
  }
}
