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

  /** Sketch-based profile for scales where exact `count(DISTINCT)` /
    * `percentile` are infeasible: HyperLogLog++ distinct estimates per key
    * column and approximate percentiles per numeric column, one aggregation
    * pass, constant memory per sketch (HLL ~1.5 KB at 2% rsd; the quantile
    * summary is bounded by `accuracy`). At 100 TB this runs where the exact
    * variants would shuffle every distinct value; estimates are spec-pinned
    * against the exact answers on fixtures (`ProfilingSpec`), not
    * oracle-gated — approximate output has no bit-stable cross-engine form.
    *
    * `rsd` is the HLL target relative standard deviation; `accuracy` the
    * `approx_percentile` inverse-epsilon (10000 → ±0.01% rank error). */
  def approxProfile(df: DataFrame, keyCols: Seq[String], numCols: Seq[String],
      rsd: Double = 0.02, accuracy: Int = 10000): DataFrame = {
    require(keyCols.nonEmpty || numCols.nonEmpty, "approxProfile needs at least one column")
    val bad = (keyCols ++ numCols).filterNot(df.columns.toSet)
    require(bad.isEmpty, s"approxProfile: no such columns: ${bad.mkString(", ")}")
    val aggs =
      keyCols.map(c => approx_count_distinct(col(c), rsd).as(s"__ad_$c")) ++
      numCols.flatMap(c => Seq(
        percentile_approx(col(c), lit(0.5), lit(accuracy)).cast("double").as(s"__p50_$c"),
        percentile_approx(col(c), lit(0.99), lit(accuracy)).cast("double").as(s"__p99_$c")))
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs =
      keyCols.map(c => s"'$c', __rows, `__ad_$c`, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)") ++
      numCols.map(c => s"'$c', __rows, CAST(NULL AS BIGINT), `__p50_$c`, `__p99_$c`")
    wide.selectExpr(
      s"stack(${stackArgs.size}, ${stackArgs.mkString(", ")}) " +
        "as (col_name, n_rows, approx_distinct, approx_p50, approx_p99)")
  }
}
