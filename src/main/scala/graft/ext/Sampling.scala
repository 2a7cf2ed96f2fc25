package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling operators for training-data pipelines
 * (SURVEY.md §2.12): hash-based fraction sampling and per-group stratified
 * sampling. Unlike `df.sample()` (seeded per-partition RNG — the selection
 * changes with the partitioning, so two runs over differently-split inputs
 * disagree), these select on a content hash of a stable id: the same row set
 * comes back on any cluster, any partitioning, any engine — which is what a
 * reproducible training-data pipeline needs, and what lets the DuckDB oracle
 * verify the selection bit-for-bit.
 *
 * Both are pure per-row maps (fraction) or one window shuffle (stratified);
 * no driver-side state — the plan is identical at 10^3 or 10^9 rows.
 */
object Sampling {

  /** 60-bit portable id hash: first 15 hex chars of `md5(CAST(id AS STRING))`
    * — the same construction as [[Dedup.md5TokenHash]], computable
    * bit-identically in any engine with md5 (DuckDB:
    * `CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15) AS BIGINT)`). */
  def idHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Keep ~`permille`/1000 of rows: `idHash(id) % 1000 < permille`.
    * Deterministic, engine-portable, and composable — the selection of one
    * row never depends on any other row. */
  def hashFraction(df: DataFrame, idCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille out of range: $permille")
    df.filter(idHash(col(idCol)) % 1000 < permille)
  }

  /** Stratified sample: the `n` rows with the smallest `(idHash, id)` per
    * `groupCol` stratum — a deterministic per-class quota (class-balanced
    * subset selection). One window shuffle on the stratum key; hash order
    * makes the pick uniform-ish while `(hash, id)` stays a total order. */
  def stratified(df: DataFrame, groupCol: String, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(idHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n).drop("__rn")
  }
}
