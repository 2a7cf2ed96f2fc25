package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for joins whose key distribution is heavy-tailed — the
 * classic salting pattern for when AQE's skew-join split isn't available
 * (e.g. broadcast is impossible because both sides are large AND a handful
 * of keys dominate).
 *
 * `saltedJoin(facts, dim, key, saltFactor)` spreads each hot fact key over
 * `saltFactor` shuffle partitions by appending a salt derived from a stable
 * per-row hash (deterministic — no `rand()`, so plans stay reproducible and
 * retries are safe), and replicates the (smaller) right side once per salt
 * value. Correctness is unchanged: every fact row still meets every matching
 * right row exactly once.
 *
 * Use when: right side too big to broadcast, left side skewed. Cost: right
 * side shuffled `saltFactor`×. AQE's `skewJoin` handles the sort-merge case
 * automatically; this utility covers deliberate pre-salting (stable plans,
 * or aggregations-after-join keyed on the salted key).
 */
object Skew {

  /** Deterministic salt in `[0, saltFactor)` from the row's full content
    * hash — stable across retries, unlike `rand()`. */
  def salt(saltFactor: Int, cols: Seq[Column]): Column =
    pmod(hash(cols: _*), lit(saltFactor))

  /** Allowed join types: ones where only LEFT rows can be emitted unmatched.
    * Right/full outer would emit each unmatched right row `saltFactor` times
    * (the right side is replicated per salt). */
  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(SupportedJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti joins; '$joinType' would " +
        "duplicate unmatched right rows once per salt")
    val saltedLeft = left.withColumn("__salt",
      salt(saltFactor, left.columns.toIndexedSeq.map(col)))
    val saltedRight = right.crossJoin(
      org.apache.spark.sql.functions.broadcast(
        spark_partition_salts(saltFactor)))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** A one-column DataFrame `__salt = 0..n-1` — built via `explode` of a
    * literal sequence so it needs no SparkSession handle. */
  private def spark_partition_salts(n: Int): DataFrame = {
    // derive from an existing 1-row frame: use a literal sequence explode
    // over a dummy projection of the right side is avoided; instead callers
    // pass any DataFrame — simplest is a range over the active session
    val spark = org.apache.spark.sql.SparkSession.active
    spark.range(n.toLong).select(col("id").cast("int").as("__salt"))
  }
}
