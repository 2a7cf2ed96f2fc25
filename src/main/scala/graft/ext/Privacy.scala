package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Privacy screens over quasi-identifier projections — the release gate a
 * training corpus passes AFTER PII redaction ([[TextAnalysis.piiRedact]]
 * strips direct identifiers; these measure RE-identification risk from the
 * indirect ones): k-anonymity (Sweeney 2002) says every quasi-identifier
 * combination must be shared by ≥ k rows, and l-diversity (Machanavajjhala
 * et al. 2007) additionally requires ≥ l distinct sensitive values inside
 * each combination, so an attacker who pins the group still cannot infer
 * the sensitive attribute.
 *
 * Both reduce to grouped exact counts, so they hash-gate against a DuckDB
 * oracle directly. Suppression (the enforcement step) generalizes the
 * quasi-identifiers of failing rows to an opaque marker rather than
 * dropping them — the corpus keeps its size and the suppressed rows stay
 * usable for anything that doesn't key on the generalized columns.
 *
 * Scale shape: one groupBy over the quasi-identifier tuple (count +
 * count-distinct partial aggregation), then a broadcast-or-shuffle join of
 * the small group table back onto the rows. Group cardinality is bounded
 * by the quasi-identifier domain product, not the row count, so the group
 * table broadcasts at any corpus size with a sane QI choice.
 */
object Privacy {

  /**
   * Per-group anonymity statistics: for every distinct quasi-identifier
   * tuple, its support `n`, the number of distinct `sensitive` values
   * `l_distinct`, and the `k_anonymous` / `l_diverse` verdicts at the
   * given thresholds.
   */
  def anonymityStats(df: DataFrame, qi: Seq[String], sensitive: Column,
      k: Int, l: Int): DataFrame = {
    require(qi.nonEmpty, "anonymityStats: need at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"anonymityStats: k and l must be >= 1: k=$k l=$l")
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("l_distinct"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("l_distinct") >= l)
  }

  /**
   * Enforce k-anonymity by suppression: rows whose quasi-identifier group
   * has support < k get every `qi` column generalized to `marker` (the
   * columns are cast to string to admit it). Adds `grp_n` (the original
   * group's support) and `suppressed`. The group table is qi-domain-
   * bounded, but a high-cardinality QI choice (zip × birthdate — the
   * canonical re-identification case, exactly when suppression fires
   * most) makes it near-row-count-sized, so the broadcast is SIZE-GATED
   * (`Ops.hintIfSmall`) rather than forced — past the threshold it runs
   * as a keyed shuffle join.
   *
   * NULL quasi-identifier values form their own group (exactly as the
   * groupBy counts them) — the row join is NULL-SAFE (`<=>` per QI
   * column), so a row with a NULL QI is suppressed or kept by its
   * NULL-group's support instead of silently dropping out of the corpus
   * (a plain equi-join never matches NULL, which would break the
   * "suppression keeps the corpus size" contract — r17 advice).
   */
  def suppressBelowK(df: DataFrame, qi: Seq[String], k: Int,
      marker: String = "*"): DataFrame = {
    require(qi.nonEmpty, "suppressBelowK: need at least one quasi-identifier")
    val groups = qi.foldLeft(
      df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("grp_n"))) {
      (acc, c) => acc.withColumnRenamed(c, s"__g_$c")
    }
    val cond = qi.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    val joined = df.join(graft.ops.Ops.hintIfSmall(groups), cond)
      .drop(qi.map(c => s"__g_$c"): _*)
    val suppressed = col("grp_n") < k
    val out = qi.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c,
        when(suppressed, lit(marker)).otherwise(col(c).cast("string")))
    }
    out.withColumn("suppressed", suppressed)
  }
}
