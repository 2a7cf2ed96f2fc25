package graft.ext

import graft.ops.Ops
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-evaluation metrics over scored corpora — the measurement step that
 * closes every training-data loop in this engine (quality classifier →
 * threshold pick, retrieval → ranking quality, heuristic labeler → agreement
 * with gold). The reference has no analog (it copies tables, it never scores
 * them); these are beyond-reference extension operators in the SURVEY §2.12
 * family, kept EXACT so they can be hash-gated against a DuckDB oracle:
 * every statistic reduces to integer/rank arithmetic with one final division.
 *
 * Scale posture: nothing here materializes per-row data on the driver.
 * [[aucBinary]] is the interesting one — a textbook
 * `row_number() OVER (ORDER BY score)` plans `Exchange SinglePartition`
 * (one task sorts the corpus), so ranks come from [[Ops.globalOrdinals]]'s
 * range-partitioned numbering instead and ties collapse by a `groupBy` on
 * the score value. Everything downstream of the rank assignment is a
 * constant-width aggregate.
 */
object Eval {

  /**
   * Exact ROC AUC of a numeric score against a binary label, via the
   * Mann–Whitney U statistic with midranks for ties (Hand & Till 2001's
   * formulation): AUC = (R₊ − P(P+1)/2) / (P·N) where R₊ is the sum of
   * positive midranks over the pooled ranking.
   *
   * Exactness: ranks are integers from a total order on (score, id); a
   * tie group occupying ranks [lo, hi] has midrank (lo+hi)/2, so
   * 2·R₊ = Σ n₊(lo+hi) stays integral — the sum runs in DECIMAL(38,0)
   * (longs would overflow past ~10⁹ rows × 10⁹ ranks) and the single
   * division happens once, in double, at the end.
   *
   * One row out: `n_pos`, `n_neg`, `auc` (round 6).
   *
   * Scale shape: globalOrdinals = distributed range sort (no
   * single-partition exchange), then one groupBy(score) shuffle, then a
   * scalar aggregate. Skewed score distributions (many ties) only make
   * the tie groups bigger, never a hot single task, because the midrank
   * needs only min/max/count per group.
   */
  def aucBinary(df: DataFrame, score: Column, positive: Column,
      id: Column): DataFrame = {
    val scored = df
      .select(score.cast("double").as("__s"),
        when(positive, 1L).otherwise(0L).as("__y"), id.as("__id"))
      .filter(col("__s").isNotNull)
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranked = Ops.globalOrdinals(scored, Seq(col("__s"), col("__id")), parts,
      ordCol = "__ord")
    ranked
      .groupBy("__s")
      .agg((min("__ord") + 1).as("__lo"), (max("__ord") + 1).as("__hi"),
        sum("__y").as("__np"), count(lit(1)).as("__n"))
      .agg(
        sum(col("__np").cast("decimal(38,0)") *
          (col("__lo") + col("__hi")).cast("decimal(38,0)")).as("__r2"),
        sum("__np").as("__p"), sum(col("__n") - col("__np")).as("__nn"))
      // AUC is undefined without both classes — raise loudly (the
      // ksStatistic posture) instead of silently dividing to NaN/Infinity
      // (the filter CONSUMES the guard so it cannot be pruned)
      .filter(when(col("__p").isNull || col("__p") === 0L || col("__nn") === 0L,
        raise_error(lit("aucBinary: need at least one positive and one " +
          "negative scored row — AUC is undefined for a single-class input")))
        .otherwise(lit(true)))
      .select(col("__p").as("n_pos"), col("__nn").as("n_neg"),
        round((col("__r2").cast("double") -
            col("__p").cast("double") * (col("__p").cast("double") + 1)) /
          (lit(2.0) * col("__p").cast("double") * col("__nn").cast("double")),
          6).as("auc"))
  }

  /**
   * Reliability (calibration) bins for a score in [0, 1] against a binary
   * outcome — the per-bin table behind a reliability diagram and the ECE
   * metric: equal-width bins of the score, each with its support, mean
   * predicted score, and empirical positive rate. A well-calibrated scorer
   * has `mean_score ≈ frac_pos` in every bin.
   *
   * The raw score is normalized by the global max (one broadcast scalar),
   * so callers can pass any non-negative score. Bin assignment is the
   * bit-deterministic `floor((s / max) * bins)` clamped to [0, bins);
   * `mean_score` divides an EXACT decimal(18,2) sum of the RAW score once
   * by (n · max) — raw scores are accumulated at 2-decimal precision so
   * the sum is order-independent and engine-portable (scores with finer
   * precision lose sub-0.01 detail in the bin MEAN only, never in the bin
   * assignment itself).
   *
   * Scale shape: one scalar-aggregate broadcast + one groupBy(bin) over
   * at most `bins` groups — map-side partial aggregation does all the work.
   */
  def calibrationBins(df: DataFrame, score: Column, positive: Column,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"calibrationBins: bins must be positive: $bins")
    val base = df.select(score.cast("double").as("__v"),
      when(positive, 1L).otherwise(0L).as("__y"))
      .filter(col("__v").isNotNull)
    val mx = broadcast(base.agg(max("__v").as("__mx")))
    base.crossJoin(mx)
      // a non-positive max (dead scorer, or negative scores) makes v/max
      // NaN or flips bin order — refuse loudly instead of silently piling
      // NaN rows into bin 0 (the filter CONSUMES the guard so it cannot
      // be pruned)
      .filter(when(col("__mx").isNull || col("__mx") <= 0.0, raise_error(lit(
        "calibrationBins: global max score is not positive — scores must " +
          "be non-negative with at least one positive value")))
        .otherwise(lit(true)))
      .withColumn("bin",
        least(greatest(floor(col("__v") / col("__mx") * bins).cast("int"),
          lit(0)), lit(bins - 1)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("__v").cast("decimal(18,2)")).as("__sv"),
        sum("__y").as("__np"), max("__mx").as("__m"))
      .select(col("bin"), col("n"),
        round(col("__sv").cast("double") / col("n").cast("double") /
          col("__m"), 6).as("mean_score"),
        round(col("__np").cast("double") / col("n").cast("double"), 6)
          .as("frac_pos"))
  }

  /**
   * Per-class precision / recall / F1 from (gold, predicted) pairs — the
   * classification report that closes the train→apply→evaluate loop
   * around [[TextAnalysis.nbClassify]] / [[Similarity.knnClassify]]:
   * per class, `tp`, gold support, predicted support, and the three
   * ratios. F1 uses the integer identity `2·tp / (2·tp + fp + fn)` so
   * every ratio is ONE exact integer division (never the P·R composite,
   * which would compound two roundings). Classes with zero gold or zero
   * predicted support emit NULL for the undefined ratio rather than 0
   * (0 would be indistinguishable from a real all-miss).
   *
   * Scale shape: one |labels|²-cell confusion count, then label-keyed
   * margins joined back — label-cardinality frames throughout.
   */
  def classificationReport(df: DataFrame, gold: Column,
      pred: Column): DataFrame = {
    val cells = df.select(gold.as("__g"), pred.as("__p"))
      .filter(col("__g").isNotNull && col("__p").isNotNull)
      .groupBy("__g", "__p").agg(count(lit(1)).as("__c"))
    val cached = Caches.track(cells)
    val goldM = cached.groupBy(col("__g").as("label")).agg(sum("__c").as("n_gold"))
    val predM = cached.groupBy(col("__p").as("label")).agg(sum("__c").as("n_pred"))
    val tp = cached.filter(col("__g") === col("__p"))
      .select(col("__g").as("label"), col("__c").as("tp"))
    goldM.join(predM, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_gold"), lit(0L)).as("n_gold"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("label"), col("n_gold"), col("n_pred"), col("tp"),
        when(col("n_pred") > 0,
          round(col("tp").cast("double") / col("n_pred").cast("double"), 6))
          .as("precision"),
        when(col("n_gold") > 0,
          round(col("tp").cast("double") / col("n_gold").cast("double"), 6))
          .as("recall"),
        when(col("n_gold") + col("n_pred") > 0,
          round(lit(2.0) * col("tp").cast("double") /
            (col("n_gold") + col("n_pred")).cast("double"), 6)).as("f1"))
  }

  /**
   * Kendall rank agreement (τ-a) between two scorers over each group's
   * top-`head` ranking — the metric for "does the cheap scorer order the
   * corpus like the expensive one?" before swapping a classifier for a
   * heuristic in a selection pipeline (rank agreement is what matters
   * there: selection cuts on order, not on calibrated values).
   *
   * Both rankings are made TOTAL orders by the id tiebreak, so there are
   * no rank ties and τ-a = (C − D) / (n(n−1)/2) over exact integer
   * concordant/discordant counts — one division at the end.
   *
   * Scale shape: the head cut is one per-group rank window; the pair
   * comparison is a self-join WITHIN the head (≤ head²/2 pairs per group,
   * a caller-bounded constant — `head` is capped at 1000 so a group can
   * never form an unbounded pair set; full-corpus τ would be O(n²) and is
   * deliberately not offered).
   */
  def rankAgreement(df: DataFrame, group: Column, score1: Column,
      score2: Column, id: Column, head: Int): DataFrame = {
    require(head >= 2 && head <= 1000, s"rankAgreement: head must be in [2,1000]: $head")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(group.as("__g"), score1.as("__s1"), score2.as("__s2"),
      id.as("__id")).filter(col("__s1").isNotNull && col("__s2").isNotNull)
    val w1 = Window.partitionBy("__g").orderBy(col("__s1").desc, col("__id"))
    val headDf = base.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= head)
    val w2 = Window.partitionBy("__g").orderBy(col("__s2").desc, col("__id"))
    val ranked = headDf.withColumn("__r2", row_number().over(w2))
      .select(col("__g"), col("__r1"), col("__r2"))
    val a = ranked.select(col("__g"), col("__r1").as("__i1"), col("__r2").as("__i2"))
    val b = ranked.select(col("__g"), col("__r1").as("__j1"), col("__r2").as("__j2"))
    a.join(b, Seq("__g")).filter(col("__i1") < col("__j1"))
      .groupBy(col("__g").as("grp"))
      .agg(count(lit(1)).as("__pairs"),
        sum(when(col("__i2") < col("__j2"), 1L).otherwise(0L)).as("concordant"))
      .select(col("grp"), col("__pairs").as("n_pairs"), col("concordant"),
        (col("__pairs") - col("concordant")).as("discordant"),
        round((lit(2.0) * col("concordant").cast("double") -
            col("__pairs").cast("double")) / col("__pairs").cast("double"), 6)
          .as("tau"))
  }

  /**
   * Cohen's kappa between a predicted and a gold label column — chance-
   * corrected agreement, the standard acceptance metric for a heuristic
   * labeler (our n-gram language ID) against reference annotations before
   * trusting it to route a corpus: κ = (p_o − p_e) / (1 − p_e) with
   * p_e = Σ_c rowmarg_c · colmarg_c / n².
   *
   * All inputs to the two divisions are exact integer counts (the marginal
   * product sum runs in DECIMAL(38,0) for 10⁹-row safety), so the result
   * is engine-portable at round 6.
   *
   * Scale shape: one count per (pred, gold) cell — |labels|² rows, a
   * constant — then driver-free combination via a broadcast of the cell
   * table's aggregates (all scalar).
   */
  def cohensKappa(df: DataFrame, pred: Column, gold: Column): DataFrame = {
    val cells = df.select(pred.as("__p"), gold.as("__g"))
      .filter(col("__p").isNotNull && col("__g").isNotNull)
      .groupBy("__p", "__g").agg(count(lit(1)).as("__c"))
    val rowm = cells.groupBy("__p").agg(sum("__c").as("__rm"))
    val colm = cells.groupBy("__g").agg(sum("__c").as("__cm"))
    val tot = cells.agg(sum("__c").as("n"),
      sum(when(col("__p") === col("__g"), col("__c")).otherwise(0L)).as("__diag"))
    val pe = broadcast(rowm.join(colm, col("__p") === col("__g"))
      .agg(coalesce(sum(col("__rm").cast("decimal(38,0)") *
        col("__cm").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
        .as("__sp")))
    val po = col("__diag").cast("double") / col("n").cast("double")
    val peV = col("__sp").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    broadcast(tot).crossJoin(pe)
      .select(col("n"),
        round(po, 6).as("p_observed"),
        round(peV, 6).as("p_expected"),
        // p_e = 1 (every rating pair lands in one cell by chance) makes κ
        // 0/0-undefined — surface NULL, not an ANSI divide-by-zero. The
        // test is the EXACT integer identity sp = n² (a double peV == 1.0
        // comparison silently breaks past 2⁵³, and the oracle mirrors the
        // same integer CASE so the degenerate row cannot diverge)
        when(col("__sp") ===
            col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)"),
          lit(null).cast("double"))
          .otherwise(round((po - peV) / (lit(1.0) - peV), 6)).as("kappa"))
  }
}
