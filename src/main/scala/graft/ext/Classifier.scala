package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Distributed linear text classification without MLlib — the
 * quality-filter trainer of the LLM-data pipeline (the fastText-style
 * "does this look like reference text" scorer of CCNet/GPT-3-line
 * filtering, Joulin et al. 2016; hashing-trick features per Weinberger
 * et al. 2009): logistic regression by full-batch gradient descent where
 * each iteration is ONE distributed aggregation.
 *
 * Scale shape: the hashed feature frame is built once (token explode →
 * slot counts → dense `array<double>`, length-normalized) and cached;
 * per iteration the margin is a codegen'd `vector_dot` against the
 * BROADCAST weight literal, and the gradient is a `posexplode` +
 * per-slot sum — a `dim`-row aggregate, so the driver receives O(dim)
 * doubles per step regardless of corpus size (the classic
 * parameter-server-free batch GD layout; mini-batching and momentum are
 * orthogonal refinements). Weights update on the driver in constant
 * memory. Training is deterministic up to floating-point partial-sum
 * order (zero init, fixed rate and steps) — accuracy-level results are
 * partitioning-stable, pinned by spec.
 */
object Classifier {

  import org.apache.spark.sql.graftx.VectorFunctions.vec_dot

  /**
   * Hashing-trick bag-of-tokens features: every token lands in
   * `xxhash64(token) pmod dim`, counts are normalized by the document's
   * token count (so long docs don't dominate the margin), and slot
   * `dim` (one past the hashed range) carries the constant 1.0 bias.
   * Returns `(idCol, features array<double> of length dim+1)`.
   * Docs with NULL text produce no tokens and are absent (the `unnest`
   * convention shared with the rest of the text family).
   */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val tok = docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("__w"))
    val slots = tok.groupBy(col(idCol), pmod(xxhash64(col("__w")), lit(dim.toLong)).as("__slot"))
      .agg(count(lit(1)).as("__c"))
    val n = slots.groupBy(col(idCol)).agg(sum(col("__c")).as("__n"))
    // dense vector assembled from the doc's sparse slot map; the transform
    // lambda runs once per doc at build time (the frame is cached by the
    // trainer), not in the per-iteration hot path
    slots.join(n, Seq(idCol))
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__slot"),
        col("__c").cast("double") / col("__n").cast("double")))).as("__m"))
      .select(col(idCol), concat(
        transform(sequence(lit(0L), lit(dim.toLong - 1L)),
          i => coalesce(element_at(col("__m"), i), lit(0.0))),
        array(lit(1.0))).as("features"))
  }

  /** One trained model: weight vector (length dim+1, bias last) plus the
    * final training diagnostics. */
  final case class Model(weights: Array[Double], trainAccuracy: Double,
      trainLogLoss: Double, steps: Int)

  /**
   * Full-batch logistic regression over `(features array<double>,
   * labelCol ∈ {0,1})`, with ADAGRAD per-coordinate step scaling (Duchi
   * et al. 2011) — plain GD stalls here because the feature scales are
   * badly mixed (length-normalized token slots ~1/n_tokens vs the 1.0
   * bias slot), and Adagrad's `lr / √Σg²` equalizes them without any
   * per-slot standardization pass. One aggregation job per step; EAGER.
   * The feature frame is cached for the duration.
   */
  def trainLogistic(data: DataFrame, labelCol: String, steps: Int,
      learningRate: Double): Model = {
    require(steps > 0 && learningRate > 0, s"bad hyperparams: $steps, $learningRate")
    val spark = data.sparkSession
    import spark.implicits._
    val cached = Caches.track(data.select(col("features"),
      col(labelCol).cast("double").as("__y")))
    val dim = cached.select(size(col("features"))).head().getInt(0)
    val nRows = cached.count().toDouble
    var w = new Array[Double](dim)
    val gsq = new Array[Double](dim)
    // weights travel as a broadcast ONE-ROW FRAME, not a literal: a fresh
    // typedLit per step changes the generated source, so every iteration
    // would pay a full janino compile (measured: the compile dominates the
    // whole training). With the identical plan shape each step, Spark's
    // codegen cache compiles once and steps only pay the (tiny) broadcast.
    def withW = cached.crossJoin(broadcast(Seq(Tuple1(w.toSeq)).toDF("__w")))
    var step = 0
    while (step < steps) {
      // err = sigmoid(w·x) − y per row; gradient_j = Σ err · x_j / n
      val grads = withW
        .withColumn("__err",
          lit(1.0) / (lit(1.0) + exp(-vec_dot(col("features"), col("__w")))) - col("__y"))
        .select(posexplode(col("features")).as(Seq("__j", "__x")), col("__err"))
        .groupBy(col("__j")).agg(sum(col("__x") * col("__err")).as("__g"))
        .collect()
      val g = new Array[Double](dim)
      grads.foreach { r: Row => g(r.getInt(0)) = r.getDouble(1) / nRows }
      var j = 0
      while (j < dim) {
        gsq(j) += g(j) * g(j)
        if (gsq(j) > 0) w(j) -= learningRate * g(j) / math.sqrt(gsq(j) + 1e-10)
        j += 1
      }
      step += 1
    }
    val m = withW.select(
      avg(when((vec_dot(col("features"), col("__w")) > 0.0) === (col("__y") > 0.5), 1.0)
        .otherwise(0.0)).as("acc"),
      // clamped log-loss (pure diagnostics; clamping only guards ln(0))
      avg(-(col("__y") * log(greatest(lit(1e-12),
          lit(1.0) / (lit(1.0) + exp(-vec_dot(col("features"), col("__w"))))))
        + (lit(1.0) - col("__y")) * log(greatest(lit(1e-12),
          lit(1.0) - lit(1.0) / (lit(1.0) + exp(-vec_dot(col("features"), col("__w")))))))
      ).as("loss")).head()
    Model(w, m.getDouble(0), m.getDouble(1), steps)
  }

  /** Score a corpus with a trained model: `(idCol, score)` where score =
    * `σ(w·x)` — one narrow codegen'd projection over the cached-or-fresh
    * feature frame; the weight vector broadcasts as a literal. */
  def score(features: DataFrame, model: Model, idCol: String): DataFrame = {
    val wLit = typedLit(model.weights.toSeq)
    features.select(col(idCol),
      (lit(1.0) / (lit(1.0) + exp(-vec_dot(col("features"), wLit)))).as("score"))
  }
}
