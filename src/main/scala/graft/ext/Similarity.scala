package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (`array<float>`, SURVEY.md §2.12):
 * brute-force cosine top-k as the exact baseline, and a random-hyperplane
 * LSH-bucketed variant as the scale path (bucket = IVF-style inverted list;
 * probing = own bucket + hamming-1 neighbors).
 *
 * All vector math uses Spark's higher-order array functions (`zip_with` +
 * `aggregate`) — codegen'd expressions, no UDF, no MLlib dependency.
 */
object Similarity {

  import org.apache.spark.sql.graftx.VectorFunctions.vec_dot

  /** Dot product of two `array<double>` columns — a codegen'd native
    * Catalyst expression ([[org.apache.spark.sql.graftx.VectorDot]]); the interpreted
    * `aggregate(zip_with(...))` equivalent is ~40× slower on pair scans. */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two raw (unnormalized) double vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast an `array<float>` embedding to `array<double>` for exact math. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Project `(idAs, unit-normalized vector)` — normalization happens ONCE
    * per row here so pairwise similarity later is a single dot product. */
  private def unitized(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame =
    df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .select(col(idAs), transform(col("__v"), x => x / col("__n")).as(vecAs))

  /**
   * Exact brute-force top-k: for each query vector, the `k` nearest corpus
   * vectors by cosine (self-matches excluded, ties broken by corpus id).
   *
   * The query side is **broadcast** — the corpus never shuffles, each
   * corpus partition streams once against the in-memory query set. This is
   * the right plan shape at any corpus size as long as the query batch is
   * small; for large query batches, chunk the queries and union.
   */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(unitized(queries, idCol, vecCol, "query_id", "qv"))
    val c = unitized(corpus, idCol, vecCol, "neighbor_id", "cv")
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("query_id", "neighbor_id")
  }

  /** Deterministic random hyperplanes (seeded), as literal columns. */
  private def planes(dim: Int, nPlanes: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit p set iff `v · plane_p >= 0`. */
  private def bucketOf(v: Column, ps: Seq[Array[Double]]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p.toSeq)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /**
   * Approximate top-k via random-hyperplane LSH: corpus vectors are hashed
   * into `2^nPlanes` buckets (the coarse inverted-file structure); each query
   * probes its own bucket plus all hamming-1 neighbor buckets, and exact
   * cosine re-ranks within the probed lists.
   *
   * At cluster scale the bucket assignment is a single narrow map, the
   * probe join shuffles only on `bucket` (small keys), and each inverted
   * list is a tiny fraction of the corpus — the classic IVF trade: recall
   * (more probes) vs. cost (fewer). Recall vs. the exact [[topK]] is
   * measured in `SimilaritySpec`.
   */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val ps = planes(corpus.select(col(vecCol)).head().getSeq[Float](0).length, nPlanes, seed)
    val c = unitized(corpus, idCol, vecCol, "neighbor_id", "cv")
      .withColumn("bucket", bucketOf(col("cv"), ps))
    val q = unitized(queries, idCol, vecCol, "query_id", "qv")
      .withColumn("b0", bucketOf(col("qv"), ps))
    // multiprobe: own bucket + flip each bit once (hamming-1 neighbors)
    val probes = array((lit(0L) +: (0 until nPlanes).map(i => shiftleft(lit(1L), i))): _*)
    val probed = q.select(col("query_id"), col("qv"),
      explode(transform(probes, m => col("b0").bitwiseXOR(m))).as("bucket"))
    val scored = broadcast(probed).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("query_id", "neighbor_id")
  }

  /**
   * Embedding near-duplicate pairs: all `(id_a < id_b)` with cosine ≥
   * `threshold`. Exact O(n²) pair scan with the smaller side broadcast —
   * the correct baseline at fixture scale; at corpus scale substitute the
   * LSH buckets from [[annTopK]] as the blocking stage (same verify step).
   */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = unitized(emb, idCol, vecCol, "id_a", "va")
    val b = unitized(emb, idCol, vecCol, "id_b", "vb")
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .filter(dot(col("va"), col("vb")) >= threshold)
      .select("id_a", "id_b")
  }
}
