package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed k-means clustering (Lloyd's algorithm) over an embedding
 * column — the cluster structure that powers cluster-balanced corpus
 * curation (SemDeDup-style pruning partitions the corpus with exactly this
 * before deduplicating inside clusters, and data-mixing recipes sample per
 * cluster to flatten topic skew).
 *
 * Unlike [[Similarity.trainCentroids]] (a bounded-sample quantizer private
 * to the IVF index), this is the full-corpus assignment operator: every
 * iteration is one distributed pass — a narrow codegen'd map for the
 * assignment (all k dot products from ONE `centroid_dots` call, the same
 * janino-safe expression the IVF path uses) and one partial-aggregating
 * `groupBy` for the recenter. Driver state is exactly the k×dim centroid
 * matrix (bounded metadata, independent of corpus size), so the shape holds
 * at any row count.
 *
 * Determinism contract (what makes the gate hash-exact): the k seed
 * centroids are the k lowest-id vectors; per-dimension means are rounded to
 * `scale` decimals before feeding the next round (so cross-engine
 * summation-order drift in `avg` cannot compound); assignment costs
 * `round(|c|^2 - 2*v.c, scale)` round BEFORE the argmin and break ties on
 * the lowest cluster id. An oracle that follows the same recipe (DuckDB:
 * chained CTEs, `list_dot_product`, `round(avg(..), scale)`) reproduces the
 * assignment bit-for-bit — the squared-norm/dot decomposition drops the
 * per-vector |v|^2 term, which is constant under the argmin.
 */
object Clustering {

  /** Argmin-cost cluster id for `v` against a literal centroid matrix:
    * cost_c = round(|c_c|^2 - 2 * v.c_c, scale), ties to the lowest c.
    * Linear-sized expression tree (array_position of the array_min), same
    * shape as the IVF list assignment. */
  private def assignment(v: Column, cents: Array[Array[Double]], scale: Int): Column = {
    // |c|^2 computed left-to-right on the driver — the same sequential fold
    // DuckDB's list_sum applies, so the doubles agree bitwise
    val cc = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }
    val dots = org.apache.spark.sql.graftx.VectorFunctions.centroid_dots(v, cents)
    val costs = zip_with(dots, array(cc.map(lit(_)): _*),
      (d, q) => round(q - d * lit(2.0), scale))
    (array_position(costs, array_min(costs)) - 1).cast("int")
  }

  /**
   * Assign every row to one of `k` clusters after `iters` Lloyd rounds.
   * Output: (vec_id BIGINT, cluster BIGINT). Seeds = the `k` lowest-id
   * vectors (deterministic, mirrorable); empty clusters keep their previous
   * centroid. `iters = 0` gates pure seed-assignment.
   */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    // cached: the normalized projection is re-read iters+1 times; without
    // the persist every Lloyd round re-scans and re-casts the source
    val base = Caches.track(corpus
      .select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull))
    // seed centroids: k lowest ids — k rows to the driver (bounded, = the
    // centroid matrix itself; float->double widening is exact, no rounding)
    val seeds = base.orderBy("vec_id").limit(k).collect()
    require(seeds.nonEmpty, "cannot cluster an empty corpus")
    var cents: Array[Array[Double]] = seeds.map(_.getSeq[Double](1).toArray)
    for (_ <- 0 until iters) {
      val assigned = base.withColumn("cluster", assignment(col("v"), cents, scale))
      // recenter: posexplode -> partial-aggregating groupBy over (cluster,
      // dim) — map-side combine keeps the shuffle at k*dim rows; the collect
      // is the k*dim centroid matrix (bounded metadata)
      val means = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("idx", "x")))
        .groupBy("cluster", "idx").agg(round(avg("x"), scale).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        val c = r.getInt(0); val i = r.getInt(1)
        if (c >= 0 && c < next.length) next(c)(i) = r.getDouble(2)
      }
      cents = next
    }
    base.withColumn("cluster", assignment(col("v"), cents, scale))
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
  }
}
