package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Typed custom-aggregation surface (SURVEY.md §2.12 "UDF/UDAF surface"):
 * a Spark `Aggregator` computing per-group embedding centroids in one pass.
 * The buffer is `(element-wise sums, count)` — constant size per group
 * regardless of group cardinality, with map-side partial aggregation, so a
 * 100 TB corpus aggregates with one small shuffle of `nGroups × dim`
 * doubles.
 */
object Aggregators {

  /** Mean vector per group. IN = the row's vector; BUF = (sums, n). */
  final class CentroidAggregator(dim: Int)
      extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
      var i = 0
      while (i < dim && i < v.length) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    override def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0) Seq.fill(dim)(0.0) else b._1.toIndexedSeq.map(_ / b._2)
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
        Encoders.scalaLong)
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Per-label centroid of the `embeddings` table, values rounded to
    * `scale` decimals so the result is robust to summation order. */
  def labelCentroids(spark: SparkSession, emb: DataFrame, scale: Int = 6): DataFrame = {
    import spark.implicits._
    val dim = emb.select(col("embedding")).head().getSeq[Float](0).length
    val agg = udaf(new CentroidAggregator(dim))
    emb.select(col("label"), col("embedding").cast("array<double>").as("v"))
      .groupBy("label")
      .agg(agg(col("v")).as("centroid_raw"))
      .select(col("label"),
        transform(col("centroid_raw"), x => round(x, scale)).as("centroid"))
  }
}
