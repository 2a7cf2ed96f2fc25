package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Training-data delivery: JSONL shard export — the interchange format the
 * consuming training stack actually reads (one JSON object per line,
 * many similarly-sized shard files; cf. the public LLM data releases —
 * C4/The Pile/RedPajama all ship JSONL shards).
 *
 * `maxRecordsPerShard` bounds shard size WITHOUT a repartition: Spark's
 * `maxRecordsPerFile` rolls files within each task, so the write stays
 * one narrow pass at any corpus size (shard count ≈ rows/limit, never
 * fewer files than tasks). `compression = "gzip"` (or zstd where the
 * runtime provides it) is the usual wire format; None writes plain text.
 *
 * Fidelity contract: a read-back under the SOURCE schema must reproduce
 * the frame row-for-row — JSON escaping, unicode, NULL fields and int
 * widths all round-trip (gated: `o14_export_jsonl` re-reads an exported
 * corpus against the original table's oracle). Schema is supplied
 * explicitly on read: inferring it from JSON would silently widen/narrow
 * types and is exactly the drift the store's append guard exists to stop.
 */
object Export {

  def jsonlShards(df: DataFrame, dir: String, maxRecordsPerShard: Int,
      compression: Option[String] = None): Unit = {
    require(maxRecordsPerShard > 0, s"maxRecordsPerShard must be positive: $maxRecordsPerShard")
    val w = df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerShard.toLong.toString)
    compression.fold(w)(c => w.option("compression", c)).json(dir)
  }

  def readJsonl(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(dir)
}
