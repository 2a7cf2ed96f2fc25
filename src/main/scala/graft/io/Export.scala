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

  /**
   * CSV/TSV shard export — the other interchange format training and
   * labeling stacks commonly ingest (spreadsheet-adjacent tooling, TSV
   * corpora). Same task-local file rolling as [[jsonlShards]] (no
   * repartition at any corpus size). Dialect pinned to RFC 4180: fields
   * quoted when needed, embedded quotes DOUBLED (`escape = "` — Spark's
   * default backslash escaping is not RFC and many readers reject it),
   * header row per shard. NULL is written as the sentinel `\N` (the
   * de-facto convention) so it stays distinguishable from the empty
   * string — the round-trip fidelity CSV famously loses by default.
   */
  def csvShards(df: DataFrame, dir: String, maxRecordsPerShard: Int,
      compression: Option[String] = None, delimiter: String = ","): Unit = {
    require(maxRecordsPerShard > 0, s"maxRecordsPerShard must be positive: $maxRecordsPerShard")
    val w = df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerShard.toLong.toString)
      .option("header", "true").option("sep", delimiter)
      .option("quote", "\"").option("escape", "\"")
      .option("nullValue", "\\N")
    compression.fold(w)(c => w.option("compression", c)).csv(dir)
  }

  /** Read [[csvShards]] output under an EXPLICIT schema (inference would
    * silently widen/narrow types — same discipline as [[readJsonl]]).
    * `multiLine` handles quoted embedded newlines; the quote/escape/null
    * options mirror the writer exactly. */
  def readCsv(spark: SparkSession, dir: String, schema: StructType,
      delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("sep", delimiter)
      .option("quote", "\"").option("escape", "\"")
      .option("nullValue", "\\N").option("multiLine", "true")
      .csv(dir)

  /** ORC shard export — the OTHER columnar interchange format (Hive-lineage
    * stacks read ORC where parquet isn't an option). Same task-local
    * rolling; types — above all timestamps, where cross-format round-trips
    * classically shift — are gated value-identical over the events table
    * (`o16_export_orc`). Schema travels in the ORC footer, so read-back
    * takes no explicit schema; the gate's oracle catches any silent type
    * re-mapping instead. */
  def orcShards(df: DataFrame, dir: String, maxRecordsPerShard: Int,
      compression: Option[String] = None): Unit = {
    require(maxRecordsPerShard > 0, s"maxRecordsPerShard must be positive: $maxRecordsPerShard")
    val w = df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerShard.toLong.toString)
    compression.fold(w)(c => w.option("compression", c)).orc(dir)
  }

  def readOrc(spark: SparkSession, dir: String): DataFrame = spark.read.orc(dir)
}
