package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface over the `events` table shape (SURVEY.md
 * §2.11): the reference is strictly batch — its late-data story is the
 * midnight window rollback and the changed-key re-copy — but the same
 * semantics express naturally as streams, so the engine offers them:
 *
 *  - [[dedupedEvents]]: exactly-once-per-id event flow (`dropDuplicates`
 *    keyed on `event_id` under a watermark) — the streaming analog of the
 *    changed-key upsert's "replace, don't double-load";
 *  - [[windowedCounts]]: tumbling-window per-type aggregates with a
 *    watermark bounding state — the streaming analog of the date-window
 *    reload.
 *
 * Scale posture: state is keyed by (window × event_type) or event_id with
 * the watermark evicting expired state, so state size is bounded by the
 * lateness horizon, not the stream length. Parquet-directory sources here;
 * swap `readStream.parquet` for Kafka in production — the transforms are
 * source-agnostic.
 */
object EventStream {

  /** The events schema as the stream source delivers it (ns timestamps come
    * in as longs under `nanosAsLong`, exactly like the batch reader). */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // ns since epoch (TIMESTAMP(NANOS) as long)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the stream with `ts` normalized to a timestamp (same conversion as
    * `graft.io.Tables.load`). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(RawSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Exactly-once event flow: duplicates of an `event_id` arriving within
    * the watermark horizon are dropped; state for ids older than the
    * watermark is evicted. */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Tumbling-window count/sum per event type. Append output mode: a window
    * emits once its watermark passes — the streaming equivalent of the
    * reference finalizing yesterday's partition at midnight. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
}
