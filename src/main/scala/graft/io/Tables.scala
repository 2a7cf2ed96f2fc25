package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Fixture-table access. One place knows the quirks of the test parquet
 * (`TESTDATA.md` / `FIXTURES.md`) so every operator reads through here.
 *
 * The `events.ts` column is normalized to a micro-precision `TIMESTAMP_NTZ`
 * WHATEVER the parquet physically carries — the engine's schema-on-source
 * discipline (round 13: fixtures silently moved from `TIMESTAMP(NANOS)` to
 * `timestamp[us]` mid-round; the batch path survived only because this
 * conversion was already conditioned on the arriving type):
 *  - BIGINT — `TIMESTAMP(NANOS)` under `spark.sql.legacy.parquet.nanosAsLong
 *    =true` (set by `graft.Sessions.builder`; Spark 4 cannot read NANOS
 *    natively, `PARQUET_TYPE_ILLEGAL`) — ns since epoch, integer-divided;
 *  - TIMESTAMP (LTZ, `isAdjustedToUTC` parquet) — cast (exact under the
 *    UTC session timezone);
 *  - TIMESTAMP_NTZ — already canonical.
 * Downstream operators and DuckDB oracles therefore agree regardless of
 * which representation a regenerated fixture carries.
 */
object Tables {

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Read one fixture table, normalizing `events.ts` to micros-NTZ from any
    * arriving representation. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, name))
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (name == "events" && f.name == "ts") f.dataType match {
        case LongType =>
          // integer division — `ts / 1000` would go through double and lose
          // precision beyond 2^53 (ns-epoch values are ~2^60)
          acc.withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
        case TimestampType => acc.withColumn("ts", col("ts").cast(TimestampNTZType))
        case TimestampNTZType => acc
        case other => throw new IllegalArgumentException(
          s"Tables.load: unsupported events.ts representation $other at " +
            s"${path(sfDir, name)} — expected ns-epoch BIGINT, TIMESTAMP, or TIMESTAMP_NTZ")
      }
      else acc
    }
  }
}

/** Canonical SparkSession settings shared by Verify/Bench/tests. The
  * graftx native expressions register as SQL functions via the standard
  * `SparkSessionExtensions` hook, so `spark.sql("... unicode_normalize(...)")`
  * works in every session this builder creates (a cluster deployment gets
  * the same via `spark.sql.extensions=org.apache.spark.sql.graftx
  * .GraftExtensions` with zero code changes). */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new org.apache.spark.sql.graftx.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Size post-shuffle partitions by BYTES, not by local parallelism
      // (optimization guide §2.2 "fewer, larger reduce partitions"): the
      // Spark default parallelismFirst=true ignores the advisory target
      // and re-splits every shuffle toward defaultParallelism tasks — at
      // cluster scale that floor is harmless (partitions are bytes-bound
      // anyway), but it exists only "to avoid perf regressions when AQE
      // first shipped" (Spark docs recommend false). false lets AQE
      // coalesce to the advisory size (64 MB default, untouched) on any
      // core count, so the setting is scale-adaptive rather than tuned to
      // local[32]. Env-overridable for A/B measurement.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.ui.enabled", "false")
}
