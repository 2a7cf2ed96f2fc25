package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/**
 * Fixture-table access. One place knows the quirks of the test parquet
 * (`TESTDATA.md` / `FIXTURES.md`) so every operator reads through here.
 *
 * Spark 4 cannot read parquet `TIMESTAMP(NANOS)` columns natively
 * (`PARQUET_TYPE_ILLEGAL`); with `spark.sql.legacy.parquet.nanosAsLong=true`
 * (set by `graft.Sessions.builder`) the `events.ts` column arrives as a
 * BIGINT of nanoseconds since the epoch. [[load]] normalizes it back to a
 * micro-precision `TIMESTAMP_NTZ` (exact: fixture values have microsecond
 * granularity) so downstream operators and DuckDB oracles agree.
 */
object Tables {

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Read one fixture table, normalizing known ns-as-long timestamp columns. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, name))
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (name == "events" && f.name == "ts" && f.dataType == LongType)
        // integer division — `ts / 1000` would go through double and lose
        // precision beyond 2^53 (ns-epoch values are ~2^60)
        acc.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      else acc
    }
  }
}

/** Canonical SparkSession settings shared by Verify/Bench/tests. */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
}
