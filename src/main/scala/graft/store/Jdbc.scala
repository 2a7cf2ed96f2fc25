package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Production source/sink: JDBC against a real database (the reference's
 * world is SQL Server via TDS — `TableCopyService.cs` reads with a
 * streaming `SqlDataReader` and writes with `SqlBulkCopy`). In Spark the
 * same roles are `spark.read.jdbc` / `df.write.jdbc`, and the engine's
 * operators are storage-agnostic `DataFrame → DataFrame` transforms, so
 * swapping [[TableStore]] (parquet, used by the test harness) for this
 * module is the only change a production deployment needs.
 *
 * NOT exercised in this environment (no network, no database) — kept
 * compiled and documented so the swap is mechanical:
 *
 *  - partitioned parallel reads replace the reference's single cursor
 *    (`TableCopyService.cs:140`): `partitionColumn/lowerBound/upperBound/
 *    numPartitions` splits the source table across executors;
 *  - `pushDownPredicate` (default on) sends the window's `BETWEEN` to the
 *    database, the analog of the reference's WHERE-in-SQL-text;
 *  - writes batch inserts per partition (`batchsize`); for SQL Server,
 *    `reliabilityLevel`/bulk-copy options come from the MS Spark connector
 *    if its jar is deployed — the call shape is identical.
 */
object Jdbc {

  final case class JdbcConfig(
      url: String,
      user: String,
      password: String,
      driver: String = "com.microsoft.sqlserver.jdbc.SQLServerDriver")

  private def props(cfg: JdbcConfig): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("user", cfg.user)
    p.setProperty("password", cfg.password)
    p.setProperty("driver", cfg.driver)
    p
  }

  /** Parallel partitioned read of `schema.table`, split on `splitCol`
    * (typically the primary key or the date column as epoch). */
  def read(spark: SparkSession, cfg: JdbcConfig, table: String,
      splitCol: Option[(String, Long, Long, Int)] = None): DataFrame =
    splitCol match {
      case Some((colName, lower, upper, parts)) =>
        spark.read.jdbc(cfg.url, table, colName, lower, upper, parts, props(cfg))
      case None =>
        spark.read.jdbc(cfg.url, table, props(cfg))
    }

  /** Append rows (the `SqlBulkCopy` analog); `batchsize` tunes round-trips. */
  def append(df: DataFrame, cfg: JdbcConfig, table: String, batchSize: Int = 10000): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(cfg.url, table, props(cfg))
}
