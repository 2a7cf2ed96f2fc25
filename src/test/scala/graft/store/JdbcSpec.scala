package graft.store

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/**
 * Exercises the production JDBC path end-to-end against embedded Derby (the
 * only database available offline — shipped with Spark for the Hive
 * metastore). The point is that `Jdbc.append`/`Jdbc.read` genuinely work,
 * including the partitioned parallel read that replaces the reference's
 * single streaming cursor (`TableCopyService.cs:140`); swapping the Derby
 * URL/driver for SQL Server's is configuration, not code.
 */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val cfg = {
    val home = java.nio.file.Files.createTempDirectory("graft-derby")
    System.setProperty("derby.system.home", home.toString) // keep derby.log out of the repo
    Jdbc.JdbcConfig(
      url = s"jdbc:derby:$home/db;create=true",
      user = "graft", password = "", // ignored by embedded Derby
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
  }

  test("JDBC round-trip: append creates the table and reads back identically") {
    val df = Seq((1L, "a", 10.5), (2L, "b", 20.25), (3L, "c", 30.0))
      .toDF("id", "name", "amount")
    Jdbc.append(df, cfg, "t_roundtrip")
    val back = Jdbc.read(spark, cfg, "t_roundtrip")
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 10.5), (2L, "b", 20.25), (3L, "c", 30.0)))
    // appending again appends, not overwrites (SqlBulkCopy semantics)
    Jdbc.append(df.limit(1), cfg, "t_roundtrip")
    assert(Jdbc.read(spark, cfg, "t_roundtrip").count() == 4)
  }

  test("JDBC partitioned parallel read splits the scan across partitions") {
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("id", "payload")
    Jdbc.append(df, cfg, "t_parts")
    val back = Jdbc.read(spark, cfg, "t_parts", splitCol = Some(("id", 1L, 100L, 4)))
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
  }

  test("the windowed read's BETWEEN is pushed down into the database scan") {
    import org.apache.spark.sql.functions.col
    // the production-source analog of PlanSpec's parquet PushedFilters pin:
    // the reference sends the window's WHERE in the SQL text
    // (TableCopyService.cs:140); Spark's JDBC relation must do the same,
    // not fetch the whole table and filter in the cluster
    val df = (1 to 28).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$i%02d 00:00:00"))).toDF("id", "ts")
    Jdbc.append(df, cfg, "t_push")
    val from = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val to = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val windowed = Jdbc.read(spark, cfg, "t_push")
      .filter(col("ts") >= from && col("ts") <= to)
    // the plan must at least translate the window into source filters …
    val plan = windowed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThanOrEqual(ts") && plan.contains("LessThanOrEqual(ts"),
      s"window predicate not offered to the JDBC source:\n$plan")
    assert(windowed.count() == 6)
    // … but scan metadata lists translation CANDIDATES whether or not they
    // reach the database. The load-bearing contract is unhandledFilters():
    // a filter NOT in the unhandled set is compiled into the JDBC WHERE
    // clause (JDBCRDD.scanTable). Pin it for the window's shape, and pin
    // that pushDownPredicate=false genuinely turns it off.
    import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThanOrEqual}
    def relationOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l.relation
      }.get
    val window: Array[Filter] =
      Array(GreaterThanOrEqual("ts", from), LessThanOrEqual("ts", to))
    assert(relationOf(windowed).unhandledFilters(window).isEmpty,
      "the window BETWEEN must compile into the JDBC WHERE clause, " +
        "not fetch-all-and-filter in the cluster")
    val noPush = spark.read.format("jdbc")
      .option("url", cfg.url).option("dbtable", "t_push")
      .option("driver", cfg.driver)
      .option("user", cfg.user).option("password", cfg.password)
      .option("pushDownPredicate", "false")
      .load()
      .filter(col("ts") >= from && col("ts") <= to)
    assert(relationOf(noPush).unhandledFilters(window).sameElements(window),
      "pushDownPredicate=false must leave every filter unhandled — if this " +
        "fails, the control is broken and the assertion above proves nothing")
    assert(noPush.count() == 6)
  }
}
