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
}
