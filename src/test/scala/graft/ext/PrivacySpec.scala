package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (zip, age-band, diagnosis): the classic k-anonymity example shape
  private def records = Seq(
    ("02139", "20s", "flu"), ("02139", "20s", "flu"), ("02139", "20s", "cold"),
    ("02139", "30s", "flu"),
    ("94105", "20s", "cold"), ("94105", "20s", "covid"), ("94105", "20s", "flu")
  ).toDF("zip", "age", "dx")

  test("anonymityStats: support, sensitive diversity, and both verdicts") {
    val st = Privacy.anonymityStats(records, Seq("zip", "age"), col("dx"), k = 3, l = 3)
      .orderBy("zip", "age").collect()
    assert(st.length == 3)
    val Seq(a, b, c) = st.toSeq
    // (02139, 20s): n=3, dx ∈ {flu, cold} → l_distinct=2
    assert(a.getAs[Long]("n") == 3 && a.getAs[Long]("l_distinct") == 2)
    assert(a.getAs[Boolean]("k_anonymous") && !a.getAs[Boolean]("l_diverse"))
    // (02139, 30s): singleton → fails both
    assert(b.getAs[Long]("n") == 1 && !b.getAs[Boolean]("k_anonymous"))
    // (94105, 20s): n=3, all three dx distinct → passes both
    assert(c.getAs[Long]("n") == 3 && c.getAs[Long]("l_distinct") == 3)
    assert(c.getAs[Boolean]("k_anonymous") && c.getAs[Boolean]("l_diverse"))
  }

  test("suppressBelowK: failing groups generalized, passing groups intact, size preserved") {
    val out = Privacy.suppressBelowK(records, Seq("zip", "age"), k = 2)
    assert(out.count() == 7) // suppression never drops rows
    val suppressed = out.filter(col("suppressed")).collect()
    assert(suppressed.length == 1)
    assert(suppressed.head.getAs[String]("zip") == "*")
    assert(suppressed.head.getAs[String]("age") == "*")
    assert(suppressed.head.getAs[Long]("grp_n") == 1)
    // intact rows keep their (stringified) quasi-identifiers
    val kept = out.filter(!col("suppressed") && col("zip") === "02139").collect()
    assert(kept.length == 3 && kept.forall(_.getAs[String]("age") == "20s"))
  }

  test("suppressBelowK: NULL quasi-identifiers form their own group and never drop rows") {
    // two rows share a NULL zip (their group has support 2), one is a NULL
    // singleton on (zip, age) — a plain equi-join would silently drop all
    // three (NULL never equals NULL), shrinking the corpus (r17 advice)
    val withNulls = Seq(
      (Option("02139"), "20s", "flu"), (Option("02139"), "20s", "cold"),
      (Option.empty[String], "20s", "flu"), (Option.empty[String], "20s", "cold"),
      (Option.empty[String], "30s", "flu")
    ).toDF("zip", "age", "dx")
    val out = Privacy.suppressBelowK(withNulls, Seq("zip", "age"), k = 2)
    assert(out.count() == 5) // suppression keeps the corpus size, NULL QIs included
    // the NULL-zip 20s group has support 2 → kept (zip stays NULL as a string cast)
    val nullKept = out.filter(!col("suppressed") && col("age") === "20s" && col("zip").isNull)
    assert(nullKept.count() == 2)
    // the NULL-zip 30s singleton is SUPPRESSED, not dropped
    val nullSup = out.filter(col("suppressed")).collect()
    assert(nullSup.length == 1 && nullSup.head.getAs[String]("zip") == "*" &&
      nullSup.head.getAs[String]("age") == "*" && nullSup.head.getAs[Long]("grp_n") == 1)
  }

  test("input validation refuses empty QI and non-positive thresholds") {
    assertThrows[IllegalArgumentException](
      Privacy.anonymityStats(records, Seq.empty, col("dx"), k = 2, l = 2))
    assertThrows[IllegalArgumentException](
      Privacy.anonymityStats(records, Seq("zip"), col("dx"), k = 0, l = 1))
    assertThrows[IllegalArgumentException](
      Privacy.suppressBelowK(records, Seq.empty, k = 2))
  }
}
