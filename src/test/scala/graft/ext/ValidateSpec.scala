package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ValidateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reportMap(df: org.apache.spark.sql.DataFrame, checks: Seq[Validate.Check]) =
    Validate.report(df, checks).as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap

  test("every check type counts its violations exactly") {
    val child = Seq(
      (Some(1L), Some("O"), Some(10.0)),
      (Some(1L), Some("X"), Some(-5.0)),  // dup key, bad status, below range
      (None, Some("F"), Some(999.0)),     // null key (exempt from unique), above range
      (Some(2L), None, None)              // null status/value: not violations
    ).toDF("k", "status", "v")
    val parent = Seq(1L).toDF("pk") // child key 2 is an orphan
    val got = reportMap(child, Seq(
      Validate.NotNull("k"),
      Validate.AcceptedValues("status", Seq("O", "F")),
      Validate.InRange("v", Some(0.0), Some(100.0)),
      Validate.Predicate("v", "v_lt_500", col("v") < 500),
      Validate.Unique(Seq("k")),
      Validate.RefIntegrity("k", parent, "pk")))
    assert(got == Map(
      ("not_null", "k") -> 1L,
      ("accepted_values", "status") -> 1L,
      ("in_range", "v") -> 2L,             // -5 below, 999 above; NULL exempt
      // NULL predicate result counts as violation (unknown is not a pass):
      // rows -5 (true), 10 (true), 999 (false), NULL (unknown) → 2
      ("predicate:v_lt_500", "v") -> 2L,
      ("unique", "k") -> 1L,               // two k=1 rows → 1 extra; NULL row exempt
      ("ref_integrity", "k") -> 1L))       // k=2 has no parent; NULL exempt
  }

  test("clean table reports zero violations on every check; plan fuses row checks") {
    val df = Seq((1L, "O"), (2L, "F")).toDF("k", "status")
    val checks = Seq(
      Validate.NotNull("k"), Validate.NotNull("status"),
      Validate.AcceptedValues("status", Seq("O", "F")),
      Validate.Unique(Seq("k")))
    assert(reportMap(df, checks).values.forall(_ == 0L))
    // the three row-local checks share ONE aggregation pass (one scan), so
    // the report plan contains exactly two scans of the child relation:
    // the fused row-check agg and the unique key pass
    val plan = Validate.report(df, checks).queryExecution.optimizedPlan.toString
    val scans = "LocalRelation".r.findAllIn(plan).length
    assert(scans <= 2, s"row checks must fuse into one scan:\n$plan")
  }

  test("an EMPTY table reports zero violations, not NULL counts") {
    val df = Seq((1L, "a")).toDF("k", "v").filter(lit(false))
    val got = reportMap(df, Seq(
      Validate.NotNull("k"), Validate.Unique(Seq("k")),
      Validate.RefIntegrity("k", Seq(1L).toDF("pk"), "pk")))
    assert(got.values.toSeq == Seq(0L, 0L, 0L))
  }

  test("unknown columns and empty check lists are refused") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException](Validate.report(df, Nil))
    intercept[IllegalArgumentException](
      Validate.report(df, Seq(Validate.NotNull("nope"))))
    intercept[IllegalArgumentException](
      Validate.report(df, Seq(Validate.Unique(Seq("k", "nope")))))
  }
}
