package graft.ops

import java.time.LocalDate

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based checks of the reload/upsert algebra (SURVEY.md §5.2.3) over
 * generated row sets: idempotence, out-of-window conservation, and upsert
 * replace-exactly-the-changed-keys. Few cases (Spark job per case), fixed
 * seed via scalacheck's deterministic default params + sized generators.
 */
class ReloadPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val from = LocalDate.of(2024, 1, 5)
  private val to = LocalDate.of(2024, 1, 9)

  /** (pk, dayOffset 0..19, payload) → DataFrame with a timestamp column. */
  private def df(rows: List[(Long, Int, String)]) =
    rows.toDF("pk", "off", "payload")
      .selectExpr("pk", "timestamp_ntz '2024-01-01 12:00:00' + make_dt_interval(off) as d", "payload")

  private val genRows: Gen[List[(Long, Int, String)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0L, 25L), Gen.choose(0, 19), Gen.oneOf("a", "b", "c")))

  private def params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  test("property: windowed reload is idempotent and conserves out-of-window target rows") {
    val prop = Prop.forAll(genRows, genRows) { (tgtRows, srcRows) =>
      val target = df(tgtRows)
      val source = df(srcRows)
      val once = Ops.windowedReload(target, source, "d", from, to)
      val twice = Ops.windowedReload(once, source, "d", from, to)
      val idempotent = twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty
      val outPred = !Ops.windowPredicate("d", from, to)
      val conserved = once.filter(outPred).exceptAll(target.filter(outPred)).isEmpty &&
        target.filter(outPred).exceptAll(once.filter(outPred)).isEmpty
      idempotent && conserved
    }
    assert(SCTest.check(params, prop).passed)
  }

  test("property: upsert replaces exactly the changed keys") {
    val genKeys = Gen.listOf(Gen.choose(0L, 25L))
    // unique pks by construction — dropDuplicates would pick an arbitrary
    // row per key independently in the result and expected plans
    def uniqueByPk(rows: List[(Long, Int, String)]) =
      df(rows.groupBy(_._1).map(_._2.max).toList)
    val prop = Prop.forAll(genRows, genRows, genKeys) { (tgtRows, srcRows, keys) =>
      val target = uniqueByPk(tgtRows)
      val source = uniqueByPk(srcRows)
      val changed = keys.distinct.toDF("pk")
      val result = Ops.upsert(target, source, "pk", changed)
      val keySet = keys.toSet
      val expectUntouched = target.filter(!$"pk".isin(keySet.toSeq: _*))
      val expectFresh = source.filter($"pk".isin(keySet.toSeq: _*))
      val expected = expectUntouched.unionByName(expectFresh)
      result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty
    }
    assert(SCTest.check(params, prop).passed)
  }
}
