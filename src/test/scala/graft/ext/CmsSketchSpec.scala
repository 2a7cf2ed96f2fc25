package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins [[Profiling.cmsSketch]] / [[Profiling.cmsHeavyHitters]]: mass
  * conservation per hash row, the never-undercount estimate, and exactness
  * when the width makes collisions (deterministically) absent. */
class CmsSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha alpha alpha beta beta gamma"),
    (2L, "alpha beta delta delta epsilon"),
    (3L, "gamma gamma gamma gamma zeta")).toDF("doc_id", "text")
  private val nTokens = 16L // total whitespace tokens above

  test("every hash row conserves total token mass") {
    val tok = docs.select(explode(split(col("text"), "\\s+")).as("t"))
    val sums = Profiling.cmsSketch(tok, "t", depth = 4, width = 64)
      .groupBy("row").agg(sum("cnt").as("s"))
      .as[(Int, Long)].collect().toMap
    assert(sums.keySet == Set(0, 1, 2, 3))
    assert(sums.values.forall(_ == nTokens))
  }

  test("estimates never undercount; exact at collision-free width") {
    val probe = Profiling.cmsHeavyHitters(docs, "text", depth = 4,
        width = 1 << 16, topK = 10)
      .as[(String, Long, Long)].collect()
    assert(probe.length == 6) // 6 distinct tokens
    probe.foreach { case (t, exact, est) =>
      assert(est >= exact, s"token $t undercounted")
      // at width 65536 the 6-term fixture hashes collision-free (the hash
      // is deterministic, so this is a stable fact, not a probabilistic one)
      assert(est == exact, s"token $t estimate $est != exact $exact")
    }
    assert(probe.map(r => r._1 -> ((r._2, r._3))).toMap.apply("gamma") == ((5L, 5L)))
  }

  test("narrow width still dominates exact counts (collision overcount)") {
    val probe = Profiling.cmsHeavyHitters(docs, "text", depth = 2,
        width = 2, topK = 10).as[(String, Long, Long)].collect()
    assert(probe.forall { case (_, exact, est) => est >= exact })
  }

  test("cell-wise sum of shard sketches equals the whole-corpus sketch") {
    def tok(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(col("text"), "\\s+")).as("t"))
    val full = Profiling.cmsSketch(tok(docs), "t", depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Profiling.cmsSketch(tok(docs.filter($"doc_id" % 2 === 0)), "t", 4, 64)
      .unionByName(Profiling.cmsSketch(tok(docs.filter($"doc_id" % 2 === 1)), "t", 4, 64))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == full)
  }

  test("parameter bounds") {
    val tok = docs.select(explode(split(col("text"), "\\s+")).as("t"))
    intercept[IllegalArgumentException] { Profiling.cmsSketch(tok, "t", depth = 0) }
    intercept[IllegalArgumentException] { Profiling.cmsSketch(tok, "t", width = 1) }
    intercept[IllegalArgumentException] { Profiling.cmsHeavyHitters(docs, "text", topK = 0) }
  }
}
