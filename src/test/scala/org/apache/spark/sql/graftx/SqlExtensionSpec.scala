package org.apache.spark.sql.graftx

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions registration path: every SQL-registered
  * graftx function must be callable from query TEXT in a session built by
  * `graft.io.Sessions.builder` (which installs [[GraftExtensions]]), and
  * mis-use must fail by name at analysis time, not opaquely at runtime. */
class SqlExtensionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one[A](sql: String): A =
    spark.sql(sql).collect().head.get(0).asInstanceOf[A]

  test("unicode_normalize composes from SQL text") {
    assert(one[String]("SELECT unicode_normalize('cafe\u0301', 'NFC')") == "caf\u00E9")
    assert(one[String]("SELECT unicode_normalize('caf\u00E9', 'NFD')") == "cafe\u0301")
  }

  test("vector functions compose from SQL text") {
    assert(one[Double](
      "SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))") == 11.0)
    val n = spark.sql("SELECT vector_normalize(array(3.0d, 4.0d))")
      .collect().head.getSeq[Double](0)
    assert(n == Seq(0.6, 0.8))
    assert(one[Int](
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 9L))") == 2)
  }

  test("hash-family functions compose from SQL text and MATCH the Column API") {
    // SQL result == Column-API result pins the registration WIRING — a
    // mis-registered arity-compatible expression would still be "deterministic"
    import org.apache.spark.sql.functions.{array, lit}
    val hashes = array(lit(15L), lit(15L), lit(240L))
    val apiSh = spark.range(1)
      .select(VectorFunctions.simhash64(hashes)).collect().head.getLong(0)
    assert(one[Long]("SELECT simhash64(array(15L, 15L, 240L))") == apiSh)
    val mh = array(lit(11L), lit(22L), lit(33L))
    val apiSig = spark.range(1)
      .select(VectorFunctions.minhash_signature(mh, 8)).collect().head.getSeq[Long](0)
    val sig = spark.sql("SELECT minhash_signature(array(11L, 22L, 33L), 8)")
      .collect().head.getSeq[Long](0)
    assert(sig == apiSig && sig.length == 8)
    val merged = spark.sql(
      "SELECT bpe_merge_adjacent(array('l', 'o', 'w'), 'l', 'o')")
      .collect().head.getSeq[String](0)
    assert(merged == Seq("lo", "w"))
  }

  test("mis-use fails by name: wrong arity, non-literal args, bad literal VALUES") {
    val arity = intercept[Exception](
      spark.sql("SELECT unicode_normalize('x')").collect())
    assert(arity.getMessage.contains("unicode_normalize"))
    val form = intercept[Exception](spark.sql(
      "SELECT unicode_normalize('x', lower('NFC'))").collect())
    assert(form.getMessage.contains("unicode_normalize") ||
      form.getMessage.contains("string literal"))
    val width = intercept[Exception](spark.sql(
      "SELECT minhash_signature(array(1L), 1 + 1)").collect())
    assert(width.getMessage.contains("minhash_signature") ||
      width.getMessage.contains("integer literal"))
    // right TYPE, wrong VALUE: constructor requires must also carry the name
    val badForm = intercept[Exception](spark.sql(
      "SELECT unicode_normalize('x', 'nfc')").collect())
    assert(badForm.getMessage.contains("unicode_normalize"))
    val badWidth = intercept[Exception](spark.sql(
      "SELECT minhash_signature(array(1L), 0)").collect())
    assert(badWidth.getMessage.contains("minhash_signature"))
  }

  test("the spark.sql.extensions config route stays viable: reflective no-arg instantiation applies cleanly") {
    // Spark's applyExtensions instantiates the configured class name via a
    // public no-arg constructor — pin exactly that mechanism so a rename,
    // visibility change, or lost default constructor fails HERE, not at
    // cluster session start
    val cls = Class.forName("org.apache.spark.sql.graftx.GraftExtensions")
    val inst = cls.getConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    inst(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
  }
}
