package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `SparkSessionExtensions` hook registering the native expression family as
 * SQL functions, so a SQL-first deployment can call them from query TEXT —
 * `SELECT unicode_normalize(text, 'NFC') FROM docs` — not just through the
 * Scala `Column` wrappers. Install via the standard extension points:
 * `SparkSession.builder.withExtensions(new GraftExtensions)` (what
 * `graft.io.Sessions.builder` does) or
 * `spark.sql.extensions=org.apache.spark.sql.graftx.GraftExtensions` in a
 * cluster's config — the second form is how a shared platform ships the
 * functions to every job without code changes.
 *
 * Only the SQL-sensible expressions register: the matrix-parameterized ones
 * ([[CentroidSims]], [[SignBandKeys]]) take plan-time `Array[Array[Double]]`
 * constants that have no SQL literal form and stay Column-API-only.
 * Non-expression parameters (the NFC form, the MinHash signature width)
 * must arrive as FOLDABLE literals — anything else is refused by name at
 * analysis time rather than failing opaquely at runtime.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "unicode_normalize", 2, {
      case Seq(c, StrLit(form)) => UnicodeNormalize(c, form)
      case Seq(_, other) => refuse("unicode_normalize", "a string literal form ('NFC'/'NFD'/'NFKC'/'NFKD')", other)
    })
    register(ext, "vector_dot", 2, { case Seq(a, b) => VectorDot(a, b) })
    register(ext, "vector_normalize", 1, { case Seq(v) => VectorNormalize(v) })
    register(ext, "sorted_intersect_count", 2,
      { case Seq(a, b) => SortedIntersectCount(a, b) })
    register(ext, "simhash64", 1, { case Seq(a) => SimHash64(a) })
    register(ext, "minhash_signature", 2, {
      case Seq(a, IntLit(k)) => MinHashSignature(a, k)
      case Seq(_, other) => refuse("minhash_signature", "an integer literal signature width", other)
    })
    register(ext, "bpe_merge_adjacent", 3,
      { case Seq(s, l, r) => BpeMergeAdjacent(s, l, r) })
    register(ext, "jaro_winkler", 2, { case Seq(a, b) => JaroWinkler(a, b) })
  }

  private def register(ext: SparkSessionExtensions, name: String, arity: Int,
      build: PartialFunction[Seq[Expression], Expression]): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (children: Seq[Expression]) => {
        if (children.size != arity) throw new IllegalArgumentException(
          s"$name expects $arity arguments, got ${children.size}")
        // constructor `require`s (signature-width range, form whitelist)
        // must also surface BY NAME: in a query using several functions a
        // bare "requirement failed" is not attributable
        try build(children) catch {
          case e: IllegalArgumentException
              if Option(e.getMessage).forall(m => !m.startsWith(name)) =>
            throw new IllegalArgumentException(s"$name: ${e.getMessage}", e)
        }
      }))
}

object GraftExtensions {
  private object StrLit {
    def unapply(e: Expression): Option[String] = e match {
      case Literal(s: UTF8String, StringType) => Some(s.toString)
      case _ => None
    }
  }
  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(i: Int, IntegerType) => Some(i)
      case _ => None
    }
  }
  private def refuse(name: String, expected: String, got: Expression): Nothing =
    throw new IllegalArgumentException(
      s"$name expects $expected as its trailing argument, got: ${got.sql}")
}
