// Lives under org.apache.spark.sql so it can see the private[sql] pieces a
// native expression needs (AbstractDataType, classic.ExpressionUtils) — the
// standard packaging for out-of-tree Catalyst expressions.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One BPE merge step applied to a symbol sequence: every LEFT-TO-RIGHT,
 * NON-OVERLAPPING adjacent occurrence of `(left, right)` in the
 * `array<string>` is replaced by their concatenation — the inner loop of
 * byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
 * arXiv:1508.07909) and of applying a learned merge table to new text.
 *
 * Left-to-right non-overlap is the published contract: on symbols
 * `[a a a]` merging `(a, a)` yields `[aa a]`, not `[a aa]` and not
 * `[aa aa]`. A higher-order-function equivalent does not exist (the scan
 * is stateful — consuming a pair advances two positions), and a Scala UDF
 * here would box every symbol of every word type per merge round; this
 * expression stays inside whole-stage codegen as a tight UTF8String loop.
 */
case class BpeMergeAdjacent(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_adjacent"

  override def nullSafeEval(arr: Any, l: Any, r: Any): Any = {
    val xs = arr.asInstanceOf[ArrayData]
    val lv = l.asInstanceOf[UTF8String]
    val rv = r.asInstanceOf[UTF8String]
    val n = xs.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = xs.getUTF8String(i)
      if (i + 1 < n && cur.equals(lv) && xs.getUTF8String(i + 1).equals(rv)) {
        out.add(UTF8String.concat(lv, rv))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val cur = ctx.freshName("cur")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $n = $arr.numElements();
         |java.util.ArrayList<$u> $out = new java.util.ArrayList<$u>($n);
         |int $i = 0;
         |while ($i < $n) {
         |  $u $cur = $arr.getUTF8String($i);
         |  if ($i + 1 < $n && $cur.equals($l) && $arr.getUTF8String($i + 1).equals($r)) {
         |    $out.add($u.concat($l, $r));
         |    $i += 2;
         |  } else {
         |    $out.add($cur);
         |    $i += 1;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray(new $u[0]));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/**
 * Unicode canonical/compatibility normalization (NFC/NFD/NFKC/NFKD) — the
 * repair step a crawl pipeline applies after encoding screening and before
 * fingerprint/dedup (ftfy normalizes to NFC; utf8proc-based stacks do the
 * same), so that `café` typed precomposed (U+00E9) and decomposed
 * (`e` + U+0301) hash identically. Spark has NO built-in for this; a Scala
 * UDF would pay serialization per row. The JDK's `java.text.Normalizer` is
 * the reference implementation surface, called directly from codegen'd
 * Java with two fast paths: pure-ASCII input (one byte per code point —
 * and ASCII is invariant under every normal form) returns the INPUT
 * UTF8String without even decoding to UTF-16, and already-normal
 * non-ASCII text returns it after one `isNormalized` check, so only rows
 * that actually change pay the normalize allocation.
 *
 * `form` is a plan-time constant (validated at construction), not a child
 * expression, so codegen inlines the enum constant.
 */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(UnicodeNormalize.Forms(form),
    s"form must be one of ${UnicodeNormalize.Forms.toSeq.sorted.mkString("/")}: $form")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val resolvedForm = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    // pure-ASCII fast path with NO decode at all: one byte per code point
    // means ASCII, and ASCII is invariant under all four normal forms —
    // the corpus majority never leaves UTF8String
    if (u.numBytes == u.numChars) u
    else {
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, resolvedForm)) u
      else UTF8String.fromString(java.text.Normalizer.normalize(s, resolvedForm))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val f = s"java.text.Normalizer.Form.$form"
      s"""
         |if ($c.numBytes() == $c.numChars()) {
         |  ${ev.value} = $c;
         |} else {
         |  java.lang.String $s = $c.toString();
         |  ${ev.value} = java.text.Normalizer.isNormalized($s, $f)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($s, $f));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}

/** Column wrappers for the text expressions. */
object TextFunctions {
  def bpe_merge_adjacent(symbols: Column, left: Column, right: Column): Column =
    ExpressionUtils.column(BpeMergeAdjacent(
      ExpressionUtils.expression(symbols),
      ExpressionUtils.expression(left),
      ExpressionUtils.expression(right)))

  def unicode_normalize(text: Column, form: String): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(text), form))
}
