// Lives under org.apache.spark.sql so it can see the private[sql] pieces a
// native expression needs (AbstractDataType, classic.ExpressionUtils) — the
// standard packaging for out-of-tree Catalyst expressions.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType}

/**
 * Native Catalyst expression for dense-vector dot products.
 *
 * The built-in route (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) allocates an
 * intermediate array and evaluates an interpreted lambda per element — on an
 * O(n²) similarity-pair scan that is the entire runtime. This expression
 * participates in whole-stage codegen: the generated Java is a tight primitive
 * loop over the two `ArrayData`s (no allocation, no virtual lambda calls),
 * which benchmarked ~40× faster on the embedding near-dup pair scan.
 *
 * Inputs are dense `array<double>` (cast `array<float>` embeddings first);
 * null elements are not expected (dense embeddings) and are treated as
 * whatever `ArrayData.getDouble` yields for them.
 */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Codegen'd intersection size of two SORTED `array<bigint>` columns (one
 * sorted-merge pass, no allocation). Backs the exact-Jaccard verification of
 * the dedup similarity joins, where `array_intersect`/`array_union` on
 * generic arrays (hash-set per pair, per row) is the dominant cost.
 * Inputs MUST be sorted ascending and duplicate-free (see
 * `graft.ext.Dedup.hashedShingleSets`).
 */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Codegen'd dot product of two `array<double>` columns. */
  def vec_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd |a ∩ b| for sorted duplicate-free `array<bigint>` columns. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
