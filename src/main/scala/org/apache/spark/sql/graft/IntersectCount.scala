package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst distinct-intersection COUNT over two `array<long>`
  * columns — semantically `size(array_intersect(a, b))` (distinct common
  * elements; duplicates never double-counted) without materializing the
  * intersection array.
  *
  * Why (SURVEY §7.3 escalation ladder, same rung as [[DotProduct]]):
  * the set-similarity verifies (q118's PPJoin Jaccard; any hash-array
  * overlap check) only need the CARDINALITY, but the built-in
  * composition allocates the intersection array plus its internal
  * hash-set per row. This expression sorts two primitive long[] copies
  * and merge-counts — zero boxing, zero output allocation beyond the
  * two copies, and the heavy lifting sits in one static JVM method
  * ([[IntersectCountUtil.count]]) that both the interpreted path and
  * the generated code call, so the two paths cannot diverge.
  *
  * Null contract: null input array → null result (BinaryExpression
  * default); null ELEMENTS follow `array_intersect` exactly — null is
  * one distinct value, counted when present on BOTH sides. The engine's
  * own inputs are hash arrays that never contain null, so the null scan
  * short-circuits into the primitive fast path; the slow path exists
  * because the expression is registered as a PUBLIC SQL function and
  * arbitrary user arrays must not surface an opaque executor exception.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountUtil.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.IntersectCountUtil.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCountUtil {
  private def ensureSorted(a: Array[Long]): Unit = {
    var i = 1
    while (i < a.length && a(i - 1) <= a(i)) i += 1
    if (i < a.length) java.util.Arrays.sort(a)
  }

  private def hasNull(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  private def nonNulls(a: ArrayData): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    var k = 0
    while (i < n) {
      if (!a.isNullAt(i)) { out(k) = a.getLong(i); k += 1 }
      i += 1
    }
    if (k == n) out else java.util.Arrays.copyOf(out, k)
  }

  /** |distinct(a) ∩ distinct(b)| by merge over primitive copies.
    * Pre-sorted inputs (the q118 index stores its hash arrays sorted)
    * skip the sort after one linear check — the per-pair cost over
    * millions of candidate pairs is then the merge alone. */
  def count(x: ArrayData, y: ArrayData): Long = {
    val nx = hasNull(x)
    val ny = hasNull(y)
    if (nx || ny)
      // array_intersect semantics: null is one distinct value, common
      // only when both sides carry it
      merge(nonNulls(x), nonNulls(y)) + (if (nx && ny) 1L else 0L)
    else
      merge(x.toLongArray(), y.toLongArray())
  }

  private def merge(a: Array[Long], b: Array[Long]): Long = {
    ensureSorted(a)
    ensureSorted(b)
    var i = 0
    var j = 0
    var c = 0L
    var last = 0L
    var counted = false
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else {
        if (!counted || a(i) != last) { c += 1; last = a(i); counted = true }
        i += 1; j += 1
      }
    }
    c
  }
}

object SetExprs {
  /** Column-API entry point for [[IntersectCount]]. */
  def intersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(IntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
