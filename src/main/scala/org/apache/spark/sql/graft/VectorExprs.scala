package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * Why a custom Expression (SURVEY §7.3 escalation ladder): the
  * higher-order-function formulation (`aggregate(zip_with(a, b, *), ...)`)
  * is evaluated INTERPRETED — one closure call per element — which made
  * the similarity-search queries' scoring loop the single hottest spot in
  * the whole bench. This expression generates a tight primitive loop
  * inside whole-stage codegen (with a matching interpreted fallback), so
  * scoring stays on the fused-pipeline fast path.
  *
  * Lives under org.apache.spark.sql.* because the expression-authoring
  * surface (AbstractDataType, ExpressionUtils.column) is private[sql] —
  * the conventional placement for out-of-tree Catalyst expressions.
  *
  * Semantics: left-to-right accumulation in index order — identical to the
  * HOF fold it replaces and to DuckDB's ordered `list_sum(list_transform)`
  * oracle twin, so cross-engine float equality is preserved. Inputs are
  * length-aligned, null-element-free arrays (the `embeddings` contract);
  * a length mismatch uses the shorter prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-API entry point for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
