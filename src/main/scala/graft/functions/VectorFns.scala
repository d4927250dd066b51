package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns — no UDFs, no
  * ml.linalg conversion on the hot path, and no higher-order-function
  * lambdas (those are interpreted per element; the dot product is a native
  * codegen Expression, see graft.functions.expr.DotProduct).
  *
  * All math is promoted to double *before* accumulation and runs in index
  * order, so results are reproducible and match a DuckDB oracle computing
  * the same left-to-right sum.
  */
object VectorFns {

  /** array<float> → array<double> (float→double promotion is exact;
    * Cast is codegen'd, unlike a per-element transform lambda). */
  def toDoubleArray(c: Column): Column = c.cast("array<double>")

  /** Dot product, left-to-right accumulation in index order (native
    * codegen expression — org.apache.spark.sql.graft.DotProduct). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExprs.dot(a, b)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (precompute norms once per
    * row before any join — never inside the pair loop). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
