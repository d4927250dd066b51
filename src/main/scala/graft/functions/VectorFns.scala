package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as pure
  * codegen-friendly column expressions (zip_with + aggregate) — no UDFs, no
  * ml.linalg conversion on the hot path.
  *
  * All math is promoted to double *before* accumulation and folds run in
  * index order, so results are reproducible and match a DuckDB oracle
  * computing the same left-to-right sum.
  */
object VectorFns {

  /** array<float> → array<double> (float→double promotion is exact). */
  def toDoubleArray(c: Column): Column = transform(c, x => x.cast("double"))

  /** Dot product, left-to-right fold in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (precompute norms once per
    * row before any join — never inside the pair loop). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
