package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salt-based skew mitigation for equi-joins whose build side is too
  * large to broadcast and whose probe side has hot keys (SURVEY §4's
  * shuffle notes; the technique the guide lists alongside AQE for
  * runtime skew).
  *
  * AQE's skew-join split handles MOST skew for free — it is the first
  * resort and the engine leaves it on. Salting is for the cases AQE
  * cannot fix at 100 TB:
  *  - a single key so hot that even a split partition's post-join
  *    output exceeds one task (AQE splits map output by size BEFORE the
  *    join multiplies rows);
  *  - aggregations layered over the join where the hot key must also be
  *    spread across the combine (AQE re-coalesces after the join, so
  *    the downstream agg re-skews);
  *  - shuffled-hash joins on engines/plans where the AQE skew rule does
  *    not apply (it only rewrites sort-merge joins without shuffle
  *    reuse).
  *
  * Mechanism: the fact (probe) side gains a salt in `[0, factor)`; the
  * dim (build) side is replicated `factor`× with every salt value; the
  * join key becomes `(key, salt)`, so a hot key's rows spread over
  * `factor` reducers. Join output is salt-independent, so the result is
  * row-for-row the plain join — the DuckDB oracle (q55) pins that.
  *
  * The salt is DETERMINISTIC — a hash of the whole fact row, not
  * `rand()`. A nondeterministic shuffle key makes stage retries
  * indeterminate (a re-rolled salt routes the row to a different
  * reducer than the lost map output claimed, the failure class behind
  * Spark's repartition(rand)-correctness machinery); a row hash keeps
  * exactly-once semantics under retries at the cost that fully
  * identical duplicate rows share a salt — the right trade for a
  * 1000-executor job, and duplicate fact rows are bounded by upstream
  * dedup anyway.
  */
object SkewJoin {

  private[graft] val SaltCol = "__graft_salt"

  /** Deterministic per-row salt in `[0, factor)`: xxhash64 over all of
    * the row's columns (seeded away from the partitioner's own hash
    * family so salt and partition stay independent). */
  private[graft] def rowSalt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(lit(0x9747b28cL) +: df.columns.map(col).toSeq: _*),
      lit(factor.toLong))

  /** Inner equi-join `fact ⋈ dim ON fact(factKey) = dim(dimKey)` with the
    * hot fact keys spread over `factor` reducers. `dim` is replicated
    * `factor`× (keep it the smaller relation — replication is the price
    * of the spread; `factor` of 8-32 covers real skew without
    * meaningfully inflating the build side).
    *
    * Both key columns survive in the output (like a plain inner join);
    * the salt columns do not. */
  def salted(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val saltedFact = fact.withColumn(SaltCol, rowSalt(fact, factor))
    // explode a literal 0..factor-1 array: `factor` copies of every dim
    // row, one per salt value — a narrow map, no shuffle
    val replicatedDim = dim.withColumn(SaltCol,
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact(SaltCol) === replicatedDim(SaltCol))
      .drop(SaltCol)
  }
}
