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
      dimKey: String, factor: Int): DataFrame =
    saltedJoin(fact, factKey, dim, dimKey, factor, "inner")

  /** LEFT OUTER salted join: every fact row exists exactly once on the
    * probe side with exactly one salt, and the dim copy carrying that
    * salt holds the full dim key set — so an unmatched fact row is
    * emitted exactly once (with nulls), and a matched one once per
    * matching dim row: row-for-row the plain left join. */
  def saltedLeft(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, factor: Int): DataFrame =
    saltedJoin(fact, factKey, dim, dimKey, factor, "left")

  /** LEFT SEMI salted join (existence filter): fact rows whose key
    * appears in dim, each exactly once; no dim columns in the output. */
  def saltedSemi(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, factor: Int): DataFrame =
    saltedJoin(fact, factKey, dim, dimKey, factor, "left_semi")

  private def saltedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, factor: Int, joinType: String): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val saltedFact = fact.withColumn(SaltCol, rowSalt(fact, factor))
    // explode a literal 0..factor-1 array: `factor` copies of every dim
    // row, one per salt value — a narrow map, no shuffle
    val replicatedDim = dim.withColumn(SaltCol,
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact(SaltCol) === replicatedDim(SaltCol),
        joinType)
      .drop(SaltCol)
  }

  /** Derive the salt factor from the fact key histogram instead of a
    * caller guess: the skew multiplier `m = hottest key count / mean key
    * count` says how many times hotter than average the worst key is —
    * splitting it `m` ways flattens the reducer histogram back to the
    * uniform case. Rounded up to the next power of two (partitioner-
    * friendly, and over- rather than under-spreads), capped at
    * `maxFactor` (dim replication is the price), and 1 — no salting —
    * when `m <= 2` (AQE absorbs mild skew for free; replication would
    * cost more than the imbalance).
    *
    * Cost: one pass over `fact` with map-side combine (one row per
    * distinct key per task reaches the shuffle) plus a scalar agg. For
    * very-high-cardinality keys pass `sampleFraction < 1` — the
    * histogram is sampled with a FIXED seed so the factor (a plan
    * parameter) stays deterministic across retries and re-plans. */
  def autoFactor(fact: DataFrame, factKey: String, maxFactor: Int = 64,
      sampleFraction: Double = 1.0): Int = {
    require(maxFactor >= 1, s"maxFactor must be >= 1, got $maxFactor")
    val keyed = if (sampleFraction < 1.0)
      fact.sample(withReplacement = false, sampleFraction, seed = 42L)
    else fact
    val row = keyed.groupBy(col(factKey)).count()
      .agg(max(col("count")).as("hot"), avg(col("count")).as("mean"))
      .head()
    if (row.isNullAt(0) || row.getDouble(1) <= 0.0) 1
    else {
      val m = row.getLong(0) / row.getDouble(1)
      if (m <= 2.0) 1
      else math.min(maxFactor,
        Integer.highestOneBit(math.ceil(m).toInt - 1) * 2).max(1)
    }
  }

  /** `salted` with the factor measured from the data (see autoFactor). */
  def saltedAuto(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, maxFactor: Int = 64,
      sampleFraction: Double = 1.0): DataFrame =
    salted(fact, factKey, dim, dimKey,
      autoFactor(fact, factKey, maxFactor, sampleFraction))
}
