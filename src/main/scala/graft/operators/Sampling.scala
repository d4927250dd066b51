package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-mix construction: a 100 TB corpus
  * is mixed by KEEPING a per-stratum fraction of documents ("50% of en,
  * 25% of de, 10% of the rest"), and that decision must be a pure
  * function of the ROW — not `rand()`:
  *  - stage retries and speculative tasks re-evaluate the predicate and
  *    must keep the same rows (the repartition(rand)-correctness failure
  *    class, same reasoning as [[SkewJoin]]'s deterministic salt);
  *  - re-runs over the same snapshot must produce the same training set
  *    (reproducibility is a data-governance requirement, not a nicety);
  *  - the sample must be verifiable by ANY engine replaying the rule —
  *    which is exactly how the q59 DuckDB oracle gates it.
  *
  * Mechanism: md5 of the key column's string form, first 6 hex digits
  * (24 uniform bits) reduced mod `Buckets`; a row survives iff its
  * bucket falls below `fraction × Buckets` for its stratum. md5 is
  * bit-identical across engines (unlike xxhash64, which only Spark
  * exposes), making the predicate replayable in plain ANSI-ish SQL.
  * The filter is narrow, codegen'd, and shuffle-free — sampling 100 TB
  * costs one scan. */
object Sampling {

  /** Bucket granularity: fractions resolve to 1/10000ths. */
  val Buckets = 10000

  /** Deterministic bucket in [0, Buckets) from the key's string form. */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 6), 16, 10).cast("long"),
      lit(Buckets.toLong))

  /** Keep rows whose key-bucket falls below their stratum's fraction.
    * `fractions` maps stratum value → keep fraction in [0,1]; strata not
    * listed keep `default`. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0,1]")
    val quota = fractions.foldLeft(lit((default * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * Buckets).toLong))
          .otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < quota)
  }

  /** TEMPERATURE-FLATTENED mixture rates (the multilingual-corpus
    * resampling rule: stratum weight ∝ n^α with α < 1 upsamples rare
    * strata relative to proportional). For a total keep fraction K, the
    * per-stratum keep rate is
    *   r_s = K · n_tot · n_s^α / Σ_t n_t^α / n_s
    * expressed as an integer bucket threshold in [0, Buckets]. α is
    * pinned to 0.5 so the weight is sqrt(n) — sqrt is correctly-rounded
    * IEEE on every engine, which keeps the threshold arithmetic (and so
    * the sampled set) bit-identically replayable by a SQL oracle; a
    * general pow(n, α) is not. Returns (stratum, n_docs, thr); one
    * groupBy over the corpus. Rates above 1 (tiny strata the formula
    * over-asks) cap at Buckets — the stratum is kept whole.
    *
    * NULL policy: rows with a NULL stratum are excluded from BOTH the
    * histogram and the sample (a training-mix stratum must be known; an
    * unknown-language document belongs in a cleanup pass, not a mixture
    * weight). Excluding them here keeps the realized keep-fraction exact
    * — previously they inflated n_tot/wsum while [[temperatureMix]]'s
    * equality join silently dropped them, undershooting keepFraction. */
  def temperatureThresholds(df: DataFrame, strataCol: String,
      keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0,1]")
    // eager collect below — fail a streaming input with a clear contract
    // error instead of an opaque AnalysisException from inside collect
    require(!df.isStreaming,
      "temperatureThresholds requires a batch DataFrame (eager histogram collect)")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    // The histogram is a RESULT table — one row per stratum (languages,
    // sources), bounded at any corpus size — so it is materialized to
    // the driver ONCE and rebuilt as a local relation. Without this cut
    // every downstream occurrence of the thresholds re-runs the full
    // corpus scan: the totals stitch below consumes `counts` a second
    // time, and a caller that both broadcasts the thresholds into a
    // filter and reports them (q68's shape) doubles the whole subtree
    // again — 5 corpus scans measured in the un-cut q68 plan, vs 1 here.
    //
    // This makes the operator EAGER: the histogram job runs at call
    // time, so plan-only callers (explain tools) pay one corpus scan,
    // and the thresholds are FROZEN into the returned plan — a re-run
    // against changed data must call this again. Both are the standard
    // cost of driver-localized results (the Q.localized discipline),
    // and the freeze is the retry-stability property the deterministic
    // md5 sampling rule exists for: a task retry must never observe
    // different thresholds than the original attempt.
    val local = {
      import scala.jdk.CollectionConverters._
      df.sparkSession.createDataFrame(
        counts.collect().toSeq.asJava, counts.schema)
    }
    val totals = local.agg(
      sum(col("n_docs")).cast("double").as("n_tot"),
      sum(sqrt(col("n_docs").cast("double"))).as("wsum"))
    // 1-row aggregate stitch (same shape as the TextAnalysis corpus
    // constants): broadcast-cross-joins a single row, never a shuffle
    local.crossJoin(broadcast(totals))
      .select(col(strataCol), col("n_docs"),
        // floor, NOT a double→long cast: Spark's cast truncates while
        // DuckDB's rounds — floor is the one conversion both agree on
        least(
          floor(lit(keepFraction) * col("n_tot")
            * sqrt(col("n_docs").cast("double"))
            / col("wsum") / col("n_docs").cast("double")
            * lit(Buckets.toDouble)),
          lit(Buckets.toLong)).as("thr"))
  }

  /** Deterministic TRAIN/VAL/TEST split: every row is assigned exactly one
    * split label as a pure function of its key's md5 bucket — the
    * dataset-governance primitive behind every training run (the split must
    * survive retries, re-runs, engine changes, and INCREMENTAL growth: a
    * document that was `test` yesterday must still be `test` after today's
    * ingest appends rows, which rules out row_number()-style quantile
    * splits that reshuffle labels as the corpus grows).
    *
    * `splits` is an ordered list of (label, fraction); fractions must sum
    * to 1 (within bucket granularity). Buckets partition [0, 10000) into
    * consecutive ranges in list order, so the assignment is also trivially
    * replayable by a SQL oracle as a CASE over the same cumulative cuts.
    * One narrow codegen'd projection — splitting 100 TB costs one scan,
    * no shuffle, and emits no copy of the data (the label column IS the
    * split; downstream readers filter on it).
    *
    * The split draws from its OWN hash domain (`domain` is prefixed into
    * the digest input), NOT the raw key bucket [[stratified]] and
    * [[temperatureMix]] use. This keeps the two decisions independent
    * when composed on the same key: with a shared domain, a 30% sample
    * (buckets < 3000) would have an EMPTY `test` split (buckets ≥ 9500)
    * — every hash-derived decision in a pipeline must consume its own
    * uniform, exactly like independent RNG streams. */
  /** The corpus train/val/test split spec shared by q85 (the split
    * itself), q146 (leakage audit) and q150 (leakage repair). ONE
    * definition is load-bearing: the audit/repair pair recomputes split
    * labels from this spec on the pair side, and their oracles hard-code
    * the matching 9000/9500 cumulative cuts — a fraction changed in one
    * site but not the others would silently audit a DIFFERENT split
    * than the one q85 ships. */
  val CorpusSplits: Seq[(String, Double)] =
    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  def hashSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split",
      domain: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), "fractions must be positive")
    val cuts = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + (f * Buckets).toLong
    }.tail
    require(cuts.last == Buckets.toLong,
      s"fractions must sum to 1 (cumulative buckets ${cuts.last} != $Buckets)")
    val b = hashBucket(concat(lit(domain + "|"), col(keyCol).cast("string")))
    val assign = splits.init.zip(cuts.init).foldRight(lit(splits.last._1)) {
      case (((label, _), cut), rest) => when(b < cut, lit(label)).otherwise(rest)
    }
    df.withColumn(splitCol, assign)
  }

  /** Filter `df` to its temperature-flattened sample: broadcast the
    * per-stratum thresholds, keep rows whose md5 bucket falls under
    * their stratum's. Two single passes over the corpus (histogram,
    * filter) — no data-scale shuffle at any size. NULL-stratum rows are
    * excluded (see [[temperatureThresholds]]'s NULL policy; the inner
    * join enforces it). */
  def temperatureMix(df: DataFrame, keyCol: String, strataCol: String,
      keepFraction: Double): DataFrame = {
    val thr = temperatureThresholds(df, strataCol, keepFraction)
      .withColumnRenamed(strataCol, "__stratum")
    df.join(broadcast(thr), df(strataCol) === col("__stratum"))
      .filter(hashBucket(col(keyCol)) < col("thr"))
      .drop("__stratum", "n_docs", "thr")
  }
}
