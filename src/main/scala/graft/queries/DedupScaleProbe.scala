package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-growth evidence harness for the dedup/similarity family:
  * measures, on N× replicas of a source corpus, the CANDIDATE-pair
  * counts of q17 (MinHash LSH), q19 (both band generators) and q118
  * (PPJoin prefix join) plus verified-pair counts and steady times —
  * the data behind PERF.md's "is candidate generation sub-quadratic"
  * claims. Lives in graft.queries (not tools) because it counts the
  * exact private candidate relations the queries execute.
  *
  * Two replica modes, because they answer different questions:
  *  - `family` (the ScaleUp construction: copy c of doc d is doc d
  *    prefixed with a version token): every copy of d is a NEAR-DUP of
  *    every other copy, so the TRUE pair count itself grows as
  *    copies²·docs — any exact-recall engine's output is quadratic in
  *    copies by the replica's construction. Useful for steady times
  *    and candidate-vs-true-pair ratios at moderate N, meaningless
  *    for growth curves beyond that.
  *  - `salted` (constant dup density — the realistic web-corpus
  *    shape): copy c deterministically rewrites ~half of each doc's
  *    tokens (xxhash64(token, position, c) parity), so copies of the
  *    same doc share ~25% of tokens / ~2% of trigrams — far below
  *    every dedup threshold — while each copy PRESERVES the source's
  *    internal duplicate structure (identical source docs salt
  *    identically within a copy). True pairs grow LINEARLY in copies;
  *    candidate counts then expose the generator's own collision
  *    growth, which is the scale question.
  *
  * Run: runMain graft.queries.DedupScaleProbe <srcSfDir> <copies>
  *        <family|salted> [metrics csv: q19,q17,q118] [outBase]
  * Prints one JSON line per invocation.
  */
object DedupScaleProbe {

  private val SHIFT = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val copies = args(1).toInt
    val mode = args(2)
    require(mode == "family" || mode == "salted", s"bad mode $mode")
    val metrics: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet
      else Set("q19", "q17", "q118")
    val outBase = if (args.length > 4) args(4) else "target/dedup_scale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"$outBase/x${copies}_$mode"
    buildIfAbsent(spark, src, dir, copies, mode)

    val out = new StringBuilder(
      s"""{"copies":$copies,"mode":"$mode"""")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    if (metrics("q19")) {
      val sig = Dedup.simhashDf(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = sig.count()
      def cand(banded: DataFrame): Long =
        banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") &&
              col("a.bk") === col("b.bk") &&
              col("a.doc_id") < col("b.doc_id"))
          .count()
      val (cSmall, tSmall) = timed(cand(Dedup.simBandsSmall(sig)))
      val (cBlocks, tBlocks) = timed(cand(Dedup.simBandsBlocks(sig)))
      val (pairs, tPairs) = timed(Dedup.q19PairsPlan(sig).count())
      // what the production gate decides on this corpus, derived from
      // the ALREADY-measured nDocs/cSmall (same rule as
      // Dedup.q19BandedChoice) — re-invoking the gate here would
      // re-run sig.count() plus a full census scan untimed, doubling
      // probe wall time at the 1M-doc scales this targets
      val branch =
        if (nDocs > Dedup.SimBandLimit) s"blocks:doc-count=$nDocs"
        else if (cSmall / math.max(nDocs, 1L) <= Dedup.SimCensusPerDocLimit)
          s"small:census=$cSmall"
        else s"blocks:census=$cSmall"
      sig.unpersist(blocking = false)
      out ++= s""","n_docs":$nDocs,"q19_cand_small":$cSmall"""
      out ++= f""","q19_cand_small_secs":$tSmall%.2f"""
      out ++= s""","q19_cand_blocks":$cBlocks"""
      out ++= f""","q19_cand_blocks_secs":$tBlocks%.2f"""
      out ++= s""","q19_pairs":$pairs"""
      out ++= f""","q19_secs":$tPairs%.2f"""
      out ++= s""","q19_branch":"$branch""""
    }

    if (metrics("q17")) {
      val docs = graft.io.Tables.table(spark, dir, "documents")
      val sh = graft.dedup.TextDedup.shingleRows(docs, "doc_id", "text")
      val (c17, t17c) = timed(
        graft.dedup.TextDedup.lshCandidates(sh, 8).count())
      // full registered q17 (builds/reuses the pair artifact for this
      // corpus identity, then scores) — the honest cold+steady pair
      val (v17a, t17a) = timed(
        Registry.queries("q17_neardup_minhash")(spark, dir).count())
      val (_, t17b) = timed(
        Registry.queries("q17_neardup_minhash")(spark, dir).count())
      out ++= s""","q17_cand":$c17"""
      out ++= f""","q17_cand_secs":$t17c%.2f"""
      out ++= s""","q17_pairs":$v17a"""
      out ++= f""","q17_cold_secs":$t17a%.2f,"q17_steady_secs":$t17b%.2f"""
    }

    if (metrics("q17occ")) {
      // bucket-occupancy census INSTEAD of the candidate join — the
      // implied candidate count is Σ n·(n−1)/2 over (band, key) buckets,
      // computable without materializing a blown-up join when a hot
      // bucket exists
      val docs = graft.io.Tables.table(spark, dir, "documents")
      val sh = graft.dedup.TextDedup.shingleRows(docs, "doc_id", "text")
      val occ = graft.dedup.TextDedup.bandedSignatures(sh, 8)
        .groupBy(col("band"), col("bk"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2).cast("long").as("cand"),
          max(col("n")).as("hottest"), count(lit(1)).as("buckets"))
        .collect().head
      out ++= s""","q17_cand_implied":${occ.getLong(0)}"""
      out ++= s""","q17_hottest_bucket":${occ.getLong(1)}"""
      out ++= s""","q17_buckets":${occ.getLong(2)}"""
    }

    if (metrics("q17ind")) {
      // control experiment: the SAME r=2 banding census with 8 fully
      // INDEPENDENT md5 hashes instead of the production
      // Kirsch-Mitzenmacher g_k = h1 + k·h2 pair — isolates how much of
      // the candidate mass comes from KM's correlated band rows (a pair
      // that collides on one g_k tends to collide on all of them, so
      // band precision degrades from j² toward j; recall is unaffected)
      import graft.functions.TextFns
      val docs = graft.io.Tables.table(spark, dir, "documents")
      val sh = graft.dedup.TextDedup.shingleRows(docs, "doc_id", "text")
      val mins = (1 to 8).map(k =>
        min(TextFns.hash56(md5(concat(lit(s"k$k|"), col("s"))), 1))
          .as(s"mh$k"))
      val sig = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      val banded = sig.select(col("doc_id"),
        posexplode(array((1 to 4).map(graft.dedup.TextDedup.bandKeyCol): _*)))
        .select(col("doc_id"), col("pos").as("band"), col("col").as("bk"))
      val occ = banded.groupBy(col("band"), col("bk"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2).cast("long").as("cand"),
          max(col("n")).as("hottest"))
        .collect().head
      out ++= s""","q17_ind_cand_implied":${occ.getLong(0)}"""
      out ++= s""","q17_ind_hottest":${occ.getLong(1)}"""
    }

    if (metrics("q17mod")) {
      // the candidate fix under test: MODULAR Kirsch-Mitzenmacher —
      // g_k = (h1 + k·h2) mod 2^56. Without the mod, g_k for k ≥ 2 is
      // dominated by the smallest h2 (no wraparound → argmin ≈ argmin
      // of h2 for every upper k), so the upper bands all key the SAME
      // shingle and band precision collapses; the mod restores
      // per-k argmin mixing at zero extra digest cost
      import graft.functions.TextFns
      val docs = graft.io.Tables.table(spark, dir, "documents")
      val sh = graft.dedup.TextDedup.shingleRows(docs, "doc_id", "text")
      val mask = (1L << 56) - 1
      val hp = sh.select(col("doc_id"), md5(col("s")).as("m"))
        .select(col("doc_id"),
          TextFns.hash56(col("m"), 1).as("h1"),
          TextFns.hash56(col("m"), 15).as("h2"))
      val mins = (1 to 8).map(k =>
        min((col("h1") + lit(k.toLong) * col("h2"))
          .bitwiseAND(lit(mask))).as(s"mh$k"))
      val sig = hp.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      val banded = sig.select(col("doc_id"),
        posexplode(array((1 to 4).map(graft.dedup.TextDedup.bandKeyCol): _*)))
        .select(col("doc_id"), col("pos").as("band"), col("col").as("bk"))
      val occ = banded.groupBy(col("band"), col("bk"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2).cast("long").as("cand"),
          max(col("n")).as("hottest"))
        .collect().head
      out ++= s""","q17_mod_cand_implied":${occ.getLong(0)}"""
      out ++= s""","q17_mod_hottest":${occ.getLong(1)}"""
    }

    if (metrics("q118")) {
      val idx = Dedup.q118Index(spark, dir)
      val pref = spark.read.parquet(s"$idx/pref")
      val (c118, t118c) = timed(Dedup.q118Candidates(pref).count())
      val (v118, t118) = timed(
        Dedup.q118PairsPlan(spark, dir).count())
      out ++= s""","q118_cand":$c118"""
      out ++= f""","q118_cand_secs":$t118c%.2f"""
      out ++= s""","q118_pairs":$v118"""
      out ++= f""","q118_secs":$t118%.2f"""
    }

    if (metrics("q152")) {
      // the round-17 cascade gate's A/B on the same replica corpus:
      // the single-pass union (4 lengths in one scan) vs the
      // flagged-docs-only level cascade — both branches forced via the
      // injectable gate (DedupSpec pins output equality; this measures
      // which wins at which flagged fraction)
      val docs = graft.io.Tables.table(spark, dir, "documents")
      val (rSingle, tSingle) = timed(
        Dedup.longestSharedRun(docs, cascadeLimit = Long.MaxValue).count())
      val (rCascade, tCascade) = timed(
        Dedup.longestSharedRun(docs, cascadeLimit = 0L).count())
      val flagged8 = Dedup.longestSharedRun(docs,
          cascadeLimit = Long.MaxValue)
        .filter(col("max_shared_len") >= 8L).count()
      out ++= s""","q152_rows":$rSingle"""
      out ++= f""","q152_single_secs":$tSingle%.2f"""
      out ++= s""","q152_cascade_rows":$rCascade"""
      out ++= f""","q152_cascade_secs":$tCascade%.2f"""
      out ++= s""","q152_flagged_l8":$flagged8"""
    }

    out ++= "}"
    println(out.result())
    spark.stop()
  }

  /** Documents-only replica at `dir`: `copies` shifted copies of the
    * source documents table, text rewritten per `mode` (see class
    * doc). Reused if already on disk with the right row count. */
  private def buildIfAbsent(spark: SparkSession, src: String, dir: String,
      copies: Int, mode: String): Unit = {
    val path = s"$dir/documents.parquet"
    val base = spark.read.parquet(s"$src/documents.parquet")
    val want = base.count() * copies
    val have =
      try spark.read.parquet(path).count()
      catch { case _: Exception => -1L }
    if (have == want) return
    val scaled = (0 until copies).map { i =>
      val shifted = base.withColumn("doc_id", col("doc_id") + lit(i * SHIFT))
      mode match {
        case "family" =>
          shifted.withColumn("text", concat(lit(s"v$i "), col("text")))
        case "salted" =>
          shifted.withColumn("text", array_join(
            transform(split(col("text"), " "), (t, ix) =>
              when(pmod(xxhash64(t, ix, lit(i)), lit(2)) === 0,
                concat(t, lit(s"_$i"))).otherwise(t)), " "))
      }
    }.reduce(_ unionByName _)
    scaled.repartition(32).write.mode("overwrite").parquet(path)
  }
}
