package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Semantic properties of the curation operators (q107 winnowing
  * fingerprints, q108 model-based quality filter, q109 cluster
  * representative retention) that the DuckDB value-compare can't
  * express: the SWA03 detection guarantee, keep-rule band logic,
  * determinism, and the best-quality/tie-break retention policy. */
class CurationSpec extends AnyFunSuite with Matchers with SparkTestSession {

  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ---------------------------------------------------------------- q107

  test("q107: SWA03 guarantee — docs sharing a >= w+k-1 token run at " +
    "DIFFERENT offsets share a fingerprint; an unrelated doc shares none") {
    // shared 8-token run, offset 0 in doc 1 vs offset 3 in doc 2 —
    // a chunk-grid aligner (q84) would miss this, winnowing must not
    val run = "the quick brown fox jumps over the lazy"
    val d = docs(
      1L -> s"$run dog sleeps",
      2L -> s"alpha beta gamma $run end",
      3L -> "completely different words about unrelated topics here now")
    val r = CurationOps.winnowCensus(d).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    r(1L) should be > 0L
    r(2L) should be > 0L
    r(3L) shouldBe 0L
  }

  test("q107: a doc shorter than the winnow window still yields exactly " +
    "one fingerprint (min of all its k-gram hashes)") {
    // 4 tokens -> 2 k-grams -> m < W=4 -> single window = whole doc
    val r = CurationOps.winnowCensus(docs(1L -> "just four tokens here"))
      .collect().head
    r.getLong(1) shouldBe 2L // n_kgrams
    r.getLong(2) shouldBe 1L // n_fp
  }

  test("q107: fingerprint density lands near the 2/(w+1) winnowing bound " +
    "on a diverse doc (compression is the operator's point)") {
    val text = (1 to 400).map(i => s"tok${i * 7919 % 1000}x$i").mkString(" ")
    val r = CurationOps.winnowCensus(docs(1L -> text)).collect().head
    val frac = r.getDouble(4)
    frac should be < 0.6 // far below 1.0 = no compression
    frac should be > 0.2 // but a real cover, not degenerate
  }

  test("q107: intra-doc repetition alone never marks a fingerprint shared") {
    val rep = "echo echo echo echo echo echo echo echo echo echo"
    val r = CurationOps.winnowCensus(docs(
      1L -> rep, 2L -> "nothing in common with that other document at all"))
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    r(1L) shouldBe 0L
    r(2L) shouldBe 0L
  }

  // ---------------------------------------------------------------- q108

  test("q108: keep rule bands — every doc in buckets >= 6 is kept, " +
    "no doc below the low bar is kept, middle band is sampled") {
    val out = Registry.queries("q108_quality_filter")(spark, sf0001)
      .collect()
    out.nonEmpty shouldBe true
    out.foreach { r =>
      val (bucket, nDocs, nKept) = (r.getLong(0), r.getLong(1), r.getLong(2))
      nKept should be <= nDocs
      if (bucket >= 6) nKept shouldBe nDocs // score >= 0.6 hard-keep
      if (bucket <= 2) nKept shouldBe 0L // score < 0.3 < KEEP_LO dropped
      // snapped score bounds stay inside the bucket
      r.getDouble(3) should be >= bucket / 10.0
      r.getDouble(4) should be < (bucket + 1) / 10.0
    }
  }

  test("q108: deterministic — two runs produce identical rows (the md5 " +
    "coin, unlike random(), is reproducible)") {
    val a = Registry.queries("q108_quality_filter")(spark, sf0001).collect()
    val b = Registry.queries("q108_quality_filter")(spark, sf0001).collect()
    a.map(_.toString) shouldBe b.map(_.toString)
  }

  // ---------------------------------------------------------------- q109

  test("q109: keeps the best-quality member per component; ties break to " +
    "the smaller doc_id") {
    // component {1,2,3} via chain 1-2, 2-3: doc 2 has the richest text
    // (highest quality), doc 1 the poorest; component {5,6} has two
    // IDENTICAL docs -> equal quality -> rep must be doc 5
    val d = docs(
      1L -> "a a a a a a a a a a",
      2L -> ("the of and to in that it is was for he with as his on be " +
        "at by had many distinct words here make quality rise"),
      3L -> "the the the b b b c c c d",
      5L -> "identical twin text body with enough tokens to shingle",
      6L -> "identical twin text body with enough tokens to shingle")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = CurationOps.clusterRetention(pairs, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    out.keySet shouldBe Set(1L, 5L) // min-label component ids
    out(1L)._1 shouldBe 3L // n_members
    out(1L)._2 shouldBe 2L // rep = highest quality
    out(1L)._3 shouldBe 2L // n_dropped
    out(5L) shouldBe ((2L, 5L, 1L)) // tie -> smaller doc_id
  }

  test("q109: on the test corpus, every cluster's representative has the " +
    "component's max quality and members/drops reconcile") {
    val rows = Registry.queries("q109_cluster_retention")(spark, sf0001)
      .collect()
    rows.nonEmpty shouldBe true
    rows.foreach { r =>
      r.getLong(1) should be >= 2L // a cluster needs >= 2 members
      r.getLong(4) shouldBe r.getLong(1) - 1 // drop all but the rep
    }
    // global invariant: clustered docs = members; dropped = members - reps
    val members = rows.map(_.getLong(1)).sum
    val dropped = rows.map(_.getLong(4)).sum
    dropped shouldBe members - rows.length
  }

  // ---------------------------------------------------------------- q145

  test("q145: chunk geometry — 57 tokens at W=32/S=24 yields starts " +
    "1/25/49 with lengths 32/32/9; short and exact-fit docs get the " +
    "closed-form counts") {
    val d = docs(
      1L -> (1 to 57).map(i => s"w$i").mkString(" "), // ceil(25/24)+1 = 3
      2L -> (1 to 10).map(i => s"w$i").mkString(" "), // n <= W -> 1 chunk
      3L -> (1 to 56).map(i => s"w$i").mkString(" ")) // exact fit -> 2, no empty tail
    val r = CurationOps.chunkOverlap(d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    r.filter(_._1 == 1L).map(c => (c._3, c._4)).toSeq shouldBe
      Seq((1L, 32L), (25L, 32L), (49L, 9L))
    r.filter(_._1 == 2L).map(c => (c._3, c._4)).toSeq shouldBe Seq((1L, 10L))
    r.filter(_._1 == 3L).map(c => (c._3, c._4)).toSeq shouldBe
      Seq((1L, 32L), (25L, 32L))
  }

  test("q145: coverage and overlap invariants hold over the test corpus — " +
    "chunks tile every token, neighbors overlap by exactly W-S except " +
    "a short last window, fingerprints match re-derived chunk text") {
    val W = CurationOps.ChunkW.toLong
    val S = CurationOps.ChunkS.toLong
    val byDoc = Registry.queries("q145_chunk_overlap")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    byDoc should not be empty
    byDoc.values.foreach { cs =>
      val sorted = cs.sortBy(_._2)
      sorted.head._3 shouldBe 1L // first chunk starts at token 1
      sorted.zipWithIndex.foreach { case ((_, no, start, _), i) =>
        no shouldBe i + 1L
        start shouldBe i * S + 1 // the declared stride grid
      }
      // complete coverage: each next chunk starts inside the previous
      sorted.sliding(2).foreach {
        case Array((_, _, s1, n1), (_, _, s2, _)) =>
          s2 should be <= (s1 + n1)
        case _ => ()
      }
      // all but the last are full windows
      sorted.dropRight(1).foreach(_._4 shouldBe W)
      sorted.last._4 should be <= W
    }
  }

  // ---------------------------------------------------------------- q147

  test("q147: census equals an independent driver-side greedy replay over " +
    "q23's scores; selected volume respects the budget") {
    // independent replay: q23 supplies (doc_id, n_toks, quality); the
    // test re-runs the greedy fit rule in plain Scala and compares the
    // per-source census bitwise
    val qual = Registry.queries("q23_quality_score")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ordered = qual.toSeq
      .map { case (id, (n, q)) =>
        (id, n, math.floor(q * 10000 + 0.5).toLong) }
      .sortBy { case (id, _, qmu) => ((10000 - qmu) << 40) + id }
    val budget = math.floor(ordered.map(_._2).sum / 2.0).toLong
    var cum = 0L
    val sel = ordered.flatMap { case (id, n, qmu) =>
      val keep = cum + n <= budget
      cum += n
      if (keep) Some((src(id), n, qmu)) else None
    }
    val expected = sel.groupBy(_._1).map { case (s, xs) =>
      (s, xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).min / 10000.0)
    }.toSet
    val got = Registry.queries("q147_budget_select")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    got.toSet shouldBe expected
    got.map(_._3).sum should be <= budget
    got should not be empty
  }

  // ---------------------------------------------------------------- q149

  test("q149: trajectory equals an independent driver-side replay of the " +
    "multiplicative-weights loop; round 0 uniform; mass approximately " +
    "conserved; above-average-loss domains gain weight in round 1") {
    val rows = Registry.queries("q149_mixture_reweight")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val losses = rows.filter(_._1 == 0L).map(x => x._2 -> x._3)
      .sortBy(_._1)
    // independent replay in plain Scala from the round-0 losses
    val w0 = math.floor(10000.0 / losses.length).toLong
    var w = losses.map { case (s, l) => (s, l, w0) }
    var expected = w.map { case (s, l, wi) => (0L, s, l, wi) }
    for (r <- 1 to 6) {
      val lbar = math.floor(
        w.map { case (_, l, wi) => wi * l }.sum.toDouble /
          w.map(_._3).sum.toDouble).toLong
      val raw = w.map { case (s, l, wi) => (s, l, wi * (20000L + l - lbar)) }
      val sraw = raw.map(_._3).sum
      w = raw.map { case (s, l, rv) =>
        (s, l, math.floor(rv.toDouble * 10000.0 / sraw.toDouble).toLong) }
      expected = expected ++ w.map { case (s, l, wi) => (r.toLong, s, l, wi) }
    }
    rows.toSet shouldBe expected.toSet
    // round 0 uniform
    rows.filter(_._1 == 0L).map(_._4).distinct.length shouldBe 1
    // normalization keeps total mass within floor-rounding of 10^4
    (0L to 6L).foreach { r =>
      val tot = rows.filter(_._1 == r).map(_._4).sum
      tot should be <= 10000L
      tot should be > 10000L - losses.length
    }
    // directional sanity: in round 1 every above-weighted-mean-loss
    // domain's weight is >= every below-mean domain's weight change
    val lbar0 = math.floor(
      losses.map { case (_, l) => w0 * l }.sum.toDouble /
        (w0 * losses.length).toDouble).toLong
    val r1 = rows.filter(_._1 == 1L).map(x => x._2 -> x._4).toMap
    val lmap = losses.toMap
    r1.foreach { case (s, w1) =>
      if (lmap(s) > lbar0) w1 should be >= w0
      if (lmap(s) < lbar0 - 1) w1 should be <= w0
    }
  }
}
