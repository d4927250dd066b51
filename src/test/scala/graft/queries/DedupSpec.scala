package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Postcondition checks for the dedup suite, complementing the DuckDB
  * value-equality oracle the driver runs. */
class DedupSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("q15: one row per content hash; keep_id is the min doc_id; copies sum to corpus size") {
    val rows = Registry.queries("q15_dedup_exact")(spark, sf0001).collect()
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    rows.map(_.getString(0)).distinct.length shouldBe rows.length
    rows.map(_.getAs[Long]("n_copies")).sum shouldBe nDocs
    all(rows.map(_.getAs[Long]("n_copies"))) should be >= 1L
  }

  test("q17: pairs are ordered, above threshold, and deterministic") {
    val run = Registry.queries("q17_neardup_minhash")
    val a = run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    a.foreach { case (da, db, j) =>
      da should be < db
      j should be >= 0.5
      j should be <= 1.0
    }
    run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq shouldBe a
  }

  test("q19: hamming distance within threshold and symmetric-free ordering") {
    val rows = Registry.queries("q19_simhash_pairs")(spark, sf0001).collect()
    rows.foreach { r =>
      r.getLong(0) should be < r.getLong(1)
      r.getLong(2) should be <= 3L
      r.getLong(2) should be >= 0L
    }
  }

  test("q18: simhash signatures use the full 64-bit plane and identical " +
    "docs collide") {
    val sig = Registry.queries("q18_simhash")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // the upper parity plane (bits 32..63) must actually be populated —
    // a regression to the 32-bit construction would leave it all-zero
    sig.values.exists(s => s < 0L || s >= (1L << 32)) shouldBe true
    // exact duplicates (same md5 text) must have identical simhash
    val dupGroups = Registry.queries("q15_dedup_exact")(spark, sf0001).collect()
      .filter(_.getAs[Long]("n_copies") > 1)
    import org.apache.spark.sql.functions._
    val byFp = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("fp")).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSeq)
    dupGroups.foreach { g =>
      val ids = byFp(g.getString(0))
      ids.map(sig).distinct.length shouldBe 1
    }
  }

  test("q84: a planted boilerplate chunk is cut everywhere except its " +
    "canonical (min doc_id) occurrence; documents re-assemble in order") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(
        s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dir = java.nio.file.Files.createTempDirectory("q84fix").toString
    val boiler = (1 to 10).map(i => f"b$i%02d").mkString(" ") // chunk A
    val unique = (1 to 10).map(i => f"c$i%02d").mkString(" ") // chunk B
    val other = (1 to 10).map(i => f"d$i%02d").mkString(" ")  // chunk D
    val short15 = (1 to 15).map(i => f"e$i%02d").mkString(" ")
    Seq(
      1L -> s"$boiler $unique",  // canonical home of the boilerplate
      2L -> s"$boiler $other",   // loses chunk A, keeps chunk D
      3L -> boiler,              // entirely boilerplate -> emptied
      4L -> short15              // 15 tokens -> 2 chunks, last one short
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val run = Registry.queries("q84_chunk_dedup")
    val rows = run(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    rows(1L) shouldBe ((2L, 0L, md5hex(s"$boiler $unique")))
    rows(2L) shouldBe ((2L, 1L, md5hex(other)))
    rows(3L) shouldBe ((1L, 1L, md5hex("")))
    rows(4L) shouldBe ((2L, 0L, md5hex(short15)))
    // deterministic under re-execution (canonical rule is a total order)
    run(spark, dir).collect().map(_.toSeq).toSeq shouldBe
      rows.toSeq.sortBy(_._1).map { case (id, (a, b, c)) => Seq(id, a, b, c) }
  }

  test("q102: a passage shared at DIFFERENT offsets is caught (the chunk-" +
    "grid miss case); intra-doc repetition alone never marks a span") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q102fix").toString
    val passage = (1 to 8).map(i => f"p$i%02d").mkString(" ")
    val selfRep = (1 to 8).map(i => f"q$i%02d").mkString(" ")
    Seq(
      1L -> s"$passage x01 x02 x03 x04", // passage at offset 1
      2L -> s"y01 y02 $passage",         // same passage at offset 3 — a
                                         // fixed chunk grid never aligns it
      3L -> (1 to 8).map(i => f"z$i%02d").mkString(" "), // unique, 1 span
      4L -> s"$selfRep $selfRep"         // repeats only WITHIN one doc
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("q102_repeated_spans")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    rows(1L) shouldBe ((5L, 1L, 0.2))      // 12 toks → 5 spans, 1 shared
    rows(2L) shouldBe ((3L, 1L, 0.3333))   // 10 toks → 3 spans, 1 shared
    rows(3L) shouldBe ((1L, 0L, 0.0))
    rows(4L) shouldBe ((9L, 0L, 0.0))      // 2 intra-doc occurrences: no mark
  }

  test("q152: planted shared runs of 12/40/70 tokens land at grid lengths " +
    "8/32/64; a unique doc reports 0; intra-doc repetition never marks") {
    import spark.implicits._
    def run(tag: String, n: Int) =
      (1 to n).map(i => f"$tag$i%03d").mkString(" ")
    def filler(tag: String, n: Int) = run(tag, n)
    val r12 = run("a", 12)   // shared 12-run  → longest grid hit: 8
    val r40 = run("b", 40)   // shared 40-run  → 32 (no 64-window fits)
    val r70 = run("c", 70)   // shared 70-run  → 64
    val selfRep = run("s", 8)
    val docs = Seq(
      1L -> s"${filler("fa", 4)} $r12 ${filler("fb", 4)}",
      2L -> s"${filler("fc", 6)} $r12",
      3L -> s"$r40 ${filler("fd", 5)}",
      4L -> s"${filler("fe", 3)} $r40",
      5L -> r70,
      6L -> s"${filler("ff", 9)} $r70",
      7L -> filler("fg", 20),            // unique → 0
      8L -> s"$selfRep $selfRep $selfRep" // intra-doc only → 0
    ).toDF("doc_id", "text")
    val got = Dedup.longestSharedRun(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(
      1L -> 8L, 2L -> 8L, 3L -> 32L, 4L -> 32L,
      5L -> 64L, 6L -> 64L, 7L -> 0L, 8L -> 0L)
    // monotone flag structure: a doc flagged at L is flagged at every
    // shorter grid length — max over the grid is well-defined (the
    // sub-span argument the cascade deployment shape relies on)
    val base = docs.select($"doc_id",
      graft.functions.TextFns.tokens($"text").as("tk"))
    Seq(8, 16, 32, 64).foreach { len =>
      val flagged = Dedup.longestSharedRun(docs).collect()
        .filter(_.getLong(1) >= len).map(_.getLong(0)).toSet
      // every doc whose max_shared_len >= len must actually contain a
      // cross-doc-shared len-window per q102-style independent check
      val spans = base.collect().flatMap { r =>
        val tk = r.getSeq[String](1)
        tk.sliding(len).filter(_.length == len)
          .map(w => (w.mkString(" "), r.getLong(0))).toSeq
      }
      val shared = spans.groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 2)
        .values.flatten.map(_._2).toSet
      flagged shouldBe shared
    }
  }

  test("q152 cascade gate: the flagged-docs-only level cascade (forced " +
    "via cascadeLimit = 0) emits EXACTLY the single-pass union's output " +
    "on the planted-run fixture — the monotone sub-span soundness " +
    "argument, spec-forced per the standing size-gate rule") {
    import spark.implicits._
    def run(tag: String, n: Int) =
      (1 to n).map(i => f"$tag$i%03d").mkString(" ")
    val r12 = run("a", 12)
    val r40 = run("b", 40)
    val r70 = run("c", 70)
    val selfRep = run("s", 8)
    val docs = Seq(
      1L -> s"${run("fa", 4)} $r12 ${run("fb", 4)}",
      2L -> s"${run("fc", 6)} $r12",
      3L -> s"$r40 ${run("fd", 5)}",
      4L -> s"${run("fe", 3)} $r40",
      5L -> r70,
      6L -> s"${run("ff", 9)} $r70",
      7L -> run("fg", 20),
      8L -> s"$selfRep $selfRep $selfRep",
      // a doc whose ONLY sharing is at level 8 — it must leave the
      // cascade's scan set after level 8 (flagged, but contributes no
      // 16-spans shared with anyone) without perturbing deeper levels
      9L -> s"$r12 ${run("fh", 3)}"
    ).toDF("doc_id", "text")
    val single = Dedup.longestSharedRun(docs, cascadeLimit = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val cascade = Dedup.longestSharedRun(docs, cascadeLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    cascade shouldBe single
    // and the fixture actually exercises every level: all four grid
    // lengths appear (12/40/70-token runs land at 8/32/64; 40 also
    // flags 16 on the way)
    single.map(_._2).toSet should contain allOf (0L, 8L, 32L, 64L)
  }

  test("q146: classification agrees with an independently-computed census " +
    "over injected pairs; sides normalized; same-split rows leak nothing") {
    import spark.implicits._
    // synthetic pair graph over ids 0..199 — labels derived by the SAME
    // library split the corpus uses; the spec pins the CLASSIFICATION
    // (normalization, leaked-side choice, distinctness), computed here
    // by independent driver-side code over the labeled id set
    val ids = (0L until 200L)
    val labels = graft.operators.Sampling.hashSplit(
        ids.toDF("doc_id"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    labels.values.toSet should contain allOf ("train", "val", "test")
    val pairs = ids.sliding(2).map(w => (w(0), w(1))).toSeq
    val rk = Map("train" -> 0, "val" -> 1, "test" -> 2)
    val expected = pairs
      .map { case (a, b) =>
        val (la, lb) = (labels(a), labels(b))
        val (lo, hi, leak) =
          if (rk(la) == rk(lb)) (la, lb, None)
          else if (rk(la) < rk(lb)) (la, lb, Some(b))
          else (lb, la, Some(a))
        ((lo, hi), leak)
      }
      .groupBy(_._1)
      .map { case (k, vs) =>
        (k._1, k._2, vs.size.toLong,
          vs.flatMap(_._2).distinct.size.toLong)
      }.toSet
    val got = Dedup.splitLeakageCensus(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    got.toSet shouldBe expected
    got.foreach { case (a, b, _, leaked) =>
      rk(a) should be <= rk(b)
      if (a == b) leaked shouldBe 0L
    }
  }

  test("q146: census totals reconcile with the verified pair graph at sf0.001") {
    val census = Registry.queries("q146_split_leakage")(spark, sf0001)
      .collect()
    val totalPairs = Dedup.verifiedPairsIndexed(spark, sf0001).count()
    census.map(_.getLong(2)).sum shouldBe totalPairs
    census.foreach { r =>
      r.getLong(3) should be <= r.getLong(2) // distinct docs <= pairs
    }
  }

  test("q150: repair removes exactly the independently-derived train-side " +
    "contaminators; eval splits untouched; counts partition each split") {
    val labels = graft.operators.Sampling.hashSplit(
        spark.read.parquet(s"$sf0001/documents.parquet").select("doc_id"),
        "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expectedRm = Dedup.verifiedPairsIndexed(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        (labels(a), labels(b)) match {
          case ("train", lb) if lb != "train" => Some(a)
          case (la, "train") if la != "train" => Some(b)
          case _ => None
        }
      }.distinct
    val rows = Registry.queries("q150_split_repair")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.keySet shouldBe Set("train", "val", "test")
    rows.foreach { case (s, (n, rm, kept)) =>
      assert(n == labels.values.count(_ == s).toLong)
      assert(rm + kept == n)
      if (s != "train") assert(rm == 0L)
    }
    rows("train")._2 shouldBe expectedRm.length.toLong
  }
}
