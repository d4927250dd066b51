package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Behavioral invariants for the round-7 corpus/sequence operators
  * (q62 funnel, q63 cube, q64 int8 quantization, q65 hyperplane LSH,
  * q66 transition mining). The DuckDB oracle pins cross-engine value
  * equality; these specs pin the SEMANTIC properties the oracle alone
  * can't express — monotonicity, conservation, reconstruction bounds,
  * partitioning invariance. */
class CorpusOpsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("q62: funnel stage counts are monotone non-increasing") {
    val r = Registry.queries("q62_funnel")(spark, sf0001).collect().head
    val (users, signup, click, purchase) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    users should be >= signup
    signup should be >= click
    click should be >= purchase
    purchase should be > 0L // fixture has complete funnels
  }

  test("q66: transition counts conserve events — every event except each " +
    "user's first is exactly one (prev, next) pair") {
    val events = graft.io.Tables.table(spark, sf0001, "events")
    val nEvents = events.count()
    val nUsers = events.select(col("user_id")).distinct().count()
    val total = Registry.queries("q66_transitions")(spark, sf0001)
      .agg(sum(col("n"))).collect().head.getLong(0)
    total shouldBe (nEvents - nUsers)
  }

  test("q63: cube's grand-total row equals the table count; per-lang slice sums to it") {
    val rows = Registry.queries("q63_cube")(spark, sf0001).collect()
    val nDocs = graft.io.Tables.table(spark, sf0001, "documents").count()
    val grand = rows.filter(r => r.getString(1) == "ALL" && r.getString(2) == "ALL")
    grand should have length 1
    grand.head.getLong(3) shouldBe nDocs
    // grp_id 1 = lang kept, source aggregated out: sums to the total
    rows.filter(_.getLong(0) == 1L).map(_.getLong(3)).sum shouldBe nDocs
  }

  test("q64: int8 quantization reconstructs within half a quantization step") {
    // |v[d] - q[d]*scale| <= scale/2 where scale = amax/127 — the defining
    // property of symmetric round-to-nearest quantization
    val bad = graft.io.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
      .where(col("amax") > 0)
      .withColumn("maxerr", expr(
        """array_max(transform(v,
          |  x -> abs(x - round((x * 127.0D) / amax, 0) * amax / 127.0D)))""".stripMargin))
      .where(col("maxerr") > col("amax") / 127.0 / 2.0 * 1.0000001)
      .count()
    bad shouldBe 0L
  }

  test("q64: quantized range is within [-127, 127]") {
    val r = Registry.queries("q64_embedding_quantize")(spark, sf0001)
    // q_md5 pins the exact components cross-engine; here re-derive the
    // component range from the same arithmetic
    val range = graft.io.Tables.table(spark, sf0001, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
      .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
      .where(col("amax") > 0)
      .select(
        expr("array_min(transform(v, x -> round((x * 127.0D) / amax, 0)))").as("lo"),
        expr("array_max(transform(v, x -> round((x * 127.0D) / amax, 0)))").as("hi"))
      .agg(min(col("lo")), max(col("hi"))).collect().head
    range.getDouble(0) should be >= -127.0
    range.getDouble(1) should be <= 127.0
    r.count() should be > 0L
  }

  test("q65: signatures are deterministic and partitioning-invariant") {
    val emb = graft.io.Tables.table(spark, sf0001, "embeddings")
    def histogram(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val sig = Similarity.hyperplanes.zipWithIndex.map { case (signs, b) =>
        when(round(graft.functions.VectorFns.dot(
          col("v"), typedLit(signs.toSeq)), 6) >= 0, lit(1L << b))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .select(sig.as("s")).groupBy("s").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val h1 = histogram(emb)
    val h2 = histogram(emb.repartition(7, col("vec_id")))
    h1 shouldBe h2
    h1.values.sum shouldBe emb.count()
  }

  test("q65: an exact duplicate vector lands in the same bucket (candidate recall)") {
    import spark.implicits._
    val base = graft.io.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(5)
    val dup = base.withColumn("vec_id", col("vec_id") + lit(1000000L))
    val sig = Similarity.hyperplanes.zipWithIndex.map { case (signs, b) =>
      when(round(graft.functions.VectorFns.dot(
        col("v"), typedLit(signs.toSeq)), 6) >= 0, lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val sigs = base.union(dup)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), sig.as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sigs.filter(_._1 < 1000000L).foreach { case (id, s) =>
      sigs(id + 1000000L) shouldBe s
    }
  }

  test("q67: LSH near-dup is SOUND — every emitted pair is a genuine " +
    "above-threshold pair of the brute-force set") {
    val lsh = Registry.queries("q67_lsh_neardup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force all-pairs at the same threshold (sf0.001 is tiny)
    import graft.functions.VectorFns._
    val n = graft.io.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val a = n.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    val all = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb"), col("na"), col("nb")), 4).as("c"))
      .where(col("c") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh.subsetOf(all) shouldBe true
    lsh should not be empty
  }

  test("packing kernel size gate: the per-lang window and the " +
    "distributed grouped-PrefixSum branches are bit-identical on real " +
    "testdata (COVERAGE.md standing rule — q60/q81/q88/q90 all pack " +
    "through this kernel)") {
    val docs = graft.io.Tables.table(spark, sf0001, "documents")
    val narrow = docs.select(col("doc_id"), col("lang"),
      org.apache.spark.sql.functions.size(split(col("text"), " "))
        .as("n_tokens"))
    val n = docs.count()
    def run(limit: Long) =
      EtlPipeline.exclusiveTokens(narrow, "n_tokens", n, localLimit = limit)
        .orderBy(col("lang"), col("doc_id"))
        .select(col("doc_id"), col("__excl_toks"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    val window = run(Long.MaxValue) // n << any limit → window branch
    val dist = run(0L)              // forces the grouped distributed scan
    window.length.toLong shouldBe n
    dist should contain theSameElementsInOrderAs window
  }

  test("q81: shards are contiguous per lang; an over-budget shard means one oversized doc") {
    val rows = Registry.queries("q81_corpus_prep")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows should not be empty
    rows.groupBy(_._1).foreach { case (_, shards) =>
      // shard ids are 0..max with no gaps (cumulative packing can't skip)
      shards.map(_._2).sorted.toSeq shouldBe (0L until shards.length.toLong)
      shards.foreach { case (_, _, nDocs, tokens) =>
        nDocs should be >= 1L
        // a shard over the 1000-token budget is only possible when a
        // single document alone overflows it — packing never appends to
        // a shard whose budget is already spent
        if (tokens > 1000L + 200L) nDocs shouldBe 1L
      }
    }
  }

  test("q79: a transitive duplicate family collapses to ONE survivor") {
    // three copies of one vector (a transitive 3-clique after LSH +
    // verify) plus two copies of another: the clustering must elect
    // exactly one min-id survivor per family, never one per PAIR —
    // that's the difference between pair emission (q67) and dedup (q79)
    import spark.implicits._
    val base = graft.io.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(2).collect()
    val (v1, v2) = (base(0).getSeq[Double](1), base(1).getSeq[Double](1))
    val planted = Seq(
      (10L, v1), (11L, v1), (12L, v1),
      (20L, v2), (21L, v2)).toDF("vec_id", "v")
    val out = Similarity.embeddingDedup(planted, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    out.map(t => (t._1, t._2)) shouldBe
      Array((10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L))
    out.filter(_._3 == 1L).map(_._1) shouldBe Array(10L, 20L)
  }

  test("q79: the dedup output agrees with q67's pair graph at the same threshold") {
    // every non-survivor must appear in some pair; every paired id must
    // be in the output (nodes of the pair graph == clustered ids)
    val cl = Registry.queries("q79_embedding_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clustered = cl.map(_._1).toSet
    val survivors = cl.filter(_._3 == 1L).map(_._1).toSet
    // cluster labels are members, and each cluster's label is its min id
    cl.foreach { case (id, label, surv) =>
      clustered should contain(label)
      label should be <= id
      (surv == 1L) shouldBe (label == id)
    }
    survivors should not be empty
    clustered.size should be > survivors.size // at least one drop
  }

  test("q67: exact duplicates always collide and are always emitted") {
    val base = graft.io.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(3)
    val dup = base.withColumn("vec_id", col("vec_id") + lit(1000000L))
    val sigd = base.union(dup)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), Similarity.signatureCol.as("s"))
    val pairs = sigd.as("a").join(sigd.as("b"),
        col("a.s") === col("b.s") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    base.collect().map(_.getLong(0)).foreach { id =>
      pairs should contain((id, id + 1000000L))
    }
  }

  test("q100: a planted duplicate family collapses to the min-vec_id " +
    "survivor inside its cell; a lone vector in another cell is untouched") {
    import spark.implicits._
    import graft.functions.VectorFns.l2norm
    // two orthogonal centroids; 10/11/12 are copies of c1's direction
    // (within-cell cosine 1.0), 20 sits alone at c2
    val c1 = Seq(1.0, 0.0, 0.0)
    val c2 = Seq(0.0, 1.0, 0.0)
    val n = Seq((10L, c1), (11L, c1), (12L, c1), (20L, c2))
      .toDF("vec_id", "v").withColumn("nrm", l2norm(col("v")))
    val cents = Seq((1L, c1), (2L, c2)).toDF("c_id", "cv")
      .withColumn("cn", l2norm(col("cv")))
    val out = Similarity.semanticDedupCensus(n, cents, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out shouldBe Array((1L, 3L, 2L, 1L), (2L, 1L, 0L, 1L))
  }

  test("q100: the census conserves the corpus — cells partition the " +
    "vectors, survivors + dropped = cell size, and assignment is " +
    "partitioning-invariant") {
    val rows = Registry.queries("q100_semantic_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows should not be empty
    val nVecs = graft.io.Tables.table(spark, sf0001, "embeddings").count()
    rows.map(_._2).sum shouldBe nVecs
    rows.foreach { case (_, n, dropped, survivors) =>
      dropped + survivors shouldBe n
      survivors should be >= 1L // the min-id cell-mate always survives
    }
    // determinism: a second run over a differently-partitioned plan is equal
    val again = Registry.queries("q100_semantic_dedup")(spark, sf0001)
      .repartition(7).orderBy(col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    again shouldBe rows
  }

  test("q101: each Gopher rule fires on its own planted violation and " +
    "keep is the conjunction") {
    import spark.implicits._
    val good = (Seq("the", "of", "and") ++
      (1 to 57).map(i => s"word$i")).mkString(" ")       // 60 words, 3 stopwords
    val short = "the of " + (1 to 8).map(i => s"w$i").mkString(" ") // 10 words
    val symbols = (Seq("the", "of") ++
      (1 to 58).map(_ => "###")).mkString(" ")           // 58/60 symbol tokens
    val longWords = (Seq("the", "of") ++
      (1 to 58).map(i => "x" * 15)).mkString(" ")        // mean len >> 10
    val out = TextAnalysis.gopherRules(
      Seq((1L, good), (2L, short), (3L, symbols), (4L, longWords))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9),
          r.getLong(10), r.getLong(11))).toMap
    // (r_wordcount, r_meanlen, r_alpha, r_symbol, r_stopword, keep)
    out(1L) shouldBe ((1L, 1L, 1L, 1L, 1L, 1L))
    out(2L)._1 shouldBe 0L // word count below 50
    out(2L)._6 shouldBe 0L
    out(3L)._3 shouldBe 0L // <80% alphabetic tokens
    out(3L)._4 shouldBe 0L // symbol ratio above 0.1
    out(3L)._6 shouldBe 0L
    out(4L)._2 shouldBe 0L // mean word length above 10
    out(4L)._6 shouldBe 0L
    // keep is exactly the conjunction of the five rules, every row
    out.values.foreach { case (a, b, c, d, e, k) =>
      k shouldBe (a min b min c min d min e)
    }
  }

  test("q101: map-only plan — no shuffle, no UDFs; registry output " +
    "covers every tokenizable doc") {
    val df = Registry.queries("q101_gopher_rules")(spark, sf0001)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    p should not include "BatchEvalPython"
    // the only allowed exchange is the final orderBy's range partitioning
    p.split("Exchange").length - 1 should be <= 1
    val nTokenizable = graft.io.Tables.table(spark, sf0001, "documents")
      .filter(org.apache.spark.sql.functions.size(
        graft.functions.TextFns.tokens(col("text"))) > 0).count()
    assert(df.count() == nTokenizable)
  }

  test("q68: temperature thresholds flatten the mixture — rarer strata " +
    "get strictly higher keep rates; caps at the bucket ceiling") {
    val rows = Registry.queries("q68_temperature_mix")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.length should be >= 2
    // sort by corpus count: thr must be non-increasing as n_docs grows
    val byCount = rows.sortBy(_._2)
    byCount.sliding(2).foreach { case Array((_, n1, t1, _), (_, n2, t2, _)) =>
      if (n1 < n2) t1 should be >= t2
    }
    all(rows.map(_._3)) should be <= 10000L
    // every stratum keeps something, nothing keeps more than it has
    rows.foreach { case (_, n, _, kept) =>
      kept should be > 0L
      kept should be <= n
    }
  }

  test("q68: temperatureMix is deterministic and matches its own threshold replay") {
    import graft.operators.Sampling
    val docs = graft.io.Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"))
    val once = Sampling.temperatureMix(docs, "doc_id", "lang", 0.3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val again = Sampling.temperatureMix(
        docs.repartition(5, col("doc_id")), "doc_id", "lang", 0.3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    once shouldBe again
    // overall keep volume lands near the requested fraction (md5 buckets
    // are uniform; sf0.001 is small so allow a generous band)
    val total = docs.count().toDouble
    once.size.toDouble should be > total * 0.15
    once.size.toDouble should be < total * 0.45
  }

  test("q69: containment catches a short doc embedded in a long one " +
    "where symmetric Jaccard structurally cannot") {
    import spark.implicits._
    val small = (1 to 30).map(i => s"tok$i").mkString(" ")
    val big = small + " " + (31 to 300).map(i => s"pad$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val sh = graft.dedup.TextDedup.shingleRows(docs, "doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val (overlap, cached) = graft.dedup.TextDedup.pairOverlapPlan(sh, pairs)
    val r = overlap.collect().head
    val (na, nb, ni) = (r.getAs[Long]("na"), r.getAs[Long]("nb"),
      r.getAs[Long]("n_inter"))
    cached.foreach(_.unpersist(blocking = false))
    val jaccard = ni.toDouble / (na + nb - ni)
    val contA = ni.toDouble / na
    contA shouldBe 1.0 // every shingle of the small doc is in the big one
    jaccard should be < 0.4 // the q35 threshold would have missed it
  }

  test("q70: MAD is robust — an extreme injected outlier is flagged and " +
    "barely moves the statistics") {
    import spark.implicits._
    val base = (1 to 99).map(i => ("en", 100.0 + (i % 11))) // lengths 100..110
    val poisoned = base :+ (("en", 1e7))
    def stats(rows: Seq[(String, Double)]) = {
      val df = rows.toDF("lang", "x")
      val med = df.groupBy("lang").agg(percentile(col("x"), lit(0.5)).as("med"))
      val dev = df.join(med, "lang").select(col("lang"),
        abs(col("x") - col("med")).as("adev"), col("med"))
      val mad = dev.groupBy("lang").agg(percentile(col("adev"), lit(0.5)).as("mad"),
        first(col("med")).as("med"))
      val r = mad.collect().head
      val m = r.getAs[Double]("med"); val d = r.getAs[Double]("mad")
      val out = dev.filter(col("adev") > lit(3.0) * lit(1.4826) * lit(d)).count()
      (m, d, out)
    }
    val (medClean, madClean, _) = stats(base)
    val (medPois, madPois, outPois) = stats(poisoned)
    outPois shouldBe 1L // exactly the injected point
    math.abs(medPois - medClean) should be <= 1.0
    math.abs(madPois - madClean) should be <= 1.0
  }

  test("q71: every probe result shares the probe vector's index bucket, " +
    "ranks are contiguous from 1, cosines non-increasing") {
    val rows = Registry.queries("q71_lsh_index_probe")(spark, sf0001).collect()
    rows.map(_.getLong(0)).toSeq shouldBe (1L to rows.length)
    val cosines = rows.map(_.getDouble(2)).toSeq
    cosines.sliding(2).foreach {
      case Seq(a, b) => a should be >= b
      case _ =>
    }
    // bucket agreement: recompute signatures for probe + neighbors
    val sigs = graft.io.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), Similarity.signatureCol.as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) >> 4)).toMap
    rows.map(_.getLong(1)).foreach { nb => sigs(nb) shouldBe sigs(0L) }
  }

  test("q72: diff statuses conserve the two snapshot populations exactly") {
    val rows = Registry.queries("q72_snapshot_diff")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dec = graft.operators.Sampling.hashBucket(col("doc_id")) % 10
    val docs = graft.io.Tables.table(spark, sf0001, "documents")
    val v1 = docs.where(dec < 9).count()
    val v2 = docs.where(dec >= 1).count()
    rows("removed") shouldBe docs.where(dec === 0).count()
    rows("added") shouldBe docs.where(dec === 9).count()
    rows("changed") shouldBe docs.where(dec === 5).count()
    // everything in both snapshots is either changed or same
    rows("changed") + rows("same") shouldBe docs.where(dec >= 1 && dec < 9).count()
    rows.values.sum shouldBe (v1 + v2 -
      docs.where(dec >= 1 && dec < 9).count()) // |v1 ∪ v2|
  }

  test("q73: a planted 4-clique of duplicates yields K4 graph stats " +
    "(6 edges, 4 nodes of degree 3, 4 triangles)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q73fix").toString
    val dup = "the very same duplicated document body repeated verbatim " +
      "across four doc ids to form a clique in the pair graph"
    val docs = Seq(
      1L -> dup, 2L -> dup, 3L -> dup, 4L -> dup,
      5L -> "an unrelated island document about something else entirely",
      6L -> "another disconnected text mentioning only itself"
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val stats = Registry.queries("q73_graph_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    stats("edges") shouldBe 6L
    stats("nodes") shouldBe 4L
    stats("deg_3") shouldBe 4L
    stats("triangles") shouldBe 4L
  }

  test("q74: trailing-hour frame matches a brute-force recomputation per user") {
    val rows = Registry.queries("q74_range_frame")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val events = graft.io.Tables.table(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    byUser.foreach { case (uid, evs) =>
      evs.foreach { case (_, eid, tus) =>
        val expected = evs.count(e => e._3 >= tus - 3600000000L && e._3 <= tus)
        withClue(s"user $uid event $eid: ") {
          rows((uid, eid)) shouldBe expected.toLong
        }
      }
    }
  }

  test("q75: the sample is exactly the 20 globally smallest A-ES keys, " +
    "and heavier docs get smaller keys for the same uniform") {
    val got = Registry.queries("q75_weighted_sample")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got.map(_._1).toSeq shouldBe (1L to 20L)
    // brute force: recompute every key and take the 20 smallest
    val all = graft.io.Tables.table(spark, sf0001, "documents")
      .where(col("n_chars") > 0)
      .select(col("doc_id"),
        ((graft.operators.Sampling.hashBucket(col("doc_id")).cast("double") +
          lit(0.5)) / 10000.0).as("u"),
        col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), -math.log(r.getDouble(1)) / r.getLong(2)))
    val expect = all.sortBy(t => (t._2, t._1)).take(20).map(_._1).toSeq
    got.map(_._2).toSeq shouldBe expect
    // the weight actually biases: key is decreasing in w for fixed u
    val k1 = -math.log(0.25) / 100.0
    val k2 = -math.log(0.25) / 1000.0
    k2 should be < k1
  }

  test("q82: a planted token-spam doc is flagged repetitive; a fully " +
    "distinct doc is not, and its top gram tie-breaks lexicographically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q82fix").toString
    // the distinct doc must be long enough that ONE trigram is an honestly
    // small char fraction — the thresholds are corpus rules, and a
    // 10-token doc genuinely trips them (any trigram is ~30% of it)
    Seq(
      1L -> Seq.fill(10)("spam").mkString(" "),
      2L -> (1 to 30).map(i => f"a$i%02d").mkString(" ")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("q82_repetition_metrics")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5))).toMap
    val (top2Spam, t2s, t3s, d5s, flagSpam) = rows(1L)
    top2Spam shouldBe "spam spam"
    d5s shouldBe 1.0 // every 5-gram occurrence duplicates
    flagSpam shouldBe 1L
    val (top2Dist, t2d, t3d, d5d, flagDist) = rows(2L)
    top2Dist shouldBe "a01 a02" // all counts 1 -> smallest gram wins
    d5d shouldBe 0.0
    flagDist shouldBe 0L
    t2s should be > t2d
    t3s should be > t3d
  }

  test("q83: the statistically unusual doc scores lowest; identical docs " +
    "score identically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q83fix").toString
    val common = "the cat sat on the mat"
    Seq(1L -> common, 2L -> common, 3L -> common,
      9L -> "the zebra jumped over the volcano")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("q83_bigram_lm_score")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows should have length 4
    // bottom-k is ordered ascending: the novel-bigram doc is first
    rows.head._1 shouldBe 9L
    // the three identical docs share one score and tie-break by id
    rows.drop(1).map(_._1).toSeq shouldBe Seq(1L, 2L, 3L)
    rows.drop(1).map(_._3).distinct should have length 1
    rows.head._3 should be < rows(1)._3
  }

  test("q103: pair counts weight by token frequency and exclude 1-char " +
    "tokens — the BPE merge argmax is exact on a planted vocabulary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q103fix").toString
    // vocab after histogram: ab×2, abc×1, a×1 (excluded: 1 char)
    Seq(1L -> "ab ab a", 2L -> "abc").toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("q103_bpe_pair_counts")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // 'ab' pairs: from ab (w=2) + from abc (w=1) = 3; 'bc' from abc = 1;
    // the single 'a' token contributes nothing
    rows.toSeq shouldBe Seq("ab" -> 3L, "bc" -> 1L)
  }

  test("q104: an exact benchmark copy in the corpus is flagged at cosine " +
    "1.0 with the right best-match; unrelated vectors stay unflagged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q104fix").toString
    // md5-decile(vec_id): 14, 17 >= 9 (benchmark); 0..4 < 9 (corpus)
    val leaked = Array.tabulate(64)(d => math.sin(d + 1).toFloat)
    val other = Array.tabulate(64)(d => math.cos(3 * d + 2).toFloat *
      (if (d % 2 == 0) 1 else -1))
    Seq(
      (14L, leaked, 0),  // benchmark item
      (17L, other, 0),   // unrelated benchmark item
      (3L, leaked, 0),   // the leak: exact copy in the corpus
      (1L, other.map(-_), 0) // anti-correlated with 17 -> cosine -1, no flag
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Registry.queries("q104_semantic_decontam")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // only the planted copy flags: identical vectors share the LSH bucket
    // by construction and score exactly 1.0
    rows.toSeq shouldBe Seq((3L, 1L, 14L, 1.0))
  }

  test("q85: the split manifest partitions the corpus — doc and token " +
    "totals conserve, and every (split, lang) group is one of the 3 labels") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q85fix").toString
    val docs = (0L until 100L).map(i =>
      (i, s"tok${i % 7} alpha beta", if (i % 3 == 0) "de" else "en"))
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("q85_hash_split")(spark, dir).collect()
    rows.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")) shouldBe true
    rows.map(_.getLong(2)).sum shouldBe 100L       // every doc exactly once
    rows.map(_.getLong(3)).sum shouldBe 300L       // 3 tokens per doc conserve
    // re-running assigns identical groups (pure function of the row)
    Registry.queries("q85_hash_split")(spark, dir).collect() shouldBe rows
  }

  test("q86: fertility is exact on planted docs — subword splits of 'x9' " +
    "cost extra BPE tokens; language keys off the marker vote") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q86fix").toString
    Seq(
      1L -> "The and of to in",       // 5 en markers, 5 ws = 5 bpe tokens
      2L -> "der die und x9 ein"      // de markers; "x9" -> "x","9": 6 bpe
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("q86_tokenizer_fertility")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    rows("en") shouldBe ((1L, 5L, 5L, 1.0, 0.3125))   // 5/16 chars
    rows("de") shouldBe ((1L, 6L, 5L, 1.2, 0.3333))   // 6/18 chars
  }

  test("q87: entropy is 0 for a one-token-type doc (flagged), ln(n) for an " +
    "all-distinct doc, and the mixed case matches the closed form") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q87fix").toString
    Seq(
      1L -> Seq.fill(4)("spam").mkString(" "),  // H = 0
      2L -> ('a' to 'i').map(_.toString).mkString(" "), // H = ln 9 ≈ 2.1972
      3L -> "x x y"                             // H = ln3 - (2 ln2)/3
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("q87_token_entropy")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    rows(1L) shouldBe ((4L, 1L, 0.0, 1L))
    rows(2L) shouldBe ((9L, 9L, 2.1972, 0L))   // floor(ln(9)·1e4+.5)/1e4
    rows(3L) shouldBe ((3L, 2L, 0.6365, 1L))   // micro-nat-snapped closed form
  }

  test("q88: a small lang's shard interleaves INSIDE the big lang's run " +
    "at its stride midpoint, and running token totals accumulate in order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q88fix").toString
    val w500 = Seq.fill(500)("w").mkString(" ")
    // lang a: 6×500-token docs -> 3 shards of 1000; lang b: 2×500 -> 1 shard
    ((1L to 6L).map(i => (i, w500, "a")) ++
      Seq((11L, w500, "b"), (12L, w500, "b")))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("q88_shard_interleave")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    // fins: a = 1/6, 3/6, 5/6; b = 1/2 (ties with a's shard 1 -> lang order)
    rows shouldBe Array(
      (1L, "a", 0L, 1000L),
      (2L, "a", 1L, 2000L),
      (3L, "b", 0L, 3000L),
      (4L, "a", 2L, 4000L))
  }

  test("q90: incremental packing continues each lang's layout exactly at " +
    "floor(T_L/1000), shards are contiguous, and batch tokens conserve") {
    import graft.operators.Sampling
    val F = org.apache.spark.sql.functions
    val toks = graft.io.Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"),
        F.size(F.split(col("text"), " ")).cast("long").as("n"),
        Sampling.hashBucket(col("doc_id")).as("b"))
    // independent derivation of yesterday's totals and the batch volume
    val tl = toks.where(col("b") < 8000).groupBy("lang").agg(sum("n").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchTok = toks.where(col("b") >= 8000).groupBy("lang").agg(sum("n").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Registry.queries("q90_incremental_packing")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val shards = rs.map(_._2).sorted
      val t = tl.getOrElse(lang, 0L)
      withClue(s"$lang: ") {
        // first batch shard is exactly the corpus boundary shard
        assert(shards.head == t / 1000)
        // contiguous range, no holes
        shards shouldBe (shards.head to shards.last)
        // the boundary shard continues iff the corpus left it part-filled
        rs.find(_._2 == shards.head).get._4 shouldBe (if (t % 1000 > 0) 1L else 0L)
        // later shards never carry the continuation flag
        rs.filter(_._2 > shards.head).map(_._4).distinct.toSeq should
          (be(Seq(0L)) or be(Seq.empty))
        // token conservation: manifest delta sums to the batch volume
        assert(rs.map(_._3).sum == batchTok(lang))
      }
    }
    rows.length should be > 0
  }

  test("q91: stage counts are monotone, drops reconcile exactly, and the " +
    "sampled stage agrees with q81's packed doc total (shared rules)") {
    val rows = Registry.queries("q91_attrition_report")(spark, sf0001).collect()
    rows.length shouldBe 5
    val n = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1L to 4L).foreach(i => assert(n(i) <= n(i - 1)))
    rows.foreach { r =>
      val expected = if (r.getLong(0) == 0L) 0L else n(r.getLong(0) - 1) - n(r.getLong(0))
      assert(r.getLong(3) == expected, s"stage ${r.getLong(0)} dropped")
    }
    // the report and the pipeline output derive from byte-identical rules —
    // they can never disagree about how many docs survived to packing
    val q81docs = Registry.queries("q81_corpus_prep")(spark, sf0001)
      .collect().map(_.getLong(2)).sum
    assert(n(4L) == q81docs)
    n(0L) should be > 0L
  }

  test("q94: tertile buckets partition the scored corpus with ordered, " +
    "non-overlapping score ranges and near-third sizes") {
    val rows = Registry.queries("q94_perplexity_buckets")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    rows.keySet shouldBe Set("head", "middle", "tail")
    val (nH, minH, _) = rows("head")
    val (nM, minM, maxM) = rows("middle")
    val (nT, minT, maxT) = rows("tail")
    val n = nH + nM + nT
    // score ranges are ordered and disjoint: tail < middle < head
    minT should be <= maxT
    maxT should be < minM
    maxM should be < minH
    // cut at ceil(n/3) ties-inclusive: tail reaches at least a third;
    // head (the ELSE bucket) can only lose docs to ties, never gain
    nT should be >= (n + 2) / 3
    nH should be <= (n + 2) / 3
    Seq(nH, nM, nT).foreach(_ should be > 0L)
  }

  test("q93: the SCD2 gate subset is internally consistent — versions " +
    "are dense per user and intervals chain without gaps") {
    val rows = Registry.queries("q93_scd2_intervals")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5)))
    rows should not be empty
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.map(_._2) shouldBe (1L to sorted.length.toLong)
      sorted.sliding(2).foreach {
        case Array(a, b) => a._4 shouldBe Some(b._3) // valid_to = next from
        case _           => ()
      }
      sorted.last._4 shouldBe None // open interval…
      sorted.last._5 shouldBe 1L   // …flagged current
      sorted.init.foreach(_._5 shouldBe 0L)
    }
  }

  test("q65: hyperplanes are balanced ±1 (md5 coin is unbiased enough) and fixed") {
    val hp = Similarity.hyperplanes
    hp.length shouldBe 8
    all(hp.map(_.length)) shouldBe 64
    // regenerating gives the identical planes (pure function of md5)
    val again = Similarity.hyperplanes
    hp.zip(again).foreach { case (a, b) => a.toSeq shouldBe b.toSeq }
    // each plane is a genuine mix of signs, not degenerate
    hp.foreach { plane =>
      val pos = plane.count(_ > 0)
      pos should be > 16
      pos should be < 48
    }
  }
}
