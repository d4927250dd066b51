package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.similarity.VectorSearch

/** The bounded IVF coarse codebook (q36/q100/q130/q131) and the q131
  * nprobe election. The round-14 verdict's one weak family: the retired
  * vec_id%101 codebook grew linearly with the corpus (broadcast OOM +
  * N²/101 assignment). These tests force BOTH branches of the
  * k = min(budget, ceil(sqrt(N))) rule (the standing spec-forced-branch
  * rule), pin the deterministic md5-order selection against an
  * independent Scala computation, and prove the capped branch sound
  * end-to-end via the k=1 identity (one cell ⇒ IVF ≡ brute force). */
class CodebookSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def normedEmb = {
    import graft.functions.VectorFns.{l2norm, toDoubleArray}
    graft.io.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"),
        toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
  }

  test("derivedK: sqrt branch below the budget, capped branch above, " +
    "floored at 1 — pure function both engines mirror") {
    VectorSearch.derivedK(500) shouldBe 23 // ceil(sqrt(500)) = 23
    VectorSearch.derivedK(2000) shouldBe 45
    VectorSearch.derivedK(0) shouldBe 1
    VectorSearch.derivedK(1) shouldBe 1
    // capped branch: a trillion vectors still yields the budget
    VectorSearch.derivedK(1000L * 1000 * 1000 * 1000) shouldBe (1 << 16)
    // injected budget forces the cap at any n
    VectorSearch.derivedK(100, budget = 5) shouldBe 5
    // the budget is a ceiling, not a floor
    VectorSearch.derivedK(4, budget = 5) shouldBe 2
    an[IllegalArgumentException] should be thrownBy
      VectorSearch.derivedK(10, budget = 0)
  }

  test("boundedCents: |cents| = derivedK(N) on real data, and the " +
    "selection is exactly the md5(vec_id)-order prefix (independent " +
    "Scala recomputation)") {
    val n = normedEmb
    val total = n.count()
    val cents = Similarity.boundedCents(n).select(col("c_id"))
      .collect().map(_.getLong(0)).toSet
    cents.size shouldBe VectorSearch.derivedK(total)
    // independent ground truth: hex md5 of the decimal id string, sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    val ids = n.select(col("vec_id")).collect().map(_.getLong(0))
    val expect = ids.sortBy { id =>
      (md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id)
    }.take(cents.size).toSet
    cents shouldBe expect
  }

  test("capped branch forced: an injected budget bounds the codebook " +
    "regardless of corpus size") {
    val cents = Similarity.boundedCents(normedEmb, budget = 3L)
    cents.count() shouldBe 3L
  }

  test("capped branch is SOUND end-to-end: budget=1 puts the whole " +
    "corpus in one cell, so nprobe=1 IVF is bitwise the brute-force " +
    "top-k over the same probes") {
    val n = normedEmb.persist()
    try {
      val ivf = Similarity.ivfSearch(n, Similarity.boundedCents(n, budget = 1L),
          nprobe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      // brute force over the same modulus probe universe, same rounding
      // and tie-break rules, built independently of ivfSearch
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFns.cosine
      val probes = n.filter(col("vec_id") % 53 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("neighbor").asc)
      val bf = n.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor"),
          round(cosine(col("v"), col("qv"), col("nrm"), col("qn")), 4)
            .as("cosine"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("neighbor"), col("cosine"))
        .orderBy(col("q_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      ivf should not be empty
      ivf shouldBe bf
    } finally { n.unpersist(blocking = false); () }
  }

  test("q133 two-level assignment degenerates to EXACTLY the flat " +
    "argmax when every centroid is a super (s = k) — the approximation " +
    "is the grouping, not the scoring") {
    val n = normedEmb.persist()
    try {
      val k = VectorSearch.derivedK(n.count())
      val twoLevel = n.select(col("vec_id"),
          Similarity.twoLevelAssignCol(n, sOverride = Some(k)).as("c_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val flat = VectorSearch.assignCells(n, Similarity.boundedCents(n))
        .select(col("vec_id"), col("c_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      twoLevel should not be empty
      twoLevel shouldBe flat
    } finally { n.unpersist(blocking = false); () }
  }

  test("groupedCodebook: byte-identical super vectors under different " +
    "ids can't empty a group (self-anchoring), and non-super centroids " +
    "join their nearest super with min-id ties") {
    val vA = Array(1.0, 0.0)
    val vB = Array(0.0, 1.0)
    def nrm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    // supers 5 and 9 are byte-identical: without self-anchoring, 9's
    // group would be empty (its own vector argmaxes to 5) and a row
    // landing on super 9 would have no level-2 candidates
    val supers = Seq((5L, vA, nrm(vA)), (9L, vA, nrm(vA)))
    val cents = supers ++ Seq((20L, vB, nrm(vB)), (30L, vA, nrm(vA)))
    val g = VectorSearch.groupedCodebook(cents, supers)
    g.groups.foreach(_.ids should not be empty)
    g.superIds.toSeq shouldBe Seq(5L, 9L)
    // 30 (== vA) ties between identical supers 5 and 9 -> min id 5;
    // 20 (orthogonal vB) ties at score 0 for both -> min id 5 too
    g.groups(0).ids.toSet shouldBe Set(5L, 20L, 30L)
    g.groups(1).ids.toSet shouldBe Set(9L)
  }

  test("q131 curve: recall_bp monotone in nprobe (superset candidates " +
    "can only displace non-true members), exactly one elected row, and " +
    "the election rule holds") {
    val rows = Registry.queries("q131_ann_nprobe_curve")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(6),
        r.getLong(7))) // (nprobe, recall_bp, meets_target, chosen)
      .sortBy(_._1)
    rows.map(_._1) shouldBe Seq(1L, 2L, 4L, 8L)
    rows.map(_._2).toSeq.sliding(2).foreach {
      case Seq(a, b) => b should be >= a
      case _ => ()
    }
    rows.count(_._4 == 1L) shouldBe 1
    val meeting = rows.filter(_._3 == 1L)
    val expectChosen =
      if (meeting.nonEmpty) meeting.map(_._1).min else rows.map(_._1).max
    rows.find(_._4 == 1L).get._1 shouldBe expectChosen
  }

  test("q132 serves at the elected nprobe: realized recall on the " +
    "evaluated sample EQUALS the elected curve row's recall_bp (the " +
    "election and the serve are the same construction end to end)") {
    val curve = Registry.queries("q131_ann_nprobe_curve")(spark, sf0001)
      .filter(col("chosen") === 1L).collect().head
    val electedBp = curve.getAs[Long]("recall_bp")
    val served = Registry.queries("q132_ann_auto_nprobe")(spark, sf0001)
      .select(col("q_id"), col("neighbor"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the evaluated sample + its exact ground truth, rebuilt
    // independently (q20's construction)
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFns.cosine
    val n = normedEmb
    val probes = n.filter(col("vec_id") % 53 === 0)
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(32)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("neighbor").asc)
    val exact = n.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(cosine(col("v"), col("qv"), col("nrm"), col("qn")), 4)
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("neighbor"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sampleQs = exact.map(_._1).distinct
    val hits = exact.count(served.contains)
    val realizedBp =
      math.floor(hits * 10000.0 / (sampleQs.length * 10)).toLong
    realizedBp shouldBe electedBp
  }

  test("q21 baseline guard: past the vector ceiling the quadratic " +
    "brute-force refuses loudly and names the scale path; under it the " +
    "plan runs") {
    val n = normedEmb
    val e = the[IllegalArgumentException] thrownBy
      Similarity.q21Plan(n, maxVecs = 1L)
    e.getMessage should include("q67_lsh_neardup")
    e.getMessage should include("q79_embedding_dedup")
    // under the ceiling the guard is transparent
    Similarity.q21Plan(n).count() should be >= 0L
  }

  test("q131 ties to q130: the nprobe=1 curve point's sum_hits equals " +
    "q130's total hits (same index, same probes, same ground truth)") {
    val curve1 = Registry.queries("q131_ann_nprobe_curve")(spark, sf0001)
      .filter(col("nprobe") === 1L).select(col("sum_hits"))
      .collect().head.getLong(0)
    val q130 = Registry.queries("q130_ann_recall")(spark, sf0001)
      .agg(sum(col("n_hit"))).collect().head.getLong(0)
    curve1 shouldBe q130
  }

  test("graft_nearest_centroids (q159's stateless top-p router): the " +
    "rank-ordered cell array matches an independent driver-side " +
    "(score desc, c_id asc) ranking at every grid nprobe, its head is " +
    "exactly the flat graft_nearest_centroid assignment, and it agrees " +
    "with probeCells' aggregate ranking") {
    import org.apache.spark.sql.graft.CentroidExprs
    val n = Similarity.normed(spark, sf0001)
    val cents = Similarity.boundedCents(n)
    val centRows = cents
      .select(col("c_id").cast("long"), col("cv"), col("cn"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(
      CentroidExprs.centroidSet(centRows.toSeq))
    val queries = Similarity.pqProbes(n)
    val qRows = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def expected(qv: Array[Double], qn: Double, p: Int): Seq[Long] =
      centRows.map { case (id, cv, cn) =>
        var s = 0.0; var i = 0
        while (i < math.min(qv.length, cv.length)) { s += qv(i) * cv(i); i += 1 }
        (math.floor(s / (qn * cn) * 1000000.0 + 0.5).toLong, id)
      }.sortBy { case (mu, id) => (-mu, id) }.take(p).map(_._2).toSeq
    for (p <- Seq(1, 2, 4, 8)) {
      val got = queries.select(col("q_id"),
          CentroidExprs.nearestCentroids(bc, p, col("qv"), col("qn"))
            .as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      qRows.foreach { case (q, qv, qn) =>
        got(q) shouldBe expected(qv, qn, p)
      }
      // head = the flat argmax expression (the assignment identity the
      // q36/q133 own-cell rule relies on)
      if (p == 1) {
        val flat = queries.select(col("q_id"),
            CentroidExprs.nearestCentroid(bc, col("qv"), col("qn")).as("c"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got.foreach { case (q, cells) => cells.head shouldBe flat(q) }
      }
      // and the aggregate router (probeCells) ranks identically —
      // per-probe cell SETS with ranks reconstructed independently
      val agg = graft.similarity.VectorSearch.probeCells(
          queries.select(col("q_id").as("vec_id"), col("qv").as("v"),
            col("qn").as("nrm")), cents, p)
        .select(col("q_id"), col("qcell"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      agg.foreach { case (q, cells) => cells shouldBe got(q).toSet }
    }
  }
}
