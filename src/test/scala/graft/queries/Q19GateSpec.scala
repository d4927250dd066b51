package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The q19 candidate-generation size gate, BOTH ways (COVERAGE.md
  * standing rule: the at-scale branch of a shipped operator must not be
  * dead code under test), plus the recall GUARANTEE both generators
  * claim: every pair at hamming <= 3 over the 64-bit signatures is
  * emitted — pigeonhole over 4x16-bit bands below the gate, pigeonhole
  * over C(6,3) block-triple keys above it. The ground truth is computed
  * exhaustively in plain Scala (Long.bitCount over every doc pair), so
  * a recall hole in EITHER generator — especially at band/block
  * boundaries or the sign bit — fails loudly. */
class Q19GateSpec extends AnyFunSuite with Matchers with SparkTestSession {

  // adversarial signature set: flips placed on band edges (15/16,
  // 31/32, 47/48), block edges of the (11,11,11,11,10,10) layout
  // (10/11, 21/22, 32/33, 43/44, 53/54), and the long's sign bit —
  // plus multi-flip variants up to hamming 4 (which must be EXCLUDED)
  private val base = 0x5A5A5A5A5A5A5A5AL
  private val edges =
    Seq(0, 10, 11, 15, 16, 21, 22, 31, 32, 33, 43, 44, 47, 48, 53, 54, 62, 63)
  private val multiSub = Seq(0, 15, 16, 31, 32, 47, 48, 63)

  private lazy val sigRows: Seq[(Long, Long)] = {
    val vs = Seq.newBuilder[Long]
    vs += base
    edges.foreach(p => vs += (base ^ (1L << p)))
    (2 to 4).foreach { k =>
      multiSub.combinations(k).foreach { c =>
        vs += c.foldLeft(base)((a, p) => a ^ (1L << p))
      }
    }
    vs.result().zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  private def groundTruth: Seq[(Long, Long, Long)] =
    (for {
      (ida, sa) <- sigRows
      (idb, sb) <- sigRows
      if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb).toLong
      if h <= 3
    } yield (ida, idb, h)).sortBy(p => (p._1, p._2))

  private def sigDf: DataFrame = {
    import spark.implicits._
    sigRows.toDF("doc_id", "simhash")
  }

  private def pairs(limit: Long,
      censusPerDoc: Long = Long.MaxValue): Seq[(Long, Long, Long)] =
    Dedup.q19PairsPlan(sigDf, bandLimit = limit,
        censusPerDoc = censusPerDoc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2)).toSeq

  test("q19 small branch (4x16 bands): exhaustive recall — exactly the " +
    "hamming<=3 pair set, including sign-bit and band-edge flips") {
    pairs(Long.MaxValue) shouldBe groundTruth
  }

  test("q19 at-scale branch (20 block-triple keys, bandLimit=0): " +
    "bitwise-identical pair set to the small branch's") {
    val gt = groundTruth
    gt should not be empty
    pairs(0L) shouldBe gt
  }

  test("q19 density trip (censusPerDoc=-1 flips to blocks below the " +
    "doc-count ceiling): identical pair set — the adaptive gate is a " +
    "plan decision, never a semantics decision") {
    pairs(Long.MaxValue, censusPerDoc = -1L) shouldBe groundTruth
  }

  test("candidateCensus counts exactly the pairs the 16-bit join would " +
    "generate: sum of n(n-1)/2 over (band, bk) buckets") {
    import spark.implicits._
    // 3 docs sharing all 4 band keys + 1 disjoint: 4 buckets of 3 and
    // 4 of 1 -> 4*3 + 0 = 12; and that equals the join's pre-filter
    // candidate row count on the same relation
    val rows = Seq((0L, 0L), (1L, 0L), (2L, 0L),
      (3L, -1L)).toDF("doc_id", "simhash")
    val banded = Dedup.simBandsSmall(rows)
    Dedup.candidateCensus(banded) shouldBe 12L
    val joined = banded.as("a").join(banded.as("b"),
      $"a.band" === $"b.band" && $"a.bk" === $"b.bk" &&
        $"a.doc_id" < $"b.doc_id").count()
    joined shouldBe 12L
    // empty relation: census is 0, not null
    Dedup.candidateCensus(banded.limit(0)) shouldBe 0L
  }

  test("q19 on real data: both branches agree on sf0.001 documents") {
    val sig = Registry.queries("q18_simhash")(spark, sf0001)
      .persist()
    try {
      val small = Dedup.q19PairsPlan(sig, bandLimit = Long.MaxValue,
          censusPerDoc = Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(p => (p._1, p._2)).toSeq
      val blocks = Dedup.q19PairsPlan(sig, bandLimit = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(p => (p._1, p._2)).toSeq
      blocks shouldBe small
    } finally { sig.unpersist(blocking = false); () }
  }

  test("property sweep: on random signature sets, both generators equal " +
    "the exhaustive hamming<=3 ground truth (seeded, 3 distributions)") {
    import spark.implicits._
    // three corpus shapes: uniform random, clustered (perturbations of
    // few centers — the near-dup regime), and low-entropy (few distinct
    // values — maximal collisions). Deterministic LCG, no java.util.
    var seed = 0x9E3779B97F4A7C15L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    def corpus(kind: Int): Seq[(Long, Long)] = {
      val vs = kind match {
        case 0 => Seq.fill(120)(next())
        case 1 =>
          val centers = Seq.fill(6)(next())
          (0 until 120).map { i =>
            val c = centers(i % 6)
            // flip 0..5 pseudo-random bits
            (0 until (i % 6)).foldLeft(c)((a, j) =>
              a ^ (1L << (math.floorMod(next(), 64)).toInt))
          }
        case _ => (0 until 120).map(i => (i % 7).toLong * 0x0101010101010101L)
      }
      vs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    }
    for (kind <- 0 to 2) {
      val rows = corpus(kind)
      val gt = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb).toLong
        if h <= 3
      } yield (ia, ib, h)).sortBy(p => (p._1, p._2))
      val df = rows.toDF("doc_id", "simhash")
      def run(limit: Long) = Dedup.q19PairsPlan(df, bandLimit = limit,
          censusPerDoc = Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(p => (p._1, p._2)).toSeq
      withClue(s"corpus kind $kind (small branch): ") {
        run(Long.MaxValue) shouldBe gt
      }
      withClue(s"corpus kind $kind (blocks branch): ") {
        run(0L) shouldBe gt
      }
    }
  }

  test("gate arithmetic is overflow-safe: censusPerDoc=Long.MaxValue on " +
    "an EVEN doc count still reads 'never trip' (the naive limit*n " +
    "product wraps to -n for even n and silently flipped to blocks)") {
    import spark.implicits._
    // 4 docs (even), all colliding in every band -> census 24 > 0, so a
    // wrapped-negative limit would reject the small branch
    val rows = (0L until 4L).map(i => (i, 0L)).toDF("doc_id", "simhash")
    val (_, reason) = Dedup.q19BandedChoice(rows,
      bandLimit = Long.MaxValue, censusPerDoc = Long.MaxValue)
    reason should startWith("small:")
  }

  test("block-key construction: sign-bit-only signature lands in block 5 " +
    "as 512 (fill-insensitive shift+mask), packed into exactly the 10 " +
    "combos containing block 5") {
    import spark.implicits._
    val one = Seq((0L, 1L << 63)).toDF("doc_id", "simhash")
    val rows = Dedup.simBandsBlocks(one).collect()
      .map(r => (r.getInt(2).toLong, r.getLong(3))).toSeq // (band, bk)
    rows should have length 20
    rows.map(_._1).sorted shouldBe (0L until 20L)
    val byKey = rows.groupBy(_._2).view.mapValues(_.length).toMap
    byKey shouldBe Map(0L -> 10, 512L -> 10)
    // and the small generator puts the sign bit in band 3 as 0x8000
    val small = Dedup.simBandsSmall(one).collect()
      .map(r => (r.getInt(2).toLong, r.getLong(3))).sortBy(_._1).toSeq
    small shouldBe Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 32768L))
  }
}
