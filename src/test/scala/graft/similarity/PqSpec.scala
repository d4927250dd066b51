package graft.similarity

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import org.apache.spark.sql.graft.{PqAdcNum, PqCodebook, PqEncode, PqExprs, PqLuts}

/** The product-quantization expressions in isolation: the per-subspace
  * argmin contract (micro-unit floor distances, ties to the MIN code),
  * the self-encoding identity (a codebook vector's own slices quantize
  * to its code with zero error), ADC-numerator parity with an
  * independent per-subspace product-sum, and the codegen path through a
  * real projection. (The q134/q135 oracles cover the end-to-end
  * construction against DuckDB.) */
class PqSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val M = 4
  private val KSUB = 3
  private val SUB = 2
  private val DIM = M * SUB

  private var seed = 0xBADC0DEL
  private def next(): Double = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (seed >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  private def cb(vecs: Array[Array[Double]]): PqCodebook =
    PqCodebook(M, KSUB, SUB, vecs)

  private def randomCb(): PqCodebook =
    cb(Array.fill(KSUB)(Array.fill(DIM)(next())))

  private def encodeOf(c: PqCodebook) =
    PqEncode(spark.sparkContext.broadcast(c),
      org.apache.spark.sql.catalyst.expressions.Literal(null))

  /** Independent reference encoder: same left-to-right accumulation,
    * same floor-mu rule, same strict-< min-code ties. */
  private def refEncode(c: PqCodebook, v: Array[Double]): Seq[(Long, Long)] =
    (0 until c.m).map { j =>
      val off = j * c.subDim
      (0 until c.ksub).map { ci =>
        var d2 = 0.0
        var i = off
        while (i < off + c.subDim) {
          val t = v(i) - c.cents(ci)(i); d2 += t * t; i += 1
        }
        (math.floor(d2 * 1000000.0 + 0.5).toLong, ci + 1L)
      }.minBy { case (mu, code) => (mu, code) }.swap
    }

  test("a codebook vector encodes to its own code with zero error on " +
    "every subspace (distinct slices)") {
    val c = randomCb()
    val e = encodeOf(c)
    (0 until KSUB).foreach { ci =>
      val got = e.encode(new GenericArrayData(c.cents(ci)))
      (0 until M).foreach { j =>
        val r = got.getStruct(j, 2)
        r.getLong(0) shouldBe (ci + 1L)
        r.getLong(1) shouldBe 0L
      }
    }
  }

  test("distance ties break to the MIN code (duplicate sub-centroids)") {
    val base = Array.fill(DIM)(next())
    // codebook vectors 2 and 3 identical => every subspace tie, code 2 wins
    val c = cb(Array(Array.fill(DIM)(next()), base, base.clone()))
    val e = encodeOf(c)
    val v = base.map(_ + 0.25)
    val got = e.encode(new GenericArrayData(v))
    (0 until M).foreach { j =>
      got.getStruct(j, 2).getLong(0) shouldBe 2L
    }
  }

  test("encode matches the independent reference argmin on seeded " +
    "random vectors") {
    val c = randomCb()
    val e = encodeOf(c)
    (0 until 200).foreach { _ =>
      val v = Array.fill(DIM)(next())
      val got = e.encode(new GenericArrayData(v))
      val want = refEncode(c, v)
      (0 until M).foreach { j =>
        val r = got.getStruct(j, 2)
        (r.getLong(0), r.getLong(1)) shouldBe want(j)
      }
    }
  }

  test("buildLut entries are the per-(subspace, centroid) product-sums " +
    "and the ADC numerator sums them in subspace order") {
    val c = randomCb()
    val q = Array.fill(DIM)(next())
    val lut = PqExprs.buildLut(c, q)
    (0 until M).foreach { j =>
      (0 until KSUB).foreach { ci =>
        var s = 0.0
        var i = j * SUB
        while (i < (j + 1) * SUB) { s += q(i) * c.cents(ci)(i); i += 1 }
        lut(j * KSUB + ci) shouldBe s
      }
    }
    val luts = PqLuts(M, KSUB, Map(42L -> lut))
    val adc = PqAdcNum(spark.sparkContext.broadcast(luts),
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      org.apache.spark.sql.catalyst.expressions.Literal(null))
    (0 until 50).foreach { _ =>
      val codes = Array.fill(M)((math.abs(next() * 1e9).toLong % KSUB) + 1L)
      var want = 0.0
      var j = 0
      while (j < M) { want += lut(j * KSUB + (codes(j).toInt - 1)); j += 1 }
      adc.score(42L, new GenericArrayData(codes)) shouldBe want
    }
  }

  test("packed ADC numerator equals the row-form ADC numerator on the " +
    "packed encoding of every random code word (the ivfpq_index " +
    "serving contract)") {
    val c = randomCb()
    val q = Array.fill(DIM)(next())
    val lut = PqExprs.buildLut(c, q)
    val luts = PqLuts(M, KSUB, Map(42L -> lut))
    val bc = spark.sparkContext.broadcast(luts)
    val nil = org.apache.spark.sql.catalyst.expressions.Literal(null)
    val adc = PqAdcNum(bc, nil, nil)
    val adcP = org.apache.spark.sql.graft.PqAdcNumPacked(bc, nil, nil)
    (0 until 100).foreach { _ =>
      val codes = Array.fill(M)((math.abs(next() * 1e9).toLong % KSUB) + 1L)
      val packed = codes.zipWithIndex
        .map { case (cd, j) => (cd - 1L) << (4 * j) }.sum
      adcP.score(42L, packed) shouldBe
        adc.score(42L, new GenericArrayData(codes))
    }
  }

  test("prefix property (q138's construction): width-w codes equal the " +
    "argmin over the first w rows of the full codebook, and per-subspace " +
    "quantization error is weakly decreasing in width") {
    val full = randomCb()
    val widths = Seq(1, 2, KSUB)
    (0 until 100).foreach { _ =>
      val v = Array.fill(DIM)(next())
      val byWidth = widths.map { w =>
        val e = encodeOf(PqCodebook(M, w, SUB, full.cents.take(w)))
        val got = e.encode(new GenericArrayData(v))
        (0 until M).map { j =>
          val r = got.getStruct(j, 2); (r.getLong(0), r.getLong(1))
        }
      }
      // each width's codes are a legal argmin over its prefix
      widths.zip(byWidth).foreach { case (w, codes) =>
        val ref = refEncode(PqCodebook(M, w, SUB, full.cents.take(w)), v)
        codes shouldBe ref
      }
      // widening never increases the chosen sub-distance
      byWidth.map(_.map(_._2)).sliding(2).foreach {
        case Seq(narrow, wide) =>
          narrow.zip(wide).foreach { case (a, b) => b should be <= a }
        case _ =>
      }
    }
  }

  test("q138 curve contract: recall_bp monotone in ksub (wider codebook " +
    "never loses recall on the same ground truth), exactly one elected " +
    "row, and the full-width point ties to q137's total") {
    val curve = graft.queries.Registry
      .queries("q138_pq_width_curve")(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("ksub"))
    curve.length shouldBe 3
    val bps = curve.map(_.getAs[Long]("recall_bp"))
    bps.zip(bps.tail).foreach { case (a, b) => b should be >= a }
    curve.count(_.getAs[Long]("chosen") == 1L) shouldBe 1
    // the ksub=16 curve point IS q137's measurement (same codebook,
    // same probes, same ground truth) — the two queries must agree
    val full = curve.last
    full.getAs[Long]("ksub") shouldBe 16L
    val q137Total = graft.queries.Registry
      .queries("q137_pq_recall")(spark, sf0001)
      .collect().map(_.getAs[Long]("n_hit")).sum
    full.getAs[Long]("sum_hits") shouldBe q137Total
  }

  test("q155 serves at the elected width: when the election lands on " +
    "the FULL width (the sf0.001 fallback), the elected-width serve is " +
    "exactly q135's ranking — same codebook, same ADC, same ties") {
    val curve = graft.queries.Registry
      .queries("q138_pq_width_curve")(spark, sf0001)
      .collect()
    val chosen = curve.filter(_.getAs[Long]("chosen") == 1L)
      .map(_.getAs[Long]("ksub"))
    chosen.length shouldBe 1
    if (chosen.head == 16L) {
      val q155 = graft.queries.Registry
        .queries("q155_pq_auto_width")(spark, sf0001)
        .collect().map(_.toSeq).toSeq
      val q135 = graft.queries.Registry
        .queries("q135_pq_adc_topk")(spark, sf0001)
        .collect().map(_.toSeq).toSeq
      q155 shouldBe q135
    }
  }

  test("codegen path: encode + ADC through a real projection; null " +
    "vectors stay null") {
    import spark.implicits._
    val c = randomCb()
    val bcCb = spark.sparkContext.broadcast(c)
    val q = Array.fill(DIM)(next())
    val bcLut = spark.sparkContext.broadcast(
      PqLuts(M, KSUB, Map(7L -> PqExprs.buildLut(c, q))))
    val df = Seq(
      (1L, Some(Array.fill(DIM)(next()))),
      (2L, Some(Array.fill(DIM)(next()))),
      (3L, Option.empty[Array[Double]]))
      .toDF("vec_id", "v")
    val out = df
      .withColumn("pq", PqExprs.pqEncode(bcCb, col("v")))
      .withColumn("codes", transform(col("pq"), s => s.getField("code")))
      .withColumn("num",
        PqExprs.pqAdcNum(bcLut, lit(7L), col("codes")))
      .orderBy(col("vec_id"))
      .collect()
    out.length shouldBe 3
    // non-null rows agree with the interpreted expression + direct sum
    val enc = encodeOf(c)
    Seq(0, 1).foreach { r =>
      val v = df.orderBy(col("vec_id")).collect()(r).getSeq[Double](1).toArray
      val want = refEncode(c, v)
      val codes = out(r).getSeq[Long](3)
      codes shouldBe want.map(_._1)
      val lut = bcLut.value.luts(7L)
      var s = 0.0
      var j = 0
      while (j < M) { s += lut(j * KSUB + (codes(j).toInt - 1)); j += 1 }
      out(r).getDouble(4) shouldBe s
    }
    out(2).isNullAt(2) shouldBe true
    out(2).isNullAt(3) shouldBe true
    out(2).isNullAt(4) shouldBe true
  }
}
