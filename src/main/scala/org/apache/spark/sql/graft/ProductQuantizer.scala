package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** A product-quantization codebook: M contiguous subspaces of SUB dims
  * each, KSUB sub-centroids per subspace. Sub-centroid c of subspace j is
  * dims [j·SUB, (j+1)·SUB) of full codebook vector c (the md5(vec_id)-order
  * prefix — the q36/q20 deterministic-sample construction), so the whole
  * codebook is KSUB full vectors and the broadcast is KSUB·dim doubles
  * (8 KB at KSUB=16, dim=64) — CONSTANT at any corpus size. Codes are
  * 1-based (c ∈ [1, KSUB], the oracle's row_number domain). */
case class PqCodebook(m: Int, ksub: Int, subDim: Int,
    cents: Array[Array[Double]]) {
  require(m > 0 && ksub > 0 && subDim > 0, "degenerate PQ geometry")
  require(cents.length == ksub, s"expected $ksub codebook vectors")
}

/** Per-probe asymmetric-distance lookup tables: for probe q_id, a flat
  * m·ksub array where entry (j−1)·ksub + (c−1) is the double dot product
  * of the probe's subspace-j slice with sub-centroid c — computed ONCE
  * per probe (m·ksub·subDim mults) so scoring a candidate is m array
  * lookups + m adds, never a full-vector dot. Bounded: the probe set is
  * the fixed-count md5-order sample (QUERY_N rows), so the broadcast is
  * QUERY_N·m·ksub doubles regardless of corpus size. */
case class PqLuts(m: Int, ksub: Int, luts: Map[Long, Array[Double]])

/** Native PQ encoder: for a row's vector, emit one struct per subspace —
  * (code, d2_mu) where code is the 1-based index of the sub-centroid
  * minimizing the squared L2 distance to the vector's subspace slice and
  * d2_mu is that distance in integer MICRO-units (floor(d2·10⁶ + 0.5) —
  * the Q.cents construction: pure IEEE double arithmetic both engines
  * evaluate bit-identically, ties break to the MIN code via strict `<`
  * over a code-ascending scan, so the DuckDB oracle mirrors the argmin
  * with `ORDER BY d2_mu, c`).
  *
  * Why a custom Expression (SURVEY §7.3 ladder): the relational form is
  * an n × (m·ksub) join expansion followed by a per-(row, subspace)
  * argmin aggregate — the exact SortAggregate-over-expansion shape the
  * [[NearestCentroid]] rework retired (AnnScaleProbe measured 124.8 s vs
  * seconds map-side for the same FLOPs). This runs as ONE scan-stage
  * call per row: m·ksub·subDim fused multiply-adds, no expansion, no
  * aggregate, no exchange. The codebook ships as a TorrentBroadcast
  * (bytes once per executor; the expression serializes the handle). */
case class PqEncode(bcast: Broadcast[PqCodebook], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("code", LongType, nullable = false),
    StructField("d2_mu", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: expected array<double> vector, got ${t.catalogString}")
  }

  /** Called from generated code. */
  def encode(v: ArrayData): ArrayData = {
    val cb = bcast.value
    val out = new Array[Any](cb.m)
    val nV = v.numElements()
    var j = 0
    while (j < cb.m) {
      val off = j * cb.subDim
      var bestMu = Long.MaxValue
      var bestC = 1L
      var c = 0
      while (c < cb.ksub) {
        val cv = cb.cents(c)
        val hi = math.min(math.min(off + cb.subDim, nV), cv.length)
        var d2 = 0.0
        var i = off
        while (i < hi) {
          val t = v.getDouble(i) - cv(i)
          d2 += t * t
          i += 1
        }
        val mu = math.floor(d2 * 1000000.0 + 0.5).toLong
        if (mu < bestMu) { bestMu = mu; bestC = c + 1L }
        c += 1
      }
      out(j) = InternalRow(bestC, bestMu)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqEncode", this,
      classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Native ADC (asymmetric distance computation) numerator: given a
  * candidate's PQ codes and the probe's q_id, sum the probe's
  * precomputed per-subspace lookup-table entries in subspace order —
  * Σ_j lut[(j−1)·ksub + (code_j − 1)], j ascending, left-to-right double
  * adds, exactly the order the oracle's `list_sum(list_transform(range(1,
  * m+1), j -> lut[(j-1)*ksub + codes[j]]))` replays. Per-candidate cost
  * is m lookups + m adds — no multiplies, no vector access: the PQ
  * serving win (the candidate side reads CODES, ~m small ints per
  * vector, not the dim·8-byte embedding — the 100 TB memory-traffic
  * story q135 exists to demonstrate). */
case class PqAdcNum(bcast: Broadcast[PqLuts],
    left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc_num"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: expected (bigint q_id, array<bigint> codes), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  def score(qId: Long, codes: ArrayData): Double = {
    val ls = bcast.value
    val lut = ls.luts(qId)
    var s = 0.0
    var j = 0
    val m = math.min(ls.m, codes.numElements())
    while (j < m) {
      s += lut(j * ls.ksub + (codes.getLong(j).toInt - 1))
      j += 1
    }
    s
  }

  override def nullSafeEval(q: Any, codes: Any): Any =
    score(q.asInstanceOf[Long], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqAdcNum", this,
      classOf[PqAdcNum].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $ref.score($q, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcNum =
    copy(left = newLeft, right = newRight)
}

/** [[PqAdcNum]] over BIT-PACKED codes: the candidate's m codes arrive as
  * ONE BIGINT — bits [4(j−1), 4j) hold code_j − 1 (ksub ≤ 16, so 4 bits
  * each; m ≤ 16 fits the word) — and the score loop is m shift-mask
  * lookups + m adds with NO array access at all. This is the shape the
  * q134 header's 128× memory claim actually requires: the serving scan
  * reads an 8-byte word per candidate instead of an m-element array of
  * 8-byte longs (and never the 512-byte vector). Summation order and
  * lut indexing are [[PqAdcNum]]'s verbatim, so packed and row-form
  * serves rank bitwise-identically (PqSpec pins the equivalence). */
case class PqAdcNumPacked(bcast: Broadcast[PqLuts],
    left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc_num_packed"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: expected (bigint q_id, bigint packed codes), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  def score(qId: Long, packed: Long): Double = {
    val ls = bcast.value
    val lut = ls.luts(qId)
    var s = 0.0
    var j = 0
    while (j < ls.m) {
      s += lut(j * ls.ksub + ((packed >>> (4 * j)) & 0xfL).toInt)
      j += 1
    }
    s
  }

  override def nullSafeEval(q: Any, packed: Any): Any =
    score(q.asInstanceOf[Long], packed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqAdcNumPacked", this,
      classOf[PqAdcNumPacked].getName)
    nullSafeCodeGen(ctx, ev, (q, p) => s"${ev.value} = $ref.score($q, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcNumPacked =
    copy(left = newLeft, right = newRight)
}

object PqExprs {
  /** Column-API entry: PQ codes + per-subspace quantization error. */
  def pqEncode(bcast: Broadcast[PqCodebook], vec: Column): Column =
    ExpressionUtils.column(PqEncode(bcast, ExpressionUtils.expression(vec)))

  /** Column-API entry: ADC numerator for (q_id, codes). */
  def pqAdcNum(bcast: Broadcast[PqLuts], qId: Column, codes: Column): Column =
    ExpressionUtils.column(PqAdcNum(bcast,
      ExpressionUtils.expression(qId), ExpressionUtils.expression(codes)))

  /** Column-API entry: ADC numerator for (q_id, packed code word). */
  def pqAdcNumPacked(bcast: Broadcast[PqLuts], qId: Column,
      packed: Column): Column =
    ExpressionUtils.column(PqAdcNumPacked(bcast,
      ExpressionUtils.expression(qId), ExpressionUtils.expression(packed)))

  /** Driver-side LUT build for a bounded probe set: lut[(j−1)·ksub +
    * (c−1)] = Σ_i q[j·sub + i] · cent_c[j·sub + i], i ascending — the
    * identical left-to-right product-sum the oracle's per-(j, c)
    * list_sum computes, so downstream micro-snaps agree bitwise. */
  def buildLut(cb: PqCodebook, q: Array[Double]): Array[Double] = {
    val lut = new Array[Double](cb.m * cb.ksub)
    var j = 0
    while (j < cb.m) {
      val off = j * cb.subDim
      var c = 0
      while (c < cb.ksub) {
        val cv = cb.cents(c)
        val hi = math.min(math.min(off + cb.subDim, q.length), cv.length)
        var s = 0.0
        var i = off
        while (i < hi) { s += q(i) * cv(i); i += 1 }
        lut(j * cb.ksub + c) = s
        c += 1
      }
      j += 1
    }
    lut
  }
}
