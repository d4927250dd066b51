package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** An immutable coarse-quantizer codebook for [[NearestCentroid]]:
  * parallel arrays (ids ASCENDING — the tie-break relies on scan order),
  * pre-extracted to primitives so the per-row loop touches no Catalyst
  * containers. Built via [[CentroidExprs.centroidSet]]. */
case class CentroidSet(ids: Array[Long], vecs: Array[Array[Double]],
    nrms: Array[Double]) {
  require(ids.nonEmpty, "empty centroid set")
  require(ids.length == vecs.length && ids.length == nrms.length,
    "centroid arrays must be parallel")
  require(ids.zip(ids.tail).forall { case (a, b) => a < b },
    "centroid ids must be strictly ascending (first-wins tie-break = min c_id)")
}

/** Native nearest-centroid assignment: for a row's (vec, nrm), return the
  * c_id of the broadcast codebook centroid maximizing the cosine score in
  * integer MICRO-units — floor(cos·10⁶ + 0.5), the Q.cents construction:
  * pure IEEE double arithmetic both engines evaluate bit-identically, so
  * the DuckDB oracle mirrors the ranking with
  * `CAST(floor(cosExpr * 1000000.0 + 0.5) AS BIGINT) DESC, c_id` — ties
  * break to the MIN c_id (strict `>` over an id-ascending scan).
  *
  * Why a custom Expression (SURVEY §7.3 escalation ladder), and why not
  * the crossJoin→partial-max_by aggregate it replaces: the max_by(struct)
  * buffer forces a SortAggregate, which SORTS the n×k join expansion
  * carrying the full vectors (first(v) rides the buffer) — AnnScaleProbe
  * measured 124.8 s for a 200k-vector × 448-centroid assignment (89.6 M
  * dot products that are ~2 s of raw FLOPs) with the sorter spilling
  * ~1 KB-wide rows. This expression is ONE map-side pass in the scan
  * stage: no row expansion, no aggregate, no sort, no exchange — the
  * per-row cost is exactly k fused dot products (same tight loop as
  * [[DotProduct]], same left-to-right accumulation the oracle's
  * list_sum(list_transform) replays).
  *
  * The codebook ships as a TorrentBroadcast (the
  * [[BloomMightContainBroadcast]] pattern — bytes once per executor, the
  * expression serializes only the handle) and is bounded by construction:
  * VectorSearch.CentroidBudget caps k at 2¹⁶ (≈34 MB of 64-dim doubles).
  */
case class NearestCentroid(bcast: Broadcast[CentroidSet],
    left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: expected (array<double> vector, double norm), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  /** Called from generated code (the expression is its own codegen
    * reference object; serializing it ships the broadcast handle, never
    * the codebook). */
  def assign(v: ArrayData, nr: Double): Long = {
    val cs = bcast.value
    val ids = cs.ids
    val vecs = cs.vecs
    val nrms = cs.nrms
    var bestMu = Long.MinValue
    var bestId = ids(0)
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      val n = math.min(v.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * cv(i); i += 1 }
      val mu = math.floor(s / (nr * nrms(c)) * 1000000.0 + 0.5).toLong
      if (mu > bestMu) { bestMu = mu; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  override def nullSafeEval(v: Any, nr: Any): Any =
    assign(v.asInstanceOf[ArrayData], nr.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, (v, nr) => s"${ev.value} = $ref.assign($v, $nr);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

/** A two-level codebook for [[NearestCentroidTwoLevel]]: level-1
  * "super" centroids (parallel arrays, ids ascending) and, for each
  * super, the [[CentroidSet]] of level-2 centroids grouped under it.
  * Every group is non-empty by construction (a super centroid is always
  * a member of its own group — see Similarity.twoLevelGrouped). */
case class GroupedCentroidSet(superIds: Array[Long],
    superVecs: Array[Array[Double]], superNrms: Array[Double],
    groups: Array[CentroidSet]) {
  require(superIds.nonEmpty, "empty super-centroid set")
  require(superIds.length == superVecs.length &&
    superIds.length == superNrms.length &&
    superIds.length == groups.length, "grouped arrays must be parallel")
  require(superIds.zip(superIds.tail).forall { case (a, b) => a < b },
    "super ids must be strictly ascending")
}

/** Two-level nearest-centroid assignment — the past-the-budget-cap
  * shape: pick the nearest of s ≈ √k SUPER centroids, then the nearest
  * level-2 centroid WITHIN that super's group, so the per-row cost is
  * s + k/s ≈ 2√k dot products instead of k. APPROXIMATE relative to the
  * flat argmax (a vector near a super-cell boundary can land in a
  * neighboring group's centroid) — which is why this is its own
  * registered query (q133) with its own oracle replaying the identical
  * two-level rule, never a silent swap under q36. Same micro-unit
  * score and min-id tie-breaks as [[NearestCentroid]] at both levels;
  * degenerates to EXACTLY the flat assignment when every centroid is a
  * super (s = k — CodebookSpec forces the identity). */
case class NearestCentroidTwoLevel(bcast: Broadcast[GroupedCentroidSet],
    left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_nearest_centroid_2l"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: expected (array<double> vector, double norm), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  def assign(v: ArrayData, nr: Double): Long = {
    val gs = bcast.value
    var bestMu = Long.MinValue
    var bestIdx = 0
    var c = 0
    while (c < gs.superIds.length) {
      val cv = gs.superVecs(c)
      val n = math.min(v.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * cv(i); i += 1 }
      val mu = math.floor(s / (nr * gs.superNrms(c)) * 1000000.0 + 0.5).toLong
      if (mu > bestMu) { bestMu = mu; bestIdx = c }
      c += 1
    }
    val group = gs.groups(bestIdx)
    var gBestMu = Long.MinValue
    var gBestId = group.ids(0)
    c = 0
    while (c < group.ids.length) {
      val cv = group.vecs(c)
      val n = math.min(v.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * cv(i); i += 1 }
      val mu = math.floor(s / (nr * group.nrms(c)) * 1000000.0 + 0.5).toLong
      if (mu > gBestMu) { gBestMu = mu; gBestId = group.ids(c) }
      c += 1
    }
    gBestId
  }

  override def nullSafeEval(v: Any, nr: Any): Any =
    assign(v.asInstanceOf[ArrayData], nr.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNearestCentroid2L", this,
      classOf[NearestCentroidTwoLevel].getName)
    nullSafeCodeGen(ctx, ev, (v, nr) => s"${ev.value} = $ref.assign($v, $nr);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidTwoLevel =
    copy(left = newLeft, right = newRight)
}

/** Top-`nprobe` nearest centroids for a row's (vec, nrm), as an ARRAY
  * of c_ids in rank order — the [[NearestCentroid]] micro-unit rule
  * (score desc, c_id asc) extended to a top-p, bitwise the
  * `VectorSearch.probeCells` ranking (CodebookSpec pins the identity):
  * the multi-probe router as ONE scan-stage expression. Why it exists
  * when probeCells already ranks cells: probeCells is a collect_list
  * AGGREGATE over a crossJoin expansion — fine batch-side over the
  * bounded probe set, but a second stateful operator inside a
  * STREAMING plan that still needs its own top-k state downstream
  * (q159's shape), which Structured Streaming rejects. This is a
  * stateless per-row map: k fused dot products plus an O(k·p) bounded
  * insertion, no expansion, no aggregate, no state. */
case class NearestCentroids(bcast: Broadcast[CentroidSet], nprobe: Int,
    left: Expression, right: Expression) extends BinaryExpression {

  require(nprobe >= 1, "nprobe must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_nearest_centroids"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: expected (array<double> vector, double norm), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  /** Called from generated code. Insertion keeps strict `>` so equal
    * scores preserve the id-ascending scan order — ties to MIN c_id at
    * every rank, the [[NearestCentroid]] contract. */
  def probe(v: ArrayData, nr: Double): ArrayData = {
    val cs = bcast.value
    val ids = cs.ids
    val vecs = cs.vecs
    val nrms = cs.nrms
    val p = math.min(nprobe, ids.length)
    val topMu = new Array[Long](p)
    val topId = new Array[Long](p)
    var filled = 0
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      val n = math.min(v.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * cv(i); i += 1 }
      val mu = math.floor(s / (nr * nrms(c)) * 1000000.0 + 0.5).toLong
      if (filled < p || mu > topMu(p - 1)) {
        var pos = if (filled < p) filled else p - 1
        while (pos > 0 && mu > topMu(pos - 1)) {
          topMu(pos) = topMu(pos - 1); topId(pos) = topId(pos - 1)
          pos -= 1
        }
        topMu(pos) = mu; topId(pos) = ids(c)
        if (filled < p) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(topId, filled))
  }

  override def nullSafeEval(v: Any, nr: Any): Any =
    probe(v.asInstanceOf[ArrayData], nr.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNearestCentroids", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, (v, nr) => s"${ev.value} = $ref.probe($v, $nr);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroids =
    copy(left = newLeft, right = newRight)
}

object CentroidExprs {
  /** Build the broadcastable codebook from parallel collections, sorting
    * by id (the tie-break contract). */
  def centroidSet(rows: Seq[(Long, Array[Double], Double)]): CentroidSet = {
    val sorted = rows.sortBy(_._1).toArray
    CentroidSet(sorted.map(_._1), sorted.map(_._2), sorted.map(_._3))
  }

  /** Column-API entry point: nearest centroid id for (vec, nrm). */
  def nearestCentroid(bcast: Broadcast[CentroidSet], vec: Column,
      nrm: Column): Column =
    ExpressionUtils.column(NearestCentroid(bcast,
      ExpressionUtils.expression(vec), ExpressionUtils.expression(nrm)))

  /** Column-API entry point: two-level nearest centroid id. */
  def nearestCentroidTwoLevel(bcast: Broadcast[GroupedCentroidSet],
      vec: Column, nrm: Column): Column =
    ExpressionUtils.column(NearestCentroidTwoLevel(bcast,
      ExpressionUtils.expression(vec), ExpressionUtils.expression(nrm)))

  /** Column-API entry point: the `nprobe` nearest centroid ids in rank
    * order (array<long>), a stateless per-row map. */
  def nearestCentroids(bcast: Broadcast[CentroidSet], nprobe: Int,
      vec: Column, nrm: Column): Column =
    ExpressionUtils.column(NearestCentroids(bcast, nprobe,
      ExpressionUtils.expression(vec), ExpressionUtils.expression(nrm)))
}
