package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership probe against a pre-built
  * `org.apache.spark.util.sketch.BloomFilter` (the public sketch API
  * behind `df.stat.bloomFilter`). `graft_might_contain(bloom, value)`
  * is true when `value` MIGHT be in the set the filter was built over —
  * no false negatives, `fpp`-bounded false positives, exactly the
  * semantics the sketch-then-verify contract (q89 / Decontamination)
  * needs for a map-side prefilter.
  *
  * Why a custom Expression (SURVEY §7.3 escalation ladder): the Scala
  * UDF it replaces boxed every probe value and fenced whole-stage
  * codegen right at the scan, where the prefilter's whole point is to
  * run INSIDE the scan stage before anything shuffles. Spark's own
  * BloomFilterMightContain (the runtime-filter internal) is Long-only
  * and not public API; this one accepts long / string / binary probe
  * values — hashing the same bytes `BloomFilter.put*` hashed when the
  * filter was built (UTF8String.getBytes IS the UTF-8 encoding
  * `mightContainString` uses, so string semantics match the driver-side
  * builder exactly).
  *
  * The filter bytes must be a foldable binary expression (a literal —
  * the same way Spark's InjectRuntimeFilter ships its bloom): the
  * deserialized filter is cached once per expression instance and
  * referenced from generated code via `addReferenceObj`, so executors
  * deserialize once per task binary, not per row.
  *
  * Null contract: null value → null (BinaryExpression default); a null
  * filter is a type-check error, not a runtime surprise.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the filter argument must be BINARY (serialized " +
          s"BloomFilter), got ${left.dataType.catalogString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the filter argument must be foldable (a literal " +
          "or constant-foldable expression)")
    else right.dataType match {
      case LongType | StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: probe value must be BIGINT, STRING or BINARY, " +
          s"got ${dt.catalogString}")
    }
  }

  /** Deserialized once per expression instance (per task binary on
    * executors — the generated code references this object). */
  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: filter bytes are null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(l: Any, v: Any): Any = right.dataType match {
    case LongType => filter.mightContainLong(v.asInstanceOf[Long])
    case StringType =>
      filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => filter.mightContainBinary(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    // the left child is the foldable filter literal — its generated value
    // is unused (the cached reference object above replaces it)
    nullSafeCodeGen(ctx, ev, (_, v) => right.dataType match {
      case LongType => s"${ev.value} = $bf.mightContainLong($v);"
      case StringType => s"${ev.value} = $bf.mightContainBinary($v.getBytes());"
      case BinaryType => s"${ev.value} = $bf.mightContainBinary($v);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Per-JVM cache of deserialized Bloom filters keyed by broadcast id, so
  * [[BloomMightContainBroadcast]] pays the readFrom cost once per
  * EXECUTOR rather than once per task (the broadcast bytes themselves
  * are already fetched once per executor by TorrentBroadcast; this
  * extends the same amortization to the deserialized object). Entries
  * live for the executor's lifetime — a Bloom prefilter is MBs and a
  * session builds a handful, so no eviction pressure in practice. */
object BloomBroadcastCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, BloomFilter]()
  def get(b: org.apache.spark.broadcast.Broadcast[Array[Byte]]): BloomFilter =
    cache.computeIfAbsent(b.id,
      _ => BloomFilter.readFrom(new ByteArrayInputStream(b.value)))
}

/** [[BloomMightContain]]'s BROADCAST-shipped twin: identical probe
  * semantics, but the serialized filter travels as a TorrentBroadcast
  * referenced from the expression instead of a plan literal. Past a few
  * MB the literal mode hurts twice — the bytes serialize into every
  * stage's task binary AND bloat plan stringification/canonicalization —
  * while a broadcast ships the handle in the plan and the bytes once per
  * executor. The ship mode is a plan decision, never a semantics one
  * (DecontaminationSpec forces both and compares results bitwise);
  * [[SketchExprs.bloomProbe]] applies the size gate. */
case class BloomMightContainBroadcast(
    bcast: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_might_contain_bcast"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: probe value must be BIGINT, STRING or BINARY, " +
        s"got ${dt.catalogString}")
  }

  @transient private lazy val filter: BloomFilter =
    BloomBroadcastCache.get(bcast)

  /** Called from generated code (the expression itself is the codegen
    * reference object — serializing it ships only the broadcast handle
    * plus the child expression, never the filter bytes). */
  def probeLong(v: Long): Boolean = filter.mightContainLong(v)
  def probeBytes(v: Array[Byte]): Boolean = filter.mightContainBinary(v)

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => filter.mightContainLong(v.asInstanceOf[Long])
    case StringType =>
      filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => filter.mightContainBinary(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomBcast", this,
      classOf[BloomMightContainBroadcast].getName)
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case LongType => s"${ev.value} = $ref.probeLong($v);"
      case StringType => s"${ev.value} = $ref.probeBytes($v.getBytes());"
      case BinaryType => s"${ev.value} = $ref.probeBytes($v);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainBroadcast =
    copy(child = newChild)
}

object SketchExprs {
  /** Column-API entry point: probe `value` against serialized filter
    * bytes (from `BloomFilter.writeTo`). */
  def bloomMightContain(filterBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(BloomMightContain(
      Literal(filterBytes, BinaryType), ExpressionUtils.expression(value)))

  /** Broadcast-shipped probe (see [[BloomMightContainBroadcast]]). */
  def bloomMightContainBroadcast(
      bcast: org.apache.spark.broadcast.Broadcast[Array[Byte]],
      value: Column): Column =
    ExpressionUtils.column(BloomMightContainBroadcast(
      bcast, ExpressionUtils.expression(value)))

  /** Literal-ship ceiling for [[bloomProbe]]: 8 MB. Under it the plan
    * literal is simplest (no broadcast lifecycle); past it task-binary
    * size and plan stringification grow with the filter, so the bytes
    * move to a TorrentBroadcast while the 32 MB sizing cap
    * (Decontamination.MaxFilterBits — and beyond, for callers that
    * raise it) stays available. */
  val LiteralShipLimit: Long = 8L * 1024 * 1024

  /** The ship-mode gate: plan literal under `literalLimit` serialized
    * bytes, TorrentBroadcast past it. Identical results either way —
    * the gate is a plan decision (DecontaminationSpec forces both
    * modes). The broadcast is registered with the session's
    * ContextCleaner, so it is GC'd with the last plan that references
    * it. */
  def bloomProbe(spark: org.apache.spark.sql.SparkSession,
      filterBytes: Array[Byte], value: Column,
      literalLimit: Long = LiteralShipLimit): Column =
    if (filterBytes.length <= literalLimit)
      bloomMightContain(filterBytes, value)
    else
      bloomMightContainBroadcast(
        spark.sparkContext.broadcast(filterBytes), value)

  /** Serialize a built filter for embedding as the literal argument. */
  def serialize(filter: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    bos.toByteArray
  }
}
