package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the lakehouse data
  * LAYOUT technique (Delta Lake `OPTIMIZE ZORDER BY`, Iceberg sort
  * orders) that makes file-level min/max statistics selective on TWO
  * columns at once: rows are sorted by the bit-interleave of the
  * dimensions' scaled values, so a file's [min, max] box in (x, y) space
  * is a compact tile instead of a full-width stripe. A box predicate
  * then skips every non-intersecting file at PLANNING time — the same
  * footer-stats pruning a date-sort gives one column, generalized.
  *
  * Everything here is a pure function of the row plus two broadcastable
  * bounds, so the layout is deterministic (retry-safe, replayable by an
  * external engine — q80 hash-gates exactly that) and costs one extra
  * range-shuffle at write time, which a 100 TB table pays once to make
  * every subsequent selective scan cheap.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs: bit i of
    * `sx` lands at position 2i, bit i of `sy` at 2i+1 — the Morton
    * z-value. Pure arithmetic (shift/and/add) so it stays inside
    * whole-stage codegen. */
  def interleave(sx: Column, sy: Column, bits: Int): Column =
    interleaveN(Seq(sx, sy), bits)

  /** N-dimensional Morton interleave: bit i of dimension d lands at
    * position i·N + d (N=2 reduces to [[interleave]]'s even/odd split).
    * Real lakehouse layouts z-order 2-4 columns; total bits N·`bits`
    * must stay under 63. */
  def interleaveN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"n*bits must be in [2,62], got $n*$bits")
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (c, d) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + d)
      }
    }.reduce(_ + _)
  }

  /** The identical interleave as a SQL expression string (over integer
    * sub-expressions `sx`/`sy`) — lets an external ANSI engine replay
    * the exact layout, which is how q80's oracle pins it. */
  def sqlInterleave(sx: String, sy: String, bits: Int): String =
    sqlInterleaveN(Seq(sx, sy), bits)

  /** SQL twin of [[interleaveN]]. */
  def sqlInterleaveN(dims: Seq[String], bits: Int): String = {
    val n = dims.length
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (c, d) =>
        s"((($c >> $i) & 1) << ${i * n + d})"
      }
    }.mkString(" + ")
  }

  /** Min/max-scale a numeric column onto the integer grid [0, 2^bits):
    * `floor((c - mn) * 2^bits / (mx - mn + 1))`. The +1 keeps the max
    * value inside the grid without a clamp; exact in doubles for any
    * realistic key range (exact up to 2^52). */
  def scale(c: Column, mn: Column, mx: Column, bits: Int): Column =
    floor((c - mn).cast("double") * lit((1L << bits).toDouble) /
      (mx - mn + lit(1)).cast("double")).cast("long")

  /** SQL twin of [[scale]]. */
  def sqlScale(c: String, mn: String, mx: String, bits: Int): String =
    s"CAST(floor(($c - $mn) * ${1L << bits}.0 / ($mx - $mn + 1)) AS BIGINT)"

  /** The z-value of two numeric columns, bounds-scaled per dimension.
    * `bounds` must be a 1-row relation with columns (mnx, mxx, mny, mxy)
    * — broadcast it: the stitch is a 1-row cross join, never a shuffle. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    interleave(
      scale(x, col("mnx"), col("mxx"), bits),
      scale(y, col("mny"), col("mxy"), bits),
      bits)

  /** Write `df` z-ordered on (`xCol`, `yCol`) as ~`numFiles` parquet
    * files under `dstDir`: scale both dims against their observed
    * bounds (one tiny agg, broadcast back), range-partition on the
    * z-value, sort within each partition, drop the helper columns.
    * One extra shuffle at write time; every selective read after it
    * prunes at file granularity (ZOrderSpec measures the win). */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      dstDir: String, bits: Int = 10, numFiles: Int = 16): Unit = {
    val bounds = df.agg(
      min(col(xCol)).as("mnx"), max(col(xCol)).as("mxx"),
      min(col(yCol)).as("mny"), max(col(yCol)).as("mxy"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .drop("mnx", "mxx", "mny", "mxy")
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dstDir)
  }
}
