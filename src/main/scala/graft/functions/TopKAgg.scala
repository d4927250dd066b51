package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` keeping the top-k (score, payload) pairs per group
  * with a BOUNDED buffer — the scale replacement for
  * window-rank-then-filter when k ≪ group size: the partial buffers
  * combine map-side, so the shuffle carries at most k entries per group
  * per partition instead of every row. (The reference has no UDAF surface
  * at all — SURVEY §2.8 — this is engine-added capability.)
  *
  * Determinism: ties break on the payload string ascending, so results
  * are partition-order independent.
  */
object TopKAgg {

  final case class ScoredRow(key: String, score: Double, payload: String)
  final case class Entry(score: Double, payload: String)
  final case class Buf(entries: Seq[Entry])

  private val ord: Ordering[Entry] =
    Ordering.by[Entry, (Double, String)](e => (-e.score, e.payload))

  final class TopK(k: Int) extends Aggregator[ScoredRow, Buf, Seq[Entry]] {
    require(k > 0, "k must be positive")

    override def zero: Buf = Buf(Seq.empty)

    private def trim(xs: Seq[Entry]): Buf = Buf(xs.sorted(ord).take(k))

    // amortized trimming: sort only when the buffer doubles past k, so a
    // hot group costs O(log k) per row amortized instead of a full sort
    // per row; the buffer stays bounded at 2k
    override def reduce(buf: Buf, row: ScoredRow): Buf = {
      val es = Entry(row.score, row.payload) +: buf.entries
      if (es.length > 2 * k) trim(es) else Buf(es)
    }

    override def merge(a: Buf, b: Buf): Buf = trim(a.entries ++ b.entries)

    override def finish(buf: Buf): Seq[Entry] = buf.entries.sorted(ord).take(k)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]

    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Column form for Dataset[ScoredRow].groupByKey(_.key).agg(topK(5)). */
  def topK(k: Int): TypedColumn[ScoredRow, Seq[Entry]] =
    new TopK(k).toColumn
}
