package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters sketch as a typed `Aggregator`: a
  * fixed-memory (capacity-m) summary of item frequencies with the
  * classic guarantees (Metwally et al., "Efficient computation of
  * frequent and top-k elements in data streams"):
  *
  *  - every reported count is an OVERestimate: c(i) ≤ ĉ(i) ≤ c(i) + ê(i);
  *  - NO FALSE NEGATIVES above the noise floor: any item with true count
  *    > n/m is guaranteed present in the summary (n = stream length) —
  *    which is the property the q89 exact-verify query leans on;
  *  - partial summaries MERGE (Agarwal et al., "Mergeable summaries"):
  *    an absent item contributes the absent side's minimum count as its
  *    upper bound, then the union truncates back to the top m.
  *
  * Why this beats exact groupBy at 100 TB: counting tokens/URLs/n-grams
  * exactly shuffles the full distinct-key set (web-scale vocabularies are
  * billions of keys); the sketch's partial buffers combine map-side and
  * the shuffle carries AT MOST m entries per partition, independent of
  * vocabulary size. The price is approximation — which the q89 pattern
  * erases by exact-recounting only the ≤ m candidates.
  *
  * Buffer mechanics: raw items append to a cheap `pending` list and fold
  * into the summary only when `pending` reaches capacity (amortized O(1)
  * per row); eviction picks the (count, item)-minimum deterministically.
  * The eviction scan is O(m) — at the ~10³ capacities this engine uses
  * that is noise; a production 10⁶-capacity variant would keep the
  * min-heap the original paper describes.
  */
object SpaceSavingAgg {

  final case class Item(item: String, count: Long, err: Long)
  /** `npend` mirrors `pending.size` so the per-row compaction check is
    * O(1) — `Seq.length` on the prepend-built list is an O(n) scan, which
    * would make the hot `reduce` path O(capacity) per input row. */
  final case class Buf(sum: Seq[Item], pending: Seq[String], npend: Int)

  final class SpaceSaving(capacity: Int)
      extends Aggregator[String, Buf, Seq[Item]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Buf = Buf(Seq.empty, Seq.empty, 0)

    private def compact(buf: Buf): Buf = {
      if (buf.pending.isEmpty) buf
      else {
        val m = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
        buf.sum.foreach(it => m(it.item) = (it.count, it.err))
        // pending was built by prepending; replay in arrival order
        buf.pending.reverseIterator.foreach { t =>
          m.get(t) match {
            case Some((c, e)) => m(t) = (c + 1, e)
            case None if m.size < capacity => m(t) = (1L, 0L)
            case None =>
              val (mk, (mc, _)) =
                m.minBy { case (k, (c, _)) => (c, k) } // deterministic tie
              m.remove(mk)
              m(t) = (mc + 1, mc) // inherit the evicted slot's upper bound
          }
        }
        Buf(m.toSeq.map { case (k, (c, e)) => Item(k, c, e) }, Seq.empty, 0)
      }
    }

    override def reduce(buf: Buf, item: String): Buf = {
      val p = item +: buf.pending
      if (buf.npend + 1 >= capacity) compact(Buf(buf.sum, p, buf.npend + 1))
      else Buf(buf.sum, p, buf.npend + 1)
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val ca = compact(a).sum
      val cb = compact(b).sum
      // an item absent from a FULL summary may still have occurred up to
      // that summary's minimum count times — charge that bound
      val minA = if (ca.size >= capacity) ca.map(_.count).min else 0L
      val minB = if (cb.size >= capacity) cb.map(_.count).min else 0L
      val ma = ca.map(i => i.item -> i).toMap
      val mb = cb.map(i => i.item -> i).toMap
      val merged = (ma.keySet ++ mb.keySet).toSeq.map { k =>
        val (c1, e1) = ma.get(k).map(i => (i.count, i.err)).getOrElse((minA, minA))
        val (c2, e2) = mb.get(k).map(i => (i.count, i.err)).getOrElse((minB, minB))
        Item(k, c1 + c2, e1 + e2)
      }
      Buf(merged.sortBy(i => (-i.count, i.item)).take(capacity), Seq.empty, 0)
    }

    override def finish(buf: Buf): Seq[Item] =
      compact(buf).sum.sortBy(i => (-i.count, i.item))

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]

    override def outputEncoder: Encoder[Seq[Item]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Item]]()
  }
}
