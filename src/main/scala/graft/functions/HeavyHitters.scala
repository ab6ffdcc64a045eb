package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

case class MgBuf(counts: Map[Long, Long])
case class MgEntry(item: Long, approx_count: Long)

/** Misra–Gries heavy hitters (`graft_mg8(item)`) — the mergeable frequency
  * summary (Agarwal et al., Mergeable Summaries, PODS'12): at most k
  * counters per buffer, so per-group state is O(k) however many distinct
  * items stream through, and partial buffers merge associatively
  * (sum maps, then subtract the (k+1)-largest count and drop non-positive
  * counters — the merge that preserves the MG error bound).
  *
  * Guarantees after any reduce/merge tree over n items:
  * `true − n/(k+1) ≤ approx ≤ true` (counts only undercount), and every
  * item with true frequency > n/(k+1) is PRESENT. Final counts depend on
  * the partition merge order (inherent to MG), the bounds do not — specs
  * assert the bounds, the driver entry is rows-only.
  */
class HeavyHitters(k: Int) extends Aggregator[Long, MgBuf, Seq[MgEntry]] {
  override def zero: MgBuf = MgBuf(Map.empty)

  override def reduce(b: MgBuf, item: Long): MgBuf =
    b.counts.get(item) match {
      case Some(c)                    => MgBuf(b.counts.updated(item, c + 1))
      case None if b.counts.size < k  => MgBuf(b.counts.updated(item, 1L))
      case None =>
        // decrement-all step: drop zeroed counters (classic MG)
        MgBuf(b.counts.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None })
    }

  override def merge(x: MgBuf, y: MgBuf): MgBuf = {
    val summed = y.counts.foldLeft(x.counts) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (summed.size <= k) MgBuf(summed)
    else {
      val d = summed.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
      MgBuf(summed.flatMap { case (i, c) => if (c > d) Some(i -> (c - d)) else None })
    }
  }

  override def finish(b: MgBuf): Seq[MgEntry] =
    b.counts.toSeq
      .sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) => MgEntry(i, c) }

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Seq[MgEntry]] = ExpressionEncoder()
}
