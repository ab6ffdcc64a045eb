package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

case class ScoredKey(score: Double, key: Long)
case class TopKBuf(items: Seq[ScoredKey])

/** Bounded top-k typed aggregate (`graft_top3(score, key)`): keeps the k
  * best (score desc, key asc) entries through reduce/merge, so per-group
  * top-k costs O(k) state per group and map-side combines like any native
  * aggregate.
  *
  * This is the scale alternative to the `row_number() OVER (...) <= k`
  * formulation (q10/q30): the window form shuffles and SORTS every raw
  * row of every group; this form shuffles k-sized partial buffers —
  * at 100 TB per-group top-k over billions of rows, the difference is a
  * full-data sort versus a groups×k merge. The window form stays right
  * when the query also needs the non-top rows or arbitrary rank frames.
  */
class TopK(k: Int) extends Aggregator[(Double, Long), TopKBuf, Seq[ScoredKey]] {
  // e sorts before f under (score desc, key asc)
  private def beats(e: ScoredKey, f: ScoredKey): Boolean =
    e.score > f.score || (e.score == f.score && e.key < f.key)

  override def zero: TopKBuf = TopKBuf(Nil)

  override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf = {
    val e = ScoredKey(a._1, a._2)
    if (b.items.size < k) TopKBuf(e +: b.items)
    else {
      // items stay unsorted in the buffer: O(k) worst-scan per row, no
      // per-row sort; ordering is imposed once, in finish()
      val w = b.items.reduceLeft((x, y) => if (beats(x, y)) y else x)
      if (beats(e, w)) {
        val i = b.items.indexOf(w) // drop ONE copy — duplicates are legal
        TopKBuf(e +: (b.items.take(i) ++ b.items.drop(i + 1)))
      } else b
    }
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf((x.items ++ y.items).sortWith(beats).take(k))

  override def finish(b: TopKBuf): Seq[ScoredKey] = b.items.sortWith(beats)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[ScoredKey]] = ExpressionEncoder()
}
