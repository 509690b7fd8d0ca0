package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (key, score) entry of a top-k result. */
final case class TopKRow(key: Long, score: Double)
/** Aggregation buffer / result: at most k entries, best-first. */
final case class TopKState(items: Seq[TopKRow])

/** Demonstration of the typed-aggregate extension surface (SURVEY.md
  * §2.3 UDF/UDAF policy): an exact top-k accumulator over (key, score)
  * pairs. Partial aggregation comes free — each partition reduces to at
  * most k entries before the merge, so the shuffle carries O(k ×
  * partitions), not the data. Cross-checked against the builtin
  * TakeOrderedAndProject path (q_topk) in TopKAggregatorSpec.
  *
  * Ordering: score DESC, key ASC tiebreak — the same total order as
  * `ORDER BY score DESC, key LIMIT k`.
  *
  * SET semantics, not multiset: duplicate (key, score) input rows
  * collapse to one entry — the top-k is a reduction over the DISTINCT
  * entry set (multi-table LSH probes legitimately deliver the same pair
  * once per colliding table, and dedup inside the buffer beats a
  * distinct shuffle before the aggregation). Inputs whose duplicates
  * must each count toward k need a multiset variant; the divergence
  * from `ORDER BY … LIMIT k` on duplicate-bearing input is pinned in
  * TopKAggregatorSpec.
  */
final class TopKAggregator(k: Int)
  extends Aggregator[TopKRow, TopKState, TopKState] {

  private def better(a: TopKRow, b: TopKRow): Boolean =
    a.score > b.score || (a.score == b.score && a.key < b.key)

  // `distinct` makes the top-k a reduction over the distinct entry SET:
  // multi-table LSH probes (AnnIndex.knnJoin) legitimately deliver the
  // same (key, score) entry once per colliding table, and dedup inside
  // the buffer beats a distinct shuffle before the aggregation. Entries
  // dedup only when key AND score match — in the kNN pipelines the
  // score is a pure function of the pair, so that is exact pair dedup.
  private def trim(xs: Seq[TopKRow]): TopKState =
    TopKState(xs.distinct.sortWith(better).take(k))

  override def zero: TopKState = TopKState(Nil)
  // `trim` keeps the buffer sorted best-first, so a full buffer rejects
  // a non-improving row with ONE comparison and zero allocation — the
  // hot path when this aggregator trims an O(n²) edge stream (knnJoin):
  // almost every row is worse than the current k-th.
  override def reduce(buf: TopKState, row: TopKRow): TopKState =
    if (buf.items.size >= k && !better(row, buf.items.last)) buf
    else trim(row +: buf.items)
  override def merge(a: TopKState, b: TopKState): TopKState =
    trim(a.items ++ b.items)
  override def finish(buf: TopKState): TopKState = buf

  override def bufferEncoder: Encoder[TopKState] = Encoders.product[TopKState]
  override def outputEncoder: Encoder[TopKState] = Encoders.product[TopKState]
}
