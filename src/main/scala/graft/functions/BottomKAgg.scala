package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k sample state — the mergeable-sketch form of q102/q154's
  * KMV discipline, for streaming quantiles (`Sketch.sampledQuantilesStream`):
  * keep the k rows with the smallest (hash, id), exactly the rows the batch
  * WindowGroupLimit sample admits, as O(k) state per group that merges
  * across partitions and micro-batches (bottom-k of a union is the bottom-k
  * of the two bottom-ks — same argument as min/max).
  *
  * Input (hk, id, value); `finish` returns the sample's VALUES sorted by
  * (value, id) — the identical rank order the batch form's value window
  * uses, so element_at(vals, ceil(q·m)) reproduces the batch quantile
  * bit-for-bit. Buffer kept sorted by (hk, id); reduce/merge are
  * O(k log k) per call — the per-row constant of a k≤a-few-thousand sample,
  * not a scale term.
  */
/** [[BottomKAgg]]'s double-keyed sibling for the A-ES race (q119/q156:
  * key = −ln(u)/w, the k smallest win ⇒ inclusion ∝ weight): input
  * (key, id, value, weight), state the k smallest (key, id) rows,
  * `finish` the sample's (value, weight) pairs sorted by (value, id) —
  * the order the weighted running-sum quantile walks. Same mergeability
  * argument as the integer form.
  */
class WeightedBottomKAgg(k: Int) extends Aggregator[
    (Double, Long, Long, Long), Seq[(Double, Long, Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, s"WeightedBottomKAgg: k must be >= 1, got $k")
  private def trim(b: Seq[(Double, Long, Long, Long)]): Seq[(Double, Long, Long, Long)] =
    b.sortBy(t => (t._1, t._2)).take(k)
  override def zero: Seq[(Double, Long, Long, Long)] = Vector.empty
  override def reduce(b: Seq[(Double, Long, Long, Long)],
                      a: (Double, Long, Long, Long)): Seq[(Double, Long, Long, Long)] =
    if (b.size == k &&
        (b.last._1 < a._1 || (b.last._1 == a._1 && b.last._2 <= a._2))) b
    else trim(b :+ a)
  override def merge(b1: Seq[(Double, Long, Long, Long)],
                     b2: Seq[(Double, Long, Long, Long)]): Seq[(Double, Long, Long, Long)] =
    trim(b1 ++ b2)
  override def finish(r: Seq[(Double, Long, Long, Long)]): Seq[(Long, Long)] =
    r.sortBy(t => (t._3, t._2)).map(t => (t._3, t._4))
  override def bufferEncoder: Encoder[Seq[(Double, Long, Long, Long)]] =
    Encoders.kryo[Seq[(Double, Long, Long, Long)]]
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

class BottomKAgg(k: Int) extends Aggregator[
    (Long, Long, Long), Seq[(Long, Long, Long)], Seq[Long]] {
  require(k >= 1, s"BottomKAgg: k must be >= 1, got $k")
  private def trim(b: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    b.sortBy(t => (t._1, t._2)).take(k)
  override def zero: Seq[(Long, Long, Long)] = Vector.empty
  override def reduce(b: Seq[(Long, Long, Long)],
                      a: (Long, Long, Long)): Seq[(Long, Long, Long)] =
    if (b.size == k &&
        (b.last._1 < a._1 || (b.last._1 == a._1 && b.last._2 <= a._2))) b
    else trim(b :+ a)
  override def merge(b1: Seq[(Long, Long, Long)],
                     b2: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    trim(b1 ++ b2)
  override def finish(r: Seq[(Long, Long, Long)]): Seq[Long] =
    r.sortBy(t => (t._3, t._2)).map(_._3)
  override def bufferEncoder: Encoder[Seq[(Long, Long, Long)]] =
    Encoders.kryo[Seq[(Long, Long, Long)]]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
