package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact distinct-count via set union — the reference accumulates a
  * `Set orderIdSet` inside its window reduce
  * (…/bean/TradeProvinceOrderWindow.java:29, populated
  * …/app/dws/DwsTradeProvinceOrderWindow.java:160-167) and its inline
  * `AggregateFunction`s leave `merge` unimplemented (`return null`,
  * SURVEY.md §8) — this is the working typed-Aggregator form, with a real
  * merge so partial (map-side) aggregation works.
  *
  * Scale note: state is O(distinct values per group). Use Spark's
  * `count_distinct` (expand-based) or `approx_count_distinct` (HLL, fixed
  * state) for high-cardinality groups; this Aggregator is for the
  * reference's semantics — bounded per-group domains where the exact set
  * is also wanted downstream.
  */
class DistinctSetAgg extends Aggregator[String, Set[String], Long] {
  override def zero: Set[String] = Set.empty
  override def reduce(b: Set[String], a: String): Set[String] =
    if (a == null) b else b + a
  override def merge(b1: Set[String], b2: Set[String]): Set[String] = b1 union b2
  override def finish(r: Set[String]): Long = r.size.toLong
  override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
