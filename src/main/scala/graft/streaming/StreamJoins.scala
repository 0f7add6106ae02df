package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY.md §2.5 J1/J2).
  *
  * The reference joins order facts with UNBOUNDED state (FlinkSQL regular
  * joins, no TTL — …/app/dwd/db/DwdTradeOrderPreProcess.java:162-168; the
  * registered defect SURVEY.md §7.4-2). Spark requires what the reference
  * should have done anyway: watermarks on both sides plus an event-time
  * range condition, which lets the state store evict rows once the
  * watermark passes the range. State per key is then O(rows within the
  * range window), independent of stream length — the property that keeps
  * this runnable on an unbounded 100 TB/day feed.
  *
  * Left-outer emission is watermark-delayed (the unmatched row is emitted
  * null-padded only when no match can arrive anymore) — replacing the
  * reference's emit-then-retract changelog with emit-once-late semantics;
  * downstream latest-row dedup (D1) is therefore unnecessary for our own
  * joins but kept for compatibility with retracting upstreams.
  */
object StreamJoins {

  /** Assign the event-time watermark at a source leaf. Call ONCE per
    * stream — Spark rejects watermark redefinition above stateful
    * operators, so joins (below) never set watermarks themselves.
    */
  def watermarked(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  /** Equi-join with asymmetric event-time bound (Flink intervalJoin shape):
    * `leftTs + lowerSeconds <= rightTs <= leftTs + upperSeconds`.
    * Both inputs must already carry watermarks (see [[watermarked]]);
    * chained joins then compose freely
    * (`spark.sql.streaming.statefulOperator.allowMultiple`, default on).
    * `joinType`: "inner" or "left_outer". Identical in batch.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTsCol: String, rightTsCol: String,
                   keys: Column, lowerSeconds: Long, upperSeconds: Long,
                   joinType: String): DataFrame = {
    val bound = col(rightTsCol) >= col(leftTsCol) + expr(s"INTERVAL $lowerSeconds SECONDS") &&
      col(rightTsCol) <= col(leftTsCol) + expr(s"INTERVAL $upperSeconds SECONDS")
    left.join(right, keys && bound, joinType)
  }

  /** Symmetric convenience: |leftTs - rightTs| <= rangeSeconds. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTsCol: String, rightTsCol: String,
                   keys: Column, rangeSeconds: Long,
                   joinType: String): DataFrame =
    intervalJoin(left, right, leftTsCol, rightTsCol, keys,
      -rangeSeconds, rangeSeconds, joinType)
}
