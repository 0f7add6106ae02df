package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's most complex DWS app (SURVEY.md §3.3):
  * …/app/dws/DwsTradeTrademarkCategoryUserSpuOrderWindow.java —
  * order-detail stream → latest-row dedup → SIX chained async dim lookups
  * (sku → spu → trademark → category3 → category2 → category1, each a
  * Redis-cached Phoenix point query in a thread pool) → 10 s windows per
  * (trademark, category, user).
  *
  * Spark shape: the async-RPC machinery dissolves into broadcast
  * stream-static joins — set-oriented, no thread pool, no cache
  * invalidation (the per-batch dim snapshot IS the cache); the chain stays
  * map-side so the only shuffles are the dedup key and the window keys,
  * exactly the two keyBy's the reference pays.
  *
  * `dims`: name -> (dimDf, joinKeyInFact, joinKeyInDim, carriedCols).
  * Chained in order; every dim is broadcast.
  */
object TradeSkuOrderWindow {

  final case class DimHop(dim: DataFrame, factKey: String, dimKey: String,
                          carried: Seq[String])

  def apply(wideDetail: DataFrame, hops: Seq[DimHop],
            groupCols: Seq[String],
            windowLen: String = "10 seconds", delay: String = "5 seconds"): DataFrame =
    windowed(wideDetail, hops, groupCols,
      sums = Map("split_total_amount" -> "amount_sum"),
      countName = "order_detail_ct", windowLen = windowLen)

  /** Generalized dedup → broadcast-dim-hop chain → keyed tumbling window:
    * the shared spine of the trademark/spu order window AND the
    * trademark/category refund window
    * (…/app/dws/DwsTradeTrademarkCategoryUserRefundWindow.java follows the
    * identical keyBy(id)-dedup → 5 dim hops → keyBy(dims)-window shape).
    * `sums`: measure column -> output name; a row count is always emitted
    * under `countName`.
    */
  def windowed(wideDetail: DataFrame, hops: Seq[DimHop],
               groupCols: Seq[String], sums: Map[String, String],
               countName: String,
               windowLen: String = "10 seconds",
               tsCol: String = "eventTime",
               dedupKey: String = "id"): DataFrame = {
    // watermark comes from the source leaves (see TradeProvinceOrderWindow)
    val deduped =
      if (wideDetail.isStreaming) wideDetail.dropDuplicatesWithinWatermark(dedupKey)
      else wideDetail.dropDuplicates(dedupKey)

    val enriched = hops.foldLeft(deduped) { (df, h) =>
      df.join(
        broadcast(h.dim.select((h.dimKey +: h.carried).distinct.map(col): _*)),
        df(h.factKey) === h.dim(h.dimKey), "left_outer")
        .drop(h.dimKey)
    }

    val aggs = count(lit(1)).as(countName) +:
      sums.toSeq.map { case (in, out) => sum(col(in)).as(out) }
    enriched
      .groupBy(window(col(tsCol), windowLen) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("stt") +: col("window.end").as("edt")
        +: groupCols.map(col) ++: (countName +: sums.values.toSeq).map(col): _*)
  }
}
