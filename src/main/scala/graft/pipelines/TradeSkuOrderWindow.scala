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
            windowLen: String = "10 seconds", delay: String = "5 seconds"): DataFrame = {
    // watermark comes from the source leaves (see TradeProvinceOrderWindow)
    val deduped =
      if (wideDetail.isStreaming) wideDetail.dropDuplicatesWithinWatermark("id")
      else wideDetail.dropDuplicates("id")

    val enriched = hops.foldLeft(deduped) { (df, h) =>
      df.join(
        broadcast(h.dim.select((h.dimKey +: h.carried).distinct.map(col): _*)),
        df(h.factKey) === h.dim(h.dimKey), "left_outer")
        .drop(h.dimKey)
    }

    enriched
      .groupBy(window(col("eventTime"), windowLen) +: groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("order_detail_ct"),
        sum(col("split_total_amount")).as("amount_sum"))
      .select(col("window.start").as("stt") +: col("window.end").as("edt")
        +: groupCols.map(col) ++: Seq(col("order_detail_ct"), col("amount_sum")): _*)
  }
}
