package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DWS trade pipeline (SURVEY.md §2.6 A6/A7, §2.5 J4, §2.7 D1):
  * …/app/dws/DwsTradeProvinceOrderWindow.java — order-detail stream →
  * latest-row dedup by detail id → 10 s tumbling window per province:
  * order count (distinct order ids), detail rows, amount sum → province
  * name joined AFTER aggregation (the reference's own optimization note
  * "聚合后的数据量显著减少" at :46-55 — post-agg rows are tiny, so the dim
  * join touches thousands of rows, not millions; Catalyst cannot move a
  * join across a stateful streaming agg, so the placement is ours to keep).
  *
  * Input is the wide detail frame OrderPreProcess produces — the pipelines
  * compose exactly like the reference's DWD→DWS topic chain.
  */
object TradeProvinceOrderWindow {

  def apply(wideDetail: DataFrame, provinceDim: DataFrame,
            windowLen: String = "10 seconds", delay: String = "5 seconds"): DataFrame = {
    // Streaming contract: `wideDetail` already carries its eventTime
    // watermark from the source leaves (re-applying one above a stateful
    // operator is disallowed). dropDuplicatesWithinWatermark is
    // streaming-only; batch gets the equivalent any-row dedup.
    val deduped =
      if (wideDetail.isStreaming) wideDetail.dropDuplicatesWithinWatermark("id")
      else wideDetail.dropDuplicates("id")

    val agg = deduped
      .groupBy(window(col("eventTime"), windowLen), col("province_id"))
      .agg(
        approx_count_distinct(col("order_id")).as("order_ct"),
        count(lit(1)).as("detail_ct"),
        sum(col("split_total_amount")).as("amount_sum"))
      .select(
        col("window.start").as("stt"), col("window.end").as("edt"),
        col("province_id"), col("order_ct"), col("detail_ct"), col("amount_sum"))

    // J4 join-after-aggregation: broadcast the dim against the tiny agg
    agg.join(
      broadcast(provinceDim.select(col("id").as("province_id"),
        col("name").as("province_name"))),
      Seq("province_id"), "left_outer")
  }
}
