package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LogSplit
import graft.streaming.StreamOps

/** DWS traffic pipeline (SURVEY.md §2.6 A2/A5, §3.1):
  * …/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java — page-view stream →
  * per-mid daily-distinct UV flag (keyed state) → 10 s tumbling windows per
  * (vc, ch, ar, is_new) summing uv/sv/pv/duration.
  *
  * The reference unions three separately-built measure streams and its
  * window reduce mixes fields (registered defect, SURVEY.md §8); here one
  * pass computes all measures: uv from the stateful first-visit-today flag,
  * sv from `last_page_id is null` (session entry), pv = 1 per page view.
  *
  * Shuffles: one on mid (keyed state), one on (window, dims) — same two
  * the reference's keyBy/window pair does; dims travel with the flagged
  * row so no re-join is needed.
  */
object TrafficPageViewWindow {

  case class PageRow(mid: String, vc: String, ch: String, ar: String,
                     isNew: String, lastPageId: Option[String],
                     duringTime: Long, ts: java.sql.Timestamp)

  /** logs (parsed LogSplit schema) -> windowed measure rows. `zone` pins
    * the day-bucketing timezone (explicit parameter, SURVEY.md §7.4-6 —
    * the reference hardcodes GMT+8 in DateFormatUtil).
    */
  def apply(spark: SparkSession, logs: DataFrame,
            windowLen: String = "10 seconds", delay: String = "5 seconds",
            zone: java.time.ZoneId = java.time.ZoneOffset.UTC): DataFrame = {
    import spark.implicits._
    val pages = LogSplit.split(logs)("page")
      .select(
        col("common.mid").as("mid"), col("common.vc").as("vc"),
        col("common.ch").as("ch"), col("common.ar").as("ar"),
        col("common.is_new").as("isNew"),
        col("page.last_page_id").as("lastPageId"),
        coalesce(col("page.during_time"), lit(0L)).as("duringTime"),
        timestamp_millis(col("ts")).as("ts"))
      .as[PageRow]

    // per-mid keyed state: first page view of the (UTC) day carries uv=1
    val flagged = pages.groupByKey(_.mid)
      .flatMapGroupsWithState[String, (PageRow, Int)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (mid, events, state: org.apache.spark.sql.streaming.GroupState[String]) =>
          var lastDate = state.getOption.getOrElse("")
          val out = events.toSeq.sortBy(_.ts.getTime).map { e =>
            val d = java.time.Instant.ofEpochMilli(e.ts.getTime)
              .atZone(zone).toLocalDate.toString
            val uv = if (d != lastDate) 1 else 0
            if (d != lastDate) lastDate = d
            (e, uv)
          }
          state.update(lastDate)
          out.iterator
      }
      .select(
        col("_1.vc").as("vc"), col("_1.ch").as("ch"), col("_1.ar").as("ar"),
        col("_1.isNew").as("is_new"), col("_1.ts").as("ts"),
        col("_2").as("uv"),
        when(col("_1.lastPageId").isNull, 1).otherwise(0).as("sv"),
        col("_1.duringTime").as("dur"))

    StreamOps.tumblingSums(flagged, "ts", delay, windowLen,
      Seq("vc", "ch", "ar", "is_new"),
      Map("uv" -> "uv_ct", "sv" -> "sv_ct", "dur" -> "dur_sum"))
  }
}
