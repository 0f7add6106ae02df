package graft.pipelines

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
    DwsWindows.allowFlagWindowChain(spark)
    val pages = LogSplit.split(logs)("page")
      .select(
        col("common.mid").as("mid"), col("common.vc").as("vc"),
        col("common.ch").as("ch"), col("common.ar").as("ar"),
        col("common.is_new").as("isNew"),
        col("page.last_page_id").as("lastPageId"),
        coalesce(col("page.during_time"), lit(0L)).as("duringTime"),
        timestamp_millis(col("ts")).as("ts"))
      .as[PageRow]

    // per-mid keyed state: first page view of the (UTC) day carries uv=1 —
    // the shared bounded flagger (end-of-day EventTimeTimeout eviction)
    val flagged = DwsWindows.firstOfDayFlags[PageRow](
      StreamOps.withEventTime(pages, "ts", delay), _.mid, _.ts, zone)
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

  /** DwsTrafficPageViewWindow (…/app/dws/DwsTrafficPageViewWindow.java:
    * 115-170): home / good_detail daily UV. ONE keyed state per mid holds
    * BOTH last-visit dates (the reference keeps two ValueStates in the
    * same KeyedProcessFunction — same thing); a row is emitted only when
    * at least one flag fires (:163-166), then a 10 s window sums the two
    * flags. Shuffles: mid (state), window key — same as the reference's
    * keyBy + windowAll, minus the windowAll single-instance bottleneck.
    *
    * Input rows: (mid, pageId, ts) pre-filtered to the two page ids by the
    * caller or not — the filter here makes the op self-contained (P10).
    */
  def homeDetailUvWindow(spark: SparkSession, pages: Dataset[(String, String, java.sql.Timestamp)],
                         windowLen: String = "10 seconds", delay: String = "5 seconds",
                         zone: java.time.ZoneId = java.time.ZoneOffset.UTC): DataFrame = {
    import spark.implicits._
    DwsWindows.allowFlagWindowChain(spark)
    val watermarked =
      if (pages.isStreaming) pages.withWatermark("_3", delay) else pages
    val flagged = watermarked
      .filter(r => r._2 == "home" || r._2 == "good_detail")
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, String), (java.sql.Timestamp, Int, Int)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (_, events, state: org.apache.spark.sql.streaming.GroupState[(String, String)]) =>
          if (state.hasTimedOut) {
            // watermark passed end-of-day of BOTH tracked dates: any later
            // event is on a new date for both flags, so forgetting is free
            state.remove()
            Iterator.empty
          } else {
            var (homeDt, detailDt) = state.getOption.getOrElse(("", ""))
            val out = events.toSeq.sortBy(_._3.getTime).flatMap { case (_, pageId, ts) =>
              val d = java.time.Instant.ofEpochMilli(ts.getTime)
                .atZone(zone).toLocalDate.toString
              val homeUv = if (pageId == "home" && d != homeDt) 1 else 0
              val detailUv = if (pageId == "good_detail" && d != detailDt) 1 else 0
              if (homeUv == 1) homeDt = d
              if (detailUv == 1) detailDt = d
              if (homeUv != 0 || detailUv != 0) Some((ts, homeUv, detailUv)) else None
            }
            state.update((homeDt, detailDt))
            // at least one date is set (reaching here requires a home or
            // good_detail event); evict once both are past end-of-day
            val evictAt = Seq(homeDt, detailDt).filter(_.nonEmpty)
              .map(StreamOps.endOfDayMs(_, zone)).max
            StreamOps.setEvictionAt(state, evictAt)
            out.iterator
          }
      }
      .toDF("ts", "home_uv", "detail_uv")

    // re-declare event time: the state op's encoder output drops the tag
    val timed = if (flagged.isStreaming) flagged.withWatermark("ts", delay) else flagged
    timed
      .groupBy(window(col("ts"), windowLen))
      .agg(sum(col("home_uv")).as("home_uv_ct"),
        sum(col("detail_uv")).as("good_detail_uv_ct"))
      .select(col("window.start").as("stt"), col("window.end").as("edt"),
        col("home_uv_ct"), col("good_detail_uv_ct"))
  }
}
