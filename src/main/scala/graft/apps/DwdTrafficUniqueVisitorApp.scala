package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.LogSplit
import graft.pipelines.DwsWindows

/** Deployable twin of …/app/dwd/log/DwdTrafficUniqueVisitorDetail.java:
  * behavior-log stream → page branch → drop in-session views
  * (last_page_id non-null, :66-73) → per-mid first-view-of-day filter
  * (the reference's TTL'd ValueState, :82-119) → UV detail parquet.
  *
  * The keyed state is the shared bounded flagger
  * ([[DwsWindows.firstOfDayFlags]]) — end-of-day `EventTimeTimeout`
  * eviction IS the reference's 1-day state TTL.
  */
object DwdTrafficUniqueVisitorApp {

  /** One session-entry page view with its common dims. */
  case class PageHit(mid: String, vc: String, ch: String, ar: String,
                     is_new: String, page_id: String, ts: java.sql.Timestamp)

  val usage = "graft.apps.DwdTrafficUniqueVisitorApp --source file|kafka " +
    "--input <dir> [--brokers <csv> --topics <csv>] --out <dir> " +
    "--checkpoint <dir> [--delay '5 seconds'] " +
    "[--trigger available-now|'<interval>']"

  /** Source-agnostic body: raw log lines → UV detail rows (one per mid per
    * day: the day's first session-entry page view, with its common dims).
    */
  def run(spark: SparkSession, raw: DataFrame, outDir: String,
          checkpointDir: String, delay: String, trigger: Trigger): Seq[StreamingQuery] = {
    import spark.implicits._
    val (clean, _) = LogSplit.parse(raw, "value")
    val pages = LogSplit.split(clean)("page")
      .filter(col("page.last_page_id").isNull)
      .select(col("common.mid").as("mid"), col("common.vc").as("vc"),
        col("common.ch").as("ch"), col("common.ar").as("ar"),
        col("common.is_new").as("is_new"),
        col("page.page_id").as("page_id"),
        timestamp_millis(col("ts")).as("ts"))
      .as[PageHit]
    val watermarked = if (pages.isStreaming) pages.withWatermark("ts", delay) else pages
    val uv = DwsWindows.firstOfDayFlags[PageHit](watermarked, _.mid, _.ts)
      .filter(col("_2") === 1)
      .select(col("_1.mid").as("mid"), col("_1.vc").as("vc"),
        col("_1.ch").as("ch"), col("_1.ar").as("ar"),
        col("_1.is_new").as("is_new"), col("_1.page_id").as("page_id"),
        col("_1.ts").as("ts"))
    Seq(uv.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start())
  }

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-dwd-uv", conf)
    val queries = run(spark, AppEnv.source(spark, conf, usage),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      conf.getOrElse("delay", "5 seconds"), AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
