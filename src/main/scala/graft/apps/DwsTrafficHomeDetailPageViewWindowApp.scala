package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.LogSplit
import graft.pipelines.TrafficPageViewWindow

/** Deployable twin of …/app/dws/DwsTrafficPageViewWindow.java: behavior-log
  * stream → page branch → per-mid home / good_detail daily-UV flags (one
  * keyed state holds both last-visit dates, as the reference keeps two
  * ValueStates in one KeyedProcessFunction) → 10 s window sums → parquet
  * summary table.
  */
object DwsTrafficHomeDetailPageViewWindowApp {

  val usage = "graft.apps.DwsTrafficHomeDetailPageViewWindowApp " +
    "--source file|kafka --input <dir> [--brokers <csv> --topics <csv>] " +
    "--out <dir> --checkpoint <dir> [--window '10 seconds'] " +
    "[--delay '5 seconds'] [--trigger available-now|'<interval>']"

  /** Source-agnostic body: raw log lines → windowed home/detail UV counts. */
  def run(spark: SparkSession, raw: DataFrame, outDir: String,
          checkpointDir: String, windowLen: String, delay: String,
          trigger: Trigger): Seq[StreamingQuery] = {
    import spark.implicits._
    val (clean, _) = LogSplit.parse(raw, "value")
    val pages = LogSplit.split(clean)("page")
      .select(col("common.mid").as("_1"), col("page.page_id").as("_2"),
        timestamp_millis(col("ts")).as("_3"))
      .as[(String, String, java.sql.Timestamp)]
    Seq(TrafficPageViewWindow.homeDetailUvWindow(spark, pages, windowLen, delay)
      .writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start())
  }

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-dws-home-detail", conf)
    val queries = run(spark, AppEnv.source(spark, conf, usage),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      conf.getOrElse("window", "10 seconds"),
      conf.getOrElse("delay", "5 seconds"), AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
