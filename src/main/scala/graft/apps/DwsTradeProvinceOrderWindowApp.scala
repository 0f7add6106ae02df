package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipelines.{OrderPreProcess, TradeProvinceOrderWindow}

/** Deployable twin of …/app/dws/DwsTradeProvinceOrderWindow.java: streams
  * the wide order-detail table `DwdOrderApp` writes (the DWD→DWS chain the
  * reference runs over Kafka topics, here over a parquet directory) →
  * dedup by detail id → 10 s windows per province → post-agg province-name
  * join → parquet summary table.
  *
  * The parquet stream needs an explicit schema; it is read from the
  * directory's own footers (the DWD job must have produced at least one
  * file — same ordering requirement as "the upstream topic exists"). The
  * event-time watermark is re-declared here because file handoff, unlike a
  * direct plan, does not carry the upstream watermark.
  */
object DwsTradeProvinceOrderWindowApp {

  val usage = "graft.apps.DwsTradeProvinceOrderWindowApp --input <dwd-dir> " +
    "--provinces <table> --out <dir> --checkpoint <dir> " +
    "[--window '10 seconds'] [--delay '5 seconds'] " +
    "[--trigger available-now|'<interval>']"

  /** Source-agnostic body: wide-detail stream (must carry an `eventTime`
    * watermark) + province dim → windowed summary parquet sink.
    */
  def run(spark: SparkSession, wideDetail: DataFrame, provinces: DataFrame,
          outDir: String, checkpointDir: String, windowLen: String,
          delay: String, trigger: Trigger): Seq[StreamingQuery] =
    Seq(TradeProvinceOrderWindow(wideDetail, provinces, windowLen, delay)
      .writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start())

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-dws-province", conf)
    val inDir = AppEnv.get(conf, "input", usage)
    val delay = conf.getOrElse("delay", OrderPreProcess.WatermarkDelay)
    val wide = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .parquet(inDir)
      .withWatermark("eventTime", delay)
    val queries = run(spark, wide,
      AppEnv.readTable(spark, AppEnv.get(conf, "provinces", usage)),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      conf.getOrElse("window", "10 seconds"), delay, AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
