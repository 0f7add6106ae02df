package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipelines.{DwsWindows, OrderPreProcess}

/** Deployable twin of …/app/dws/DwsTradeOrderWindow.java: streams the wide
  * order-detail table `DwdOrderApp` writes → dedup by detail id → per-user
  * order uu/new flags (bounded keyed state) → 10 s windows summing flags
  * and the three split amounts → parquet summary table.
  *
  * The reference bean's splitActivityAmount/splitCouponAmount come from
  * the upstream wide table when it carries them; `DwdOrderApp`'s output
  * carries only `split_total_amount`, so the two reduce amounts default
  * to 0 when the columns are absent from the input schema (checked once,
  * against the directory's own footers).
  */
object DwsTradeOrderWindowApp {

  val usage = "graft.apps.DwsTradeOrderWindowApp --input <dwd-dir> " +
    "--out <dir> --checkpoint <dir> [--window '10 seconds'] " +
    "[--delay '5 seconds'] [--trigger available-now|'<interval>']"

  /** Source-agnostic body: wide-detail stream (with an `eventTime`
    * watermark) → windowed order summary parquet sink.
    */
  def run(spark: SparkSession, wideDetail: DataFrame, outDir: String,
          checkpointDir: String, windowLen: String, delay: String,
          trigger: Trigger): Seq[StreamingQuery] = {
    import spark.implicits._
    val fields = wideDetail.schema.fieldNames.toSet
    def amount(name: String): org.apache.spark.sql.Column =
      if (fields.contains(name)) coalesce(col(name).cast("double"), lit(0.0))
      else lit(0.0)
    val details = wideDetail.select(
        col("id").cast("string").as("id"),
        col("user_id").cast("string").as("userId"),
        col("eventTime").as("ts"),
        amount("split_activity_amount").as("activityAmount"),
        amount("split_coupon_amount").as("couponAmount"),
        coalesce(col("split_total_amount").cast("double"), lit(0.0))
          .as("originalAmount"))
      .as[DwsWindows.OrderDetail]
    Seq(DwsWindows.tradeOrderWindow(spark, details, windowLen, delay)
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
    val spark = AppEnv.session("graft-dws-trade-order", conf)
    val inDir = AppEnv.get(conf, "input", usage)
    val delay = conf.getOrElse("delay", OrderPreProcess.WatermarkDelay)
    // one-file batches replay the upstream feed so the watermark can cross
    // the dedup -> flagger -> window chain (it advances between batches)
    val reader = conf.get("max-files-per-trigger")
      .map(n => spark.readStream.option("maxFilesPerTrigger", n))
      .getOrElse(spark.readStream)
    val wide = reader
      .schema(spark.read.parquet(inDir).schema)
      .parquet(inDir)
      .withWatermark("eventTime", delay)
    val queries = run(spark, wide, AppEnv.get(conf, "out", usage),
      AppEnv.get(conf, "checkpoint", usage),
      conf.getOrElse("window", "10 seconds"), delay, AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
