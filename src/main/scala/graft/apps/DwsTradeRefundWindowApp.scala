package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipelines.{DwdFacts, DwsWindows}
import graft.sources.CdcEnvelope
import graft.streaming.StreamOps

/** Deployable twin of
  * …/app/dws/DwsTradeTrademarkCategoryUserRefundWindow.java: CDC envelope
  * stream → order_refund fact extraction → dedup by refund id → five
  * chained broadcast dim hops (sku → trademark, category3 → category2 →
  * category1) → 10 s windows per (trademark, category tree, user)
  * counting refunds and summing refund_amount → parquet summary table.
  */
object DwsTradeRefundWindowApp {

  val usage = "graft.apps.DwsTradeRefundWindowApp --source file|kafka " +
    "--input <dir> [--brokers <csv> --topics <csv>] --sku <table> " +
    "--trademark <table> --c3 <table> --c2 <table> --c1 <table> " +
    "--out <dir> --checkpoint <dir> [--window '10 seconds'] " +
    "[--delay '5 seconds'] [--trigger available-now|'<interval>']"

  /** Source-agnostic body: envelope `value` lines + five dims → windowed
    * refund summary parquet sink.
    */
  def run(spark: SparkSession, raw: DataFrame, sku: DataFrame,
          trademark: DataFrame, c3: DataFrame, c2: DataFrame, c1: DataFrame,
          outDir: String, checkpointDir: String, windowLen: String,
          delay: String, trigger: Trigger): Seq[StreamingQuery] = {
    val (clean, _) = CdcEnvelope.parse(raw, "value")
    val refunds = StreamOps.withEventTime(
      DwdFacts.extract(CdcEnvelope.etlFilter(clean),
          DwdFacts.defs.find(_.name == "order_refund").get)
        .withColumn("eventTime", timestamp_seconds(col("ts"))),
      "eventTime", delay)
    Seq(DwsWindows.refundWindow(refunds, sku, trademark, c3, c2, c1, windowLen)
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
    val spark = AppEnv.session("graft-dws-refund", conf)
    def dim(key: String) = AppEnv.readTable(spark, AppEnv.get(conf, key, usage))
    val queries = run(spark, AppEnv.source(spark, conf, usage),
      dim("sku"), dim("trademark"), dim("c3"), dim("c2"), dim("c1"),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      conf.getOrElse("window", "10 seconds"),
      conf.getOrElse("delay", "5 seconds"), AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
