package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipelines.OrderPreProcess
import graft.sources.CdcEnvelope

/** Deployable twin of the reference's biggest DWD job
  * (…/app/dwd/db/DwdTradeOrderPreProcess.java): CDC envelope stream →
  * order_detail ⋈ order_info ⟕ activity ⟕ coupon ⋈ dict → wide order
  * detail, written as a parquet table other jobs read — the Spark analogue
  * of the reference's `dwd_trade_order_pre_process` topic. Downstream DWS
  * jobs (`DwsTradeProvinceOrderWindowApp`) stream this directory.
  */
object DwdOrderApp {

  val usage = "graft.apps.DwdOrderApp --source file|kafka --input <dir> " +
    "[--brokers <csv> --topics <csv>] --dict <table> --out <dir> " +
    "--checkpoint <dir> [--trigger available-now|'<interval>']"

  /** Source-agnostic body: envelope `value` lines + dict dim → wide detail
    * parquet sink. Append mode: interval-join output is final once emitted.
    */
  def run(spark: SparkSession, raw: DataFrame, dict: DataFrame, outDir: String,
          checkpointDir: String, trigger: Trigger): Seq[StreamingQuery] = {
    val (clean, _) = CdcEnvelope.parse(raw, "value")
    val wide = OrderPreProcess(clean, dict)
    Seq(wide.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start())
  }

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-dwd-order", conf)
    val queries = run(spark, AppEnv.source(spark, conf, usage),
      AppEnv.readTable(spark, AppEnv.get(conf, "dict", usage)),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
