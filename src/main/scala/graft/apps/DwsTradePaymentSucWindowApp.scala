package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipelines.{DwdFacts, DwsWindows}
import graft.sources.CdcEnvelope

/** Deployable twin of …/app/dws/DwsTradePaymentSucWindow.java: CDC
  * envelope stream → successful-payment fact (payment_info updates whose
  * payment_status changed to 1602) → dedup by payment id → per-user
  * pay-success uu/new flags (bounded keyed state) → 10 s windows →
  * parquet summary table.
  */
object DwsTradePaymentSucWindowApp {

  val usage = "graft.apps.DwsTradePaymentSucWindowApp --source file|kafka " +
    "--input <dir> [--brokers <csv> --topics <csv>] --out <dir> " +
    "--checkpoint <dir> [--window '10 seconds'] [--delay '5 seconds'] " +
    "[--trigger available-now|'<interval>']"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark: SparkSession = AppEnv.session("graft-dws-payment-suc", conf)
    import spark.implicits._
    val (clean, _) = CdcEnvelope.parse(AppEnv.source(spark, conf, usage), "value")
    val payments = DwdFacts.extract(CdcEnvelope.etlFilter(clean),
        DwdFacts.defs.find(_.name == "payment_info").get)
      .select(col("id"), col("user_id").as("userId"),
        timestamp_seconds(col("ts")).as("ts"))
      .as[DwsWindows.Payment]
    val q = DwsWindows.paymentSucWindow(spark, payments,
        conf.getOrElse("window", "10 seconds"),
        conf.getOrElse("delay", "5 seconds"))
      .writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", AppEnv.get(conf, "out", usage))
      .option("checkpointLocation", AppEnv.get(conf, "checkpoint", usage))
      .trigger(AppEnv.trigger(conf))
      .start()
    AppEnv.await(spark, conf, Seq(q))
  }
}
