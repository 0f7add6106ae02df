package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipelines.{DwdFacts, UserWindows}
import graft.sources.CdcEnvelope

/** Deployable twin of …/app/dws/DwsTradeCartAddUuWindow.java: CDC envelope
  * stream → cart_add fact extraction (inserts + sku_num-grew updates) →
  * per-user daily-distinct cart-add flag → 10 s windowed unique-user
  * counts → parquet summary table.
  *
  * The reference app is UNFINISHED (ends after keyBy, :88-92); this
  * implements the intent its javadoc documents (:22-37) via
  * [[UserWindows.cartAddUuWindow]].
  */
object DwsTradeCartAddUuWindowApp {

  val usage = "graft.apps.DwsTradeCartAddUuWindowApp --source file|kafka " +
    "--input <dir> [--brokers <csv> --topics <csv>] --out <dir> " +
    "--checkpoint <dir> [--window '10 seconds'] [--delay '5 seconds'] " +
    "[--trigger available-now|'<interval>']"

  /** Source-agnostic body: envelope `value` lines → windowed cart-add uu
    * counts parquet sink.
    */
  def run(spark: SparkSession, raw: DataFrame, outDir: String,
          checkpointDir: String, windowLen: String, delay: String,
          trigger: Trigger): Seq[StreamingQuery] = {
    import spark.implicits._
    val (clean, _) = CdcEnvelope.parse(raw, "value")
    val cartAdds = DwdFacts.extract(CdcEnvelope.etlFilter(clean),
        DwdFacts.defs.find(_.name == "cart_add").get)
      .select(col("user_id").as("uid"), timestamp_seconds(col("ts")).as("ts"))
      .as[UserWindows.Login]
    Seq(UserWindows.cartAddUuWindow(spark, cartAdds, windowLen, delay)
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
    val spark = AppEnv.session("graft-dws-cart-add-uu", conf)
    val queries = run(spark, AppEnv.source(spark, conf, usage),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      conf.getOrElse("window", "10 seconds"),
      conf.getOrElse("delay", "5 seconds"), AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
