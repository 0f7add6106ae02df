package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.LogSplit
import graft.pipelines.UserWindows

/** Deployable twin of …/app/dws/DwsUserUserLoginWindow.java: behavior-log
  * stream → page branch filtered to login events (uid present AND the
  * view is a session entry or an explicit login page, :83-97) → per-uid
  * last-login-date state flags unique (uu) and back-flow (>7 idle days)
  * logins → 10 s window sums → parquet summary table.
  */
object DwsUserLoginWindowApp {

  val usage = "graft.apps.DwsUserLoginWindowApp --source file|kafka " +
    "--input <dir> [--brokers <csv> --topics <csv>] --out <dir> " +
    "--checkpoint <dir> [--window '10 seconds'] [--delay '5 seconds'] " +
    "[--trigger available-now|'<interval>']"

  /** Source-agnostic body: raw log lines → windowed uu/back counts. */
  def run(spark: SparkSession, raw: DataFrame, outDir: String,
          checkpointDir: String, windowLen: String, delay: String,
          trigger: Trigger): Seq[StreamingQuery] = {
    import spark.implicits._
    val (clean, _) = LogSplit.parse(raw, "value")
    val logins = LogSplit.split(clean)("page")
      .filter(col("common.uid").isNotNull &&
        (col("page.last_page_id").isNull || col("page.last_page_id") === "login"))
      .select(col("common.uid").as("uid"), timestamp_millis(col("ts")).as("ts"))
      .as[UserWindows.Login]
    Seq(UserWindows.loginWindow(spark, logins, windowLen, delay)
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
    val spark = AppEnv.session("graft-dws-user-login", conf)
    val queries = run(spark, AppEnv.source(spark, conf, usage),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      conf.getOrElse("window", "10 seconds"),
      conf.getOrElse("delay", "5 seconds"), AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
