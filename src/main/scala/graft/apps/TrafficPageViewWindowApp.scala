package graft.apps

import org.apache.spark.sql.SparkSession

import graft.operators.LogSplit
import graft.pipelines.TrafficPageViewWindow

/** Deployable twin of …/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:
  * behavior-log stream → parse → per-mid daily-UV flag (bounded keyed
  * state) → 10 s windows per (vc, ch, ar, is_new) summing uv/sv/pv
  * measures → parquet summary table.
  */
object TrafficPageViewWindowApp {

  val usage = "graft.apps.TrafficPageViewWindowApp --source file|kafka " +
    "--input <dir> [--brokers <csv> --topics <csv>] --out <dir> " +
    "--checkpoint <dir> [--window '10 seconds'] [--delay '5 seconds'] " +
    "[--trigger available-now|'<interval>']"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark: SparkSession = AppEnv.session("graft-traffic-pv-window", conf)
    val (clean, _) = LogSplit.parse(AppEnv.source(spark, conf, usage), "value")
    val q = TrafficPageViewWindow(spark, clean,
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
