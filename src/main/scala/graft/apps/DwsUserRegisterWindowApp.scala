package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipelines.{DwdFacts, DwsWindows}
import graft.sources.CdcEnvelope

/** Deployable twin of …/app/dws/DwsUserUserRegisterWindow.java: CDC
  * envelope stream → user_register fact extraction (user_info inserts) →
  * 10 s tumbling register counts → parquet summary table.
  */
object DwsUserRegisterWindowApp {

  val usage = "graft.apps.DwsUserRegisterWindowApp --source file|kafka " +
    "--input <dir> [--brokers <csv> --topics <csv>] --out <dir> " +
    "--checkpoint <dir> [--window '10 seconds'] [--delay '5 seconds'] " +
    "[--trigger available-now|'<interval>']"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark: SparkSession = AppEnv.session("graft-dws-user-register", conf)
    val (clean, _) = CdcEnvelope.parse(AppEnv.source(spark, conf, usage), "value")
    val registers = DwdFacts.extract(CdcEnvelope.etlFilter(clean),
        DwdFacts.defs.find(_.name == "user_register").get)
      .withColumn("event_ts", timestamp_seconds(col("ts")))
    val q = DwsWindows.userRegisterWindow(registers, "event_ts",
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
