package graft.apps

import org.apache.spark.sql.SparkSession

import graft.pipelines.KeywordWindow

/** Deployable twin of …/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:
  * streams the routed page directory `BaseLogApp` writes (the log-side
  * DWD→DWS file chain, like the reference's page topic) → search filter →
  * tokenize + explode → 10 s keyword counts → parquet summary table.
  */
object KeywordWindowApp {

  val usage = "graft.apps.KeywordWindowApp --input <page-dir> --out <dir> " +
    "--checkpoint <dir> [--window '10 seconds'] [--delay '5 seconds'] " +
    "[--trigger available-now|'<interval>']"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark: SparkSession = AppEnv.session("graft-keyword-window", conf)
    val inDir = AppEnv.get(conf, "input", usage)
    val pages = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .parquet(inDir)
    val q = KeywordWindow.fromPages(pages,
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
