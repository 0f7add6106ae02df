package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.LogSplit
import graft.streaming.StreamOps

/** Deployable twin of …/app/dwd/log/DwdTrafficUserJumpDetail.java: the CEP
  * bounce-detection job. Behavior-log stream → page branch → per-mid
  * pattern "session entry followed by another session entry, or by
  * nothing within the gap" → bounce rows parquet.
  *
  * The reference's CEP pattern + timeout side-output union
  * (:104-155) is one state machine here ([[StreamOps.jumpDetect]]): both
  * the matched and the timed-out bounce emit from the same keyed state.
  */
object DwdTrafficUserJumpApp {

  val usage = "graft.apps.DwdTrafficUserJumpApp --source file|kafka " +
    "--input <dir> [--brokers <csv> --topics <csv>] --out <dir> " +
    "--checkpoint <dir> [--gap-seconds 10] [--delay '5 seconds'] " +
    "[--trigger available-now|'<interval>']"

  /** Source-agnostic body: raw log lines → bounce (mid, ts) rows. */
  def run(spark: SparkSession, raw: DataFrame, outDir: String,
          checkpointDir: String, gapMs: Long, delay: String,
          trigger: Trigger): Seq[StreamingQuery] = {
    import spark.implicits._
    val (clean, _) = LogSplit.parse(raw, "value")
    val views = LogSplit.split(clean)("page")
      .select(col("common.mid").as("mid"),
        col("page.last_page_id").as("lastPageId"),
        timestamp_millis(col("ts")).as("ts"))
      .as[StreamOps.PageView]
    val bounces = StreamOps.jumpDetect(spark, views, delay, gapMs)
      .select(col("mid"), col("ts"))
    Seq(bounces.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start())
  }

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-dwd-user-jump", conf)
    val queries = run(spark, AppEnv.source(spark, conf, usage),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      conf.getOrElse("gap-seconds", "10").toLong * 1000,
      conf.getOrElse("delay", "5 seconds"), AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
