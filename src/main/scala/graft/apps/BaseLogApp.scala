package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.LogSplit

/** Deployable twin of the reference's first DWD job
  * (…/app/dwd/log/BaseLogApp.java:42-287): behavior-log stream → parse with
  * dirty side-output → 5-way split (err/start/page/display/action) → one
  * sink per branch.
  *
  * Each branch is its own streaming query with its own checkpoint subdir —
  * the Spark analogue of the reference's five sink topics: branches commit
  * and recover independently, and a slow branch doesn't back-pressure the
  * rest. All six share one source definition; the file/kafka source replays
  * per query (offsets tracked per checkpoint), which trades one extra scan
  * per branch for per-branch recovery — the same trade the reference makes
  * by writing five topics from one job.
  */
object BaseLogApp {

  val usage = "graft.apps.BaseLogApp --source file|kafka --input <dir> " +
    "[--brokers <csv> --topics <csv>] --out <dir> --checkpoint <dir> " +
    "[--trigger available-now|'<interval>']"

  /** Source-agnostic body: raw `value` lines → six parquet-dir sinks.
    * Returns the started queries (dirty, err, start, page, display, action).
    */
  def run(spark: SparkSession, raw: DataFrame, outDir: String,
          checkpointDir: String, trigger: Trigger): Seq[StreamingQuery] = {
    val (clean, dirty) = LogSplit.parse(raw, "value")

    def sink(df: DataFrame, branch: String): StreamingQuery =
      df.writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", s"$outDir/$branch")
        .option("checkpointLocation", s"$checkpointDir/$branch")
        .trigger(trigger)
        .start()

    sink(dirty, "dirty") +: LogSplit.split(clean).toSeq.sortBy(_._1)
      .map { case (branch, df) => sink(df, branch) }
  }

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-base-log", conf)
    val queries = run(spark, AppEnv.source(spark, conf, usage),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
