package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.DimRouter
import graft.sinks.Sinks
import graft.sources.CdcEnvelope

/** Deployable twin of the reference's DIM job
  * (…/app/dim/DimSinkApp.java:39-117): CDC envelope stream → parse +
  * bootstrap filter → config-table routing (broadcast join) → per-dim-table
  * upsert store.
  *
  * The config table (source_table, sink_table, sink_columns) is re-read
  * from `--config` every micro-batch — a stream-static join, so config
  * edits apply to subsequent batches exactly like the reference's
  * broadcast-state updates. The store is the routed changelog
  * (`DimRouter.writeRouted`, partitioned by sink_table); readers get
  * point-in-time dims via `Sinks.upsertView` by `pk` — the engine's
  * Phoenix-upsert replacement.
  */
object DimApp {

  val usage = "graft.apps.DimApp --source file|kafka --input <dir> " +
    "[--brokers <csv> --topics <csv>] --config <table> --out <dir> " +
    "--checkpoint <dir> [--trigger available-now|'<interval>']"

  /** Source-agnostic body. `config` is a thunk so each micro-batch sees
    * current config (pass `() => fixedDf` for a static config in specs).
    * Returns (dim store query, dirty side-output query).
    */
  def run(spark: SparkSession, raw: DataFrame, config: () => DataFrame,
          outDir: String, checkpointDir: String,
          trigger: Trigger): Seq[StreamingQuery] = {
    val (clean, dirty) = CdcEnvelope.parse(raw, "value")
    val filtered = CdcEnvelope.etlFilter(clean)

    val dimStore = Sinks.foreachBatchSink(filtered, s"$checkpointDir/dims",
      trigger, outputMode = "append") { (batch, _) =>
      DimRouter.writeRouted(DimRouter.route(batch, config()), s"$outDir/dims")
    }

    val dirtyQ = dirty.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", s"$outDir/dirty")
      .option("checkpointLocation", s"$checkpointDir/dirty")
      .trigger(trigger)
      .start()

    Seq(dimStore, dirtyQ)
  }

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-dim", conf)
    val configPath = AppEnv.get(conf, "config", usage)
    val queries = run(spark, AppEnv.source(spark, conf, usage),
      () => AppEnv.readTable(spark, configPath),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
