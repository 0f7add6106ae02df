package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sinks.Sinks
import graft.sources.CdcEnvelope

/** Deployable CDC → lakehouse dimension table: the [[DimApp]] flow with a
  * MERGE table instead of a routed changelog store. Where DimApp persists
  * the upsert LOG (readers resolve point-in-time rows via
  * `Sinks.upsertView`), this job maintains the RESOLVED table on disk —
  * one row per key, updates merged copy-on-write, CDC deletes applied —
  * so any engine that reads parquet sees current dims with no resolve
  * step. The reference's Phoenix-upsert DIM layer
  * (…/app/dim/DimSinkApp.java:39-117) is exactly this contract (HBase
  * resolves upserts internally); [[graft.operators.Merge]] is the
  * plain-parquet equivalent.
  *
  * Partitioning: `pmod(xxhash64(pk), buckets)` — key-derived, therefore
  * STABLE per key (Merge's contract), and it spreads the rewrite so one
  * micro-batch touches only the buckets its keys hash to. Within-batch
  * ordering is (ts, op): a key's last change by source timestamp wins,
  * ties broken by op name so replays stay deterministic.
  */
object DimLakehouseApp {

  val usage = "graft.apps.DimLakehouseApp --source file|kafka --input <dir> " +
    "[--brokers <csv> --topics <csv>] --table <src-table> --pk <col> " +
    "--columns <csv> --buckets <n> --out <table-dir> --checkpoint <dir> " +
    "[--trigger available-now|'<interval>']"

  /** Source-agnostic body (specs feed a MemoryStream frame). */
  def run(spark: SparkSession, raw: DataFrame, table: String, pk: String,
          columns: Seq[String], buckets: Int, outDir: String,
          checkpointDir: String, trigger: Trigger): StreamingQuery = {
    require(columns.contains(pk), s"--columns must include the pk '$pk'")
    require(buckets >= 1, s"--buckets must be >= 1, got $buckets")
    val (clean, _) = CdcEnvelope.parse(raw, "value")
    val rows = CdcEnvelope.etlFilter(clean)
      .filter(col("table") === table)
      .select(Seq(col("ts"), col("type").as("op")) ++
        columns.map(c => col("data")(c).as(c)): _*)
      .withColumn("bucket", pmod(xxhash64(col(pk)), lit(buckets)).cast("int"))
    Sinks.mergeSink(rows, outDir, pk, "bucket",
      Seq(col("ts"), col("op")), checkpointDir, trigger,
      deleteWhen = Some(col("op") === "delete"),
      transientCols = Seq("op"))
  }

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-dim-lakehouse", conf)
    val q = run(spark, AppEnv.source(spark, conf, usage),
      AppEnv.get(conf, "table", usage), AppEnv.get(conf, "pk", usage),
      AppEnv.get(conf, "columns", usage).split(",").map(_.trim).toSeq,
      AppEnv.get(conf, "buckets", usage).toInt,
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      AppEnv.trigger(conf))
    AppEnv.await(spark, conf, Seq(q))
  }
}
