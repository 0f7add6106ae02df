package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.CdcEnvelope

/** Config-table-driven DIM routing (SURVEY.md §2.5 J5 + §2.2 K4).
  *
  * The reference broadcasts a `table_process` config stream (MySQL CDC of
  * `gmall_config`, …/app/dim/DimSinkApp.java:91-114) into a
  * BroadcastProcessFunction (…/app/func/MyBroadcastFunction.java:31-97)
  * that (a) keeps only source tables present in config, (b) prunes `data`
  * to the configured sink columns, (c) tags each record with its sink
  * table.
  *
  * Spark shape: the config is a small DataFrame; routing is a broadcast
  * inner join (map-side, no shuffle of the fact stream), pruning is
  * `map_filter` against the per-row config array. In streaming the same
  * function runs per micro-batch — a stream-static join where the static
  * side is re-read each trigger, which reproduces the reference's
  * "config updates apply to subsequent records" semantics.
  *
  * Config schema: (source_table, sink_table, sink_columns: comma-list).
  */
object DimRouter {

  /** Route + prune: returns the envelope rows that match config, with
    * `sink_table` attached, `data` pruned to the configured columns, and
    * `pk` (= source `data['id']`) extracted BEFORE pruning — a config whose
    * sink_columns omits `id` must still produce a usable upsert key, or the
    * read-side upsert (Sinks.upsertView keyed by pk) would collapse all of
    * that table's rows into one.
    */
  def route(env: DataFrame, config: DataFrame): DataFrame = {
    val cfg = broadcast(config.select(
      col("source_table"),
      col("sink_table"),
      split(col("sink_columns"), ",").as("keep_cols")))
    val joined = env.join(cfg, col("table") === col("source_table"), "inner")
      .withColumn("pk", col("data")("id"))
    CdcEnvelope.pruneData(joined, col("keep_cols"))
      .select(col("sink_table"), col("type"), col("data"), col("ts"), col("pk"))
  }

  /** Batch/`foreachBatch` writer: one directory per dim table (replaces
    * the reference's Phoenix upsert, …/app/func/MyPhoenixSink.java:9-28).
    * APPEND per micro-batch — overwrite would clobber earlier batches;
    * upsert semantics live on the read side (`Sinks.upsertView` by `pk`,
    * ordered by `ts`), the engine's changelog convention.
    * `partitionBy(sink_table)` gives one writer group per dim table — at
    * scale each dim is its own parquet/Delta table and this becomes a
    * MERGE; the routing plan is identical.
    */
  def writeRouted(routed: DataFrame, outDir: String): Unit =
    routed
      .write.mode("append")
      .partitionBy("sink_table")
      .parquet(outDir)
}
