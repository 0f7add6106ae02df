package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Relational

/** Sink layer (SURVEY.md §2.2 K1-K5).
  *
  * The physical transports of the reference (transactional Kafka producer
  * …/utils/KafkaUtil.java:53-64, upsert-kafka …/utils/KafkaUtil.java:84-94,
  * ClickHouse JDBC batches …/utils/ClickHouseUtil.java:16-52) are external
  * services; what the ENGINE owns is the frame preparation, the changelog
  * convention, and the micro-batch delivery contract — all testable without
  * the services and all per-row/per-batch (no extra shuffles).
  *
  * Exactly-once: Spark checkpointing gives at-least-once delivery into
  * Kafka; end-to-end exactly-once is the keyed last-write-wins convention
  * below (replay rewrites the same keys), the same convention the
  * reference's downstream dedup (D1) already assumes.
  */
object Sinks {

  /** K1/K2 frame prep: (key, value) string columns — key from `keyCols`
    * (null key = unkeyed append topic), value = JSON of all other columns.
    * `tombstoneWhen` rows emit a null value (upsert-kafka DELETE).
    */
  def kafkaFrame(df: DataFrame, keyCols: Seq[String],
                 tombstoneWhen: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val payloadCols = df.columns.filterNot(keyCols.contains).map(col).toSeq
    val key =
      if (keyCols.isEmpty) lit(null).cast("string")
      else concat_ws("|", keyCols.map(col): _*)
    val value = tombstoneWhen match {
      case Some(cond) => when(cond, lit(null).cast("string"))
        .otherwise(to_json(struct(payloadCols: _*)))
      case None => to_json(struct(payloadCols: _*))
    }
    df.select(key.as("key"), value.as("value"))
  }

  /** K1/K2 writer config (not integration-testable here — no broker in the
    * container; the frame side is covered by SinksSpec).
    */
  def kafkaWriter(frame: DataFrame, servers: String, topic: String,
                  checkpoint: String): DataStreamWriter[Row] =
    frame.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** K2 consumer side: materialize an upsert changelog — last write per key
    * wins (by `orderCol`), null payloads (tombstones) delete the key. This
    * is the engine-side "read an upsert topic as a table" operation the
    * reference delegates to upsert-kafka connectors.
    *
    * `valueCol` doubles as the tie-breaker so the ordering is TOTAL: two
    * writes to one key at the same `orderCol` (same micro-batch, same
    * timestamp) deterministically keep the greater payload — without it
    * the survivor would depend on partition arrival order under replay
    * (latestByKey documents the totality requirement; null payloads sort
    * last under the descending order, so a tombstone never beats a
    * concurrent same-ts payload).
    */
  def upsertView(changelog: DataFrame, keys: Seq[String], orderCol: String,
                 valueCol: String): DataFrame =
    Relational.latestByKey(changelog, keys, Seq(col(orderCol), col(valueCol)))
      .filter(col(valueCol).isNotNull)

  /** K3: micro-batch delivery with a pluggable writer (JDBC/ClickHouse in
    * production — `(batchDf, batchId) => df.write.jdbc(...)`). The 5 s
    * batch interval of the reference maps to the trigger; batching itself
    * is the micro-batch. `outputMode`: "update" (default — upsert sinks
    * take provisional rows and last-write-wins) or "append" (only
    * watermark-finalized rows reach the writer — required when the writer
    * post-processes whole windows, e.g. per-window ranking).
    */
  def foreachBatchSink(df: DataFrame, checkpoint: String,
                       trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
                       outputMode: String = "update")(
      writer: (Dataset[Row], Long) => Unit): StreamingQuery =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch(writer)
      .start()

  /** K3's `@TransientSink` analogue: drop in-flight-only columns before the
    * sink (…/bean/TransientSink.java:8-11 skips marked bean fields).
    */
  def dropTransient(df: DataFrame, transientCols: Seq[String]): DataFrame =
    df.drop(transientCols: _*)

  /** K4 as a lakehouse table: continuous copy-on-write upsert. Each
    * micro-batch is resolved to ONE row per key (last write wins under
    * `orderCols` — which must give a TOTAL order per key, same requirement
    * as [[upsertView]]) and merged into the partitioned parquet table at
    * `path` ([[graft.operators.Merge]]; first batch bootstraps the table).
    *
    * This is the Spark-native form of the reference's Phoenix upsert sink
    * (…/app/dim/DimSinkApp.java routes dims into upserted HBase tables):
    * replaying a micro-batch rewrites the same keys with the same rows, so
    * at-least-once delivery composes to idempotent table state — the same
    * argument as the Kafka key-dedup convention, now for table storage.
    * Merge's stable-partition contract applies per key.
    *
    * `deleteWhen`: rows matching the predicate delete their key (the CDC
    * `op = delete` leg). The predicate is evaluated BEFORE `transientCols`
    * drop, so it may read an op-marker column that never reaches the
    * table; after the drop, the upsert columns must match the target
    * table's schema.
    */
  def mergeSink(df: DataFrame, path: String, keyCol: String, partCol: String,
                orderCols: Seq[org.apache.spark.sql.Column], checkpoint: String,
                trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
                deleteWhen: Option[org.apache.spark.sql.Column] = None,
                transientCols: Seq[String] = Nil): StreamingQuery =
    foreachBatchSink(df, checkpoint, trigger) { (batch, _) =>
      if (!batch.isEmpty) {
        val resolved = Relational.latestByKey(batch.toDF(), Seq(keyCol), orderCols)
        // NULL-safe split (Merge.splitChanges): a row whose deleteWhen
        // evaluates to NULL (null op marker) upserts instead of silently
        // vanishing from the merge
        val (ups0, dels0) = graft.operators.Merge.splitChanges(resolved, deleteWhen)
        val dels = dels0.select(col(keyCol), col(partCol))
        val ups = ups0.drop(transientCols: _*)
        graft.operators.Merge.applyChangesOrCreate(
          batch.sparkSession, path, ups, dels, keyCol, partCol)
      }
    }
}
