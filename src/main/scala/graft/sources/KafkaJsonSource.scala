package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka source builders (SURVEY.md §2.1 S1/S2).
  *
  * Reference: …/utils/KafkaUtil.java:26-51 (DataStream consumer) and
  * :74-82 (SQL DDL). Here: one builder returning the raw value stream and
  * one applying a JSON schema — everything downstream (CdcEnvelope,
  * LogSplit, pipelines) consumes the same `value` column these produce, so
  * swapping the container-testable `MemoryStream`/file sources for a real
  * broker is a one-line change at the edge.
  *
  * No broker ships in this container, so these builders are exercised
  * end-to-end through their MemoryStream twins in the specs.
  */
object KafkaJsonSource {

  /** S1: topic -> streaming DataFrame with a string `value` column. */
  def raw(spark: SparkSession, servers: String, topics: String,
          startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
        "topic", "timestamp")

  /** S2: declarative JSON table over a topic. */
  def json(spark: SparkSession, servers: String, topics: String,
           schema: org.apache.spark.sql.types.StructType,
           startingOffsets: String = "latest"): DataFrame =
    raw(spark, servers, topics, startingOffsets)
      .withColumn("j", from_json(col("value"), schema))
      .select(col("topic"), col("timestamp"), col("j.*"))
}
