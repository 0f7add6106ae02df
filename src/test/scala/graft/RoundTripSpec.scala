package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.OrderPreProcess
import graft.sinks.Sinks
import graft.sources.CdcEnvelope

/** The reference's DWD convention end to end: pipeline output → keyed JSON
  * topic frame (upsert-kafka producer side) → parse back → last-write-wins
  * materialization (consumer side). What a downstream DWS app would read.
  */
class RoundTripSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("DWD emit/consume round trip: kafkaFrame -> parse -> upsertView") {
    val lines = Seq(
      """{"database":"gmall","table":"order_info","type":"insert","data":{"id":"o1","user_id":"u1","province_id":"p1","order_status":"1001"},"ts":100}""",
      """{"database":"gmall","table":"order_detail","type":"insert","data":{"id":"d1","order_id":"o1","sku_id":"s1","sku_name":"w","sku_num":"2","order_price":"10.00","source_type":"2401","create_time":"t"},"ts":101}""")
    val dict = Seq(("2401", "user order")).toDF("dic_code", "dic_name")
    val (clean, _) = CdcEnvelope.parse(lines.toDF("value"), "value")
    val wide = OrderPreProcess(clean, dict)
      .select($"id", $"order_id", $"user_id", $"sku_num", $"source_type_name",
        $"ts")

    // producer side: keyed topic frame
    val frame = Sinks.kafkaFrame(wide, Seq("id"))
    assert(frame.columns.toSeq == Seq("key", "value"))

    // simulate a replayed duplicate with a later ts (at-least-once delivery)
    val replay = Sinks.kafkaFrame(
      wide.withColumn("ts", $"ts" + 5).withColumn("user_id", lit("u1-updated")),
      Seq("id"))
    val topic = frame.unionByName(replay)

    // consumer side: parse value, apply last-write-wins by key
    val valueSchema = StructType.fromDDL(
      "order_id STRING, user_id STRING, sku_num STRING, source_type_name STRING, ts BIGINT")
    val parsed = topic.select($"key", from_json($"value", valueSchema).as("v"))
      .select($"key", $"v.*")
    val materialized = Sinks.upsertView(parsed, Seq("key"), "ts", "user_id")
      .select($"key", $"user_id", $"ts")
    val row = materialized.as[(String, String, Long)].collect()
    assert(row.toSeq == Seq(("d1", "u1-updated", 106L))) // latest write won
  }
}
