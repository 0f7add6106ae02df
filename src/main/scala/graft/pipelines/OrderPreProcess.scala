package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.CdcEnvelope
import graft.streaming.StreamJoins

/** The order pre-processing pipeline (SURVEY.md §3.2): the reference's
  * biggest FlinkSQL app, …/app/dwd/db/DwdTradeOrderPreProcess.java —
  * topic_db envelope → order_detail ⋈ order_info ⟕ detail_activity ⟕
  * detail_coupon ⋈ dict → wide fact row.
  *
  * Differences by design (SURVEY.md §7.4):
  *  - all stream-stream joins carry watermark + event-time bounds (the
  *    reference keeps join state forever);
  *  - the base_dic lookup join becomes a broadcast stream-static join (no
  *    per-record JDBC);
  *  - money math is DECIMAL(16,2), not string-typed doubles.
  *
  * Pure `(env, dict) => DataFrame`: runs unchanged over a batch envelope
  * table or a streaming `readStream` source (specs exercise both).
  */
object OrderPreProcess {

  val JoinRangeSeconds = 900L
  val WatermarkDelay = "5 seconds"

  /** One watermark per source leaf, under a stream-unique column name
    * (watermarks may not be redefined above stateful operators, and the
    * global watermark is min() across all of these).
    */
  private def withEventTime(df: DataFrame, tsName: String): DataFrame =
    StreamJoins.watermarked(
      df.withColumn(tsName, timestamp_seconds(col("ts"))), tsName, WatermarkDelay)

  def apply(env: DataFrame, dict: DataFrame): DataFrame = {
    val clean = CdcEnvelope.etlFilter(env)

    val od = withEventTime(CdcEnvelope.factExtract(clean, "order_detail",
      Seq("insert"),
      Seq("id", "order_id", "sku_id", "sku_name", "sku_num", "order_price",
        "source_type", "create_time")), "eventTime")
      .withColumn("split_total_amount",
        col("sku_num").cast(DecimalType(16, 2)) * col("order_price").cast(DecimalType(16, 2)))

    val oi = withEventTime(CdcEnvelope.factExtract(clean, "order_info",
      Seq("insert", "update"),
      Seq("id", "user_id", "province_id", "order_status")), "oi_eventTime")
      .withColumnRenamed("ts", "oi_ts")

    val act = withEventTime(CdcEnvelope.factExtract(clean, "order_detail_activity",
      Seq("insert"), Seq("order_detail_id", "activity_id", "activity_rule_id")),
      "act_eventTime")
      .withColumnRenamed("ts", "act_ts")

    val cou = withEventTime(CdcEnvelope.factExtract(clean, "order_detail_coupon",
      Seq("insert"), Seq("order_detail_id", "coupon_id")), "cou_eventTime")
      .withColumnRenamed("ts", "cou_ts")

    // J1: detail ⋈ header
    val base = StreamJoins.intervalJoin(
      od, oi, "eventTime", "oi_eventTime",
      od("order_id") === oi("id"), JoinRangeSeconds, "inner")
      .drop(oi("id")).drop("oi_eventTime", "oi_ts")

    // J2 ×2: optional activity / coupon
    val withAct = StreamJoins.intervalJoin(
      base, act, "eventTime", "act_eventTime",
      base("id") === act("order_detail_id"), JoinRangeSeconds, "left_outer")
      .drop("order_detail_id", "act_eventTime", "act_ts")

    val withCou = StreamJoins.intervalJoin(
      withAct, cou, "eventTime", "cou_eventTime",
      withAct("id") === cou("order_detail_id"), JoinRangeSeconds, "left_outer")
      .drop("order_detail_id", "cou_eventTime", "cou_ts")

    // J3: dict lookup — broadcast stream-static join
    val dic = broadcast(dict.select(
      col("dic_code"), col("dic_name").as("source_type_name")))
    withCou.join(dic, withCou("source_type") === dic("dic_code"), "left_outer")
      .drop("dic_code")
  }
}
