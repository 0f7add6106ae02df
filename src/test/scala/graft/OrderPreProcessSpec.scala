package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.OrderPreProcess
import graft.sources.CdcEnvelope

class OrderPreProcessSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def env(table: String, tpe: String, ts: Long, data: (String, String)*) = {
    val d = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"database":"gmall","table":"$table","type":"$tpe","data":{$d},"ts":$ts}"""
  }

  private val dict = Seq(("2401", "user order"), ("2402", "promo order"))
    .toDF("dic_code", "dic_name")

  private val lines = Seq(
    env("order_info", "insert", 1000, "id" -> "o1", "user_id" -> "u1",
      "province_id" -> "p1", "order_status" -> "1001"),
    env("order_detail", "insert", 1001, "id" -> "d1", "order_id" -> "o1",
      "sku_id" -> "s1", "sku_name" -> "widget", "sku_num" -> "2",
      "order_price" -> "10.50", "source_type" -> "2401", "create_time" -> "2022-01-01 00:00:01"),
    env("order_detail", "insert", 1002, "id" -> "d2", "order_id" -> "o1",
      "sku_id" -> "s2", "sku_name" -> "gadget", "sku_num" -> "1",
      "order_price" -> "5.00", "source_type" -> "2402", "create_time" -> "2022-01-01 00:00:02"),
    env("order_detail_activity", "insert", 1001, "order_detail_id" -> "d1",
      "activity_id" -> "a1", "activity_rule_id" -> "r1"),
    // detail with no matching header within the join range -> dropped (inner)
    env("order_detail", "insert", 99000, "id" -> "d9", "order_id" -> "o9",
      "sku_id" -> "s9", "sku_name" -> "x", "sku_num" -> "1",
      "order_price" -> "1.00", "source_type" -> "2401", "create_time" -> "2022-01-01 01:00:00"))

  test("batch: join shape, activity/coupon nulls, dict names, decimal money") {
    val (clean, _) = CdcEnvelope.parse(lines.toDF("value"), "value")
    val out = OrderPreProcess(clean, dict).cache()
    assert(out.count() == 2) // d9 has no header
    val d1 = out.filter($"id" === "d1").head()
    assert(d1.getAs[String]("activity_id") == "a1")
    assert(d1.getAs[String]("source_type_name") == "user order")
    assert(d1.getAs[java.math.BigDecimal]("split_total_amount")
      .compareTo(new java.math.BigDecimal("21.00")) == 0)
    val d2 = out.filter($"id" === "d2").head()
    assert(d2.getAs[String]("activity_id") == null) // left-outer preserved
    assert(d2.getAs[String]("source_type_name") == "promo order")
    out.unpersist()
  }

  test("streaming: same pipeline over MemoryStream, outer rows emit after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val (clean, _) = CdcEnvelope.parse(in.toDF().toDF("value"), "value")
    val q = OrderPreProcess(clean, dict)
      .select($"id", $"user_id", $"activity_id", $"source_type_name")
      .writeStream.format("memory").queryName("opp").outputMode("append").start()
    try {
      in.addData(lines.take(4): _*)
      q.processAllAvailable()
      // The global watermark is min() across ALL FOUR watermarked inputs
      // (od, oi, activity, coupon) — every table must see events or the
      // watermark stays at its epoch floor. It also propagates one
      // stateful operator per micro-batch (3-deep join chain), so nudge
      // all tables across several batches.
      for (i <- 1 to 6) {
        val t = 500000L + i
        in.addData(
          env("order_info", "insert", t, "id" -> s"o$i", "user_id" -> "u",
            "province_id" -> "p", "order_status" -> "1001"),
          env("order_detail", "insert", t, "id" -> s"dn$i", "order_id" -> s"o$i",
            "sku_id" -> "s", "sku_name" -> "z", "sku_num" -> "1",
            "order_price" -> "1.00", "source_type" -> "2401",
            "create_time" -> "2022-01-01 02:00:00"),
          env("order_detail_activity", "insert", t, "order_detail_id" -> s"dn$i",
            "activity_id" -> "a", "activity_rule_id" -> "r"),
          env("order_detail_coupon", "insert", t, "order_detail_id" -> s"dn$i",
            "coupon_id" -> "c"))
        q.processAllAvailable()
      }
      val rows = spark.table("opp").select($"id", $"activity_id", $"source_type_name")
        .as[(String, Option[String], String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(rows.contains("d1") && rows("d1") == ((Some("a1"), "user order")))
      assert(rows.contains("d2") && rows("d2") == ((None, "promo order")))
    } finally q.stop()
  }
}
