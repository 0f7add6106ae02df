package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.{OrderPreProcess, TradeProvinceOrderWindow}
import graft.sources.CdcEnvelope

/** Composition test: OrderPreProcess (DWD) output feeds
  * TradeProvinceOrderWindow (DWS), like the reference's topic chain.
  */
class TradePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def env(table: String, ts: Long, data: (String, String)*) = {
    val d = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"database":"gmall","table":"$table","type":"insert","data":{$d},"ts":$ts}"""
  }

  test("DWD->DWS composition: dedup, windowed province aggregates, post-agg dim join") {
    val lines = Seq(
      env("order_info", 100, "id" -> "o1", "user_id" -> "u1",
        "province_id" -> "p1", "order_status" -> "1001"),
      env("order_info", 101, "id" -> "o2", "user_id" -> "u2",
        "province_id" -> "p1", "order_status" -> "1001"),
      env("order_detail", 101, "id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1",
        "sku_name" -> "w", "sku_num" -> "2", "order_price" -> "10.00",
        "source_type" -> "2401", "create_time" -> "t"),
      env("order_detail", 102, "id" -> "d2", "order_id" -> "o1", "sku_id" -> "s2",
        "sku_name" -> "w", "sku_num" -> "1", "order_price" -> "5.00",
        "source_type" -> "2401", "create_time" -> "t"),
      env("order_detail", 103, "id" -> "d3", "order_id" -> "o2", "sku_id" -> "s1",
        "sku_name" -> "w", "sku_num" -> "1", "order_price" -> "3.50",
        "source_type" -> "2401", "create_time" -> "t"),
      // duplicate of d1 (upstream retraction/replay) -> deduped
      env("order_detail", 103, "id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1",
        "sku_name" -> "w", "sku_num" -> "2", "order_price" -> "10.00",
        "source_type" -> "2401", "create_time" -> "t"),
      env("order_detail", 115, "id" -> "d4", "order_id" -> "o3", "sku_id" -> "s1",
        "sku_name" -> "w", "sku_num" -> "1", "order_price" -> "1.00",
        "source_type" -> "2401", "create_time" -> "t"),
      env("order_info", 114, "id" -> "o3", "user_id" -> "u3",
        "province_id" -> "p2", "order_status" -> "1001"))

    val dict = Seq(("2401", "user order")).toDF("dic_code", "dic_name")
    val provinces = Seq(("p1", "Beijing"), ("p2", "Shanghai")).toDF("id", "name")

    val (clean, _) = CdcEnvelope.parse(lines.toDF("value"), "value")
    val wide = OrderPreProcess(clean, dict)
    val out = TradeProvinceOrderWindow(wide, provinces)
      .select($"stt".cast("long"), $"province_name", $"order_ct", $"detail_ct",
        $"amount_sum".cast("double"))
      .as[(Long, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))

    assert(out.toSeq == Seq(
      (100L, "Beijing", 2L, 3L, 28.50),  // d1 deduped: 20.00+5.00+3.50
      (110L, "Shanghai", 1L, 1L, 1.00)))
  }

  test("streaming: dedup + window agg + post-agg stream-static join compose") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dict = Seq(("2401", "user order")).toDF("dic_code", "dic_name")
    val provinces = Seq(("p1", "Beijing")).toDF("id", "name")
    val in = MemoryStream[String]
    val (clean, _) = CdcEnvelope.parse(in.toDF().toDF("value"), "value")
    val q = TradeProvinceOrderWindow(OrderPreProcess(clean, dict), provinces)
      .select($"stt".cast("long").as("stt"), $"province_name", $"detail_ct")
      .writeStream.format("memory").queryName("prov").outputMode("append").start()
    try {
      def env2(table: String, ts: Long, data: (String, String)*) = {
        val d = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
        s"""{"database":"gmall","table":"$table","type":"insert","data":{$d},"ts":$ts}"""
      }
      in.addData(
        env2("order_info", 100, "id" -> "o1", "user_id" -> "u1",
          "province_id" -> "p1", "order_status" -> "1001"),
        env2("order_detail", 101, "id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1",
          "sku_name" -> "w", "sku_num" -> "2", "order_price" -> "10.00",
          "source_type" -> "2401", "create_time" -> "t"))
      q.processAllAvailable()
      // watermark food for all four envelope streams, several batches (the
      // join chain + dedup + window are 5 chained stateful operators)
      for (i <- 1 to 8) {
        val t = 500000L + i
        in.addData(
          env2("order_info", t, "id" -> s"o$i", "user_id" -> "u",
            "province_id" -> "p1", "order_status" -> "1001"),
          env2("order_detail", t, "id" -> s"dn$i", "order_id" -> s"o$i",
            "sku_id" -> "s", "sku_name" -> "z", "sku_num" -> "1",
            "order_price" -> "1.00", "source_type" -> "2401", "create_time" -> "t"),
          env2("order_detail_activity", t, "order_detail_id" -> s"dn$i",
            "activity_id" -> "a", "activity_rule_id" -> "r"),
          env2("order_detail_coupon", t, "order_detail_id" -> s"dn$i",
            "coupon_id" -> "c"))
        q.processAllAvailable()
      }
      val rows = spark.table("prov").as[(Long, String, Long)].collect().toSet
      assert(rows.contains((100L, "Beijing", 1L)))
    } finally q.stop()
  }
}
