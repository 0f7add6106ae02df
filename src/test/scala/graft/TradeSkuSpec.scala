package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.{OrderPreProcess, TradeSkuOrderWindow}
import graft.pipelines.TradeSkuOrderWindow.DimHop
import graft.sources.CdcEnvelope

class TradeSkuSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def env(table: String, ts: Long, data: (String, String)*) = {
    val d = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"database":"gmall","table":"$table","type":"insert","data":{$d},"ts":$ts}"""
  }

  test("multi-hop broadcast dim chain after dedup, windowed per trademark/user") {
    val lines = Seq(
      env("order_info", 100, "id" -> "o1", "user_id" -> "u1",
        "province_id" -> "p1", "order_status" -> "1001"),
      env("order_detail", 101, "id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1",
        "sku_name" -> "w", "sku_num" -> "2", "order_price" -> "10.00",
        "source_type" -> "2401", "create_time" -> "t"),
      env("order_detail", 102, "id" -> "d2", "order_id" -> "o1", "sku_id" -> "s2",
        "sku_name" -> "w", "sku_num" -> "1", "order_price" -> "4.00",
        "source_type" -> "2401", "create_time" -> "t"))
    val dict = Seq(("2401", "user order")).toDF("dic_code", "dic_name")
    // 3-hop chain: sku -> spu -> trademark (same shape as the 6-hop chain)
    val skuDim = Seq(("s1", "sp1"), ("s2", "sp2")).toDF("sku_id_d", "spu_id")
    val spuDim = Seq(("sp1", "tm1"), ("sp2", "tm2")).toDF("spu_id_d", "tm_id")
    val tmDim = Seq(("tm1", "Acme"), ("tm2", "Globex")).toDF("tm_id_d", "tm_name")

    val (clean, _) = CdcEnvelope.parse(lines.toDF("value"), "value")
    val wide = OrderPreProcess(clean, dict)
    val out = TradeSkuOrderWindow(wide,
      Seq(
        DimHop(skuDim, "sku_id", "sku_id_d", Seq("spu_id")),
        DimHop(spuDim, "spu_id", "spu_id_d", Seq("tm_id")),
        DimHop(tmDim, "tm_id", "tm_id_d", Seq("tm_name"))),
      groupCols = Seq("tm_name", "user_id"))
      .select($"stt".cast("long"), $"tm_name", $"user_id",
        $"order_detail_ct", $"amount_sum".cast("double"))
      .as[(Long, String, String, Long, Double)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      (100L, "Acme", "u1", 1L, 20.00),
      (100L, "Globex", "u1", 1L, 4.00)))
  }

  test("streaming: OrderPreProcess -> dim hops -> sku window as ONE query finalizes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dict = Seq(("2401", "user order")).toDF("dic_code", "dic_name")
    val skuDim = Seq(("s1", "sp1")).toDF("sku_id_d", "spu_id")
    val spuDim = Seq(("sp1", "tm1")).toDF("spu_id_d", "tm_id")
    val tmDim = Seq(("tm1", "Acme")).toDF("tm_id_d", "tm_name")
    val in = MemoryStream[String]
    val (clean, _) = CdcEnvelope.parse(in.toDF().toDF("value"), "value")
    // the full DWD->DWS chain as ONE streaming query: 3 interval joins +
    // dedup + window agg = 5 chained stateful ops (broadcast dim hops are
    // stateless); watermark advances one stateful op per micro-batch
    val q = TradeSkuOrderWindow(OrderPreProcess(clean, dict),
      Seq(
        DimHop(skuDim, "sku_id", "sku_id_d", Seq("spu_id")),
        DimHop(spuDim, "spu_id", "spu_id_d", Seq("tm_id")),
        DimHop(tmDim, "tm_id", "tm_id_d", Seq("tm_name"))),
      groupCols = Seq("tm_name", "user_id"))
      .select($"stt".cast("long").as("stt"), $"tm_name", $"user_id",
        $"order_detail_ct", $"amount_sum".cast("double").as("amount"))
      .writeStream.format("memory").queryName("skuw").outputMode("append").start()
    try {
      in.addData(
        env("order_info", 100, "id" -> "o1", "user_id" -> "u1",
          "province_id" -> "p1", "order_status" -> "1001"),
        env("order_detail", 101, "id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1",
          "sku_name" -> "w", "sku_num" -> "2", "order_price" -> "10.00",
          "source_type" -> "2401", "create_time" -> "t"),
        // replay of d1 -> deduped inside the window stage
        env("order_detail", 102, "id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1",
          "sku_name" -> "w", "sku_num" -> "2", "order_price" -> "10.00",
          "source_type" -> "2401", "create_time" -> "t"))
      q.processAllAvailable()
      for (i <- 1 to 8) {
        val t = 500000L + i
        in.addData(
          env("order_info", t, "id" -> s"o$i", "user_id" -> "u",
            "province_id" -> "p1", "order_status" -> "1001"),
          env("order_detail", t, "id" -> s"dn$i", "order_id" -> s"o$i",
            "sku_id" -> "s1", "sku_name" -> "z", "sku_num" -> "1",
            "order_price" -> "1.00", "source_type" -> "2401", "create_time" -> "t"),
          env("order_detail_activity", t, "order_detail_id" -> s"dn$i",
            "activity_id" -> "a", "activity_rule_id" -> "r"),
          env("order_detail_coupon", t, "order_detail_id" -> s"dn$i",
            "coupon_id" -> "c"))
        q.processAllAvailable()
      }
      val rows = spark.table("skuw")
        .as[(Long, String, String, Long, Double)].collect().toSet
      assert(rows.contains((100L, "Acme", "u1", 1L, 20.00)), s"got $rows")
    } finally q.stop()
  }
}
