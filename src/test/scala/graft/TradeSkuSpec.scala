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
}
