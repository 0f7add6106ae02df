package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.{DwsWindows, TrafficPageViewWindow}
import graft.pipelines.DwsWindows.{OrderDetail, Payment}
import graft.sources.CdcEnvelope
import graft.pipelines.DwdFacts

/** The five DWS window apps composed in round 2 (order, payment-suc,
  * trademark/category refund, user-register, home/good_detail UV):
  * batch runs pin exact flag/sum semantics; streaming runs prove the
  * windows finalize under watermarks (nudge batches per chained stateful
  * op, see StreamingSpec header).
  */
class DwsWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)
  private val day = 86400L

  test("tradeOrderWindow batch: dedup, uu/new flags, amount sums") {
    val details = Seq(
      OrderDetail("d1", "u1", ts(101), 1.0, 0.5, 10.0),
      OrderDetail("d1", "u1", ts(101), 1.0, 0.5, 10.0),  // dup detail id -> dropped
      OrderDetail("d2", "u1", ts(103), 0.0, 0.0, 5.0),   // same user same day: uu=0 nu=0
      OrderDetail("d3", "u2", ts(105), 2.0, 0.0, 7.0),   // new user
      OrderDetail("d4", "u1", ts(day + 101), 0.0, 0.0, 3.0)) // next day: uu=1 nu=0
      .toDS()
    val out = DwsWindows.tradeOrderWindow(spark, details)
      .select($"stt".cast("long"), $"order_unique_user_ct", $"order_new_user_ct",
        $"order_activity_reduce_amount".cast("double"),
        $"order_origin_total_amount".cast("double"))
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (100L, 2L, 2L, 3.0, 22.0),      // u1 first-ever + u2 first-ever
      (day + 100L, 1L, 0L, 0.0, 3.0))) // u1 next day: uu only
  }

  test("paymentSucWindow batch: uu/new flags per paying user") {
    val pays = Seq(
      Payment("p1", "u1", ts(101)),
      Payment("p2", "u1", ts(105)),        // same day: no flags
      Payment("p3", "u2", ts(107)),
      Payment("p4", "u1", ts(day + 50))).toDS()
    val out = DwsWindows.paymentSucWindow(spark, pays)
      .select($"stt".cast("long"), $"payment_suc_unique_user_ct",
        $"payment_suc_new_user_ct")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((100L, 2L, 2L), (day + 50L, 1L, 0L)))
  }

  test("refundWindow: 5-hop dim chain from CDC refund facts, windowed per tm/category/user") {
    def env(ts: Long, data: (String, String)*) = {
      val d = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
      s"""{"database":"gmall","table":"order_refund_info","type":"insert","data":{$d},"ts":$ts}"""
    }
    val lines = Seq(
      env(101, "id" -> "r1", "user_id" -> "u1", "order_id" -> "o1", "sku_id" -> "s1",
        "refund_type" -> "1501", "refund_num" -> "1", "refund_amount" -> "10.0"),
      env(103, "id" -> "r2", "user_id" -> "u1", "order_id" -> "o2", "sku_id" -> "s1",
        "refund_type" -> "1501", "refund_num" -> "2", "refund_amount" -> "4.0"),
      env(105, "id" -> "r3", "user_id" -> "u2", "order_id" -> "o3", "sku_id" -> "s2",
        "refund_type" -> "1501", "refund_num" -> "1", "refund_amount" -> "8.0"))
    val (clean, _) = CdcEnvelope.parse(lines.toDF("value"), "value")
    val refunds = DwdFacts.extract(CdcEnvelope.etlFilter(clean), DwdFacts.defs.find(_.name == "order_refund").get)
      .withColumn("eventTime", timestamp_seconds(col("ts")))
      .withColumn("refund_amount", col("refund_amount").cast("double"))
    val sku = Seq(("s1", "tm1", "c3a"), ("s2", "tm2", "c3b")).toDF("id", "tm_id", "category3_id")
    val tm = Seq(("tm1", "Acme"), ("tm2", "Globex")).toDF("id", "tm_name")
    val c3 = Seq(("c3a", "phones", "c2a"), ("c3b", "laptops", "c2a")).toDF("id", "name", "category2_id")
    val c2 = Seq(("c2a", "electronics", "c1a")).toDF("id", "name", "category1_id")
    val c1 = Seq(("c1a", "goods")).toDF("id", "name")
    val out = DwsWindows.refundWindow(refunds, sku, tm, c3, c2, c1)
      .select($"stt".cast("long"), $"tm_name", $"category3_name",
        $"category2_name", $"category1_name", $"user_id",
        $"refund_ct", $"refund_amount_sum".cast("double"))
      .as[(Long, String, String, String, String, String, Long, Double)]
      .collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      (100L, "Acme", "phones", "electronics", "goods", "u1", 2L, 14.0),
      (100L, "Globex", "laptops", "electronics", "goods", "u2", 1L, 8.0)))
  }

  test("refundWindow plan: 5 broadcast hops, no shuffle besides dedup+window") {
    val refunds = Seq(("r1", "u1", "s1", 10.0, ts(101)))
      .toDF("id", "user_id", "sku_id", "refund_amount", "eventTime")
    val sku = Seq(("s1", "tm1", "c3a")).toDF("id", "tm_id", "category3_id")
    val tm = Seq(("tm1", "Acme")).toDF("id", "tm_name")
    val c3 = Seq(("c3a", "phones", "c2a")).toDF("id", "name", "category2_id")
    val c2 = Seq(("c2a", "electronics", "c1a")).toDF("id", "name", "category1_id")
    val c1 = Seq(("c1a", "goods")).toDF("id", "name")
    val plan = DwsWindows.refundWindow(refunds, sku, tm, c3, c2, c1)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 5,
      s"expected 5 broadcast dim hops:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dim hop fell back to SMJ:\n$plan")
  }

  test("userRegisterWindow streaming: per-window register counts finalize") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val (clean, _) = CdcEnvelope.parse(in.toDF().toDF("value"), "value")
    val regs = DwdFacts.extract(CdcEnvelope.etlFilter(clean),
        DwdFacts.defs.find(_.name == "user_register").get)
      .withColumn("eventTime", timestamp_seconds(col("ts")))
    val q = DwsWindows.userRegisterWindow(regs, "eventTime")
      .select($"stt".cast("long").as("stt"), $"register_ct")
      .writeStream.format("memory").queryName("regs").outputMode("append").start()
    def reg(id: String, t: Long) =
      s"""{"database":"gmall","table":"user_info","type":"insert","data":{"id":"$id","create_time":"2022-02-02 10:00:00"},"ts":$t}"""
    try {
      in.addData(reg("u1", 101), reg("u2", 103), reg("u3", 112))
      q.processAllAvailable()
      in.addData(reg("uz", 200)) // watermark past both windows
      q.processAllAvailable()
      in.addData(reg("uz2", 210)) // nudge
      q.processAllAvailable()
      val rows = spark.table("regs").as[(Long, Long)].collect().toSet
      assert(rows.contains((100L, 2L)) && rows.contains((110L, 1L)))
    } finally q.stop()
  }

  test("homeDetailUvWindow: two per-mid states; only flagged rows counted") {
    val pages = Seq(
      ("m1", "home", ts(101)),         // home uv
      ("m1", "home", ts(103)),         // same day: nothing
      ("m1", "good_detail", ts(105)),  // detail uv (independent state)
      ("m2", "cart", ts(106)),         // filtered page id
      ("m2", "good_detail", ts(107)),  // detail uv
      ("m1", "home", ts(day + 101)))   // next day: home uv again
      .toDS()
    val out = TrafficPageViewWindow.homeDetailUvWindow(spark, pages)
      .select($"stt".cast("long"), $"home_uv_ct", $"good_detail_uv_ct")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((100L, 1L, 2L), (day + 100L, 1L, 0L)))
  }

  test("homeDetailUvWindow streaming: finalized windows from two-date keyed state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, Timestamp)]
    val q = TrafficPageViewWindow.homeDetailUvWindow(spark, in.toDS())
      .select($"stt".cast("long").as("stt"), $"home_uv_ct", $"good_detail_uv_ct")
      .writeStream.format("memory").queryName("hduv").outputMode("append").start()
    try {
      in.addData(("m1", "home", ts(101)), ("m1", "home", ts(103)),
        ("m1", "good_detail", ts(105)), ("m2", "good_detail", ts(107)))
      q.processAllAvailable()
      (1 to 3).foreach { i =>
        in.addData(("mz", "home", ts(300 + i * 10)))
        q.processAllAvailable()
      }
      val rows = spark.table("hduv").as[(Long, Long, Long)].collect().toSet
      assert(rows.contains((100L, 1L, 2L)), s"got $rows")
    } finally q.stop()
  }

  test("tradeOrderWindow streaming: flags + window finalize through 3 chained stateful ops") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[OrderDetail]
    val q = DwsWindows.tradeOrderWindow(spark, in.toDS())
      .select($"stt".cast("long").as("stt"), $"order_unique_user_ct",
        $"order_new_user_ct")
      .writeStream.format("memory").queryName("orderw").outputMode("append").start()
    try {
      in.addData(
        OrderDetail("d1", "u1", ts(101), 0, 0, 1.0),
        OrderDetail("d1", "u1", ts(101), 0, 0, 1.0), // dup id
        OrderDetail("d2", "u2", ts(104), 0, 0, 2.0))
      q.processAllAvailable()
      // 3 chained stateful ops: watermark advances one op per batch
      (1 to 4).foreach { i =>
        in.addData(OrderDetail(s"z$i", "uz", ts(300 + i * 10), 0, 0, 0.0))
        q.processAllAvailable()
      }
      val rows = spark.table("orderw").as[(Long, Long, Long)].collect().toSet
      assert(rows.contains((100L, 2L, 2L)), s"got $rows")
    } finally q.stop()
  }

  test("full order path streaming: OrderPreProcess -> tradeOrderWindow (6 stateful ops)") {
    // the reference's actual topology: DwdTradeOrderPreProcess writes the
    // wide detail topic that DwsTradeOrderWindow consumes; here both run
    // as ONE streaming query — 3 interval joins + dedup + flags + window
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dict = Seq(("2401", "user order")).toDF("dic_code", "dic_name")
    val in = MemoryStream[String]
    val (clean, _) = CdcEnvelope.parse(in.toDF().toDF("value"), "value")
    val wide = graft.pipelines.OrderPreProcess(clean, dict)
    val details = wide.select(
      col("id").cast("string").as("id"),
      col("user_id").cast("string").as("userId"),
      col("eventTime").as("ts"),
      lit(0.0).as("activityAmount"), lit(0.0).as("couponAmount"),
      col("split_total_amount").cast("double").as("originalAmount"))
      .as[DwsWindows.OrderDetail]
    // wide already carries the source-leaf watermark; bypass the re-declare
    // in tradeOrderWindow by feeding it the watermarked stream directly
    val q = DwsWindows.tradeOrderWindow(spark, details)
      .select(col("stt").cast("long").as("stt"),
        col("order_unique_user_ct"), col("order_new_user_ct"),
        col("order_origin_total_amount").cast("double"))
      .writeStream.format("memory").queryName("orderchain").outputMode("append").start()
    def env2(table: String, ts: Long, data: (String, String)*) = {
      val d = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
      s"""{"database":"gmall","table":"$table","type":"insert","data":{$d},"ts":$ts}"""
    }
    try {
      in.addData(
        env2("order_info", 100, "id" -> "o1", "user_id" -> "u1",
          "province_id" -> "p1", "order_status" -> "1001"),
        env2("order_detail", 101, "id" -> "d1", "order_id" -> "o1", "sku_id" -> "s1",
          "sku_name" -> "w", "sku_num" -> "2", "order_price" -> "10.00",
          "source_type" -> "2401", "create_time" -> "t"),
        env2("order_detail", 103, "id" -> "d2", "order_id" -> "o1", "sku_id" -> "s2",
          "sku_name" -> "w", "sku_num" -> "1", "order_price" -> "4.00",
          "source_type" -> "2401", "create_time" -> "t"))
      q.processAllAvailable()
      for (i <- 1 to 10) {
        // the global watermark is min across ALL four envelope legs — every
        // leg needs rows or it pins the min at epoch 0
        val t = 500000L + i
        in.addData(
          env2("order_info", t, "id" -> s"o$i", "user_id" -> "u",
            "province_id" -> "p1", "order_status" -> "1001"),
          env2("order_detail", t, "id" -> s"dn$i", "order_id" -> s"o$i",
            "sku_id" -> "s1", "sku_name" -> "z", "sku_num" -> "1",
            "order_price" -> "1.00", "source_type" -> "2401", "create_time" -> "t"),
          env2("order_detail_activity", t, "order_detail_id" -> s"dn$i",
            "activity_id" -> "a", "activity_rule_id" -> "r"),
          env2("order_detail_coupon", t, "order_detail_id" -> s"dn$i",
            "coupon_id" -> "c"))
        q.processAllAvailable()
      }
      val rows = spark.table("orderchain")
        .as[(Long, Long, Long, Double)].collect().toSet
      // window 100-110: u1's first-ever order (uu=1, nu=1), both details sum 24.00
      assert(rows.contains((100L, 1L, 1L, 24.00)), s"got $rows")
    } finally q.stop()
  }

  test("coupon_pay and user_register facts extract per reference filters") {
    val lines = Seq(
      """{"database":"gmall","table":"coupon_use","type":"update","data":{"id":"c1","coupon_id":"cp1","user_id":"u1","order_id":"o1","used_time":"2022-02-02 11:11:11"},"old":{"used_time":null},"ts":11}""",
      """{"database":"gmall","table":"coupon_use","type":"update","data":{"id":"c2","coupon_id":"cp2","user_id":"u2","order_id":"o2"},"old":{},"ts":12}""",
      """{"database":"gmall","table":"user_info","type":"insert","data":{"id":"u9","create_time":"2022-02-03 10:00:00"},"ts":13}""",
      """{"database":"gmall","table":"user_info","type":"update","data":{"id":"u9","create_time":"2022-02-03 10:00:00"},"old":{"name":"x"},"ts":14}""")
    val (clean, _) = CdcEnvelope.parse(lines.toDF("value"), "value")
    val env = CdcEnvelope.etlFilter(clean)
    val pays = DwdFacts.extract(env, DwdFacts.defs.find(_.name == "coupon_pay").get)
    assert(pays.select($"id", $"date_id").as[(String, String)].collect().toSeq ==
      Seq(("c1", "2022-02-02"))) // c2 lacks used_time -> filtered
    val regs = DwdFacts.extract(env, DwdFacts.defs.find(_.name == "user_register").get)
    assert(regs.select($"user_id", $"date_id").as[(String, String)].collect().toSeq ==
      Seq(("u9", "2022-02-03"))) // update row filtered (insert only)
  }

  test("comment fact dict join decodes appraise codes (broadcast, left outer)") {
    val lines = Seq(
      """{"database":"gmall","table":"comment_info","type":"insert","data":{"id":"m1","user_id":"u1","sku_id":"s1","appraise":"1201","comment_txt":"good"},"ts":21}""",
      """{"database":"gmall","table":"comment_info","type":"insert","data":{"id":"m2","user_id":"u2","sku_id":"s2","appraise":"9999","comment_txt":"?"},"ts":22}""")
    val dict = Seq(("1201", "praise"), ("1202", "mid")).toDF("dic_code", "dic_name")
    val (clean, _) = CdcEnvelope.parse(lines.toDF("value"), "value")
    val out = DwdFacts.commentWithDict(CdcEnvelope.etlFilter(clean), dict)
      .select($"id", $"appraise_name").as[(String, Option[String])].collect().toMap
    assert(out == Map("m1" -> Some("praise"), "m2" -> None)) // unknown code survives as null
  }
}
