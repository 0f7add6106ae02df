package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.{DwdFacts, UserWindows}
import graft.sources.CdcEnvelope

class DwdUserSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def env(table: String, tpe: String, ts: Long,
                  data: Seq[(String, String)], old: Seq[(String, String)] = Nil) = {
    def m(kv: Seq[(String, String)]) =
      kv.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val o = if (old.isEmpty) "" else s""","old":${m(old)}"""
    s"""{"database":"gmall","table":"$table","type":"$tpe","data":${m(data)}$o,"ts":$ts}"""
  }

  test("DwdFacts: all 15 defs extract; predicates gate status transitions") {
    val lines = Seq(
      env("cart_info", "insert", 1, Seq("id" -> "c1", "user_id" -> "u", "sku_id" -> "s",
        "sku_num" -> "2", "source_type" -> "2401")),
      env("cart_info", "update", 2, Seq("id" -> "c1", "user_id" -> "u", "sku_id" -> "s",
        "sku_num" -> "5", "source_type" -> "2401"), Seq("sku_num" -> "2")),
      env("cart_info", "update", 3, Seq("id" -> "c1", "user_id" -> "u", "sku_id" -> "s",
        "sku_num" -> "1", "source_type" -> "2401"), Seq("sku_num" -> "5")), // shrink: dropped
      env("order_info", "update", 4, Seq("id" -> "o1", "user_id" -> "u",
        "province_id" -> "p", "order_status" -> "1003", "operate_time" -> "x"),
        Seq("order_status" -> "1002")),
      env("order_info", "update", 5, Seq("id" -> "o2", "user_id" -> "u",
        "province_id" -> "p", "order_status" -> "1004"), Seq("order_status" -> "1003")),
      env("payment_info", "update", 6, Seq("id" -> "pay1", "order_id" -> "o1",
        "user_id" -> "u", "payment_type" -> "1101", "payment_status" -> "1602",
        "callback_time" -> "y"), Seq("payment_status" -> "1601")),
      env("coupon_use", "update", 7, Seq("id" -> "cu1", "coupon_id" -> "q",
        "user_id" -> "u", "using_time" -> "z"), Seq("using_time" -> "")))
    val (clean, _) = CdcEnvelope.parse(lines.toDF("value"), "value")
    val facts = DwdFacts.extractAll(clean)
    assert(facts.size == 15)
    // cart_add: insert + growing update, shrink excluded; deltas 2 and 3
    val cart = facts("cart_add").select($"delta").as[Double].collect().sorted
    assert(cart.toSeq == Seq(2.0, 3.0))
    // cancel: only the ->1003 transition
    assert(facts("cancel_detail").select($"id").as[String].collect().toSeq == Seq("o1"))
    // payment success only on ->1602
    assert(facts("payment_info").count() == 1)
    // coupon order fires when using_time changed
    assert(facts("coupon_order").count() == 1)
    // untouched tables extract empty, not error
    assert(facts("favor_add").count() == 0)
  }

  test("UserLoginWindow: uu per day, back-flow after >7-day gap") {
    val day = 86400L
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val logins = Seq(
      UserWindows.Login("u1", ts(100)),          // uu=1 (first ever)
      UserWindows.Login("u1", ts(200)),          // same day: uu=0
      UserWindows.Login("u1", ts(9 * day + 100)),  // 9-day gap: uu=1 back=1
      UserWindows.Login("u2", ts(100)),          // uu=1
      UserWindows.Login("u2", ts(day + 100)))    // next day: uu=1, gap 1 -> back=0
      .toDS()
    val out = UserWindows.loginWindow(spark, logins)
      .select($"stt".cast("long"), $"uu_ct", $"back_ct")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (100L, 2L, 0L), (200L, 0L, 0L), // same-day login windows with 0 flags
      (day + 100, 1L, 0L), (9 * day + 100, 1L, 1L)))
  }

  test("CartAddUuWindow implements the unfinished app's documented intent") {
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val adds = Seq(
      UserWindows.Login("u1", ts(101)), UserWindows.Login("u1", ts(105)),
      UserWindows.Login("u2", ts(107)))
      .toDS()
    val out = UserWindows.cartAddUuWindow(spark, adds)
      .select($"stt".cast("long"), $"cart_add_uu_ct").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((100L, 2L))) // u1 counted once per day
  }
}
