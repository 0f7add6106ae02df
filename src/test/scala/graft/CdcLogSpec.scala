package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DimRouter, LogSplit}
import graft.sources.CdcEnvelope

/** Fixtures mirror the reference's wire formats: Maxwell CDC envelopes
  * (…/app/dwd/db/DwdTradeOrderPreProcess.java:57-65) and the behavior-log
  * JSON documented at …/app/dwd/log/BaseLogApp.java:153-183.
  */
class CdcLogSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val cdcLines = Seq(
    """{"database":"gmall","table":"order_info","type":"insert","data":{"id":"1","order_status":"1001","total_amount":"120.50","user_id":"7"},"ts":1000}""",
    """{"database":"gmall","table":"order_info","type":"update","data":{"id":"1","order_status":"1003","total_amount":"120.50","user_id":"7"},"old":{"order_status":"1001"},"ts":1010}""",
    """{"database":"gmall","table":"order_info","type":"update","data":{"id":"1","order_status":"1003","total_amount":"99.00","user_id":"7"},"old":{"total_amount":"120.50"},"ts":1020}""",
    """{"database":"gmall","table":"cart_info","type":"insert","data":{"id":"5","sku_id":"11","sku_num":"2"},"ts":1001}""",
    """{"database":"gmall","table":"cart_info","type":"update","data":{"id":"5","sku_id":"11","sku_num":"6"},"old":{"sku_num":"2"},"ts":1002}""",
    """{"database":"gmall","table":"comment_info","type":"bootstrap-insert","data":{"id":"9","appraise":"1201"},"ts":1003}""",
    """{"database":"gmall","table":"x","type":"bootstrap-start","ts":1004}""",
    """not json at all""")

  lazy val (cdcClean, cdcDirty) = CdcEnvelope.parse(cdcLines.toDF("value"), "value")

  test("CDC parse routes corrupt rows to the dirty branch, keeps the rest") {
    assert(cdcDirty.as[String].collect().toSeq == Seq("not json at all"))
    assert(cdcClean.count() == 7)
  }

  test("etlFilter drops snapshot markers and normalizes bootstrap-insert") {
    val f = CdcEnvelope.etlFilter(cdcClean)
    assert(f.count() == 6) // bootstrap-start (no data) dropped
    assert(f.filter($"table" === "comment_info").select($"type").as[String].head() == "insert")
  }

  test("factExtract pulls typed columns for one table+type") {
    val rows = CdcEnvelope.factExtract(cdcClean, "order_info", Seq("insert"),
      Seq("id", "order_status", "total_amount"))
      .select($"id", $"order_status", $"total_amount").as[(String, String, String)].collect()
    assert(rows.toSeq == Seq(("1", "1001", "120.50")))
  }

  test("changedTo fires only on the transition record") {
    val cancels = cdcClean.filter(
      $"table" === "order_info" && CdcEnvelope.changedTo("order_status", "1003"))
    assert(cancels.select($"ts").as[Long].collect().toSeq == Seq(1010L))
  }

  test("upsertDelta: full value on insert, difference on update") {
    val deltas = cdcClean.filter($"table" === "cart_info")
      .select(CdcEnvelope.upsertDelta("sku_num").as("d")).as[Double].collect().sorted
    assert(deltas.toSeq == Seq(2.0, 4.0))
  }

  test("DimRouter routes by config and prunes data to sink columns") {
    val config = Seq(
      ("order_info", "dim_order_info", "id,order_status"),
      ("comment_info", "dim_comment_info", "id,appraise"))
      .toDF("source_table", "sink_table", "sink_columns")
    val routed = DimRouter.route(CdcEnvelope.etlFilter(cdcClean), config)
    assert(routed.filter($"sink_table" === "dim_comment_info").count() == 1)
    // pruning removed total_amount/user_id
    val keys = routed.filter($"sink_table" === "dim_order_info")
      .select(map_keys($"data")).as[Seq[String]].collect()
    assert(keys.forall(_.toSet == Set("id", "order_status")))
    // cart_info has no config row -> dropped
    assert(routed.count() == 4)
  }

  private val logLines = Seq(
    """{"common":{"ar":"110000","ch":"web","is_new":"1","mid":"mid_1","uid":"u1","vc":"v2"},"page":{"during_time":5000,"page_id":"home"},"displays":[{"display_type":"promo","item":"3","item_type":"sku_id","order":1,"pos_id":2},{"display_type":"query","item":"4","item_type":"sku_id","order":2,"pos_id":3}],"ts":2000}""",
    """{"common":{"ar":"110000","ch":"web","is_new":"0","mid":"mid_2","uid":"u2","vc":"v2"},"start":{"entry":"icon","loading_time":1200,"open_ad_id":5,"open_ad_ms":600,"open_ad_skip_ms":0},"ts":2001}""",
    """{"common":{"ar":"310000","ch":"app","is_new":"0","mid":"mid_3","uid":"u3","vc":"v3"},"page":{"during_time":800,"page_id":"good_detail","last_page_id":"home"},"err":{"error_code":"1","msg":"boom"},"actions":[{"action_id":"cart_add","item":"9","item_type":"sku_id","ts":2002}],"ts":2002}""",
    """{"broken""")

  test("LogSplit: 5-way routing with array fan-out, dirty branch separate") {
    val (clean, dirty) = LogSplit.parse(logLines.toDF("value"), "value")
    assert(dirty.count() == 1 && clean.count() == 3)
    val out = LogSplit.split(clean)
    assert(out("start").count() == 1)
    assert(out("err").count() == 1)
    assert(out("page").count() == 2) // start-only event is not a page view
    assert(out("display").count() == 2) // exploded
    val acts = out("action").select($"action.action_id").as[String].collect()
    assert(acts.toSeq == Seq("cart_add"))
  }
}
