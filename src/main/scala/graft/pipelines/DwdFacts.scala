package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.CdcEnvelope

/** Declarative registry of the reference's 13 DWD fact extractions
  * (SURVEY.md §2.3 P4-P8; one row per `…/app/dwd/db` app). Each DWD
  * "app" is a parameterization of the same envelope operators: table
  * filter + type filter + column projection + optional change predicate +
  * optional computed columns. Keeping them as data makes the coverage
  * reviewable at a glance and the plans identical in batch and streaming.
  *
  * Status-filter notes: the reference comments OUT some status filters
  * (payment 1602, refund success — SURVEY.md §8); we implement the
  * documented intent and keep the filters.
  */
object DwdFacts {

  final case class FactDef(
      name: String,
      table: String,
      types: Seq[String],
      cols: Seq[String],
      predicate: Option[Column] = None,
      extra: Seq[(String, Column)] = Nil)

  /** …/app/dwd/db/ apps, in reference order. */
  val defs: Seq[FactDef] = Seq(
    FactDef("cart_add", "cart_info", Seq("insert", "update"),
      Seq("id", "user_id", "sku_id", "sku_num", "source_type"),
      // update counts only when sku_num grew (…/DwdTradeCartAdd.java:84-93)
      predicate = Some(col("type") === "insert" ||
        (col("old")("sku_num").isNotNull &&
          col("data")("sku_num").cast("long") > col("old")("sku_num").cast("long"))),
      extra = Seq("delta" -> CdcEnvelope.upsertDelta("sku_num"))),
    FactDef("order_detail", "order_detail", Seq("insert"),
      Seq("id", "order_id", "sku_id", "sku_num", "order_price", "source_type", "create_time")),
    FactDef("order_info", "order_info", Seq("insert", "update"),
      Seq("id", "user_id", "province_id", "order_status")),
    FactDef("order_detail_activity", "order_detail_activity", Seq("insert"),
      Seq("order_detail_id", "activity_id", "activity_rule_id")),
    FactDef("order_detail_coupon", "order_detail_coupon", Seq("insert"),
      Seq("order_detail_id", "coupon_id")),
    FactDef("cancel_detail", "order_info", Seq("update"),
      Seq("id", "user_id", "province_id", "operate_time"),
      predicate = Some(CdcEnvelope.changedTo("order_status", "1003"))),
    FactDef("payment_info", "payment_info", Seq("update"),
      Seq("id", "order_id", "user_id", "payment_type", "callback_time"),
      predicate = Some(CdcEnvelope.changedTo("payment_status", "1602"))),
    FactDef("order_refund", "order_refund_info", Seq("insert"),
      Seq("id", "user_id", "order_id", "sku_id", "refund_type", "refund_num", "refund_amount")),
    FactDef("refund_payment", "refund_payment", Seq("update"),
      Seq("id", "order_id", "sku_id", "payment_type", "total_amount", "callback_time"),
      predicate = Some(CdcEnvelope.changedTo("refund_status", "1602"))),
    FactDef("comment_info", "comment_info", Seq("insert"),
      Seq("id", "user_id", "sku_id", "appraise", "comment_txt")),
    FactDef("favor_add", "favor_info", Seq("insert"),
      Seq("id", "user_id", "sku_id")),
    FactDef("coupon_get", "coupon_use", Seq("insert"),
      Seq("id", "coupon_id", "user_id", "get_time")),
    // `old` arrives as a JSON STRING in this app (…/DwdToolCouponOrder.java:81)
    FactDef("coupon_order", "coupon_use", Seq("update"),
      Seq("id", "coupon_id", "user_id", "using_time"),
      predicate = Some(col("old")("using_time").isNotNull)))

  /** Extract one fact stream: table+type filter, change predicate, typed
    * projection + computed columns (evaluated while `type`/`old` are still
    * in scope).
    */
  def extract(env: DataFrame, d: FactDef): DataFrame = {
    val base = env.filter(col("table") === d.table && col("type").isin(d.types: _*))
    val filtered = d.predicate.fold(base)(p => base.filter(p))
    filtered.select(col("ts") +: d.cols.map(c => col("data")(c).as(c)) ++:
      d.extra.map { case (n, c) => c.as(n) }: _*)
  }

  /** All 13 streams from one envelope frame (Catalyst reuses the scan). */
  def extractAll(env: DataFrame): Map[String, DataFrame] =
    defs.map(d => d.name -> extract(env, d)).toMap
}
