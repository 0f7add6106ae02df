package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.CdcEnvelope

/** Declarative registry of the reference's DWD fact extractions
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
      predicate = Some(col("old")("using_time").isNotNull)),
    // …/app/dwd/db/DwdToolCouponPay.java:54-66
    FactDef("coupon_pay", "coupon_use", Seq("update"),
      Seq("id", "coupon_id", "user_id", "order_id", "used_time"),
      predicate = Some(col("data")("used_time").isNotNull),
      extra = Seq("date_id" -> substring(col("data")("used_time"), 1, 10))),
    // …/app/dwd/db/DwdUserRegister.java:47-55
    FactDef("user_register", "user_info", Seq("insert"),
      Seq("create_time"),
      extra = Seq(
        "user_id" -> col("data")("id"),
        "date_id" -> substring(col("data")("create_time"), 1, 10))))

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

  /** All fact streams from one envelope frame (Catalyst reuses the scan). */
  def extractAll(env: DataFrame): Map[String, DataFrame] =
    defs.map(d => d.name -> extract(env, d)).toMap

  /** `base_dic` enrichment applied INSIDE fact extraction — the reference
    * dict-joins comment facts (…/app/dwd/db/DwdInteractionComment.java:83-86)
    * and refund facts (…/app/dwd/db/DwdTradeOrderRefund.java:129-134) at
    * extraction time. Broadcast stream-static left join: the fact stream
    * never shuffles; code stays alongside its decoded name.
    */
  def withDict(fact: DataFrame, dict: DataFrame,
               codeCol: String, nameCol: String): DataFrame = {
    val dic = broadcast(dict.select(col("dic_code"), col("dic_name").as(nameCol)))
    fact.join(dic, fact(codeCol) === dic("dic_code"), "left_outer")
      .drop("dic_code")
  }

  /** The comment fact with its appraise code decoded (DwdInteractionComment). */
  def commentWithDict(env: DataFrame, dict: DataFrame): DataFrame =
    withDict(extract(env, defs.find(_.name == "comment_info").get),
      dict, "appraise", "appraise_name")
}
