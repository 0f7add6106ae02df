package graft.pipelines

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipelines.TradeSkuOrderWindow.DimHop
import graft.streaming.StreamOps

/** The remaining DWS window apps composed from the engine's operators
  * (SURVEY.md §3; round-1 verdict listed these five as un-composed):
  *
  *  - [[tradeOrderWindow]]    …/app/dws/DwsTradeOrderWindow.java:183-297
  *  - [[paymentSucWindow]]    …/app/dws/DwsTradePaymentSucWindow.java:108-283
  *  - [[refundWindow]]        …/app/dws/DwsTradeTrademarkCategoryUserRefundWindow.java
  *  - [[userRegisterWindow]]  …/app/dws/DwsUserUserRegisterWindow.java:93-132
  *  - homeDetailUvWindow (TrafficPageViewWindow.homeDetailUvWindow)
  *                            …/app/dws/DwsTrafficPageViewWindow.java:115-170
  *
  * Shared spine: dedup by the fact's unique id (watermark-bounded state)
  * → per-user daily-distinct / first-ever flags (keyed state, one shuffle
  * on user) → 10 s tumbling event-time window summing the 0/1 flags and
  * measures (one shuffle on window keys). That is exactly the reference's
  * keyBy(id) → keyBy(user_id) → windowAll chain, minus its windowAll
  * parallelism-1 bottleneck: Spark's window aggregation is a keyed
  * (partial-then-final) aggregate, so the "global" window scales with
  * executors instead of funneling every row through one operator instance.
  */
object DwsWindows {

  /** The flagger→window chains trip Spark's global-watermark correctness
    * check once the flaggers use `EventTimeTimeout`: the static analysis
    * assumes any event-time-timeout FlatMapGroupsWithState can emit rows
    * older than the watermark into the downstream window. This one cannot:
    * rows are emitted only for CURRENT-batch input events (which passed the
    * operator's late filter, so their timestamps are ≥ the previous
    * watermark) and the timeout branch emits nothing — it only drops state.
    * Spark's documented escape for exactly this known-safe shape is the
    * `checkCorrectness` toggle (error → logged warning), applied here at
    * the chain-composition points.
    *
    * SCOPE CAVEAT: the toggle is SESSION-GLOBAL and deliberately not
    * restored — the analysis runs at query START, so a set/restore around
    * construction would race any concurrently-started query. After a
    * flagged chain is built in a session, other multi-stateful-op queries
    * in that session get a logged warning instead of an analysis error;
    * compose unrelated risky topologies in their own session (cheap:
    * `spark.newSession()` shares the state but not the conf).
    */
  private[pipelines] def allowFlagWindowChain(spark: SparkSession): Unit =
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")

  /** Per-key (uu, firstEver) flags from keyed state, the
    * ValueState<lastDt> pattern shared by the order and payment apps:
    * uu=1 when the key's last-active date differs from this event's date,
    * newUser=1 only on the key's first-ever event (reference: lastOrderDt
    * == null, …/app/dws/DwsTradeOrderWindow.java:199-215). Every row is
    * emitted with its flags so measures ride along to the window.
    *
    * State is BOUNDED: `EventTimeTimeout` evicts a key's entry once the
    * watermark passes end-of-day(lastDate) — the reference's own 1-day UV
    * TTL (…/app/dwd/log/DwdTrafficUniqueVisitorDetail.java:94-99). For the
    * daily `uu` flag eviction is exact (the timeout conf also enables the
    * operator's late-row filter, so no event dated `lastDate` can arrive
    * after its state is gone; any later event is on a new date and flags
    * uu=1 like a fresh key would). The first-ever `nu` flag DOES lose
    * history on eviction: a returning key re-flags nu=1 unless primed via
    * `firstSeen` — a (key, lastKnownDate) bootstrap table loaded as initial
    * state, the compact-to-dim-table pattern a production run refreshes
    * periodically (state snapshot → dim table → initial state on restart).
    * Without a bootstrap, `nu` is exact only for keys idle < 1 day —
    * matching the reference, whose TTL'd UV state has the same horizon.
    * Note initial-state entries for keys that never re-appear carry no
    * timeout and persist — the bootstrap table's size, not the unbounded
    * key history, is the state bound.
    */
  def firstOfDayFlags[T](ds: Dataset[T], keyF: T => String,
                         tsF: T => java.sql.Timestamp,
                         zone: java.time.ZoneId = java.time.ZoneOffset.UTC,
                         firstSeen: Option[Dataset[(String, String)]] = None)
                        (implicit te: Encoder[T]): Dataset[(T, Int, Int)] = {
    implicit val outEnc: Encoder[(T, Int, Int)] =
      Encoders.tuple(te, Encoders.scalaInt, Encoders.scalaInt)
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val tupEnc: Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val func = (_: String, events: Iterator[T], state: GroupState[String]) =>
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val evs = events.toSeq
        if (evs.isEmpty) {
          // initial-state-only invocation: Spark calls the function once
          // per bootstrap key with an EMPTY event iterator at query start.
          // Leave the primed state WITHOUT a timeout — scheduling
          // end-of-day(bootstrapDate), a past timestamp, would evict the
          // very priming the bootstrap exists to provide on the next
          // watermark advance. These entries persist (the documented
          // bootstrap-table-size bound) until the key produces data.
          Iterator.empty
        } else {
          var lastDate = state.getOption.getOrElse("")
          val out = evs.sortBy(e => tsF(e).getTime).map { e =>
            val d = java.time.Instant.ofEpochMilli(tsF(e).getTime)
              .atZone(zone).toLocalDate.toString
            val isNew = if (lastDate.isEmpty) 1 else 0
            val uu = if (d != lastDate) 1 else 0
            if (d != lastDate) lastDate = d
            (e, uu, isNew)
          }
          state.update(lastDate)
          StreamOps.setEvictionAt(state, StreamOps.endOfDayMs(lastDate, zone))
          out.iterator
        }
      }
    val grouped = ds.groupByKey(keyF)(Encoders.STRING)
    firstSeen match {
      case Some(fs) =>
        grouped.flatMapGroupsWithState[String, (T, Int, Int)](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout(),
          fs.groupByKey(_._1).mapValues(_._2))(func)
      case None =>
        grouped.flatMapGroupsWithState[String, (T, Int, Int)](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(func)
    }
  }

  /** One order-detail row for the order window: unique detail id, the
    * ordering user, event time, and the three split amounts the reference
    * bean carries (TradeOrderBean).
    */
  case class OrderDetail(id: String, userId: String, ts: java.sql.Timestamp,
                         activityAmount: Double, couponAmount: Double,
                         originalAmount: Double)

  /** DwsTradeOrderWindow: order-detail stream → dedup by detail id →
    * per-user order uu/new flags → 10 s window summing flags + amounts.
    */
  def tradeOrderWindow(spark: SparkSession, details: Dataset[OrderDetail],
                       windowLen: String = "10 seconds",
                       delay: String = "5 seconds",
                       zone: java.time.ZoneId = java.time.ZoneOffset.UTC): DataFrame = {
    import spark.implicits._
    allowFlagWindowChain(spark)
    val deduped = dedupById(ensureEventTime(details, "ts", delay), "id")
    val flagged = firstOfDayFlags[OrderDetail](deduped, _.userId, _.ts, zone)
      .select(col("_1.ts").as("ts"),
        col("_2").as("uu"), col("_3").as("nu"),
        col("_1.activityAmount").as("act"),
        col("_1.couponAmount").as("cou"),
        col("_1.originalAmount").as("orig"))
    // flatMapGroupsWithState re-keys the schema, dropping the event-time
    // tag; re-declare it so the window agg below sees an event-time column
    // (the watermark VALUE still propagates from the source declaration)
    withEventTime(flagged, "ts", delay)
      .groupBy(window(col("ts"), windowLen))
      .agg(
        sum(col("uu")).as("order_unique_user_ct"),
        sum(col("nu")).as("order_new_user_ct"),
        sum(col("act")).as("order_activity_reduce_amount"),
        sum(col("cou")).as("order_coupon_reduce_amount"),
        sum(col("orig")).as("order_origin_total_amount"))
      .select(col("window.start").as("stt"), col("window.end").as("edt"),
        col("order_unique_user_ct"), col("order_new_user_ct"),
        col("order_activity_reduce_amount"), col("order_coupon_reduce_amount"),
        col("order_origin_total_amount"))
  }

  /** One successful-payment row (unique payment/detail id + paying user). */
  case class Payment(id: String, userId: String, ts: java.sql.Timestamp)

  /** DwsTradePaymentSucWindow: payment-success stream → dedup by id →
    * per-user pay-suc uu/new flags → 10 s window summing the flags.
    */
  def paymentSucWindow(spark: SparkSession, payments: Dataset[Payment],
                       windowLen: String = "10 seconds",
                       delay: String = "5 seconds",
                       zone: java.time.ZoneId = java.time.ZoneOffset.UTC): DataFrame = {
    import spark.implicits._
    allowFlagWindowChain(spark)
    val deduped = dedupById(ensureEventTime(payments, "ts", delay), "id")
    val flagged = firstOfDayFlags[Payment](deduped, _.userId, _.ts, zone)
      .select(col("_1.ts").as("ts"), col("_2").as("uu"), col("_3").as("nu"))
    withEventTime(flagged, "ts", delay)
      .groupBy(window(col("ts"), windowLen))
      .agg(
        sum(col("uu")).as("payment_suc_unique_user_ct"),
        sum(col("nu")).as("payment_suc_new_user_ct"))
      .select(col("window.start").as("stt"), col("window.end").as("edt"),
        col("payment_suc_unique_user_ct"), col("payment_suc_new_user_ct"))
  }

  /** DwsTradeTrademarkCategoryUserRefundWindow: refund-detail stream
    * (DwdFacts "order_refund") → dedup by refund id → 5-hop broadcast dim
    * chain sku → trademark + category3 → category2 → category1 → 10 s
    * window per (trademark, category tree, user) counting refunds and
    * summing refund_amount. The reference's five async Redis-cached
    * Phoenix lookups dissolve into broadcast stream-static joins; the only
    * shuffles are the dedup key and the window keys — the same two keyBy's
    * it pays.
    *
    * Dim schemas (reference DIM tables): sku(id, tm_id, category3_id),
    * trademark(id, tm_name), c3(id, name, category2_id),
    * c2(id, name, category1_id), c1(id, name).
    */
  def refundWindow(refunds: DataFrame, sku: DataFrame, trademark: DataFrame,
                   c3: DataFrame, c2: DataFrame, c1: DataFrame,
                   windowLen: String = "10 seconds"): DataFrame = {
    val hops = Seq(
      DimHop(sku.select(col("id").as("sku_dim_id"), col("tm_id"), col("category3_id")),
        "sku_id", "sku_dim_id", Seq("tm_id", "category3_id")),
      DimHop(trademark.select(col("id").as("tm_dim_id"), col("tm_name")),
        "tm_id", "tm_dim_id", Seq("tm_name")),
      DimHop(c3.select(col("id").as("c3_dim_id"), col("name").as("category3_name"),
        col("category2_id")), "category3_id", "c3_dim_id",
        Seq("category3_name", "category2_id")),
      DimHop(c2.select(col("id").as("c2_dim_id"), col("name").as("category2_name"),
        col("category1_id")), "category2_id", "c2_dim_id",
        Seq("category2_name", "category1_id")),
      DimHop(c1.select(col("id").as("c1_dim_id"), col("name").as("category1_name")),
        "category1_id", "c1_dim_id", Seq("category1_name")))
    TradeSkuOrderWindow.windowed(refunds, hops,
      groupCols = Seq("tm_id", "tm_name", "category1_id", "category1_name",
        "category2_id", "category2_name", "category3_id", "category3_name",
        "user_id"),
      sums = Map("refund_amount" -> "refund_amount_sum"),
      countName = "refund_ct", windowLen = windowLen)
  }

  /** DwsUserUserRegisterWindow: register stream (DwdFacts "user_register")
    * → 10 s window count. Stateless beyond the window — the reference app
    * is a plain windowAll count (:93-132).
    */
  def userRegisterWindow(registers: DataFrame, tsCol: String,
                         windowLen: String = "10 seconds",
                         delay: String = "5 seconds"): DataFrame =
    StreamOps.tumblingCounts(registers, tsCol, delay, windowLen, Nil)
      .withColumnRenamed("cnt", "register_ct")

  /** Streaming dedup must be the watermark-bounded form; batch runs of the
    * same pipeline (specs, backfills) get the plain one.
    */
  private def dedupById[T](ds: Dataset[T], idCol: String): Dataset[T] =
    if (ds.isStreaming) ds.dropDuplicatesWithinWatermark(idCol)
    else ds.dropDuplicates(idCol)

  /** Both delegate to the one shared watermark-declaration helper
    * (StreamOps.withEventTime): declare only when streaming AND the column
    * does not already carry an event-time tag — re-declaring above a
    * stateful operator is rejected ("Redefining watermark is disallowed").
    */
  private def withEventTime(df: DataFrame, tsCol: String, delay: String): DataFrame =
    StreamOps.withEventTime(df, tsCol, delay)

  private def ensureEventTime[T](ds: Dataset[T], tsCol: String, delay: String): Dataset[T] =
    StreamOps.withEventTime(ds, tsCol, delay)
}
