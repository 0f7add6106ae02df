package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Batch oracle twins of the round-2 DWS window pipelines (DwsWindows,
  * TrafficPageViewWindow.homeDetailUvWindow): the streaming forms are
  * spec-tested with MemoryStream; these express the SAME flag/window
  * semantics over the `events` table so the DuckDB gate can hash-check
  * them at sf0.01.
  *
  * Determinism: per-user flags order by (day, event_id) — event_id is
  * unique, and ordering by raw `ts` would tie-break differently across
  * engines (events.ts is ns-precision; Spark truncates to micros).
  * One shuffle for the flags window, one for the aggregate.
  */
object DwsQueries {
  import Queries.Q

  private def t(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.Tpch(s, dir)

  /** Per-user daily-first (uu) and first-ever (nu) flags — the
    * DwsTradeOrderWindow state pattern, batch form.
    */
  private def flagged(e: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"), col("event_id"))
    val prevDay = lag(col("day"), 1).over(w)
    e.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("uu",
        when(prevDay.isNull || prevDay =!= col("day"), 1L).otherwise(0L))
      .withColumn("nu", when(row_number().over(w) === 1, 1L).otherwise(0L))
  }

  /** DwsTradeOrderWindow twin: 10 s windows of order-uu / new-user counts
    * plus the money measure (q57).
    */
  val q57_order_uu_window: Q = (s, dir) =>
    flagged(t(s, dir).events)
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(sum(col("uu")).as("uu_ct"), sum(col("nu")).as("new_user_ct"),
        Queries.dsum(col("value")).as("amount_sum"))
      .select(col("window.start").cast("long").as("window_start"),
        col("uu_ct"), col("new_user_ct"), col("amount_sum"))

  /** DwsTradePaymentSucWindow twin: filter to the "payment" event class,
    * per-day pay-suc uu / first-ever counts (q58).
    */
  val q58_payment_uu: Q = (s, dir) =>
    flagged(t(s, dir).events.filter(col("event_type") === "purchase"))
      .groupBy(col("day"))
      .agg(sum(col("uu")).as("pay_suc_uu_ct"), sum(col("nu")).as("pay_suc_new_ct"),
        Queries.dsum(col("value")).as("pay_amount_sum"))

  /** DwsTrafficPageViewWindow twin: two INDEPENDENT daily-uv states per
    * user (view ~ home, click ~ good_detail), daily sums (q59).
    */
  val q59_home_detail_uv: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("day"), col("event_id"))
    t(s, dir).events
      .filter(col("event_type").isin("view", "click"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("first_of_day",
        when(lag(col("day"), 1).over(w).isNull ||
          lag(col("day"), 1).over(w) =!= col("day"), 1L).otherwise(0L))
      .groupBy(col("day"))
      .agg(
        sum(when(col("event_type") === "view", col("first_of_day")).otherwise(0L))
          .as("view_uv_ct"),
        sum(when(col("event_type") === "click", col("first_of_day")).otherwise(0L))
          .as("click_uv_ct"))
  }

  /** DwsUserUserRegisterWindow twin: a user's first-ever event is their
    * "registration"; count registrations per 10 s window (q60).
    */
  val q60_register_window: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"), col("event_id"))
    t(s, dir).events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("register_ct"))
      .select(col("window.start").cast("long").as("window_start"), col("register_ct"))
  }

  def all: Map[String, Q] = Map(
    "q57_order_uu_window" -> q57_order_uu_window,
    "q58_payment_uu" -> q58_payment_uu,
    "q59_home_detail_uv" -> q59_home_detail_uv,
    "q60_register_window" -> q60_register_window)

  private val flagsCte =
    """f AS (
      |  SELECT *, strftime(ts, '%Y-%m-%d') AS day FROM events
      |), g AS (
      |  SELECT user_id, ts, event_id, value, day,
      |    CASE WHEN lag(day) OVER w IS NULL OR lag(day) OVER w <> day
      |         THEN 1 ELSE 0 END AS uu,
      |    CASE WHEN row_number() OVER w = 1 THEN 1 ELSE 0 END AS nu
      |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY day, event_id)
      |)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q57_order_uu_window" ->
      s"""WITH $flagsCte
         |SELECT (floor(epoch(ts) / 10) * 10)::BIGINT AS window_start,
         |  sum(uu)::BIGINT AS uu_ct, sum(nu)::BIGINT AS new_user_ct,
         |  (round(sum(value::DECIMAL(18,6)), 2))::DOUBLE AS amount_sum
         |FROM g GROUP BY 1""".stripMargin,
    "q58_payment_uu" ->
      s"""WITH f AS (
         |  SELECT *, strftime(ts, '%Y-%m-%d') AS day FROM events
         |  WHERE event_type = 'purchase'
         |), g AS (
         |  SELECT user_id, value, day,
         |    CASE WHEN lag(day) OVER w IS NULL OR lag(day) OVER w <> day
         |         THEN 1 ELSE 0 END AS uu,
         |    CASE WHEN row_number() OVER w = 1 THEN 1 ELSE 0 END AS nu
         |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY day, event_id)
         |)
         |SELECT day, sum(uu)::BIGINT AS pay_suc_uu_ct,
         |  sum(nu)::BIGINT AS pay_suc_new_ct,
         |  (round(sum(value::DECIMAL(18,6)), 2))::DOUBLE AS pay_amount_sum
         |FROM g GROUP BY 1""".stripMargin,
    "q59_home_detail_uv" ->
      """WITH f AS (
        |  SELECT *, strftime(ts, '%Y-%m-%d') AS day FROM events
        |  WHERE event_type IN ('view', 'click')
        |), g AS (
        |  SELECT event_type, day,
        |    CASE WHEN lag(day) OVER w IS NULL OR lag(day) OVER w <> day
        |         THEN 1 ELSE 0 END AS first_of_day
        |  FROM f WINDOW w AS (PARTITION BY user_id, event_type ORDER BY day, event_id)
        |)
        |SELECT day,
        |  sum(CASE WHEN event_type = 'view' THEN first_of_day ELSE 0 END)::BIGINT AS view_uv_ct,
        |  sum(CASE WHEN event_type = 'click' THEN first_of_day ELSE 0 END)::BIGINT AS click_uv_ct
        |FROM g GROUP BY 1""".stripMargin,
    "q60_register_window" ->
      """WITH f AS (
        |  SELECT *, strftime(ts, '%Y-%m-%d') AS day FROM events
        |), g AS (
        |  SELECT ts, row_number() OVER (PARTITION BY user_id ORDER BY day, event_id) AS rn
        |  FROM f
        |)
        |SELECT (floor(epoch(ts) / 10) * 10)::BIGINT AS window_start,
        |  count(*) AS register_ct
        |FROM g WHERE rn = 1 GROUP BY 1""".stripMargin)
}
