package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scalar/aggregate function families (SURVEY.md §2.10 + Catalyst-native
  * beyond-reference coverage): exact percentiles, string ops, array ops,
  * date/time ops — each pinned to a DuckDB oracle.
  */
object FunctionQueries {
  import Queries.Q

  private def t(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.Tpch(s, dir)

  /** Exact interpolated percentiles (verified bit-identical to DuckDB's
    * quantile_cont on this data).
    */
  val q43_percentiles: Q = (s, dir) =>
    t(s, dir).events
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 6).as("p25"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"))

  /** String function family over part names. */
  val q44_string_funcs: Q = (s, dir) =>
    t(s, dir).part
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix"),
        length(col("p_name")).as("len"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        concat_ws("-", col("p_type"), col("p_brand")).as("type_brand"))

  /** Array function family over document tokens. */
  val q45_array_funcs: Q = (s, dir) =>
    t(s, dir).documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n"),
        array_join(slice(col("toks"), 1, 3), ",").as("first3"),
        array_contains(col("toks"), "spark").cast("int").as("has_spark"),
        array_join(array_sort(array_distinct(col("toks"))), ",").as("sorted_uniq"),
        element_at(col("toks"), -1).as("last_tok"))

  /** Date/time family: extraction, arithmetic, truncation. Day-of-week is
    * normalized to ISO (1=Mon..7=Sun) — Spark's dayofweek is 1=Sun,
    * DuckDB's dow is 0=Sun.
    */
  val q46_date_funcs: Q = (s, dir) =>
    t(s, dir).orders
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        (pmod(dayofweek(col("o_orderdate")) + 5, lit(7)) + 1).as("iso_dow"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate")).as("days_to_98end"))

  /** Correlated scalar subquery — Catalyst decorrelates to an aggregate +
    * join (SURVEY.md §4 "subquery decorrelation: inherited"). Decimal math
    * keeps the threshold comparison engine-exact.
    */
  val q47_correlated_subquery: Q = (s, dir) => {
    t(s, dir).orders.createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o.o_orderpriority, count(*) AS big_spenders
        |FROM orders_v o
        |WHERE CAST(o.o_totalprice AS DECIMAL(18,6)) >
        |  (SELECT 1.5 * avg(CAST(o2.o_totalprice AS DECIMAL(18,6)))
        |   FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY 1""".stripMargin)
  }

  def all: Map[String, Q] = Map(
    "q47_correlated_subquery" -> q47_correlated_subquery,
    "q43_percentiles" -> q43_percentiles,
    "q44_string_funcs" -> q44_string_funcs,
    "q45_array_funcs" -> q45_array_funcs,
    "q46_date_funcs" -> q46_date_funcs)

  def oracles: Map[String, String] = Map(
    "q47_correlated_subquery" ->
      """SELECT o.o_orderpriority, count(*) AS big_spenders
        |FROM orders o
        |WHERE CAST(o.o_totalprice AS DECIMAL(18,6)) >
        |  (SELECT 1.5 * avg(CAST(o2.o_totalprice AS DECIMAL(18,6)))
        |   FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY 1""".stripMargin,
    "q43_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90
        |FROM events GROUP BY 1""".stripMargin,
    "q44_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  substring(p_name, 1, 5) AS prefix,
        |  length(p_name) AS len,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  lpad(p_partkey::VARCHAR, 8, '0') AS padded,
        |  concat_ws('-', p_type, p_brand) AS type_brand
        |FROM part""".stripMargin,
    "q45_array_funcs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n,
        |  array_to_string(toks[1:3], ',') AS first3,
        |  (list_contains(toks, 'spark'))::INT AS has_spark,
        |  array_to_string(list_sort(list_distinct(toks)), ',') AS sorted_uniq,
        |  toks[-1] AS last_tok
        |FROM d""".stripMargin,
    "q46_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate)::INT AS y,
        |  month(o_orderdate)::INT AS m,
        |  isodow(o_orderdate)::INT AS iso_dow,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  datediff('day', o_orderdate, DATE '1998-12-31')::INT AS days_to_98end
        |FROM orders""".stripMargin)
}
