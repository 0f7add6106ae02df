package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The query registry: name -> (spark, sfDir) => DataFrame, plus the DuckDB
  * oracle SQL for each. Grouped by SURVEY.md §2 section. Kept in one file so
  * the pairing (Spark plan ⟷ oracle SQL) is reviewable side by side.
  *
  * Conventions for oracle parity (driver sorts columns by name, hashes
  * values): every computed column is aliased identically on both sides;
  * double aggregates are `round(_, 2)`; timestamps are emitted as epoch
  * seconds (bigint) or formatted strings, never raw timestamps.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String) = Tables.Tpch(s, dir)

  // ————— §2.6 A1-A4/A7: grouped aggregation (the flagship) —————
  // Reference semantics: multi-measure sums per dim tuple,
  // …/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:225-275
  val q1_agg: Q = (s, dir) =>
    t(s, dir).lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("cnt"))

  def all: Map[String, Q] = Map(
    "q1_agg" -> q1_agg
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2""".stripMargin
  )
}
