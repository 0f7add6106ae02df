package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.TextFunctions
import graft.plans.GraftFunctions

class PolyHashSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("native expression equals the HOF reference on the real corpus") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val diff = docs.select(
      GraftFunctions.poly_hash($"text").as("native"),
      TextFunctions.polyHashHof($"text").as("hof"))
      .filter($"native" =!= $"hof")
    assert(diff.count() == 0)
  }

  test("known value, empty string, null, and non-ASCII codepoint path") {
    val df = Seq(Some("table"), Some(""), None, Some("héllo 中文"))
      .toDF("s")
      .select($"s", GraftFunctions.poly_hash($"s").as("h"),
        TextFunctions.polyHashHof($"s").as("hof"))
    val rows = df.collect()
    assert(rows(0).getLong(1) == 110115790L) // cross-checked against DuckDB
    assert(rows(1).getLong(1) == 0L)
    assert(rows(2).isNullAt(1))
    assert(rows(3).getLong(1) == rows(3).getLong(2)) // codepoint fallback == HOF
  }

  test("SQL registration: poly_hash callable from spark.sql") {
    GraftFunctions.register(spark)
    val v = spark.sql("SELECT poly_hash('table') AS h").as[Long].head()
    assert(v == 110115790L)
  }

  test("whole-stage codegen keeps the fingerprint scan in one generated stage") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val plan = docs.select(GraftFunctions.poly_hash($"text"))
      .queryExecution.executedPlan
    // `*(n)` prefixes in toString mark WholeStageCodegen subtrees
    assert(plan.toString.contains("*(1)"))
  }
}
