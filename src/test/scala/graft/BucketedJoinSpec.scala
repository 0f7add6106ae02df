package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale pattern: bucketed storage makes repeated big-big equi-joins
  * shuffle-free — both sides are pre-hash-partitioned on disk, so the
  * join's distribution requirement is already satisfied (SURVEY.md
  * "Minimize shuffles": co-locate joins via bucketing). At 100 TB this is
  * the difference between re-shuffling the fact table per query and never
  * shuffling it at all.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val orders = spark.read.parquet(s"${TestSession.sf}/orders.parquet")
    val lineitem = spark.read.parquet(s"${TestSession.sf}/lineitem.parquet")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("cnt"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // neither join input needs an exchange; only the final groupBy does
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join should not re-shuffle:\n$joinPart")
      // and it computes the right thing
      val viaParquet = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("cnt"))
      assert(joined.collect().toSet == viaParquet.collect().toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
