package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DimRouter
import graft.sinks.Sinks
import graft.sources.CdcEnvelope

class AqeDimRouteSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("AQE coalesces over-provisioned shuffle partitions at runtime") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val df = spark.range(1000).select(($"id" % 5).as("k"))
      .repartition(32)
      .groupBy($"k").agg(count(lit(1)).as("n"))
    df.collect()
    // after execution the adaptive plan shows the coalesced shuffle read
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"expected AQE to coalesce tiny shuffle partitions:\n${plan.take(1500)}")
  }

  test("streaming DIM routing: foreachBatch writes per-dim-table directories") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("dim-route").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dim-ckpt").toString
    val config = Seq(
      ("user_info", "dim_user_info", "id,name"),
      ("sku_info", "dim_sku_info", "id,price")).toDF("source_table", "sink_table", "sink_columns")
    val in = MemoryStream[String]
    val (clean, _) = CdcEnvelope.parse(in.toDF().toDF("value"), "value")
    val routed = DimRouter.route(CdcEnvelope.etlFilter(clean), config)
    val q = Sinks.foreachBatchSink(routed, ckpt, Trigger.AvailableNow()) { (batch, _) =>
      if (!batch.isEmpty) DimRouter.writeRouted(batch.toDF(), outDir)
    }
    in.addData(
      """{"database":"gmall","table":"user_info","type":"insert","data":{"id":"1","name":"n","email":"e"},"ts":1}""",
      """{"database":"gmall","table":"sku_info","type":"insert","data":{"id":"2","price":"9.5","junk":"x"},"ts":2}""",
      """{"database":"gmall","table":"untracked","type":"insert","data":{"id":"3"},"ts":3}""")
    q.awaitTermination(30000)
    val dims = spark.read.parquet(outDir)
    assert(dims.select($"sink_table").distinct().as[String].collect().toSet ==
      Set("dim_user_info", "dim_sku_info"))
    // pruning applied: email/junk removed
    val keys = dims.select(map_keys($"data")).as[Seq[String]].collect().flatten.toSet
    assert(keys == Set("id", "name", "price"))
  }
}
