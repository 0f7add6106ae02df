package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LogSplit
import graft.sinks.Sinks

class MultiSinkLateDataSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("BaseLogApp shape: one stream, five routed sinks via one foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("multisink").toString
    val buffers = Map(
      "err" -> new java.util.concurrent.atomic.AtomicLong(),
      "start" -> new java.util.concurrent.atomic.AtomicLong(),
      "page" -> new java.util.concurrent.atomic.AtomicLong(),
      "display" -> new java.util.concurrent.atomic.AtomicLong(),
      "action" -> new java.util.concurrent.atomic.AtomicLong())
    val in = MemoryStream[String]
    val (clean, _) = LogSplit.parse(in.toDF().toDF("value"), "value")
    // data BEFORE start: AvailableNow snapshots what is available at launch
    in.addData(
      """{"common":{"ar":"1","ch":"web","is_new":"1","mid":"m1","uid":"u","vc":"v"},"page":{"during_time":5,"page_id":"home"},"displays":[{"display_type":"promo","item":"3","item_type":"sku_id","order":1,"pos_id":2}],"ts":1000}""",
      """{"common":{"ar":"1","ch":"web","is_new":"0","mid":"m2","uid":"u","vc":"v"},"start":{"entry":"icon","loading_time":1,"open_ad_id":1,"open_ad_ms":1,"open_ad_skip_ms":0},"ts":1001}""",
      """{"common":{"ar":"1","ch":"app","is_new":"0","mid":"m3","uid":"u","vc":"v"},"page":{"during_time":1,"page_id":"detail"},"err":{"error_code":"1","msg":"x"},"actions":[{"action_id":"fav","item":"9","item_type":"sku_id","ts":1002}],"ts":1002}""")
    // ONE streaming query; the split + 5 writes happen inside the batch
    // (the reference runs 5 Kafka producers off 5 side outputs of one job)
    val q = Sinks.foreachBatchSink(clean, ckpt, Trigger.AvailableNow()) { (batch, _) =>
      val routes = LogSplit.split(batch.toDF().cache())
      routes.foreach { case (name, df) => buffers(name).addAndGet(df.count()) }
    }
    q.awaitTermination(30000)
    assert(buffers("err").get() == 1)
    assert(buffers("start").get() == 1)
    assert(buffers("page").get() == 2)
    assert(buffers("display").get() == 1)
    assert(buffers("action").get() == 1)
  }

  test("T3 late data: within-watermark late rows update their window; beyond-watermark rows drop") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val in = MemoryStream[(Timestamp, String)]
    // update mode: window rows re-emit as late data arrives (allowedLateness)
    val q = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "30 seconds")
      .groupBy(window($"ts", "10 seconds"), $"k")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".cast("long").as("stt"), $"k", $"cnt")
      .writeStream.format("memory").queryName("late").outputMode("update").start()
    try {
      in.addData((ts(105), "a"))
      q.processAllAvailable()
      in.addData((ts(130), "z")) // watermark -> 100
      q.processAllAvailable()
      in.addData((ts(107), "a")) // late, but 107 >= watermark 100: accepted (update re-emits)
      q.processAllAvailable()
      in.addData((ts(300), "z")) // watermark -> 270
      q.processAllAvailable()
      in.addData((ts(108), "a")) // beyond the watermark now: dropped
      q.processAllAvailable()
      val aRows = spark.table("late").filter($"k" === "a")
        .select($"cnt").as[Long].collect()
      assert(aRows.max == 2) // the late update landed, the too-late one did not
    } finally q.stop()
  }
}
