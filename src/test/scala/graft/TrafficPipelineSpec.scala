package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LogSplit
import graft.pipelines.TrafficPageViewWindow

class TrafficPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // ts in millis; base 100s to stay clear of the epoch watermark floor
  private def page(mid: String, tsSec: Long, lastPage: Option[String],
                   vc: String = "v2", isNew: String = "1", dur: Long = 1000) = {
    val lp = lastPage.map(p => s""""last_page_id":"$p",""").getOrElse("")
    s"""{"common":{"ar":"110000","ch":"web","is_new":"$isNew","mid":"$mid","uid":"u","vc":"$vc"},
       |"page":{"during_time":$dur,${lp}"page_id":"home"},"ts":${tsSec * 1000}}""".stripMargin.replace("\n", "")
  }

  test("batch: uv flagged once per mid per day, sv on session entry, windowed sums") {
    val lines = Seq(
      page("m1", 101, None),            // uv=1 sv=1
      page("m1", 103, Some("home")),    // uv=0 sv=0
      page("m2", 105, None),            // uv=1 sv=1
      page("m1", 115, None),            // next window; same day: uv=0, sv=1
      page("m1", 86500, None))          // next day -> uv=1 again
    val (clean, _) = LogSplit.parse(lines.toDF("value"), "value")
    val out = TrafficPageViewWindow(spark, clean)
      .select($"stt".cast("long"), $"uv_ct", $"sv_ct", $"pv_ct").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (100L, 2L, 2L, 3L),   // m1(uv)+m2(uv), two entries, three views
      (110L, 0L, 1L, 1L),   // m1 again same day: no uv, entry sv
      (86500L, 1L, 1L, 1L))) // day rollover: uv back
  }

  test("streaming: same pipeline over MemoryStream emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val (clean, _) = LogSplit.parse(in.toDF().toDF("value"), "value")
    val q = TrafficPageViewWindow(spark, clean)
      .select($"stt".cast("long").as("stt"), $"uv_ct", $"pv_ct")
      .writeStream.format("memory").queryName("traffic").outputMode("append").start()
    try {
      in.addData(page("m1", 101, None), page("m1", 103, Some("home")),
        page("m2", 105, None))
      q.processAllAvailable()
      in.addData(page("mz", 200, None)) // advance watermark past window 100-110
      q.processAllAvailable()
      in.addData(page("mz", 210, Some("home"))) // nudge (2 stateful ops chained)
      q.processAllAvailable()
      in.addData(page("mz", 220, Some("home")))
      q.processAllAvailable()
      val rows = spark.table("traffic").as[(Long, Long, Long)].collect().toSet
      assert(rows.contains((100L, 2L, 3L)))
    } finally q.stop()
  }
}
