package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LogSplit
import graft.pipelines.KeywordWindow
import graft.sinks.Sinks

/** Per-window top-k over a streaming aggregate: rank inside foreachBatch.
  * Append mode finalizes all of a window's keyword rows in one micro-batch,
  * so per-batch ranking is per-window complete — the streaming-legal form
  * of the rank-over-aggregate the batch path runs directly.
  */
class KeywordTopKSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def search(mid: String, tsSec: Long, item: String) =
    s"""{"common":{"ar":"1","ch":"web","is_new":"0","mid":"$mid","uid":"u","vc":"v"},
       |"page":{"during_time":1,"page_id":"good_list","last_page_id":"search",
       |"item_type":"keyword","item":"$item"},"ts":${tsSec * 1000}}"""
      .stripMargin.replace("\n", "")

  test("batch: topKeywords ranks within each window with total tie-break") {
    val lines = Seq(
      search("m1", 101, "spark spark flink"),
      search("m2", 103, "spark duck duck goose"),
      search("m3", 115, "solo"))
    val (clean, _) = LogSplit.parse(lines.toDF("value"), "value")
    val top = KeywordWindow.topKeywords(KeywordWindow(clean), 2)
      .select($"stt".cast("long"), $"keyword", $"keyword_count", $"rank")
      .as[(Long, String, Long, Int)].collect().sortBy(r => (r._1, r._4))
    assert(top.toSeq == Seq(
      (100L, "spark", 3L, 1), (100L, "duck", 2L, 2), // flink/goose cut at k=2
      (110L, "solo", 1L, 1)))
  }

  test("streaming: foreachBatch ranking emits per-window top-k as windows finalize") {
    implicit val sqlCtx = spark.sqlContext
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int)]()
    val ckpt = java.nio.file.Files.createTempDirectory("topk-ckpt").toString
    val in = MemoryStream[String]
    val (clean, _) = LogSplit.parse(in.toDF().toDF("value"), "value")
    in.addData(
      search("m1", 101, "spark spark flink"),
      search("m2", 103, "spark duck duck goose"),
      search("mz", 200, "later"),  // advances the watermark past window 100-110
      search("mz", 210, "later"))
    val q = Sinks.foreachBatchSink(KeywordWindow(clean), ckpt, Trigger.AvailableNow(),
      outputMode = "append") { // only finalized windows reach the ranker
      (batch, _) =>
        KeywordWindow.topKeywords(batch.toDF(), 2)
          .select(col("stt").cast("long"), col("keyword"), col("rank"))
          .collect().foreach(r => seen.add((r.getLong(0), r.getString(1), r.getInt(2))))
    }
    q.awaitTermination(60000)
    val got = seen.toArray(Array.empty[(Long, String, Int)]).toSet
    assert(got.contains((100L, "spark", 1)) && got.contains((100L, "duck", 2)),
      s"got $got")
    assert(!got.exists(r => r._1 == 100L && (r._2 == "flink" || r._2 == "goose")),
      s"k=2 cut violated: $got")
  }
}
