package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LogSplit
import graft.pipelines.KeywordWindow
import graft.streaming.StreamOps

class IsNewKeywordSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("repairIsNew: stale is_new=1 corrected, first-seen-0 primes state to yesterday") {
    val day = 86400L
    val views = Seq(
      ("A", "1", ts(100)),        // truly new -> 1, state=day0
      ("A", "1", ts(200)),        // same day -> stays 1
      ("A", "1", ts(day + 100)),  // claims new next day -> repaired to 0
      ("B", "0", ts(100)),        // old device, state primed to yesterday
      ("B", "1", ts(day + 100)))  // later lies -> 0 (state says yesterday)
      .toDS()
    val got = StreamOps.repairIsNew(spark, views).collect()
      .map { case (m, f, t) => (m, t.getTime / 1000, f) }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("A", 100L, "1"), ("A", 200L, "1"), ("A", day + 100, "0"),
      ("B", 100L, "0"), ("B", day + 100, "0")))
  }

  test("keyword pipeline: search filter, tokenize+explode, windowed counts") {
    def search(tsSec: Long, item: String) =
      s"""{"common":{"ar":"1","ch":"web","is_new":"0","mid":"m","uid":"u","vc":"v"},
         |"page":{"during_time":1,"item":"$item","item_type":"keyword","last_page_id":"search","page_id":"good_list"},
         |"ts":${tsSec * 1000}}""".stripMargin.replace("\n", "")
    def nonSearch(tsSec: Long) =
      s"""{"common":{"ar":"1","ch":"web","is_new":"0","mid":"m","uid":"u","vc":"v"},
         |"page":{"during_time":1,"page_id":"home"},"ts":${tsSec * 1000}}""".stripMargin.replace("\n", "")
    val lines = Seq(
      search(101, "apple phone case"), search(103, "apple watch"),
      nonSearch(105), search(111, "phone"))
    val (clean, _) = LogSplit.parse(lines.toDF("value"), "value")
    val out = KeywordWindow(clean)
      .select($"stt".cast("long"), $"keyword", $"keyword_count")
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set(
      (100L, "apple", 2L), (100L, "phone", 1L), (100L, "case", 1L),
      (100L, "watch", 1L), (110L, "phone", 1L)))
  }

  test("keyword pipeline streaming: finalized windows emit after watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def search(tsSec: Long, item: String) =
      s"""{"common":{"ar":"1","ch":"web","is_new":"0","mid":"m","uid":"u","vc":"v"},
         |"page":{"during_time":1,"item":"$item","item_type":"keyword","last_page_id":"search","page_id":"good_list"},
         |"ts":${tsSec * 1000}}""".stripMargin.replace("\n", "")
    val in = MemoryStream[String]
    val (clean, _) = LogSplit.parse(in.toDF().toDF("value"), "value")
    val q = KeywordWindow(clean)
      .select($"stt".cast("long").as("stt"), $"keyword", $"keyword_count")
      .writeStream.format("memory").queryName("kw").outputMode("append").start()
    try {
      in.addData(search(101, "apple phone"), search(103, "apple"))
      q.processAllAvailable()
      in.addData(search(200, "x")) // advance watermark past window [100,110)
      q.processAllAvailable()
      in.addData(search(210, "x"))
      q.processAllAvailable()
      val rows = spark.table("kw").as[(Long, String, Long)].collect().toSet
      assert(rows.contains((100L, "apple", 2L)))
      assert(rows.contains((100L, "phone", 1L)))
    } finally q.stop()
  }
}
