package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps
import graft.streaming.StreamOps.PageView

/** Streaming-semantics tests with MemoryStream: watermark finalization,
  * keyed-state dedup, daily-distinct flags, CEP jump detection including
  * the timeout-only emission path (SURVEY.md §5 point 3).
  *
  * Event-time timeouts fire in the batch AFTER the watermark advances
  * (Spark computes batch N's watermark from batch N-1's max event time),
  * so tests push a late unrelated event and an extra nudge batch.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("tumblingCounts finalizes windows once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamOps.tumblingCounts(
      in.toDF().toDF("ts", "k"), "ts", "5 seconds", "10 seconds", Seq("k"))
      .writeStream.format("memory").queryName("tumbling").outputMode("append").start()
    try {
      in.addData((ts(1), "a"), (ts(3), "a"), (ts(11), "b"))
      q.processAllAvailable()
      in.addData((ts(40), "z")) // watermark -> 35s, finalizes both windows
      q.processAllAvailable()
      in.addData((ts(41), "z")) // nudge batch so finalized rows emit
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select($"k", $"cnt", $"stt".cast("long")).as[(String, Long, Long)]
        .collect().toSet
      assert(rows.contains(("a", 2L, 0L)))
      assert(rows.contains(("b", 1L, 10L)))
    } finally q.stop()
  }

  test("session_window merges gap-overlapping events in streaming append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = in.toDF().toDF("ts", "uid")
      .withWatermark("ts", "5 seconds")
      .groupBy(session_window(col("ts"), "10 seconds"), col("uid"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").cast("long").as("stt"),
        col("uid"), col("cnt"))
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // u1: 100,105,112 chain into ONE session (each gap < 10 s); 140 is new
      in.addData((ts(100), "u1"), (ts(105), "u1"), (ts(112), "u1"), (ts(140), "u1"))
      q.processAllAvailable()
      in.addData((ts(300), "z")) // close both sessions
      q.processAllAvailable()
      in.addData((ts(310), "z")) // nudge
      q.processAllAvailable()
      val rows = spark.table("sess").as[(Long, String, Long)].collect()
        .filter(_._2 == "u1").toSet
      assert(rows == Set((100L, "u1", 3L), (140L, "u1", 1L)), s"got $rows")
    } finally q.stop()
  }

  test("dedupAnyRow drops duplicate keys within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamOps.dedupAnyRow(
      in.toDF().toDF("ts", "id"), "ts", "10 seconds", Seq("id"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData((ts(1), "x"), (ts(2), "x"), (ts(3), "y"))
      q.processAllAvailable()
      in.addData((ts(4), "x")) // still within horizon -> dropped
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("dailyDistinctFlags marks first visit per day per mid") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L
    val in = MemoryStream[PageView]
    val q = StreamOps.dailyDistinctFlags(spark, in.toDS())
      .toDF("mid", "day", "is_first")
      .writeStream.format("memory").queryName("uv").outputMode("append").start()
    try {
      in.addData(
        PageView("m1", None, ts(10)), PageView("m1", Some("home"), ts(20)),
        PageView("m2", None, ts(30)))
      q.processAllAvailable()
      in.addData(PageView("m1", None, ts(day + 10))) // next day -> first again
      q.processAllAvailable()
      val firsts = spark.table("uv").filter($"is_first")
        .select($"mid", $"day").as[(String, String)].collect().toSet
      assert(firsts == Set(
        ("m1", "1970-01-01"), ("m2", "1970-01-01"), ("m1", "1970-01-02")))
      assert(spark.table("uv").count() == 4) // non-first row emitted with flag false
    } finally q.stop()
  }

  test("latestByKeyStream emits the max-order row per key on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, String)]
    val q = StreamOps.latestByKeyStream(spark, in.toDS(), "eventTime",
      "0 seconds", flushDelayMs = 5000)
      .toDF("key", "ord", "payload")
      .writeStream.format("memory").queryName("latest").outputMode("append").start()
    try {
      in.addData(("k", 1000L, "v1"), ("k", 3000L, "v3"), ("k", 2000L, "v2"))
      q.processAllAvailable()
      in.addData(("other", 60000L, "w")) // advance watermark past 1000+5000
      q.processAllAvailable()
      in.addData(("other2", 61000L, "w2")) // nudge: timeout fires this batch
      q.processAllAvailable()
      val rows = spark.table("latest").as[(String, Long, String)].collect()
        .filter(_._1 == "k")
      assert(rows.toSeq == Seq(("k", 3000L, "v3")))
    } finally q.stop()
  }

  test("jumpDetect: entry→entry bounces in-stream, lone entry bounces via timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PageView]
    val q = StreamOps.jumpDetect(spark, in.toDS(), "0 seconds", gapMs = 10000)
      .writeStream.format("memory").queryName("jumps").outputMode("append").start()
    try {
      // base offset 100s: an event at exactly epoch 0 ties with the initial
      // watermark and is treated as late
      in.addData(
        PageView("A", None, ts(100)), PageView("A", None, ts(105)),         // bounce: first A
        PageView("B", None, ts(100)), PageView("B", Some("home"), ts(105)), // no bounce
        PageView("C", None, ts(107)))                                       // lone entry
      q.processAllAvailable()
      in.addData(PageView("Z", Some("p"), ts(160))) // watermark -> 160s
      q.processAllAvailable()
      in.addData(PageView("Z", Some("p"), ts(161))) // nudge: C times out
      q.processAllAvailable()
      val jumps = spark.table("jumps").as[PageView].collect()
        .map(p => (p.mid, p.ts.getTime / 1000)).toSet
      assert(jumps.contains(("A", 100L)))
      assert(jumps.contains(("C", 107L)))
      assert(!jumps.exists(_._1 == "B"))
      // A's second entry view also times out eventually: it is a buffered
      // session start with no follow-up, same as C
      assert(jumps == Set(("A", 100L), ("A", 105L), ("C", 107L)))
    } finally q.stop()
  }
}
