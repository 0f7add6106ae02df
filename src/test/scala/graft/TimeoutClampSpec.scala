package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps
import graft.streaming.StreamOps.PageView

/** The persisted-flushAt crash window: a stateful op that stores its flush
  * timestamp in state and re-sets it on every data invocation MUST clamp it
  * above the current watermark (`StreamOps.setEvictionAt`). Spark invokes
  * the DATA path — not the timeout path — when a key receives rows, so a
  * key whose stale flushAt the watermark has already passed (expired
  * timeout not yet delivered) would re-set the old timestamp and throw
  * `IllegalArgumentException: Timeout timestamp (...) cannot be earlier
  * than the current watermark`, killing the query. Each test drives exactly
  * that window: batch 1 persists a small flushAt for the key AND advances
  * the global watermark far past it via another key; batch 2 delivers new
  * data to the key through the data path.
  */
class TimeoutClampSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** With no-data micro-batches on, `processAllAvailable` delivers the
    * expired timeout in a trailing empty batch BEFORE our next addData —
    * hiding the window. In production the window is real: under continuous
    * arrival the next trigger has data available, so the data batch (and
    * its data-path invocation for the stale key) beats the no-data batch.
    * Disabling them reproduces exactly that arrival order.
    */
  private def withoutNoDataBatches[T](body: => T): T = {
    val k = "spark.sql.streaming.noDataMicroBatches.enabled"
    val old = spark.conf.get(k, "true")
    spark.conf.set(k, "false")
    try body finally spark.conf.set(k, old)
  }

  // batch 1: key "a" persists flushAt = 1000 + 500 = 1500, while key "wm"
  // at ord 1_000_000 advances the watermark to 999_975 >> 1500.
  // batch 2: key "a" receives ord 999_990 (> watermark, so NOT dropped as
  // late) — the data path runs with the stale flushAt.
  private val FlushDelay = 500L
  private val Delay = "25 milliseconds"

  test("latestByKeyStream survives new data after the flush horizon passed") {
    withoutNoDataBatches {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Long, String)]
      val q = StreamOps.latestByKeyStream(spark, in.toDS(), "eventTime", Delay,
          flushDelayMs = FlushDelay)
        .toDF("key", "ord", "payload")
        .writeStream.format("memory").queryName("clamp_latest")
        .outputMode("append").start()
      try {
        in.addData(("a", 1000L, "p1"), ("wm", 1000000L, "w"))
        q.processAllAvailable()
        in.addData(("a", 999990L, "p2")) // stale flushAt=1500 < wm=999975
        q.processAllAvailable()
        in.addData(("n1", 2000000L, "n")) // watermark past the clamped eviction
        q.processAllAvailable()
        in.addData(("n2", 2000001L, "n")) // nudge: timeouts fire
        q.processAllAvailable()
        val a = spark.table("clamp_latest").collect()
          .filter(_.getString(0) == "a")
          .map(r => (r.getLong(1), r.getString(2))).toSet
        assert(a == Set((999990L, "p2"))) // latest row wins, exactly one flush
      } finally q.stop()
    }
  }

  test("funnelStream survives new data after the flush horizon passed") {
    withoutNoDataBatches {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Long, String)]
      val q = StreamOps.funnelStream(spark, in.toDS(), Seq("view", "purchase"),
          Delay, flushDelayMs = FlushDelay)
        .toDF("key", "step", "typ", "ord")
        .writeStream.format("memory").queryName("clamp_funnel")
        .outputMode("append").start()
      try {
        in.addData(("a", 1000L, "view"), ("wm", 1000000L, "view"))
        q.processAllAvailable()
        in.addData(("a", 999990L, "purchase")) // data path, stale flushAt
        q.processAllAvailable()
        in.addData(("n1", 2000000L, "view"))
        q.processAllAvailable()
        in.addData(("n2", 2000001L, "view")) // nudge: timeouts fire
        q.processAllAvailable()
        val a = spark.table("clamp_funnel").collect()
          .filter(_.getString(0) == "a")
          .map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSet
        // both steps still advance in order despite the stale horizon
        assert(a == Set((1, "view", 1000L), (2, "purchase", 999990L)))
      } finally q.stop()
    }
  }

  test("jumpDetect survives a behind-eviction-watermark entry (late-filter lag window)") {
    withoutNoDataBatches {
      // jumpDetect's crash window differs from the persisted-flushAt ops:
      // its timeout always derives from a CURRENT-batch event, but Spark
      // filters late rows against the PREVIOUS batch's watermark while
      // validating timeouts against the CURRENT one (SPARK-40925's
      // late-events vs eviction split). A batch-1 event at t=1_000_000
      // makes batch 2's eviction watermark 999_975 while its late filter
      // still sits at 0 — so a batch-2 entry at t=1000 passes the filter,
      // and the raw `setTimeoutTimestamp(1000 + gap)` with gap ≪ the jump
      // threw "Timeout timestamp cannot be earlier than the current
      // watermark" and killed the query. setEvictionAt clamps to
      // watermark + 1, which only delays the bounce emission.
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[PageView]
      val q = StreamOps.jumpDetect(spark, in.toDS(), Delay, gapMs = 10000)
        .toDF("mid", "last_page_id", "ts")
        .writeStream.format("memory").queryName("clamp_jump")
        .outputMode("append").start()
      try {
        in.addData(PageView("wm", None, new java.sql.Timestamp(1000000L)))
        q.processAllAvailable()
        // lag window: late filter at 0, eviction watermark at 999_975 —
        // the entry passes the filter with 1000 + 10000 ≪ 999_975
        in.addData(PageView("a", None, new java.sql.Timestamp(1000L)))
        q.processAllAvailable()
        in.addData(PageView("n1", Some("p"), new java.sql.Timestamp(2000000L)))
        q.processAllAvailable()
        in.addData(PageView("n2", Some("p"), new java.sql.Timestamp(2000001L)))
        q.processAllAvailable() // nudge: clamped timeouts fire
        val a = spark.table("clamp_jump").collect()
          .filter(_.getString(0) == "a").map(_.getTimestamp(2).getTime).toSet
        assert(a == Set(1000L),
          s"the lagged-in entry must survive and bounce via timeout; got $a")
      } finally q.stop()
    }
  }

  test("scd2Stream survives new data after the flush horizon passed") {
    withoutNoDataBatches {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Long, String)]
      val q = StreamOps.scd2Stream(spark, in.toDS(), Delay,
          flushDelayMs = FlushDelay)
        .toDF("key", "attr", "valid_from", "valid_to", "version", "is_current")
        .writeStream.format("memory").queryName("clamp_scd2")
        .outputMode("append").start()
      try {
        in.addData(("a", 1000L, "x"), ("wm", 1000000L, "w"))
        q.processAllAvailable()
        in.addData(("a", 999990L, "y")) // data path, stale flushAt
        q.processAllAvailable()
        in.addData(("n1", 2000000L, "n"))
        q.processAllAvailable()
        in.addData(("n2", 2000001L, "n")) // nudge: timeouts fire
        q.processAllAvailable()
        val a = spark.table("clamp_scd2").collect()
          .filter(_.getString(0) == "a")
          .map(r => (r.getString(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4), r.getInt(5)))
          .toSet
        // the late-horizon change still closes version 1 and opens version 2
        assert(a == Set(
          ("x", 1000L, Some(999990L), 1L, 0),
          ("y", 999990L, None, 2L, 1)))
      } finally q.stop()
    }
  }
}
