package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** At 100 TB the keyed state behind dedup/flags/windows outgrows executor
  * heaps; Spark's answer is the RocksDB state store (spillable, off-heap,
  * changelog-checkpointed). The engine's operators must run unchanged
  * under it — this spec reruns a windowed aggregation AND the composed
  * 6-stateful-op order chain (including a checkpoint restart) with the
  * provider switched and checks identical finalized output.
  */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("composed 6-op order chain runs and restarts from checkpoint under RocksDB") {
    withRocksDb {
      val h = new ChainHarness(spark)
      // u9's first order in window 100-110, then watermark nudges across
      // restarts — every one of the 6 operators' state lives in RocksDB
      // and must survive each checkpoint resume
      h.write(h.orderPair("o1", "d1", "u9", 100, "7.00"))
      h.startRun()
      var t = 600L
      for (_ <- 1 to 6) {
        h.write(h.orderPair(s"o$t", s"d$t", "uz", t, "1.00"))
        t += 200
        h.startRun()
      }
      assert(h.windowsAt(100L) == Seq((100L, 1L, 1L)),
        s"window 100 must finalize exactly once under RocksDB: ${h.seen}")
      // restart with next-day traffic: u9's first-ever flag state must
      // have been persisted in (and recovered from) the RocksDB store
      val day = 86400L
      h.write(h.orderPair("o-next", "d-next", "u9", day + 100, "3.00"))
      h.startRun()
      for (_ <- 1 to 6) {
        h.write(h.orderPair(s"o$t", s"d$t", "uz", day + t, "1.00"))
        t += 200
        h.startRun()
      }
      assert(h.windowsAt(day + 100L) == Seq((day + 100L, 1L, 0L)),
        s"u9 must be uu=1 nu=0 after RocksDB restart: ${h.seen}")
      assert(h.sawRocksDbMetrics,
        "expected RocksDB state store metrics in chain query progress")
    }
  }

  test("tumblingCounts produces identical results under RocksDBStateStoreProvider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Timestamp, String)]
      val q = StreamOps.tumblingCounts(
        in.toDF().toDF("ts", "k"), "ts", "5 seconds", "10 seconds", Seq("k"))
        .writeStream.format("memory").queryName("rocks").outputMode("append").start()
      try {
        in.addData((ts(1), "a"), (ts(3), "a"), (ts(11), "b"))
        q.processAllAvailable()
        in.addData((ts(40), "z"))
        q.processAllAvailable()
        in.addData((ts(41), "z"))
        q.processAllAvailable()
        // provider actually engaged, not silently defaulted: RocksDB
        // publishes its own custom state metrics into the progress events
        val usedRocks = q.recentProgress.exists(_.stateOperators.exists(
          _.customMetrics.keySet().toArray.exists(_.toString.toLowerCase.contains("rocksdb"))))
        assert(usedRocks, "expected RocksDB state store metrics in query progress")
        val rows = spark.table("rocks")
          .select($"k", $"cnt", $"stt".cast("long")).as[(String, Long, Long)]
          .collect().toSet
        assert(rows.contains(("a", 2L, 0L)))
        assert(rows.contains(("b", 1L, 10L)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
