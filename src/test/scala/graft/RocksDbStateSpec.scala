package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** At 100 TB the keyed state behind dedup/flags/windows outgrows executor
  * heaps; Spark's answer is the RocksDB state store (spillable, off-heap,
  * changelog-checkpointed). The engine's operators must run unchanged
  * under it — this spec reruns a windowed aggregation with the provider
  * switched and checks identical finalized output.
  */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

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
