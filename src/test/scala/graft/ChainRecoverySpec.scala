package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.{DwsWindows, OrderPreProcess}
import graft.sinks.Sinks
import graft.sources.CdcEnvelope

/** Checkpointed recovery of the COMPOSED order chain: the 6-stateful-op
  * query (3 interval joins + dedup + flags + window) stops and restarts
  * from its checkpoint across several runs; join state, dedup state,
  * per-user flag state, and window state must all survive, each finalized
  * window must be delivered exactly once, and the per-user first-ever
  * flag must NOT reset across restarts (its keyed state is the part a
  * naive restart would lose).
  */
class ChainRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def env(table: String, ts: Long, data: (String, String)*) = {
    val d = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"database":"gmall","table":"$table","type":"insert","data":{$d},"ts":$ts}"""
  }

  private def orderPair(oid: String, did: String, user: String, ts: Long,
                        price: String) = Seq(
    env("order_info", ts, "id" -> oid, "user_id" -> user,
      "province_id" -> "p1", "order_status" -> "1001"),
    env("order_detail", ts + 1, "id" -> did, "order_id" -> oid, "sku_id" -> "s1",
      "sku_name" -> "w", "sku_num" -> "1", "order_price" -> price,
      "source_type" -> "2401", "create_time" -> "t"),
    env("order_detail_activity", ts + 1, "order_detail_id" -> did,
      "activity_id" -> "a", "activity_rule_id" -> "r"),
    env("order_detail_coupon", ts + 1, "order_detail_id" -> did,
      "coupon_id" -> "c"))

  test("6-op chain restarts from checkpoint: windows exactly once, flag state survives") {
    import spark.implicits._
    val in = Files.createTempDirectory("chain-in").toString
    val ckpt = Files.createTempDirectory("chain-ckpt").toString
    val dict = Seq(("2401", "user order")).toDF("dic_code", "dic_name")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()

    def startRun(): Unit = {
      val lines = spark.readStream.text(in).toDF("value")
      val (clean, _) = CdcEnvelope.parse(lines, "value")
      val details = OrderPreProcess(clean, dict).select(
        col("id").cast("string").as("id"),
        col("user_id").cast("string").as("userId"),
        col("eventTime").as("ts"),
        lit(0.0).as("activityAmount"), lit(0.0).as("couponAmount"),
        col("split_total_amount").cast("double").as("originalAmount"))
        .as[DwsWindows.OrderDetail]
      val q = Sinks.foreachBatchSink(
        DwsWindows.tradeOrderWindow(spark, details), ckpt,
        Trigger.AvailableNow(), outputMode = "append") { (batch, _) =>
        batch.select(col("stt").cast("long"),
          col("order_unique_user_ct"), col("order_new_user_ct"))
          .collect().foreach(r => seen.add((r.getLong(0), r.getLong(1), r.getLong(2))))
      }
      q.awaitTermination(120000)
    }

    var file = 0
    def write(ls: Seq[String]): Unit = {
      file += 1
      Files.writeString(Paths.get(in, f"f$file%03d.txt"), ls.mkString("\n"))
    }

    // run 1: u9's first-ever order in window 100-110
    write(orderPair("o1", "d1", "u9", 100, "7.00"))
    startRun()
    // runs 2..n: nudge the watermark forward with disjoint later traffic;
    // each restart resumes ALL six operators' state from the checkpoint
    var t = 600L
    for (_ <- 1 to 6) {
      write(orderPair(s"o$t", s"d$t", "uz", t, "1.00"))
      t += 200
      startRun()
    }
    val w100 = seen.toArray(Array.empty[(Long, Long, Long)]).filter(_._1 == 100L)
    assert(w100.toSeq == Seq((100L, 1L, 1L)),
      s"window 100 must finalize exactly once with uu=1,nu=1: ${seen}")

    // u9 orders again much later: flag state survived the restarts, so the
    // same user is NOT new (nu=0) though a fresh day makes them uu=1 again
    val day = 86400L
    write(orderPair("o-next", "d-next", "u9", day + 100, "3.00"))
    startRun()
    for (_ <- 1 to 6) {
      write(orderPair(s"o$t", s"d$t", "uz", day + t, "1.00"))
      t += 200
      startRun()
    }
    val wNext = seen.toArray(Array.empty[(Long, Long, Long)])
      .filter(_._1 == day + 100L)
    assert(wNext.toSeq == Seq((day + 100L, 1L, 0L)),
      s"u9 must be uu=1 nu=0 after restart (state survived): ${seen}")
  }
}
