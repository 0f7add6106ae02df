package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipelines.{DwsWindows, OrderPreProcess}
import graft.sinks.Sinks
import graft.sources.CdcEnvelope

/** Shared driver for the composed 6-stateful-op order chain
  * (CDC parse → 3 interval joins → dedup → first-of-day flags → window):
  * file-source input so each `startRun` is a fresh query resuming every
  * operator's state from the same checkpoint. Used by ChainRecoverySpec
  * (HDFS-backed state) and RocksDbStateSpec (RocksDB provider).
  */
final class ChainHarness(spark: SparkSession) {
  import spark.implicits._

  val inDir: String = Files.createTempDirectory("chain-in").toString
  val ckptDir: String = Files.createTempDirectory("chain-ckpt").toString
  private val dict = Seq(("2401", "user order")).toDF("dic_code", "dic_name")

  /** (window-start sec, uu, nu) rows collected across every run. */
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()

  /** rocksdb metric sighting across runs (provider engagement probe). */
  @volatile var sawRocksDbMetrics = false

  private def env(table: String, ts: Long, data: (String, String)*) = {
    val d = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"database":"gmall","table":"$table","type":"insert","data":{$d},"ts":$ts}"""
  }

  def orderPair(oid: String, did: String, user: String, ts: Long,
                price: String): Seq[String] = Seq(
    env("order_info", ts, "id" -> oid, "user_id" -> user,
      "province_id" -> "p1", "order_status" -> "1001"),
    env("order_detail", ts + 1, "id" -> did, "order_id" -> oid, "sku_id" -> "s1",
      "sku_name" -> "w", "sku_num" -> "1", "order_price" -> price,
      "source_type" -> "2401", "create_time" -> "t"),
    env("order_detail_activity", ts + 1, "order_detail_id" -> did,
      "activity_id" -> "a", "activity_rule_id" -> "r"),
    env("order_detail_coupon", ts + 1, "order_detail_id" -> did,
      "coupon_id" -> "c"))

  private var file = 0

  def write(ls: Seq[String]): Unit = {
    file += 1
    Files.writeString(Paths.get(inDir, f"f$file%03d.txt"), ls.mkString("\n"))
  }

  /** One AvailableNow run over everything in `inDir`, resuming from the
    * shared checkpoint; finalized windows land in `seen`.
    */
  def startRun(): Unit = {
    val lines = spark.readStream.text(inDir).toDF("value")
    val (clean, _) = CdcEnvelope.parse(lines, "value")
    val details = OrderPreProcess(clean, dict).select(
      col("id").cast("string").as("id"),
      col("user_id").cast("string").as("userId"),
      col("eventTime").as("ts"),
      lit(0.0).as("activityAmount"), lit(0.0).as("couponAmount"),
      col("split_total_amount").cast("double").as("originalAmount"))
      .as[DwsWindows.OrderDetail]
    val q = Sinks.foreachBatchSink(
      DwsWindows.tradeOrderWindow(spark, details), ckptDir,
      Trigger.AvailableNow(), outputMode = "append") { (batch, _) =>
      batch.select(col("stt").cast("long"),
        col("order_unique_user_ct"), col("order_new_user_ct"))
        .collect().foreach(r => seen.add((r.getLong(0), r.getLong(1), r.getLong(2))))
    }
    q.awaitTermination(120000)
    if (q.recentProgress.exists(_.stateOperators.exists(
      _.customMetrics.keySet().toArray.exists(
        _.toString.toLowerCase.contains("rocksdb")))))
      sawRocksDbMetrics = true
  }

  def windowsAt(sttSec: Long): Seq[(Long, Long, Long)] =
    seen.toArray(Array.empty[(Long, Long, Long)]).filter(_._1 == sttSec).toSeq
}
