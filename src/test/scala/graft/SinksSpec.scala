package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("kafkaFrame: composite key, JSON value round-trip, tombstones") {
    val df = Seq(("o1", "s1", 2, "live"), ("o1", "s2", 1, "dead"))
      .toDF("order_id", "sku_id", "num", "status")
    val frame = Sinks.kafkaFrame(df, Seq("order_id", "sku_id"),
      tombstoneWhen = Some(col("status") === "dead"))
    val rows = frame.as[(String, Option[String])].collect().toMap
    assert(rows("o1|s1").isDefined)
    assert(rows("o1|s2").isEmpty) // DELETE tombstone
    // value parses back to the payload columns (key cols excluded)
    val parsed = frame.filter($"value".isNotNull)
      .select(from_json($"value",
        org.apache.spark.sql.types.StructType.fromDDL("num INT, status STRING")).as("v"))
      .select($"v.num", $"v.status").as[(Int, String)].head()
    assert(parsed == ((2, "live")))
  }

  test("upsertView: last write wins per key, tombstone deletes") {
    val changelog = Seq(
      ("k1", 1L, Some("a")), ("k1", 3L, Some("c")), ("k1", 2L, Some("b")),
      ("k2", 1L, Some("x")), ("k2", 2L, None), // deleted
      ("k3", 5L, Some("z")))
      .toDF("key", "seq", "payload")
    val got = Sinks.upsertView(changelog, Seq("key"), "seq", "payload")
      .select($"key", $"payload").as[(String, String)].collect().toSet
    assert(got == Set(("k1", "c"), ("k3", "z")))
  }

  test("upsertView: same-order ties resolve deterministically (payload tie-break; tombstone never wins a tie)") {
    val changelog = Seq(
      ("k1", 1L, Some("a")), ("k1", 1L, Some("b")),   // tie: greater payload wins
      ("k2", 2L, Some("x")), ("k2", 2L, None))        // tie vs tombstone: payload wins
      .toDF("key", "seq", "payload")
    val got = Sinks.upsertView(changelog, Seq("key"), "seq", "payload")
      .select($"key", $"payload").as[(String, String)].collect().toSet
    assert(got == Set(("k1", "b"), ("k2", "x")))
  }

  test("foreachBatchSink delivers micro-batches to the pluggable writer") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[(String, Int)])]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink").toString
    // data must land BEFORE the AvailableNow query starts: the trigger
    // snapshots availability at start, so a post-start addData can be
    // missed entirely when the suite runs under load (observed flake)
    in.addData(("a", 1), ("b", 2))
    val q = Sinks.foreachBatchSink(
      in.toDF().toDF("k", "v"), ckpt, Trigger.AvailableNow()) { (batch, id) =>
      seen.add((id, batch.collect().map(r => (r.getString(0), r.getInt(1))).toSeq))
    }
    assert(q.awaitTermination(60000), "AvailableNow query must terminate")
    val batches = seen.toArray(Array.empty[(Long, Seq[(String, Int)])])
    assert(batches.flatMap(_._2).toSet == Set(("a", 1), ("b", 2)))
  }

  test("foreachBatchSink: a batchId-keyed overwrite writer makes redelivery exactly-once effective") {
    // the documented mapping of the reference's EXACTLY_ONCE transactional
    // producer: delivery is at-least-once, so the WRITER must be
    // idempotent — keying the write by batchId (dir overwrite here; a
    // `DELETE WHERE batch_id = ? ; INSERT` transaction on JDBC) makes a
    // redelivered batch overwrite itself instead of duplicating
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    val out = java.nio.file.Files.createTempDirectory("graft-sink-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ck").toString
    val delivered =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(String, Int)]]()
    def write(rows: Seq[(String, Int)], id: Long): Unit =
      rows.toDF("k", "v").write.mode("overwrite").parquet(s"$out/batch=$id")
    in.addData(("a", 1), ("b", 2))
    val q = Sinks.foreachBatchSink(
      in.toDF().toDF("k", "v"), ckpt, Trigger.AvailableNow()) { (batch, id) =>
      val rows = batch.collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      delivered.put(id, rows)
      write(rows, id)
    }
    assert(q.awaitTermination(60000))
    def readAll = spark.read.parquet(s"$out/batch=*")
      .as[(String, Int)].collect().sorted.toSeq
    val once = readAll
    assert(once == Seq(("a", 1), ("b", 2)))
    // redeliver every batch (the at-least-once case): same rows, same ids
    delivered.forEach((id, rows) => write(rows, id))
    assert(readAll == once, "replayed batches must overwrite, not append")
  }

  test("dropTransient removes in-flight-only columns") {
    val df = Seq((1, "x", "tmp")).toDF("id", "v", "scratch")
    assert(Sinks.dropTransient(df, Seq("scratch")).columns.toSeq == Seq("id", "v"))
  }
}
