package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks

/** T7 — checkpointed exactly-once progress (SURVEY.md §2.9): a restarted
  * query resumes from the checkpoint and does NOT reprocess already-
  * committed input. Combined with keyed last-write-wins sinks
  * (Sinks.upsertView) this is the engine's end-to-end exactly-once story.
  */
class CheckpointRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("restart from checkpoint processes only new files") {
    val in = Files.createTempDirectory("ckpt-in").toString
    val ckpt = Files.createTempDirectory("ckpt-meta").toString
    val schema = StructType.fromDDL("id BIGINT, v STRING")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

    def startQuery() = Sinks.foreachBatchSink(
      spark.readStream.schema(schema).json(in), ckpt, Trigger.AvailableNow()) {
      (batch, _) => batch.collect().foreach(r => seen.add(r.getLong(0)))
    }

    Files.writeString(Paths.get(in, "f1.json"),
      """{"id":1,"v":"a"}""" + "\n" + """{"id":2,"v":"b"}""")
    val q1 = startQuery()
    q1.awaitTermination(30000)
    assert(seen.size() == 2)

    Files.writeString(Paths.get(in, "f2.json"), """{"id":3,"v":"c"}""")
    val q2 = startQuery() // same checkpoint -> resumes, f1 NOT reprocessed
    q2.awaitTermination(30000)
    val ids = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L)) // each record delivered exactly once
  }
}
