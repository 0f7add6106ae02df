package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Ivf

/** Streaming half of the ANN story: a trained IVF model rides into a
  * STREAMING query as a plan literal, so posting-list assignment happens
  * per micro-batch with no shuffle and no state — new corpus vectors get
  * their shard/centroid as they arrive (the ingest side of an ANN index),
  * and the batch probe path (q61) searches what the stream wrote.
  */
class StreamingAnnSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("Ivf.assign on a stream: per-batch centroid assignment equals the batch assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val cents = Ivf.train(emb, "vec_id", "embedding", k = 4, dims = 64, iters = 1)

    // batch truth
    val expected = Ivf.assign(emb, "embedding", cents, 64)
      .select($"vec_id", $"centroid").as[(Long, Int)].collect().toMap

    // same vectors arriving as a stream, two batches
    val rows = emb.as[(Long, Seq[Double])].collect().toSeq
    val in = MemoryStream[(Long, Seq[Double])]
    val q = Ivf.assign(in.toDF().toDF("vec_id", "embedding"), "embedding", cents, 64)
      .select($"vec_id", $"centroid")
      .writeStream.format("memory").queryName("ann_ingest").outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val got = spark.table("ann_ingest").as[(Long, Int)].collect().toMap
      assert(got == expected,
        s"streaming assignment must match batch for all ${expected.size} vectors")
      // and the stateless plan has no shuffle exchange at all
      val plan = Ivf.assign(emb, "embedding", cents, 64)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "assignment must stay per-row (model is a plan literal)")
    } finally q.stop()
  }
}
