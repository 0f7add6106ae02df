package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketch

/** The count-min grid's two scale properties, proven rather than claimed:
  *
  *  - MERGE: the sketch of a union is the cell-wise sum of the shards'
  *    sketches — the property that lets executors build partials
  *    independently and a 100 TB corpus build per-shard grids that fold
  *    into one.
  *  - STREAMING: the same `cmsCells` aggregate, run in complete mode over
  *    a MemoryStream fed in three batches, converges to exactly the batch
  *    grid of the same data — the sketch never has to be rebuilt; the
  *    running aggregate IS the sketch of the stream so far.
  */
class SketchStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def cellMap(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] = {
    import spark.implicits._
    df.select($"i", $"bucket", $"c").as[(Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
  }

  test("cms grids merge by cell-wise addition: sketch(A ∪ B) == sketch(A) + sketch(B)") {
    import spark.implicits._
    val a = Seq("x", "y", "x", "z").toDF("tok")
    val b = Seq("x", "w", "w").toDF("tok")
    val whole = cellMap(Sketch.cmsCells(a.unionByName(b), "tok"))
    val sa = cellMap(Sketch.cmsCells(a, "tok"))
    val sb = cellMap(Sketch.cmsCells(b, "tok"))
    val merged = (sa.keySet ++ sb.keySet)
      .map(k => k -> (sa.getOrElse(k, 0L) + sb.getOrElse(k, 0L))).toMap
    assert(whole == merged)
  }

  test("streaming cmsCells converges to the batch grid of the same tokens") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq("a", "b", "a"),
      Seq("c", "a"),
      Seq("b", "b", "d"))
    val in = MemoryStream[String]
    val q = Sketch.cmsCells(in.toDF().toDF("tok"), "tok")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val streamed = cellMap(spark.table("cms_stream"))
      val batch = cellMap(Sketch.cmsCells(batches.flatten.toDF("tok"), "tok"))
      assert(streamed == batch)
      // and the streamed grid still answers point queries soundly
      val est = Sketch.cmsEstimate(Seq("a", "b", "c", "d").toDF("tok"),
        "tok", spark.table("cms_stream"))
        .as[(String, Long)].collect().toMap
      assert(est("a") >= 3 && est("b") >= 3 && est("c") >= 1 && est("d") >= 1)
    } finally q.stop()
  }

  test("streaming hllRegisters converges to the batch registers of the same tokens") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(("a", "x"), ("a", "y"), ("b", "x")),
      Seq(("a", "x"), ("b", "z"), ("b", "w")),
      Seq(("a", "z"), ("b", "x"), ("a", "y")))
    def regMap(df: org.apache.spark.sql.DataFrame) =
      df.select($"source", $"reg", $"mr").as[(String, Long, Int)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val in = MemoryStream[(String, String)]
    val q = Sketch.hllRegisters(in.toDF().toDF("source", "tok"),
        Seq("source"), "tok")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val streamed = regMap(spark.table("hll_stream"))
      val batch = regMap(Sketch.hllRegisters(
        batches.flatten.toDF("source", "tok"), Seq("source"), "tok"))
      assert(streamed == batch)
      // and the streamed registers feed the estimator unchanged
      val est = Sketch.hllEstimate(spark.table("hll_stream"), Seq("source"))
        .select($"source", $"est").as[(String, Double)].collect().toMap
      val bEst = Sketch.hllEstimate(Sketch.hllRegisters(
          batches.flatten.toDF("source", "tok"), Seq("source"), "tok"),
        Seq("source"))
        .select($"source", $"est").as[(String, Double)].collect().toMap
      assert(est == bEst)
    } finally q.stop()
  }

  test("streaming weightedSampledQuantiles converges to the batch answer; w <= 0 fails the stream loud") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 40L).map(i => ("big", i, i * 3 % 17 + 1, i % 5 + 1)) ++
      (101L to 106L).map(i => ("small", i, i, 2L))
    val shuffled = new scala.util.Random(13).shuffle(rows)
    val in = MemoryStream[(String, Long, Long, Long)]
    val q = Sketch.weightedSampledQuantilesStream(
        in.toDF().toDF("source", "doc_id", "len", "w"),
        Seq("source"), $"len", $"w", "doc_id", k = 8, qs = Seq(0.5, 0.9))
      .writeStream.format("memory").queryName("wqtile_stream")
      .outputMode("complete").start()
    try {
      shuffled.grouped(16).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("wqtile_stream")
        .select($"source", $"q", $"value", $"sample_w")
        .as[(String, Double, Long, Long)].collect().toSet
      val batch = Sketch.weightedSampledQuantiles(
          rows.toDF("source", "doc_id", "len", "w"),
          Seq("source"), $"len", $"w", "doc_id", k = 8, qs = Seq(0.5, 0.9))
        .select($"source", $"q", $"value", $"sample_w")
        .as[(String, Double, Long, Long)].collect().toSet
      assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    } finally q.stop()
    // the per-row assert_true contract survives column pruning: a zero
    // weight kills the batch that carries it
    val in2 = MemoryStream[(String, Long, Long, Long)]
    val q2 = Sketch.weightedSampledQuantilesStream(
        in2.toDF().toDF("source", "doc_id", "len", "w"),
        Seq("source"), $"len", $"w", "doc_id", k = 8, qs = Seq(0.5))
      .writeStream.format("memory").queryName("wqtile_bad")
      .outputMode("complete").start()
    try {
      in2.addData(("big", 1L, 5L, 0L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("contract weight > 0") ||
        Option(e.getCause).exists(_.getMessage.contains("contract weight > 0")),
        s"expected the weight contract in: ${e.getMessage}")
    } finally q2.stop()
  }

  test("streaming sampledQuantiles converges to the batch answer on shuffled arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two groups, enough rows that k=8 really samples one of them; rows
    // arrive shuffled across three batches — admission is by (hash, id),
    // so arrival order must not matter
    val rows = (1L to 40L).map(i => ("big", i, i * 3 % 17)) ++
      (101L to 106L).map(i => ("small", i, i))
    val shuffled = new scala.util.Random(11).shuffle(rows)
    val batches = shuffled.grouped(16).toSeq
    val in = MemoryStream[(String, Long, Long)]
    val q = Sketch.sampledQuantilesStream(
        in.toDF().toDF("source", "doc_id", "len"),
        Seq("source"), $"len", "doc_id", k = 8, qs = Seq(0.5, 0.9))
      .writeStream.format("memory").queryName("qtile_stream")
      .outputMode("complete").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("qtile_stream")
        .select($"source", $"q", $"value", $"sample_n")
        .as[(String, Double, Long, Long)].collect().toSet
      val batch = Sketch.sampledQuantiles(
          rows.toDF("source", "doc_id", "len"),
          Seq("source"), $"len", "doc_id", k = 8, qs = Seq(0.5, 0.9))
        .select($"source", $"q", $"value", $"sample_n")
        .as[(String, Double, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"streamed=$streamed\nbatch=$batch")
      // the small group (6 rows < k) is answered exactly
      assert(streamed.filter(_._1 == "small").forall(_._4 == 6))
      assert(streamed.filter(_._1 == "big").forall(_._4 == 8))
    } finally q.stop()
  }

  test("streaming twins fail loud on non-integral value/id columns (the long state would truncate)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Double, Long)]
    val df = in.toDF().toDF("source", "doc_id", "len", "w")
    // double valCol: both twins refuse at construction, naming the column
    val e1 = intercept[IllegalArgumentException] {
      Sketch.sampledQuantilesStream(df, Seq("source"), $"len", "doc_id",
        k = 4, qs = Seq(0.5))
    }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      Sketch.weightedSampledQuantilesStream(df, Seq("source"), $"len", $"w",
        "doc_id", k = 4, qs = Seq(0.5))
    }
    assert(e2.getMessage.contains("integral"))
    // string idCol refused too (the batch twin hashes the NATIVE string;
    // the streaming long cast would NULL it)
    val in2 = MemoryStream[(String, String, Long)]
    val df2 = in2.toDF().toDF("source", "doc_id", "len")
    val e3 = intercept[IllegalArgumentException] {
      Sketch.sampledQuantilesStream(df2, Seq("source"), $"len", "doc_id",
        k = 4, qs = Seq(0.5))
    }
    assert(e3.getMessage.contains("idCol"))
    // an explicit cast at the call site satisfies the contract
    Sketch.sampledQuantilesStream(df.withColumn("len2", $"len".cast("long")),
      Seq("source"), $"len2", "doc_id", k = 4, qs = Seq(0.5))
  }
}
