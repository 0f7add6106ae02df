package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.pipelines.CorpusPipeline

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("corpus pipeline composes: quality -> exact dedup -> near-dedup, stats add up") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val (cleaned, stats) = CorpusPipeline(docs)
    val st = stats.groupBy($"stage").agg(sum($"docs").as("n"))
      .as[(String, Long)].collect().toMap
    assert(st("input") == 500)
    assert(st("quality_pass") <= st("input"))
    assert(st("exact_deduped") <= st("quality_pass"))
    assert(st("cleaned") < st("exact_deduped")) // the 25 planted pairs lose one side
    assert(cleaned.count() == st("cleaned"))
    // near-dup removal keeps the smallest doc_id per duplicate CLUSTER —
    // the 25 planted pairs form cliques, so removals < pairs
    val removed = st("exact_deduped") - st("cleaned")
    assert(removed >= 10 && removed <= 25)
  }

  test("containment decontamination is graded: substantive coverage drops, incidental overlap survives") {
    // 5-shingles: doc 101 embeds the FULL eval text (coverage 1);
    // doc 102 shares exactly one 5-gram phrase (tiny coverage of a
    // 2-shingle eval set? — use a longer eval text so one shared shingle
    // sits far under t=1/2); doc 103 shares nothing
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val evalDocs = Seq((1L, evalText)).toDF("doc_id", "text")
    val docs = Seq(
      (101L, s"intro words then $evalText and a closing remark"),
      (102L, "alpha beta gamma delta epsilon completely different tail words here now"),
      (103L, "nothing shared with the benchmark at all in this one")
    ).toDF("doc_id", "text")
    val kept = CorpusPipeline.decontaminateByContainment(
        docs, evalDocs, "doc_id", "text", 1, 2)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(102L, 103L), s"got $kept")
    // the any-overlap form is stricter: 102's single shared shingle kills it
    val evalHashes = evalDocs.select(explode(
        graft.functions.TextFunctions.shingleHashes(col("text"), 5)).as("h"))
      .distinct().as[Long].collect()
    val keptStrict = CorpusPipeline.decontaminate(docs, evalHashes)
      .select($"doc_id").as[Long].collect().toSet
    assert(keptStrict == Set(103L), s"got $keptStrict")
  }

  test("decontaminateByCanary: NULL text survives both the empty-list and non-empty-list routes") {
    val docs = Seq((1L, "clean prose here"), (2L, "contains THE-CANARY verbatim"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val emptyKept = CorpusPipeline.decontaminateByCanary(docs, Array.empty)
      .select($"doc_id").as[Long].collect().toSet
    val kept = CorpusPipeline.decontaminateByCanary(docs, Array("THE-CANARY"))
      .select($"doc_id").as[Long].collect().toSet
    assert(emptyKept == Set(1L, 2L, 3L))
    // a NULL text cannot contain a canary: kept, not silently dropped by
    // NULL propagating through the negated exists
    assert(kept == Set(1L, 3L))
  }

  test("cleaned corpus has no remaining near-dup pairs above threshold") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val (cleaned, _) = CorpusPipeline(docs)
    val residual = graft.operators.Dedup.nearDupPairs(
      cleaned, "doc_id", "text", 3, 16, 4, 0.5)
    assert(residual.count() == 0)
  }

  test("semantic stage: embedding near-dups removed after text near-dedup, stages monotone") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val (cleaned, stats) = CorpusPipeline(docs, embeddings = Some(emb))
    val st = stats.groupBy($"stage").agg(sum($"docs").as("n"))
      .as[(String, Long)].collect().toMap
    assert(st("cleaned") <= st("near_deduped"))
    assert(st("near_deduped") <= st("exact_deduped"))
    // survivors carry no residual same-bucket embedding pair >= threshold
    val survivorVecs = cleaned.select($"doc_id")
      .join(emb.withColumnRenamed("vec_id", "doc_id"), "doc_id")
    val residual = graft.operators.Similarity.lshNearDupPairs(
      survivorVecs, "doc_id", "embedding", 4, 64, 0.35)
    assert(residual.count() == 0)
    // and the semantic stage only ever REMOVES text-stage survivors
    val textOnly = CorpusPipeline(docs)._1.select($"doc_id").as[Long].collect().toSet
    val withSem = cleaned.select($"doc_id").as[Long].collect().toSet
    assert(withSem.subsetOf(textOnly))
  }

  test("packageStage: per-source cap binds, chunks carry geometry + provenance") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val (cleaned, _) = CorpusPipeline(docs)
    val chunks = CorpusPipeline.packageStage(cleaned, capPerSource = 5,
      chunkW = 32, chunkS = 24)
    val rows = chunks
      .select($"doc_id", $"chunk_id", $"chunk_start", $"n_chunk_tokens")
      .as[(Long, Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    // cap: at most 5 docs per source survive into chunking
    val docsPerSource = cleaned.select($"doc_id", $"source")
      .as[(Long, String)].collect().toMap
    val bySource = rows.map(_._1).distinct.groupBy(docsPerSource)
    assert(bySource.values.forall(_.length <= 5),
      s"per-source doc counts after cap: ${bySource.view.mapValues(_.length).toMap}")
    // geometry: stride lattice, bounded chunk size
    rows.foreach { case (_, id, start, len) =>
      assert(start == id * 24 && len >= 1 && len <= 32)
    }
    // provenance: every chunked doc is a cleaned survivor
    assert(rows.map(_._1).toSet.subsetOf(docsPerSource.keySet))
  }

  test("chunk() is stateless: runs incrementally on a stream, same chunks as batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, Seq.fill(5)("alpha beta gamma delta").mkString(" ")), // 20 tokens
      (2L, "one two three"))
    val in = MemoryStream[(Long, String)]
    val q = CorpusPipeline.chunk(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", 8, 6)
      .select($"doc_id", $"chunk_id", $"chunk_start", size($"chunk").as("n"))
      .writeStream.format("memory").queryName("chunks").outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("chunks")
        .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
      val batch = CorpusPipeline.chunk(docs.toDF("doc_id", "text"),
          "doc_id", "text", 8, 6)
        .select($"doc_id", $"chunk_id", $"chunk_start", size($"chunk").as("n"))
        .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == batch && got.nonEmpty)
      // doc 1: 20 tokens, stride 6 -> starts 0,6,12,18; last chunk 2 tokens
      assert(got.filter(_._1 == 1L).map(_._4) == Seq(8, 8, 8, 2))
    } finally q.stop()
  }

  test("admissionCap: first-k per (source, day) admitted; count resets on a new day") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(day: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-0$day 00:00:$sec%02d")
    val in = MemoryStream[(String, Long, java.sql.Timestamp)]
    val q = graft.streaming.StreamOps.admissionCap(spark, in.toDS(), k = 2)
      .map(r => (r._1, r._2))
      .writeStream.format("memory").queryName("admit").outputMode("append").start()
    try {
      in.addData(("s1", 1L, ts(1, 1)), ("s1", 2L, ts(1, 2)),
        ("s1", 3L, ts(1, 3)), ("s2", 4L, ts(1, 4)))
      q.processAllAvailable()
      in.addData(("s1", 5L, ts(1, 5)), // still day 1: over cap, dropped
        ("s1", 6L, ts(2, 1)))          // day 2: count reset, admitted
      q.processAllAvailable()
      val got = spark.table("admit").as[(String, Long)].collect().toSet
      assert(got == Set(("s1", 1L), ("s1", 2L), ("s2", 4L), ("s1", 6L)),
        s"expected first-2-per-day per source, got $got")
    } finally q.stop()
  }

  test("admissionCap: within-watermark late rows for a previous day see that day's count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(day: Int, hms: String) =
      java.sql.Timestamp.valueOf(f"2024-01-0$day $hms")
    val in = MemoryStream[(String, Long, java.sql.Timestamp)]
    // generous watermark delay so the cross-day late row is NOT dropped as
    // late — the exact case a single (date,count) state would mishandle
    val q = graft.streaming.StreamOps.admissionCap(spark, in.toDS(), k = 2,
        delay = "2 hours")
      .map(r => r._2)
      .writeStream.format("memory").queryName("admit_late").outputMode("append").start()
    try {
      in.addData(("s1", 1L, ts(1, "23:58:00")), ("s1", 2L, ts(1, "23:58:30")))
      q.processAllAvailable() // day-1 count = 2 (at cap)
      in.addData(("s1", 3L, ts(2, "00:00:10"))) // day-2: admitted, count(d2)=1
      q.processAllAvailable()
      in.addData(
        ("s1", 4L, ts(1, "23:59:00")), // LATE day-1 row, within watermark: at cap -> dropped
        ("s1", 5L, ts(2, "00:00:20"))) // day-2 second admission
      q.processAllAvailable()
      in.addData(("s1", 6L, ts(2, "00:00:30"))) // day-2 over cap -> dropped
      q.processAllAvailable()
      val got = spark.table("admit_late").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 3L, 5L),
        s"late day-1 row must NOT reset day-1's count (and day-2 must keep its own): $got")
    } finally q.stop()
  }

  test("streamingIngest: quality filter + exact dedup run incrementally; first arrival wins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = CorpusPipeline.streamingIngest(
      in.toDF().toDF("doc_id", "text", "ts"), "ts", "10 seconds")
      .select($"doc_id")
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    try {
      in.addData(
        (1L, "the quick brown fox jumps over dogs", ts(1)),
        (2L, "the quick brown fox jumps over dogs", ts(2)), // exact dup of 1
        (3L, "a a a a a a a a", ts(3)))                     // quality reject
      q.processAllAvailable()
      in.addData(
        (4L, "  THE Quick Brown Fox Jumps Over Dogs ", ts(4)), // dup after normalize
        (5L, "completely different interesting text here", ts(5)))
      q.processAllAvailable()
      val kept = spark.table("ingest").as[Long].collect().toSet
      assert(kept == Set(1L, 5L),
        s"dup (2,4) dropped across batches, low-quality (3) filtered; got $kept")
    } finally q.stop()
  }

  test("streamingIngest decontaminates in-stream: a doc sharing an eval " +
    "5-gram is dropped statelessly, batch agrees") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // the eval doc's hashes, computed once batch-side (bounded set)
    val evalHashes = Seq("e1 e2 e3 e4 e5 tail").toDF("text")
      .select(explode(graft.functions.TextFunctions.shingleHashes($"text", 5)))
      .as[Long].collect()
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = CorpusPipeline.streamingIngest(
      in.toDF().toDF("doc_id", "text", "ts"), "ts", "10 seconds",
      evalHashes = evalHashes)
      .select($"doc_id")
      .writeStream.format("memory").queryName("ingestdecont")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "lead e1 e2 e3 e4 e5 trail words here", ts(1)), // contaminated
        (2L, "lead e1 e2 e3 e4 x5 trail words here", ts(2)), // 4-gram only
        (3L, "fresh interesting clean words all around", ts(3)))
      q.processAllAvailable()
      val kept = spark.table("ingestdecont").as[Long].collect().toSet
      assert(kept == Set(2L, 3L),
        s"doc 1 shares an eval 5-gram and must drop in-stream; got $kept")
    } finally q.stop()
    // the batch form of the same call agrees
    val batchKept = CorpusPipeline.streamingIngest(
      Seq((1L, "lead e1 e2 e3 e4 e5 trail words here", ts(1)),
        (2L, "lead e1 e2 e3 e4 x5 trail words here", ts(2)),
        (3L, "fresh interesting clean words all around", ts(3)))
        .toDF("doc_id", "text", "ts"),
      "ts", "10 seconds", evalHashes = evalHashes)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchKept == Set(2L, 3L))
  }

  test("streamingBlockPack: batch 1 reproduces the batch pack; batch 2 " +
    "appends at each shard's persisted cursor, gapless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val shards = 2
    val b1 = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i"), (4L, "j k l m n"))
    val b2 = Seq((5L, "o p q"), (6L, "r s"))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.streamingBlockPack(
      spark, in.toDF().toDF("doc_id", "text"), shards, 4)
      .writeStream.format("memory").queryName("spack").outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      val afterB1 = spark.table("spack")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      // one batch == the batch operator on the same rows (same order rule)
      val batchPack = CurationQueries.blockPack(
        b1.toDF("doc_id", "text"), shards, 4)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(afterB1.toSet == batchPack.toSet,
        "a single-batch stream must reproduce the batch pack exactly")
      in.addData(b2: _*); q.processAllAvailable()
      val all = spark.table("spack")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(all.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L, 6L))
      // cross-batch invariant: offsets stay a gapless EOS-inclusive prefix
      // sum per shard — batch 2 docs start where their shard's cursor was
      for ((_, sh) <- all.groupBy(_._2); byOff = sh.sortBy(_._4)) {
        assert(byOff.head._4 == 0L)
        for (Array(a, b) <- byOff.sliding(2).map(_.toArray) if byOff.length > 1)
          assert(b._4 == a._4 + a._3 + 1,
            s"doc ${b._1} must start at doc ${a._1}'s end + EOS")
      }
      // and batch-2 docs never landed BEFORE batch-1 docs of their shard
      val b1Ids = b1.map(_._1).toSet
      for ((_, sh) <- all.groupBy(_._2)) {
        val (olds, news) = sh.partition(r => b1Ids(r._1))
        if (olds.nonEmpty && news.nonEmpty)
          assert(news.map(_._4).min > olds.map(_._4).max)
      }
    } finally q.stop()
  }

  test("streamingBlockPack: the shard cursor survives a checkpointed restart") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val in = java.nio.file.Files.createTempDirectory("spack-in").toString
    val out = java.nio.file.Files.createTempDirectory("spack-out").toString
    val cp = java.nio.file.Files.createTempDirectory("spack-cp").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    var n = 0
    def write(docs: Seq[(Long, String)]): Unit = {
      n += 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(in, f"f$n%02d.jsonl"),
        docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n"))
    }
    def run(): Unit = {
      val docs = spark.readStream.schema(schema).json(in)
      val q = graft.streaming.StreamOps.streamingBlockPack(spark, docs, 2, 4)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      q.awaitTermination()
    }
    write(Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i")))
    run()
    write(Seq((4L, "j k l m n"), (5L, "o p")))
    run() // FRESH query, same checkpoint: cursors must resume, not reset
    val all = spark.read.parquet(out)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(all.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L))
    for ((_, sh) <- all.groupBy(_._2); byOff = sh.sortBy(_._4)) {
      assert(byOff.head._4 == 0L)
      for (Array(a, b) <- byOff.sliding(2).map(_.toArray) if byOff.length > 1)
        assert(b._4 == a._4 + a._3 + 1,
          s"restart must resume the cursor: doc ${b._1} vs doc ${a._1}")
    }
  }

  test("streamingNearDedup: micro-batched near-dedup matches the batch recap survivors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext

    // word-level fixtures: independent 23-word bases (no shared shingles
    // across clusters), n=3 shingles; an m-word change moves jaccard by
    // known amounts (changed word i touches shingles i-2..i)
    def edit(base: String, repl: (Int, String)*): String = {
      val w = base.split(' ')
      repl.foreach { case (i, s) => w(i) = s }
      w.mkString(" ")
    }
    val PAIR_B = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango uniform victor whiskey"
    val PAIR_C = "zinc yarrow xenon walnut violet umber teal saffron " +
      "russet quartz pewter ochre nickel maroon lilac khaki jade ivory " +
      "hazel garnet fuchsia ebony denim"
    val CLIQUE_B = "apple baker candle dragon ember falcon garden " +
      "harbor island jasmine kettle lantern meadow nectar orchard pebble " +
      "quiver ribbon saddle timber urchin vessel willow"
    val CHAIN_B = "anchor bridge canyon delta engine furnace glacier " +
      "hammer ingot journey keystone ladder mortar needle oxide piston " +
      "quarry rudder spindle turbine valve winch zephyr"
    def pairB(r: (Int, String)*) = edit(PAIR_B, r: _*)
    def pairC(r: (Int, String)*) = edit(PAIR_C, r: _*)
    def cliqueB(r: (Int, String)*) = edit(CLIQUE_B, r: _*)
    def chainB(r: (Int, String)*) = edit(CHAIN_B, r: _*)
    // batch 1: in-batch pair (1,2); heads of the cross-batch structures
    val b1 = Seq(
      (1L, pairB()), (2L, pairB(11 -> "limon")),                // in-batch pair
      (10L, pairC()),                                           // pair head
      (20L, cliqueB()),                                         // clique head
      (30L, chainB()),                                          // chain head
      (40L, "completely unrelated text about volcanic geology and mineral formations"))
    // batch 2
    val b2 = Seq(
      (11L, pairC(11 -> "opal")),                               // ~10
      (21L, cliqueB() + " zz"),                                 // ~20, ~22
      (31L, chainB(0 -> "qq", 1 -> "rr", 2 -> "ss", 3 -> "tt")), // ~30, mid-chain
      (41L, "another unrelated document on deep sea hydrothermal vents"))
    // batch 3: 32 edits the chain's OTHER end on top of 31's head edit —
    // near 31 but too far from 30
    val b3 = Seq(
      (22L, cliqueB() + " qq"),                                 // ~20, ~21
      (32L, chainB(0 -> "qq", 1 -> "rr", 2 -> "ss", 3 -> "tt",
        19 -> "ww", 20 -> "xx", 21 -> "yy", 22 -> "vv")),       // ~31, NOT ~30
      (42L, "a third standalone text concerning medieval manuscript preservation"))

    val cfg = CorpusPipeline.Config(minhashK = 24, lshBands = 12)
    val all = (b1 ++ b2 ++ b3).toDF("doc_id", "text")

    // the batch recap: pair graph -> components -> keep min per cluster
    val pairs = Dedup.nearDupPairs(all, "doc_id", "text",
      cfg.shingleN, cfg.minhashK, cfg.lshBands, cfg.jaccardThreshold)
    val pairSet = pairs.select($"d1", $"d2").as[(Long, Long)].collect().toSet
    // planted graph sanity: the chain's ends do NOT pair directly — only
    // the all-seen-docs index can block 32 after 31 was dropped
    assert(pairSet.contains((30L, 31L)) && pairSet.contains((31L, 32L)),
      s"chain edges missing from $pairSet")
    assert(!pairSet.contains((30L, 32L)), "chain ends must not pair directly")
    val drop = Dedup.duplicateClustersStar(pairs)
      .filter($"doc_id" =!= $"cluster").select($"doc_id")
    val recap = all.join(drop, Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Long].collect().toSet

    val dir = java.nio.file.Files.createTempDirectory("neardedup").toString
    val in = MemoryStream[(Long, String)]
    val q = CorpusPipeline.streamingNearDedup(in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/out", s"$dir/cp", cfg = cfg)
    try {
      Seq(b1, b2, b3).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = spark.read.parquet(s"$dir/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed == recap,
      s"streaming diverged from recap: missing=${recap -- streamed} extra=${streamed -- recap}")
    // the interesting shapes actually resolved: in-batch pair, cross-batch
    // pair, 3-clique across batches, and the dropped-middle chain
    assert(Set(1L, 10L, 20L, 30L, 40L, 41L, 42L).subsetOf(streamed))
    assert(Set(2L, 11L, 21L, 22L, 31L, 32L).intersect(streamed).isEmpty)
    // index holds every seen doc (admitted or dropped), once per doc
    assert(spark.read.parquet(s"$dir/index").count() == all.count())
  }

  test("streamingNearDedup splitLabels: admitted docs adopt split clusters at the wider radius; labels feed forward") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def edit(base: String, repl: (Int, String)*): String = {
      val w = base.split(' ')
      repl.foreach { case (i, s) => w(i) = s }
      w.mkString(" ")
    }
    val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango uniform victor whiskey"
    // 3 separated word edits: 21 shared shingles drop to 12 of a 30-union
    // -> J = 0.4: ADMITTED at the dedup radius (0.5) yet RELATED at the
    // split radius (0.3) — the case the two-threshold design exists for
    val related = edit(base, 4 -> "xx", 10 -> "yy", 16 -> "zz")
    val cfg = CorpusPipeline.Config(minhashK = 24, lshBands = 12)
    val dir = java.nio.file.Files.createTempDirectory("splitlabels").toString
    val in = MemoryStream[(Long, String)]
    val q = CorpusPipeline.streamingNearDedup(in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/out", s"$dir/cp", cfg = cfg,
      splitLabels = Some((s"$dir/labels", 10, 0.3)))
    try {
      in.addData((1L, base),
        (40L, "completely unrelated text about volcanic geology formations"))
      q.processAllAvailable()
      in.addData((50L, related),
        (41L, "another standalone document on deep sea hydrothermal vents"))
      q.processAllAvailable()
    } finally q.stop()
    // all four docs admitted (50 is J=0.4 < the 0.5 dedup threshold)
    assert(spark.read.parquet(s"$dir/out")
      .select($"doc_id").as[Long].collect().toSet == Set(1L, 40L, 41L, 50L))
    val labels = spark.read.parquet(s"$dir/labels")
      .select($"doc_id", $"cluster", $"split", $"bridged")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(labels.size == 4, s"one label row per admitted doc: $labels")
    assert(labels(1L)._2 == 1L, "batch-1 head is its own cluster")
    // the cross-batch adoption: doc 50 inherits doc 1's cluster AND split
    assert(labels(50L)._2 == 1L && labels(50L)._4 == 0L,
      s"doc 50 must adopt cluster 1 un-bridged: ${labels(50L)}")
    assert(labels(50L)._3 == labels(1L)._3, "same cluster -> same split")
    assert(labels(40L)._2 == 40L && labels(41L)._2 == 41L, "unrelated stay singletons")
    // the at-least-once failure mode on the labels table: a replayed
    // micro-batch re-appends identical rows — readLabels' keyed dedup
    // collapses them back to one row per doc (preserving the widest
    // bridged flag), so docs⋈labels consumers never double rows
    val one = spark.read.parquet(s"$dir/labels").filter($"doc_id" === 50L)
    one.withColumn("bridged", lit(1L))
      .write.mode("append").parquet(s"$dir/labels")
    one.write.mode("append").parquet(s"$dir/labels")
    assert(spark.read.parquet(s"$dir/labels")
      .filter($"doc_id" === 50L).count() == 3)
    val deduped = CorpusPipeline.readLabels(spark, s"$dir/labels")
      .select($"doc_id", $"cluster", $"split", $"bridged")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(deduped.size == 4, s"one row per doc after dedup: $deduped")
    assert(deduped(50L) == ((50L, labels(50L)._2, labels(50L)._3, 1L)),
      s"min (cluster, split) + max bridged: ${deduped(50L)}")
    // missing dir -> empty frame of the labels schema
    assert(CorpusPipeline.readLabels(spark, s"$dir/nope").count() == 0)
  }

  test("streamingNearDedup evalContainment: streamed survivors == batch containment pass on out-of-order arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val evalText = "the quick brown fox jumps over the lazy dog near " +
      "the river bank at dawn while the birds sing softly"
    val eval = Seq((100L, evalText)).toDF("doc_id", "text")
    val covering = evalText + " with a few extra trailing words appended today"
    val onePhrase = "the quick brown fox jumps over many unrelated stories " +
      "about harbor logistics and heavy shipping cranes downtown"
    val docs = Seq(
      (1L, covering),   // covers 100% of the eval shingle set -> dropped
      (2L, onePhrase),  // shares 2 shingles (< 3/5) -> survives (the
                        //   one-shared-phrase case any-overlap deletes)
      (3L, "entirely different words concerning glacier weather and mountain climbing routes"),
      (4L, "another standalone text about medieval manuscripts and careful preservation work"))

    // the batch containment pass — order-free by construction
    val batchKept = CorpusPipeline.decontaminateByContainment(
        docs.toDF("doc_id", "text"), eval, "doc_id", "text", 3, 5)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchKept == Set(2L, 3L, 4L), s"fixture sanity; got $batchKept")

    // stream the SAME docs out of order: the contaminated doc arrives
    // LAST — containment has no cross-batch state, so arrival order
    // cannot change the survivor set
    val dir = java.nio.file.Files.createTempDirectory("streamdecon").toString
    val in = MemoryStream[(Long, String)]
    val q = CorpusPipeline.streamingNearDedup(in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/out", s"$dir/cp",
      evalContainment = Some((eval, 3, 5)))
    try {
      Seq(Seq(docs(1), docs(2)), Seq(docs(3), docs(0))).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(s"$dir/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed == batchKept,
      s"streamed containment diverged: missing=${batchKept -- streamed} " +
        s"extra=${streamed -- batchKept}")
    // decontamination runs BEFORE the index append: a contaminated doc
    // never existed for the corpus, so its signatures must not block
    // future near-dups of its (legitimately unseen) text
    val indexed = spark.read.parquet(s"$dir/index")
      .select($"doc_id").as[Long].collect().toSet
    assert(indexed == Set(2L, 3L, 4L), s"index must exclude contaminated docs; got $indexed")
  }

  test("streamingExactNearDedup: the recall-1.0 twin matches its exact batch recap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{Dedup, SetSim}
    import graft.functions.TextFunctions.shingleHashes
    implicit val sqlCtx = spark.sqlContext

    def edit(base: String, repl: (Int, String)*): String = {
      val w = base.split(' ')
      repl.foreach { case (i, s) => w(i) = s }
      w.mkString(" ")
    }
    val PAIR_B = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango uniform victor whiskey"
    val CHAIN_B = "anchor bridge canyon delta engine furnace glacier " +
      "hammer ingot journey keystone ladder mortar needle oxide piston " +
      "quarry rudder spindle turbine valve winch zephyr"
    val b1 = Seq(
      (1L, PAIR_B), (2L, edit(PAIR_B, 11 -> "limon")),   // in-batch pair
      (30L, CHAIN_B),                                    // chain head
      (40L, "completely unrelated text about volcanic geology and minerals"))
    val b2 = Seq(
      (31L, edit(CHAIN_B, 0 -> "qq", 1 -> "rr", 2 -> "ss", 3 -> "tt")),
      (41L, "another unrelated document on deep sea hydrothermal vents"))
    val b3 = Seq(
      // near 31 (same head edit, new tail edit) but too far from 30:
      // only the all-seen index can block it after 31 was dropped
      (32L, edit(CHAIN_B, 0 -> "qq", 1 -> "rr", 2 -> "ss", 3 -> "tt",
        19 -> "ww", 20 -> "xx", 21 -> "yy", 22 -> "vv")),
      (42L, "a third standalone text concerning manuscript preservation"))
    val all = (b1 ++ b2 ++ b3).toDF("doc_id", "text")

    // exact recap: SetSim pair graph at 3/5 → components → keep min
    val sets = all.select($"doc_id",
      org.apache.spark.sql.functions.array_distinct(
        shingleHashes($"text", 3)).as("hs"))
    val pairs = SetSim.jaccardSelfJoinSets(sets, "doc_id", "hs", 3, 5)
      .select($"d1", $"d2")
    val pairSet = pairs.as[(Long, Long)].collect().toSet
    assert(pairSet.contains((30L, 31L)) && pairSet.contains((31L, 32L)) &&
      !pairSet.contains((30L, 32L)), s"chain shape wrong: $pairSet")
    val drop = Dedup.duplicateClustersStar(pairs)
      .filter($"doc_id" =!= $"cluster").select($"doc_id")
    val recap = all.join(drop, Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Long].collect().toSet

    val dir = java.nio.file.Files.createTempDirectory("exactneardedup").toString
    val in = MemoryStream[(Long, String)]
    val q = CorpusPipeline.streamingExactNearDedup(
      in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/out", s"$dir/cp")
    try {
      Seq(b1, b2, b3).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = spark.read.parquet(s"$dir/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed == recap,
      s"streaming diverged: missing=${recap -- streamed} extra=${streamed -- recap}")
    assert(Set(1L, 30L, 40L, 41L, 42L).subsetOf(streamed))
    assert(Set(2L, 31L, 32L).intersect(streamed).isEmpty,
      "dropped-middle chain tail must be blocked by the index")
    assert(spark.read.parquet(s"$dir/index").count() == all.count())
  }
}
