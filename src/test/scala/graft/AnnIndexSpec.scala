package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Similarity

/** Scale pattern for similarity search: persist the corpus PARTITIONED BY
  * its LSH bucket. A query then computes its own bucket and reads only that
  * partition — partition pruning turns an ANN probe into a scan of
  * 1/2^planes of the data (at 100 TB: the difference between touching
  * ~6 TB and touching everything). The in-memory `lshTopPairs` op uses the
  * same bucketing, so recall characteristics are identical.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("LSH-partitioned index: probe reads one partition (pruned scan), top-k matches in-bucket brute force") {
    val dir = java.nio.file.Files.createTempDirectory("ann-index").toString
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
      .withColumn("v", Similarity.asDouble($"embedding"))
      .withColumn("bucket", Similarity.lshBucket($"v", 4, 64))
    emb.select($"vec_id", $"embedding", $"bucket")
      .write.partitionBy("bucket").mode("overwrite").parquet(dir)

    // probe: vec_id 7 — its bucket from the same deterministic planes
    val probe = emb.filter($"vec_id" === 7)
      .select($"v", $"bucket").head()
    val qv = probe.getAs[scala.collection.Seq[Double]](0).toSeq
    val bucket = probe.getLong(1)

    val index = spark.read.parquet(dir)
    val probed = index.filter($"bucket" === bucket && $"vec_id" =!= 7)
    // partition pruning visible in the scan
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains(s"bucket#") || scan.contains("PartitionFilters"))
    assert(scan.contains("PartitionFilters: [isnotnull(bucket"),
      s"expected pruned partition filter in:\n$scan")

    val qvCol = lit(qv.toArray)
    val got = probed
      .select($"vec_id",
        round(Similarity.dot(Similarity.asDouble($"embedding"), qvCol) /
          (Similarity.norm(Similarity.asDouble($"embedding")) * lit(math.sqrt(qv.map(x => x * x).sum))), 6).as("cos"))
      .orderBy($"cos".desc, $"vec_id".asc).limit(3)
      .as[(Long, Double)].collect().map(_._1).toSeq

    // same result as in-memory within-bucket brute force
    val expected = emb.filter($"bucket" === bucket && $"vec_id" =!= 7)
      .select($"vec_id",
        round(Similarity.dot($"v", qvCol) /
          (Similarity.norm($"v") * lit(math.sqrt(qv.map(x => x * x).sum))), 6).as("cos"))
      .orderBy($"cos".desc, $"vec_id".asc).limit(3)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("AnnIndex persisted lifecycle: probe from artifacts == in-memory IVF-PQ; append finds new vectors without retrain") {
    import graft.operators.{AnnIndex, Ivf, Pq}
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ann-lifecycle").toString
    val (dims, subDims, m, pqK) = (64, 8, 8, 16)
    val coarse = Ivf.train(emb, "vec_id", "embedding", k = 8, dims = dims, iters = 2)
    val pq = Pq.train(emb, "vec_id", "embedding", m = m, subDims = subDims,
      k = pqK, iters = 2)
    AnnIndex.write(emb, "vec_id", "embedding", coarse, dims, pq, subDims, dir)
    // the models round-trip bit-for-bit
    val (coarse2, dims2, pq2, subDims2) = AnnIndex.loadModel(spark, dir)
    assert(dims2 == dims && subDims2 == subDims)
    assert(coarse2.toSeq == coarse.toSeq && pq2.toSeq == pq.toSeq)
    // probe from disk == the fully in-memory composed plan
    val queries = emb.filter($"vec_id" < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"adc", $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val persisted = rows(AnnIndex.probe(spark, dir, queries,
      "vec_id", "embedding", nprobe = 2, kNeighbors = 3))
    val inMem = rows(Pq.ivfPqTopK(spark,
      Pq.assignCodes(Ivf.assign(emb, "embedding", coarse, dims),
        "embedding", pq, subDims),
      queries, "vec_id", "embedding", coarse, dims, pq,
      nprobe = 2, kNeighbors = 3))
    assert(persisted == inMem && persisted.nonEmpty)
    // append: a planted near-copy of vec_id 3 under a fresh id lands in
    // the same posting list and surfaces as its rank-1 ADC neighbor —
    // no retrain, the old model assigns it
    val planted = emb.filter($"vec_id" === 3)
      .select(lit(90001L).as("vec_id"), $"embedding")
    AnnIndex.append(planted, "vec_id", "embedding", dir)
    // ADC of an exact copy is the query's own quantization error — the
    // minimum any CODED neighbor can reach, so the copy ranks first
    val after = AnnIndex.probe(spark, dir, emb.filter($"vec_id" === 3),
        "vec_id", "embedding", nprobe = 1, kNeighbors = 1)
      .select($"neighbor_id").as[Long].collect()
    assert(after.toSeq == Seq(90001L),
      s"expected the planted copy at rank 1, got ${after.toSeq}")
  }

  test("probePruned == probe, and the coded scan carries a centroid partition filter") {
    import graft.operators.{AnnIndex, Ivf, Pq}
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ann-pruned").toString
    val coarse = Ivf.train(emb, "vec_id", "embedding", k = 8, dims = 64, iters = 2)
    val pq = Pq.train(emb, "vec_id", "embedding", m = 8, subDims = 8, k = 16, iters = 2)
    AnnIndex.write(emb, "vec_id", "embedding", coarse, 64, pq, 8, dir)
    val queries = emb.filter($"vec_id" < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"adc", $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val pruned = AnnIndex.probePruned(spark, dir, queries,
      "vec_id", "embedding", nprobe = 2, kNeighbors = 3)
    assert(rows(pruned) == rows(AnnIndex.probe(spark, dir, queries,
      "vec_id", "embedding", nprobe = 2, kNeighbors = 3)))
    // the scan is partition-pruned to the probed lists: with 5 queries ×
    // nprobe 2 over 8 lists the literal IN covers < all partitions, and
    // the plan's PartitionFilters entry proves files outside it are
    // never opened — the any-corpus-size serving property
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [centroid") ||
      scan.contains("PartitionFilters: [isnotnull(centroid"),
      s"expected a centroid partition filter in:\n$scan")
  }

  test("compactCoded: a replayed append dedups by id and probes rank clean again") {
    import graft.operators.{AnnIndex, Ivf, Pq}
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ann-compact").toString
    val coarse = Ivf.train(emb, "vec_id", "embedding", k = 8, dims = 64, iters = 2)
    val pq = Pq.train(emb, "vec_id", "embedding", m = 8, subDims = 8, k = 16, iters = 2)
    AnnIndex.write(emb, "vec_id", "embedding", coarse, 64, pq, 8, dir)
    val planted = emb.filter($"vec_id" === 3)
      .select(lit(90001L).as("vec_id"), $"embedding")
    // the at-least-once failure mode: the same append replayed
    AnnIndex.append(planted, "vec_id", "embedding", dir)
    AnnIndex.append(planted, "vec_id", "embedding", dir)
    val dup = AnnIndex.probe(spark, dir, emb.filter($"vec_id" === 3),
        "vec_id", "embedding", nprobe = 1, kNeighbors = 2)
      .select($"neighbor_id").as[Long].collect().toSeq
    assert(dup.count(_ == 90001L) == 2,
      s"replay must surface the duplicate (the bug compact exists for): $dup")
    val (before, after) = AnnIndex.compactCoded(spark, dir)
    assert(after == before - 1, s"exactly the replayed row drops: $before -> $after")
    val clean = AnnIndex.probe(spark, dir, emb.filter($"vec_id" === 3),
        "vec_id", "embedding", nprobe = 1, kNeighbors = 2)
      .select($"neighbor_id").as[Long].collect().toSeq
    assert(clean.count(_ == 90001L) == 1 && clean.size == 2,
      s"post-compact top-2 must be distinct ids: $clean")
  }

  test("compact lease: appends and second compacts refuse while held; a stale lease is taken over") {
    import graft.operators.{AnnIndex, Ivf, Pq}
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ann-lease").toString
    val coarse = Ivf.train(emb, "vec_id", "embedding", k = 8, dims = 64, iters = 2)
    val pq = Pq.train(emb, "vec_id", "embedding", m = 8, subDims = 8, k = 16, iters = 2)
    AnnIndex.write(emb, "vec_id", "embedding", coarse, 64, pq, 8, dir)
    val model = AnnIndex.loadModel(spark, dir)
    val planted = emb.filter($"vec_id" === 3)
      .select(lit(90001L).as("vec_id"), $"embedding")
    // simulate a compact crashed (or running) mid-window: lease present
    val fs = AnnIndex.leasePath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    locally { val o = fs.create(AnnIndex.leasePath(dir), false); o.close() }
    // an append during the swap window would land in the directory about
    // to be moved aside and silently lose rows — it must refuse instead
    val ea = intercept[IllegalArgumentException] {
      AnnIndex.appendWith(planted, "vec_id", "embedding", model, dir)
    }
    assert(ea.getMessage.contains("compact holds"), ea.getMessage)
    // a second compact against a FRESH lease refuses too (single writer)
    val ec = intercept[IllegalArgumentException] {
      AnnIndex.compactCoded(spark, dir)
    }
    assert(ec.getMessage.contains("in flight"), ec.getMessage)
    // age the lease past the takeover window: the next compact owns it,
    // runs, and releases — after which appends work again
    fs.setTimes(AnnIndex.leasePath(dir),
      System.currentTimeMillis() - 25L * 3600 * 1000, -1)
    val (before, after) = AnnIndex.compactCoded(spark, dir)
    assert(before == after, s"nothing to dedup: $before -> $after")
    assert(!fs.exists(AnnIndex.leasePath(dir)), "lease must be released")
    AnnIndex.appendWith(planted, "vec_id", "embedding", model, dir)
    val got = AnnIndex.probe(spark, dir, emb.filter($"vec_id" === 3),
        "vec_id", "embedding", nprobe = 1, kNeighbors = 1)
      .select($"neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(90001L), s"post-lease append must be probe-visible: $got")
    // a compact that fails BEFORE its swap releases the lease (an empty
    // dir has no moved-aside copy to protect), so appends can resume
    val dir2 = java.nio.file.Files.createTempDirectory("ann-lease2").toString
    intercept[Exception] { AnnIndex.compactCoded(spark, dir2) }
    assert(!fs.exists(AnnIndex.leasePath(dir2)),
      "a pre-swap failure must release the lease so appends resume")
    // a REBUILD is a maintenance writer too: it must refuse while a
    // fresh lease is held (a rebuild racing a compact's swap would be
    // overwritten or moved aside)
    locally { val o = fs.create(AnnIndex.leasePath(dir), false); o.close() }
    val (coarse2, _, pq2, _) = model
    val ew = intercept[IllegalArgumentException] {
      AnnIndex.write(emb, "vec_id", "embedding", coarse2, 64, pq2, 8, dir)
    }
    assert(ew.getMessage.contains("in flight"), ew.getMessage)
    fs.delete(AnnIndex.leasePath(dir), false)
  }

  test("interrupted swap: the next compact takes over the stale lease, rolls coded_old back, and completes") {
    import graft.operators.{AnnIndex, Ivf, Pq}
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ann-swapcrash").toString
    val coarse = Ivf.train(emb, "vec_id", "embedding", k = 8, dims = 64, iters = 2)
    val pq = Pq.train(emb, "vec_id", "embedding", m = 8, subDims = 8, k = 16, iters = 2)
    AnnIndex.write(emb, "vec_id", "embedding", coarse, 64, pq, 8, dir)
    val before = AnnIndex.loadCoded(spark, dir).count()
    // simulate a compact that crashed between rename(live->old) and
    // rename(tmp->live): live missing, old holds the only complete copy,
    // the (now stale) lease still held
    val fs = AnnIndex.leasePath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$dir/coded")
    val old = new org.apache.hadoop.fs.Path(s"$dir/coded_old")
    assert(fs.rename(live, old))
    locally { val o = fs.create(AnnIndex.leasePath(dir), false); o.close() }
    fs.setTimes(AnnIndex.leasePath(dir),
      System.currentTimeMillis() - 25L * 3600 * 1000, -1)
    // appends stay blocked through the whole crashed window
    val planted = emb.filter($"vec_id" === 3)
      .select(lit(90001L).as("vec_id"), $"embedding")
    intercept[IllegalArgumentException] {
      AnnIndex.appendWith(planted, "vec_id", "embedding",
        AnnIndex.loadModel(spark, dir), dir)
    }
    // the next compact is the recovery: takeover + rollback + swap
    val (b2, a2) = AnnIndex.compactCoded(spark, dir)
    assert(b2 == before && a2 == before, s"rolled-back compact sees all rows: $b2/$a2")
    assert(fs.exists(live) && !fs.exists(old) &&
      !fs.exists(AnnIndex.leasePath(dir)),
      "recovery must restore live, clear old, release the lease")
  }

  test("tombstones: delete is probe-effective immediately, folded and cleared by compact, honored by rebuild") {
    import graft.operators.{AnnIndex, Ivf, Pq}
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ann-delete").toString
    val coarse = Ivf.train(emb, "vec_id", "embedding", k = 8, dims = 64, iters = 2)
    val pq = Pq.train(emb, "vec_id", "embedding", m = 8, subDims = 8, k = 16, iters = 2)
    AnnIndex.write(emb, "vec_id", "embedding", coarse, 64, pq, 8, dir)
    val fs = AnnIndex.leasePath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an exact copy of vec 3 under a fresh id ranks at the top of its
    // own probe (ADC of a duplicate is its quantization error — assert
    // membership, not distance)
    val planted = emb.filter($"vec_id" === 3)
      .select(lit(90001L).as("vec_id"), $"embedding")
    AnnIndex.append(planted, "vec_id", "embedding", dir)
    def neighbors(pruned: Boolean) = {
      val f = if (pruned) AnnIndex.probePruned _ else AnnIndex.probe _
      f(spark, dir, emb.filter($"vec_id" === 3), "vec_id", "embedding", 1, 2)
        .select($"neighbor_id").as[Long].collect().toSet
    }
    assert(neighbors(pruned = false).contains(90001L))
    // the takedown: tombstone filed -> BOTH probe paths exclude it at
    // once, while the row physically remains in the lists
    AnnIndex.deleteIds(Seq(90001L).toDF("vec_id"), "vec_id", dir)
    assert(!neighbors(pruned = false).contains(90001L),
      "tombstoned id must vanish from probe before any compact")
    assert(!neighbors(pruned = true).contains(90001L),
      "and from the pruned probe path")
    val storedBefore = AnnIndex.loadCoded(spark, dir)
      .filter($"vec_id" === 90001L).count()
    assert(storedBefore == 1, "the row is only MASKED until compact folds it")
    // compact folds the tombstone into the rewrite and clears the table
    val (before, after) = AnnIndex.compactCoded(spark, dir)
    assert(after == before - 1, s"exactly the tombstoned row drops: $before -> $after")
    assert(!fs.exists(AnnIndex.deletesPath(dir)),
      "the tombstone table must be cleared once folded")
    assert(AnnIndex.loadCoded(spark, dir).filter($"vec_id" === 90001L).isEmpty,
      "the id must be physically gone from coded")
    assert(!neighbors(pruned = false).contains(90001L))
    // deletes respect the maintenance lease: refuse while held, like appends
    locally { val o = fs.create(AnnIndex.leasePath(dir), false); o.close() }
    val ed = intercept[IllegalArgumentException] {
      AnnIndex.deleteIds(Seq(1L).toDF("vec_id"), "vec_id", dir)
    }
    assert(ed.getMessage.contains("maintenance op holds"), ed.getMessage)
    fs.delete(AnnIndex.leasePath(dir), false)
    // a REBUILD honors pending tombstones even from an uncurated corpus:
    // the takedown must not resurrect
    AnnIndex.append(planted, "vec_id", "embedding", dir)
    AnnIndex.deleteIds(Seq(90001L).toDF("vec_id"), "vec_id", dir)
    val withPlant = emb.select($"vec_id", $"embedding").unionByName(planted)
    AnnIndex.write(withPlant, "vec_id", "embedding", coarse, 64, pq, 8, dir)
    assert(AnnIndex.loadCoded(spark, dir).filter($"vec_id" === 90001L).isEmpty,
      "rebuild must fold pending tombstones, not resurrect the takedown")
    assert(!fs.exists(AnnIndex.deletesPath(dir)),
      "rebuild clears the folded tombstone table")
  }

  test("lease heartbeat: a compact outliving the takeover window keeps ownership; takeover still works once the owner stops beating") {
    import graft.operators.{AnnIndex, Ivf, Pq}
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ann-heartbeat").toString
    val coarse = Ivf.train(emb, "vec_id", "embedding", k = 8, dims = 64, iters = 2)
    val pq = Pq.train(emb, "vec_id", "embedding", m = 8, subDims = 8, k = 16, iters = 2)
    AnnIndex.write(emb, "vec_id", "embedding", coarse, 64, pq, 8, dir)
    val fs = AnnIndex.leasePath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = AnnIndex.loadCoded(spark, dir).count()
    // a SLOW compact: takeover window 400ms, the Spark dedup+rewrite
    // takes seconds — without the heartbeat every later contender would
    // "take over" a healthy owner and waste its corpus-sized rewrite
    val slow = Future(AnnIndex.compactCoded(spark, dir, leaseTakeoverMs = 400L))
    val deadline = System.currentTimeMillis() + 60000
    while (!fs.exists(AnnIndex.leasePath(dir)) &&
           System.currentTimeMillis() < deadline) Thread.sleep(10)
    assert(fs.exists(AnnIndex.leasePath(dir)), "the slow compact must be holding the lease")
    // let the ORIGINAL stamp age well past the window, then contend
    Thread.sleep(1000)
    if (fs.exists(AnnIndex.leasePath(dir))) {
      val ec = intercept[IllegalArgumentException] {
        AnnIndex.compactCoded(spark, dir, leaseTakeoverMs = 400L)
      }
      assert(ec.getMessage.contains("in flight"),
        s"the heartbeat must keep the live owner's lease FRESH: ${ec.getMessage}")
    } // else the slow compact already finished — the assert below still pins success
    val (b, a) = Await.result(slow, 120.seconds)
    assert(b == before && a == before,
      s"the slow compact must complete despite outliving the window: $b/$a")
    assert(!fs.exists(AnnIndex.leasePath(dir)), "lease released after success")
    // once the owner is DEAD (no heartbeat), staleness still means
    // takeover: a hand-planted lease aged past the window is claimed
    locally { val o = fs.create(AnnIndex.leasePath(dir), false); o.close() }
    fs.setTimes(AnnIndex.leasePath(dir), System.currentTimeMillis() - 1000, -1)
    val (b2, a2) = AnnIndex.compactCoded(spark, dir, leaseTakeoverMs = 400L)
    assert(b2 == before && a2 == before)
    assert(!fs.exists(AnnIndex.leasePath(dir)))
  }

  test("drift gate: undrifted appends stay under the retrain threshold; a shifted batch crosses it") {
    import graft.operators.{AnnIndex, Ivf, Pq}
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ann-drift").toString
    val coarse = Ivf.train(emb, "vec_id", "embedding", k = 8, dims = 64, iters = 2)
    val pq = Pq.train(emb, "vec_id", "embedding", m = 8, subDims = 8, k = 16, iters = 2)
    AnnIndex.write(emb, "vec_id", "embedding", coarse, 64, pq, 8, dir)
    // freshly built: current occupancy IS the train histogram
    assert(math.abs(AnnIndex.driftScore(spark, dir)) < 1e-12)
    // an undrifted append: a 10% resample of the corpus itself lands in
    // lists proportionally — PSI stays in the append-noise band
    val resample = emb.sample(withReplacement = false, 0.1, seed = 7)
      .select(($"vec_id" + 500000L).as("vec_id"), $"embedding")
    AnnIndex.append(resample, "vec_id", "embedding", dir)
    val noise = AnnIndex.driftScore(spark, dir)
    assert(noise < 0.2, s"undrifted append must not trip the gate: $noise")
    // a drifted batch: corpus-sized mass of ONE vector piles into one
    // list — the coarse quantizer no longer tessellates the data
    val n = emb.count()
    val one = emb.filter($"vec_id" === 3).select($"embedding").head()
      .getAs[scala.collection.Seq[Float]](0)
    val drifted = spark.range(600000L, 600000L + n)
      .select($"id".as("vec_id"), typedLit(one.toArray).as("embedding"))
    AnnIndex.append(drifted, "vec_id", "embedding", dir)
    val psi = AnnIndex.driftScore(spark, dir)
    assert(psi >= 0.2, s"a corpus-sized single-point batch must cross the retrain threshold: $psi")
    assert(psi > 4 * noise, s"drift must dominate append noise: $psi vs $noise")
  }

  test("AnnIndexApp main: build -> append -> probe through the CLI surface") {
    import graft.apps.AnnIndexApp
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val base = java.nio.file.Files.createTempDirectory("ann-app").toString
    val idx = s"$base/idx"
    emb.write.parquet(s"$base/corpus")
    emb.filter($"vec_id" === 7)
      .select(lit(91001L).as("vec_id"), $"embedding")
      .write.parquet(s"$base/new")
    emb.filter($"vec_id" === 7).write.parquet(s"$base/queries")
    AnnIndexApp.main(Array("--mode", "build", "--index", idx,
      "--input", s"$base/corpus", "--list-size", "64"))
    AnnIndexApp.main(Array("--mode", "append", "--index", idx,
      "--input", s"$base/new"))
    AnnIndexApp.main(Array("--mode", "probe", "--index", idx,
      "--queries", s"$base/queries", "--nprobe", "2", "--topk", "3",
      "--out", s"$base/result"))
    val got = spark.read.parquet(s"$base/result")
      .orderBy($"rank").select($"neighbor_id").as[Long].collect().toSeq
    assert(got.size == 3 && got.head == 91001L,
      s"the appended copy of the query vector must rank first, got $got")
    // stream-append: a JSON-lines copy of vec 9 under a fresh id flows
    // through the streaming appender (model loaded once, per-batch
    // scan-local assign + partitioned append) and is probe-visible
    val v9 = emb.filter($"vec_id" === 9)
      .select($"embedding".cast("array<float>"))
      .as[Array[Float]].head()
    val streamIn = s"$base/stream-in"
    new java.io.File(streamIn).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Path.of(streamIn, "v.jsonl"),
      s"""{"vec_id":92001,"embedding":[${v9.mkString(",")}]}""".getBytes)
    AnnIndexApp.main(Array("--mode", "stream-append", "--index", idx,
      "--source", "file", "--input", streamIn,
      "--checkpoint", s"$base/stream-cp"))
    spark.sparkContext.setLogLevel("ERROR")
    emb.filter($"vec_id" === 9).write.parquet(s"$base/q9")
    AnnIndexApp.main(Array("--mode", "probe", "--index", idx,
      "--queries", s"$base/q9", "--nprobe", "1", "--topk", "1",
      "--out", s"$base/result9"))
    val got9 = spark.read.parquet(s"$base/result9")
      .select($"neighbor_id").as[Long].collect().toSeq
    assert(got9 == Seq(92001L),
      s"the stream-appended copy must rank first for its source vector, got $got9")
    // stats mode: the drift/occupancy report runs against the same index
    // (two tiny appends cannot trip the 0.2 retrain gate)
    AnnIndexApp.main(Array("--mode", "stats", "--index", idx))
    assert(graft.operators.AnnIndex.driftScore(spark, idx) < 0.2)
  }
}
