package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSession.sf, "documents")

  test("exactDedup keeps one id per distinct normalized text") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "  A b C "), (4L, "x y z"))
      .toDF("doc_id", "text")
    // 1,2 identical; 3 differs only by case/trim — all collapse to min id 1
    val kept = Dedup.exactDedup(df, "doc_id", "text")
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L))
  }

  test("wide (128-bit MD5) fingerprint survives a 31-multiplier collision the 30-bit path cannot") {
    // 31-multiplier collision stable under the lower/trim normalization:
    // 'a'*31+'z' == 'b'*31+'[' == 3129 — distinct texts, one fingerprint
    val df = Seq((1L, "az"), (2L, "b["), (3L, "az")).toDF("doc_id", "text")
    val narrow = Dedup.exactDedup(df, "doc_id", "text")
      .as[Long].collect().sorted
    assert(narrow.toSeq == Seq(1L), "30-bit path collides az/b[ into one group (the documented caveat)")
    val wide = Dedup.exactDedup(df, "doc_id", "text", wide = true)
      .as[Long].collect().sorted
    assert(wide.toSeq == Seq(1L, 2L), "MD5 path keeps distinct texts apart, collapses true dups only")
  }

  test("minhash signature: identical docs get identical signatures; k entries") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text", 3, 16)
      .select($"doc_id", $"sig").as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 16)
  }

  test("LSH near-dup pipeline surfaces the 25 planted pairs at sf0.001") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
    assert(pairs.count() >= 25)
    // every surviving pair really is >= 0.5 jaccard (verification worked)
    assert(pairs.filter($"jacc" < 0.5).count() == 0)
  }

  test("banded simhashPairs equals brute-force hamming filter (no recall loss)") {
    val sample = docs.filter($"doc_id" < 120)
    val banded = Dedup.simhashPairs(sample, "doc_id", "text", 24, 1)
      .select($"d1", $"d2", $"hamming").as[(Long, Long, Int)].collect().toSet
    val sh = Dedup.simhashOf(sample, "doc_id", "text", 24)
    val brute = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        TextFunctions.hamming($"a.simhash", $"b.simhash").as("h"))
      .filter($"h" <= 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute)
    assert(brute.nonEmpty) // dense corpus: the comparison is not vacuous
  }

  test("duplicateClusters: empty pair graph returns empty labels (clean-corpus path)") {
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.duplicateClusters(empty).count() == 0)
  }

  test("duplicateClusters: min-label propagation finds connected components") {
    // chain 1-2-3, clique {10,11,12}, isolated edge 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
      .toDF("d1", "d2")
    val labels = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(10L) == 10L && labels(11L) == 10L && labels(12L) == 10L)
    assert(labels(20L) == 20L && labels(21L) == 20L)
    // keep rule: one representative per component
    assert(labels.values.toSet == Set(1L, 10L, 20L))
  }

  test("duplicateClusters converges on a long chain (diameter > default hop budget)") {
    // 10-node path 1-2-…-10: min label needs 9 propagation hops; a fixed
    // 5-iteration run (round-1 behavior) would split it into two clusters
    val pairs = (1L until 10L).map(i => (i, i + 1)).toDF("d1", "d2")
    val labels = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 10)
    assert(labels.values.toSet == Set(1L), s"chain not fully converged: $labels")
  }

  test("incrementalExact: in-shard min-id wins, index fps rejected, idempotent after index update") {
    val index = Seq((1L, "the quick brown fox"), (2L, "hello world"))
      .toDF("doc_id", "text")
    val shard = Seq(
      (10L, "  The Quick Brown Fox "), // dup of indexed 1 after normalize
      (11L, "fresh new content here"),
      (12L, "fresh new content here"), // in-shard dup of 11 -> min id wins
      (13L, "another novel document")).toDF("doc_id", "text")
    val fpIndex = Dedup.fingerprints(index, "text")
    val admitted = Dedup.incrementalExact(shard, fpIndex, "doc_id", "text")
    assert(admitted.select($"doc_id").as[Long].collect().toSet == Set(11L, 13L))
    // append admitted fps to the index: re-offering the same shard admits nothing
    val updated = fpIndex.union(admitted.select($"fp"))
    assert(Dedup.incrementalExact(shard, updated, "doc_id", "text").count() == 0)
    // NULL text -> NULL fp: matches nothing in the index, admitted (same
    // as the batch groupBy and the q84 oracle's NOT EXISTS semantics)
    val withNull = shard.union(Seq((14L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val admitted2 = Dedup.incrementalExact(withNull, fpIndex, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted2 == Set(11L, 13L, 14L), s"null-text row must be admitted: $admitted2")
  }

  test("incrementalNearDup: near-dups of indexed docs dropped, novel docs survive") {
    // 60-token doc: appending one token keeps jaccard ~0.98, so the
    // signatures agree on (at least) one full band with certainty for any
    // hash constants that agree on ~all entries
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val index = Seq((1L, base)).toDF("doc_id", "text")
    val shard = Seq(
      (10L, base + " extra"),                     // near-dup of indexed 1
      (11L, "completely different words entirely unrelated to anything")
    ).toDF("doc_id", "text")
    val indexSigs = Dedup.minhashSignatures(index, "doc_id", "text", 3, 16)
    val kept = Dedup.incrementalNearDup(shard, indexSigs, "doc_id", "text",
      n = 3, k = 16, bands = 4, threshold = 0.5)
    assert(kept.select($"doc_id").as[Long].collect().toSet == Set(11L),
      "the near-dup of the indexed doc must drop; the novel doc must survive")
  }

  test("incrementalExact: multiple NULL-text rows share one NULL-fp group; min id admitted") {
    // all NULL fps collapse into ONE groupBy group (Spark groups nulls
    // together), so only the min-id NULL row is admitted — same as
    // exactDedup's batch semantics and the q84 oracle
    val index = Dedup.fingerprints(Seq((1L, "indexed")).toDF("doc_id", "text"), "text")
    val shard = Seq((20L, null.asInstanceOf[String]), (21L, null.asInstanceOf[String]),
      (22L, "real text")).toDF("doc_id", "text")
    val admitted = Dedup.incrementalExact(shard, index, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted == Set(20L, 22L),
      s"min-id NULL row + the real row must be admitted, got $admitted")
  }

  test("duplicateClustersStar: identical labels to min-label propagation on mixed graphs") {
    val graphs = Seq(
      // chain + clique + isolated edge (the min-label fixture)
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)),
      // long chain
      (1L until 10L).map(i => (i, i + 1)),
      // star + bridge + reversed/duplicated pairs
      Seq((5L, 1L), (5L, 2L), (5L, 3L), (3L, 9L), (9L, 3L), (2L, 5L), (100L, 50L)))
    graphs.foreach { g =>
      val pairs = g.toDF("d1", "d2")
      val minLabel = Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toMap
      val star = Dedup.duplicateClustersStar(pairs).as[(Long, Long)].collect().toMap
      assert(star == minLabel, s"label mismatch on $g:\nstar=$star\nminLabel=$minLabel")
    }
  }

  test("duplicateClustersStar: empty pair graph returns empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.duplicateClustersStar(empty).count() == 0)
  }

  test("star contraction needs O(log n) rounds on a chain; min-label needs O(n)") {
    // 64-node path: diameter 63. Min-label moves labels one hop per round;
    // star contraction doubles hook distance per round. The round count is
    // the driver-synchronous cost at scale, so it is pinned here (numbers
    // recorded in BASELINE.md).
    // maxIter=100: the DEFAULT cap (50) silently truncates min-label on a
    // 63-diameter graph — exactly the failure mode star contraction removes
    // (it converges in ~log2 rounds, far inside any sane cap)
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("d1", "d2")
    val (mlLabels, mlRounds) = Dedup.minLabelClustersWithRounds(pairs, maxIter = 100)
    val (stLabels, stRounds) = Dedup.starClustersWithRounds(pairs)
    info(s"64-node chain: star=$stRounds rounds, min-label=$mlRounds rounds")
    assert(mlLabels.as[(Long, Long)].collect().toMap ==
      stLabels.as[(Long, Long)].collect().toMap)
    assert(stLabels.select($"cluster").distinct().as[Long].collect().toSeq == Seq(1L))
    assert(stRounds * 2 <= mlRounds,
      s"star contraction must at least halve the rounds: star=$stRounds minLabel=$mlRounds")
    assert(stRounds <= 8, s"expected ~log2(64) star rounds, got $stRounds")
  }

  test("shingles guard: doc shorter than n yields empty set, null-safe minhash") {
    val df = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text", 3, 4)
      .select($"doc_id", $"sig").as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == Seq.fill(4)(TextFunctions.HashMod)) // sentinel
    assert(sigs(2L).forall(_ < TextFunctions.HashMod))
  }

  test("incrementalExactBloomed admits exactly incrementalExact's set — healthy AND saturated bloom") {
    import graft.operators.RuntimeFilter
    val index = Dedup.fingerprints(
      Seq((1L, "seen before"), (2L, "also indexed")).toDF("doc_id", "text"), "text")
    val shard = Seq((10L, "novel one"), (11L, "seen before"), (12L, "novel one"),
      (13L, "novel two"), (14L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val plain = Dedup.incrementalExact(shard, index, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    // healthy bloom: negatives skip the index, positives get verified
    val bits = 1 << 10
    val bloom = RuntimeFilter.bloomBits(index, col("fp"), bits, 3)
    val bloomed = Dedup.incrementalExactBloomed(shard, index, bloom, bits,
      "doc_id", "text").select($"doc_id").as[Long].collect().toSet
    assert(bloomed == plain, s"bloomed $bloomed != plain $plain")
    assert(plain == Set(10L, 13L, 14L)) // min-id per fp, NULL-fp row admitted
    // fully saturated bloom (all 64 bits set): every fp probes positive,
    // everything degrades to the exact anti-join — output must not change
    val saturated = Dedup.incrementalExactBloomed(shard, index, Array(-1L), 64,
      "doc_id", "text").select($"doc_id").as[Long].collect().toSet
    assert(saturated == plain, "a saturated bloom may cost, never change results")
  }

  test("resolveClustersByQuality keeps the best member, NOT the min id; ties break low") {
    // cluster {1,2,3}: doc 2 has the best quality, so min-id keep (doc 1)
    // and quality keep (doc 2) DIFFER — the point of the operator
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("d1", "d2")
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (4L, 0.7), (5L, 0.7))
      .toDF("doc_id", "quality")
    val got = Dedup.resolveClustersByQuality(pairs, scores, "doc_id", "quality")
      .select($"doc_id", $"cluster", $"keep").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(Seq(1L, 2L, 3L).forall(got(_)._1 == 1L) && Seq(4L, 5L).forall(got(_)._1 == 4L))
    assert(got(2L)._2 == 1L && got(1L)._2 == 0L && got(3L)._2 == 0L,
      "the best-quality member must be the keeper")
    assert(got(4L)._2 == 1L && got(5L)._2 == 0L, "quality tie must break toward the lower id")
  }

  // — content-defined chunking —

  private def ph(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31 + c) % TextFunctions.HashMod)

  /** Plain-Scala replay of cdcChunks: (chunk, fp, n_toks) per chunk. */
  private def chunksOf(toks: Seq[String], avg: Int): Seq[(Long, Long, Long)] = {
    val bnd = toks.indices.map(i =>
      if (i > 0 && ph(toks(i - 1) + "_" + toks(i)) % avg == 0) 1L else 0L)
    val ids = bnd.scanLeft(0L)(_ + _).tail
    toks.indices.groupBy(ids).toSeq.sortBy(_._1).map { case (c, idx) =>
      (c, ph("x" + idx.map(toks).mkString(" ")), idx.length.toLong)
    }
  }

  test("cdcChunks matches a plain-Scala replay and partitions every doc") {
    val t1 = (1 to 40).map(i => s"tk${i % 13}")
    val t2 = (1 to 25).map(i => s"u$i")
    val df = Seq((1L, t1.mkString(" ")), (2L, t2.mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunks(df, "doc_id", "text", 8)
      .select($"doc_id", $"chunk", $"fp", $"n_toks")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq).toMap
    assert(got(1L) == chunksOf(t1, 8), "doc 1 chunk layout must match the replay")
    assert(got(2L) == chunksOf(t2, 8))
    // chunks partition the doc: ids contiguous from 0, token counts sum up
    got.foreach { case (id, cs) =>
      assert(cs.map(_._1) == cs.indices.map(_.toLong), s"doc $id chunk ids")
    }
    assert(got(1L).map(_._3).sum == t1.length && got(2L).map(_._3).sum == t2.length)
  }

  test("cdcChunks is stateless: runs incrementally on a stream, same chunks as batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, (1 to 40).map(i => s"tk${i % 13}").mkString(" ")),
      (2L, (1 to 25).map(i => s"u$i").mkString(" ")),
      (3L, "")) // empty doc must yield no chunks on the stream too
    val in = MemoryStream[(Long, String)]
    val q = Dedup.cdcChunks(in.toDF().toDF("doc_id", "text"), "doc_id", "text", 8)
      .writeStream.format("memory").queryName("cdc_chunks").outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("cdc_chunks")
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      val batch = Dedup.cdcChunks(docs.toDF("doc_id", "text"), "doc_id", "text", 8)
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == batch && got.nonEmpty)
      assert(!got.exists(_._1 == 3L), "empty doc must produce no chunks")
    } finally q.stop()
  }

  test("cdcChunks: an edit at the head re-chunks only its neighborhood") {
    // the CONTENT-DEFINED property — the reason over fixed-width chunking:
    // prepending a token shifts every token position, but boundaries
    // follow token-pair hashes, so all chunks after the first boundary
    // keep their fingerprints and still dedup against the original
    val base = (1 to 60).map(i => s"w${i % 17}_$i")
    val edited = "INSERTED" +: base
    val df = Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val fps = Dedup.cdcChunks(df, "doc_id", "text", 8)
      .select($"doc_id", $"fp").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tail1 = chunksOf(base, 8).drop(1).map(_._2).toSet
    assert(tail1.nonEmpty, "fixture needs at least one boundary in the base doc")
    assert(tail1.subsetOf(fps(2L)),
      "every base chunk after the first boundary must survive the head edit")
    assert((fps(1L) -- fps(2L)).size <= 1,
      "at most the head chunk may differ after a head edit")
  }

  test("lshBandsFor: S-curve midpoint lands nearest the threshold; " +
    "monotone — lower thresholds mean more bands") {
    // exhaustive check against the definition for a few (k, t)
    for (k <- Seq(8, 16, 64, 128); t <- Seq(0.2, 0.5, 0.8)) {
      val b = graft.operators.Dedup.lshBandsFor(k, t)
      assert(k % b == 0)
      def err(b: Int) = {
        val r = k / b
        math.abs(math.log(math.pow(1.0 / b, 1.0 / r)) - math.log(t))
      }
      val best = (1 to k).filter(k % _ == 0).map(err).min
      assert(math.abs(err(b) - best) < 1e-12, s"k=$k t=$t chose b=$b")
    }
    // catching MORE similar pairs (higher t) needs FEWER bands
    val bands = Seq(0.9, 0.6, 0.3).map(graft.operators.Dedup.lshBandsFor(64, _))
    assert(bands == bands.sorted, s"bands must grow as threshold falls: $bands")
    // and the benched q28 geometry (k=16, bands=4 -> r=4) is what the
    // tuner picks for its actual midpoint (1/4)^(1/4) = 0.707
    assert(graft.operators.Dedup.lshBandsFor(16, 0.7) == 4)
  }

  test("incrementalClusterSplit: adoption, singleton, and bridge verdicts on a planted chain") {
    // index: A (w1..w11) and B (w5..w15) carry hand-fed labels 1 and 2
    // (the label table is an INPUT — index-side clustering is q157's
    // job); A–B sit at 3-shingle jaccard 5/13 ≈ 0.38 (below threshold,
    // so A's exact dup matches ONLY cluster 1), while the shard's C
    // (w2..w14) reaches 8/12 ≈ 0.67 to BOTH — adopt-min + bridge
    val w = (1 to 15).map(i => s"word$i")
    val tA = w.slice(0, 11).mkString(" ")
    val tB = w.slice(4, 15).mkString(" ")
    val tC = w.slice(1, 14).mkString(" ")
    val index = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    val shard = Seq(
      (10L, tC),                        // bridges clusters 1 and 2
      (11L, tA),                        // exact dup of A -> adopts cluster 1
      (12L, "entirely unrelated content about tidal energy systems today"))
      .toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.minhashSignatures(
      index, "doc_id", "text", 3, 16)
    // guard the fixture's LSH candidacy itself (deterministic hashing):
    // C must verify against BOTH index docs
    val pairs = graft.operators.Dedup.incrementalNearDupPairs(
        shard, sigs, "doc_id", "text", 3, 16, 8, 0.5)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 1L)) && pairs.contains((10L, 2L)),
      s"fixture must band-collide C with both index docs, got $pairs")
    val labels = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "cluster")
    val got = graft.operators.Dedup.incrementalClusterSplit(
        shard, sigs, labels, "doc_id", "text", 3, 16, 8, 0.5, buckets = 10)
      .select($"doc_id", $"cluster", $"split", $"bridged")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def splitOf(label: Long): Long = {
      val s = s"split|$label"
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L) % 10
    }
    // C adopts the MINIMUM matched cluster and flags the bridge
    assert(got(10L) == ((1L, splitOf(1L), 1L)), s"bridge verdict: ${got(10L)}")
    // the exact dup adopts its one cluster, unbridged
    assert(got(11L) == ((1L, splitOf(1L), 0L)), s"adoption verdict: ${got(11L)}")
    // the fresh doc is its own singleton
    assert(got(12L) == ((12L, splitOf(12L), 0L)), s"singleton verdict: ${got(12L)}")
  }

  test("clusterSafeSplit: cluster members share a split; per-doc hashing would leak the planted pair") {
    // docs 1/2 share their full shingle set (jaccard 1.0 — every band
    // collides, so candidacy is deterministic regardless of minhash
    // seeds; an appended-word twin sat at 8/9 and missed all 4 bands),
    // 3 is unrelated, 4 is a singleton sharing nothing
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, "completely different words about volcanic rocks and minerals here"),
      (4L, "another standalone document concerning maritime navigation techniques"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.clusterSafeSplit(
        docs, "doc_id", "text", 3, 16, 4, 0.5, buckets = 10)
      .select($"doc_id", $"cluster", $"split")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "every doc must be assigned")
    // the near-dup pair shares cluster AND split
    assert(got(1L) == got(2L), s"near-dups must share cluster+split: $got")
    assert(got(1L)._1 == 1L, "cluster label is the component min id")
    // singletons are their own cluster
    assert(got(3L)._1 == 3L && got(4L)._1 == 4L)
    assert(got.values.forall(v => v._2 >= 0 && v._2 < 10))
    // the leak the operator prevents: doc 2's OWN-id hash differs from
    // its cluster's split hash here, so per-doc hashing would separate
    // the twins (fixture chosen so the contrast is real)
    def splitOf(label: Long): Long = {
      val s = s"split|$label"
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L) % 10
    }
    assert(got(2L)._2 == splitOf(1L), "split must hash the CLUSTER label")
    assert(splitOf(2L) != splitOf(1L),
      "fixture must demonstrate the per-doc-hash leak the operator prevents")
    // invariant on the real corpus: one split per cluster, several buckets hit
    val emb = graft.core.Tables.load(spark, TestSession.sf, "documents")
    val real = graft.operators.Dedup.clusterSafeSplit(
        emb, "doc_id", "text", 3, 16, 4, 0.5, buckets = 10)
    val perCluster = real.groupBy($"cluster")
      .agg(countDistinct($"split").as("ns"))
    assert(perCluster.filter($"ns" > 1).isEmpty, "a cluster must map to ONE split")
    assert(real.select($"split").distinct().count() > 3, "buckets must spread")
  }

  test("clusterSafeSplitExact: exact boundary-J pairs cluster (the pairs LSH bands may miss); no true pair straddles") {
    import graft.operators.{Dedup, SetSim}
    def words(pre: String, from: Int, to: Int) =
      (from to to).map(i => f"$pre$i%02d").mkString(" ")
    // A and B share exactly 14 of 28 distinct 3-shingles -> J = 1/2
    // EXACTLY (integer boundary, included by inter*2 >= union); C shares
    // 13/29 with A -> just under, excluded
    val a = words("w", 1, 23)
    val b = words("w", 1, 16) + " " + words("v", 17, 23)
    val c = words("w", 1, 15) + " " + words("u", 16, 23)
    val docs = Seq((1L, a), (2L, b), (3L, c),
      (4L, "wholly unrelated prose about other things entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.clusterSafeSplitExact(docs, "doc_id", "text",
        n = 3, tNum = 1, tDen = 2, buckets = 10)
      .select($"doc_id", $"cluster", $"split")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 1L && got(2L)._2 == 1L,
      s"the exact J = 1/2 boundary pair must share a cluster: $got")
    assert(got(1L)._3 == got(2L)._3, "same cluster -> same split")
    assert(got(3L)._2 == 3L && got(4L)._2 == 4L,
      s"just-under-threshold and unrelated docs stay singletons: $got")
    // the structural guarantee on the real corpus: EVERY exact pair at
    // the threshold shares a split
    val corpus = graft.core.Tables.load(spark, TestSession.sf, "documents")
    val sets = corpus.select($"doc_id",
      array_distinct(graft.functions.TextFunctions.shingleHashes($"text", 3)).as("hs"))
      .filter(size($"hs") >= 1)
    val truePairs = SetSim.jaccardSelfJoinSets(sets, "doc_id", "hs", 1, 2)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    assert(truePairs.nonEmpty, "fixture corpus must carry true pairs")
    val splits = Dedup.clusterSafeSplitExact(corpus, "doc_id", "text",
        n = 3, tNum = 1, tDen = 2, buckets = 10)
      .select($"doc_id", $"split").as[(Long, Long)].collect().toMap
    val straddling = truePairs.filter { case (x, y) => splits(x) != splits(y) }
    assert(straddling.isEmpty, s"no true pair may straddle: ${straddling.take(5)}")
  }

  test("snapshotDiff: every status drawn; whitespace/case-only rewrites count as unchanged") {
    val oldSnap = Seq(
      (1L, "stable text here"),
      (2L, "will be rewritten"),
      (3L, "gets dropped entirely"),
      (4L, "Mixed Case  Padded  ")).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "stable text here"),
      (2L, "was rewritten indeed"),
      (4L, "mixed case  padded"), // trim+lower-equal -> unchanged by design
      (5L, "brand new document")).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"), s"got $got")
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.snapshotDiff(
        oldSnap.withColumnRenamed("doc_id", "status"),
        newSnap.withColumnRenamed("doc_id", "status"), "status", "text")
    }
  }

  test("snapshotDiff: NULL text is in-domain — presence by side markers, fingerprints compared null-safely") {
    // md5(NULL) is NULL: fingerprint-nullness would misread every one of
    // these as added/changed — presence markers + <=> must not
    val oldSnap = Seq(
      (1L, null.asInstanceOf[String]), // stays NULL            -> unchanged
      (2L, null.asInstanceOf[String]), // gains text            -> changed
      (3L, "loses its text"),          // goes NULL             -> changed
      (4L, null.asInstanceOf[String])) // NULL row removed      -> removed
      .toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, "text appeared"),
      (3L, null.asInstanceOf[String]),
      (5L, null.asInstanceOf[String])) // NULL row added        -> added
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"), s"got $got")
  }
}
