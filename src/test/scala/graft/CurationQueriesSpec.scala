package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Semantic pins for the round-4 curation queries (q96–q100, q104–q108)
  * on planted corpora — the DuckDB oracle hash-checks them on the
  * synthetic tables; these prove the *semantics* on constructed inputs
  * (a known contaminated 5-gram, rule-boundary docs, closed-form
  * entropies, a hand-computable temperature mixture, the winnowing
  * window-coverage guarantee, hand-counted BPE pairs and source/doc
  * overlaps, a gapless pack replay, and a closed-form Zipf fit).
  */
class CurationQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** docs 0–1 play the eval set (doc_id < 20); docs 20+ are the corpus.
    * - doc 20 repeats eval doc 0's "e1 e2 e3 e4 e5" verbatim → contaminated
    * - doc 21 shares only the 4-gram prefix ("e5" → "x5") → clean
    * - docs 30/31 share the 6-token run "p q r s t u" (winnowing guarantee
    *   threshold w + n − 1 = 6); doc 32 is token-disjoint from both
    * - doc 40 is one token repeated (entropy 0); doc 41 is 4 distinct
    *   tokens (entropy 2); they also pin the mixture arithmetic: src_a
    *   carries 9 tokens, src_b 16, so q ∝ 3 : 4
    */
  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-curation-sf").toFile.getAbsolutePath
    val docs = Seq(
      (0L, "e1 e2 e3 e4 e5 tail0 tail1 tail2 tail3 tail4", "en", "src_a", 0L),
      (1L, "other eval doc with no overlap at all here now", "en", "src_a", 0L),
      (20L, "lead0 lead1 e1 e2 e3 e4 e5 trail0 trail1 trail2", "en", "src_a", 0L),
      (21L, "lead2 lead3 e1 e2 e3 e4 x5 trail3 trail4 trail5", "en", "src_a", 0L),
      (30L, "p q r s t u v w", "en", "src_b", 0L),
      (31L, "z1 z2 p q r s t u y1", "en", "src_b", 0L),
      (32L, "k1 k2 k3 k4 k5 k6 k7 k8", "en", "src_b", 0L),
      (40L, "same same same same", "en", "src_a", 0L),
      (41L, "one two three four", "en", "src_a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def run(q: String) = SparkEntry.queries(q)(spark, dir)

  test("q96: exact 5-gram hit flags the doc; a 4-gram-only overlap does not") {
    val flags = run("q96_ngram_decontaminate")
      .as[(Long, Int)].collect().toMap
    assert(flags(20L) == 1, "doc 20 repeats an eval 5-gram verbatim")
    assert(flags(21L) == 0, "doc 21 shares only a 4-gram — below n")
    assert(flags.keys.forall(_ >= 20L), "eval docs must not appear in output")
    // winnow/entropy fixtures are 5-gram-disjoint from the eval docs
    assert(Seq(30L, 31L, 32L, 40L, 41L).forall(flags(_) == 0))
  }

  test("q155: verbatim canary span flags the doc; a one-char-off span does not") {
    // own fixture: the shared one's texts are shorter than the 40-char
    // canary window, and growing them would shift q99/q104's token counts
    val d = Files.createTempDirectory("graft-canary-sf").toFile.getAbsolutePath
    val canary = "THE-QUICK-BROWN-FOX-JUMPS-OVER-LAZY-DOGS" // exactly 40 chars
    assert(canary.length == 40)
    val docs = Seq(
      (0L, s"0123456789$canary tail of the eval document", "en", "src_a", 0L),
      (20L, s"training prefix $canary training suffix", "en", "src_a", 0L),
      (21L, s"training prefix ${canary.dropRight(1)}X training suffix", "en", "src_a", 0L),
      (22L, "wholly unrelated training text with no span", "en", "src_a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    val q = SparkEntry.queries("q155_canary_decontaminate")(spark, d)
    val got = q.select($"doc_id", $"contaminated")
      .as[(Long, Int)].collect().toMap
    assert(got == Map(20L -> 1, 21L -> 0, 22L -> 0), s"got $got")
    // the match is a broadcast nested-loop SEMI join: text never shuffles
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") && plan.contains("LeftSemi"),
      s"expected a BNLJ left-semi canary match in:\n$plan")
  }

  test("Canary gate: a large planted list engages the gram route; verdicts identical on both routes") {
    import graft.operators.Canary
    val canaries = (1 to 60).map(i => f"PLANTED-CANARY-$i%03d-XYZW").toDF("phrase")
    val docs = Seq(
      (1L, "clean document with nothing planted at all"),
      (2L, "prefix PLANTED-CANARY-007-XYZW suffix"),
      (3L, "prefix PLANTED-CANARY-007-XYZQ suffix"), // one char off -> miss
      (4L, "PLANTED-CANARY-060-XYZW"), // text length == gram length exactly
      (5L, null.asInstanceOf[String]),
      (6L, "two: PLANTED-CANARY-001-XYZW and PLANTED-CANARY-002-XYZW"))
      .toDF("doc_id", "text")
    def route(ceiling: Long) = Canary.contaminatedIds(
      docs, "doc_id", "text", canaries, "phrase", canaryCountCeiling = ceiling)
    def ids(ceiling: Long) =
      route(ceiling).select($"doc_id").as[Long].collect().toSet
    val bnlj = ids(1000) // 60 <= 1000: the plain broadcast-contains route
    val gram = ids(16)   // 60 > 16: the gram-prefilter route engages
    assert(bnlj == Set(2L, 4L, 6L), s"plain route got $bnlj")
    assert(gram == bnlj, s"routes diverged: gram=$gram plain=$bnlj")
    // the gate genuinely switched plans
    assert(route(16).queryExecution.analyzed.toString.contains("char_gram_hashes"))
    assert(!route(1000).queryExecution.analyzed.toString.contains("char_gram_hashes"))
    // empty list contaminates nothing on either side of the gate
    assert(Canary.contaminatedIds(docs, "doc_id", "text",
      Seq.empty[String].toDF("phrase"), "phrase").count() == 0)
    // the too-big-to-broadcast route (same gram prefilter as a shuffle
    // equi-join + bounded-candidate verify) produces identical verdicts
    val joined = Canary.contaminatedIds(docs, "doc_id", "text", canaries,
        "phrase", canaryCountCeiling = 16, broadcastCharsCeiling = 1)
      .select($"doc_id").as[Long].collect().toSet
    assert(joined == bnlj, s"shuffle route diverged: joined=$joined plain=$bnlj")
    // a sub-4-codepoint canary no longer aborts the gated routes: it is
    // split off to the BNLJ contains path (g is computed over the LONG
    // canaries only) and the id sets union — so a list that merely grows
    // past the ceiling keeps working with short probes in it. "oth" hits
    // doc 1 ("nothing"), which every long canary misses.
    val withShort = canaries.unionByName(Seq("oth").toDF("phrase"))
    for (bcast <- Seq(Long.MaxValue, 1L)) {
      val got = Canary.contaminatedIds(docs, "doc_id", "text", withShort,
          "phrase", canaryCountCeiling = 16, broadcastCharsCeiling = bcast)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == bnlj + 1L, s"short+long union (bcast=$bcast) got $got")
    }
    // an ALL-short list above the ceiling has no gram route — it stays
    // on BNLJ (the only exact plan for sub-4-codepoint probes) and works
    val allShort = Canary.contaminatedIds(docs, "doc_id", "text",
        Seq("oth", "ume").toDF("phrase"), "phrase", canaryCountCeiling = 1)
      .select($"doc_id").as[Long].collect().toSet
    assert(allShort == Set(1L), s"all-short got $allShort")
  }

  test("q159 == q155 verdict-for-verdict on the shared corpus fixture") {
    val d = Files.createTempDirectory("graft-canary159-sf").toFile.getAbsolutePath
    val canary = "THE-QUICK-BROWN-FOX-JUMPS-OVER-LAZY-DOGS"
    val canary2 = "ANOTHER-EVAL-SPAN-OF-EXACTLY-FORTY-CHARS"
    // TWO eval docs: q159's ceiling=1 gate needs >1 canaries to engage
    val docs = Seq(
      (0L, s"0123456789$canary tail of the eval document", "en", "src_a", 0L),
      (1L, s"0123456789$canary2 tail of the other eval doc", "en", "src_a", 0L),
      (20L, s"training prefix $canary training suffix", "en", "src_a", 0L),
      (21L, s"training prefix ${canary.dropRight(1)}X training suffix", "en", "src_a", 0L),
      (22L, "wholly unrelated training text with no span", "en", "src_a", 0L),
      (23L, s"hits the second canary $canary2 here", "en", "src_a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    val plain = SparkEntry.queries("q155_canary_decontaminate")(spark, d)
      .as[(Long, Int)].collect().toSet
    val gated = SparkEntry.queries("q159_canary_gated")(spark, d)
    assert(gated.queryExecution.analyzed.toString.contains("char_gram_hashes"),
      "q159 must run the gram-prefilter route")
    assert(gated.as[(Long, Int)].collect().toSet == plain)
  }

  test("q97: each rule trips on its own boundary, pass is the conjunction") {
    val rows = run("q97_gopher_rules")
      .select($"doc_id", $"n_tok", $"r_count", $"r_mean_len", $"r_stop", $"r_uniq", $"pass")
      .as[(Long, Long, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    // doc 30: 8 tokens of length 1 → mean_len 1.0 < 2.0, no stopwords
    val d30 = rows(30L)
    assert(d30._2 == 8 && d30._4 == 0 && d30._5 == 0 && d30._7 == 0)
    // doc 40: 4 repeated tokens → uniq_ratio 0.25 < 0.3 and n_tok < 10
    val d40 = rows(40L)
    assert(d40._3 == 0 && d40._6 == 0 && d40._7 == 0)
    // doc 0: 10 tokens (boundary pass on r_count), mean_len in range,
    // no stopword → r_stop is the only failing rule
    val d0 = rows(0L)
    assert(d0._2 == 10 && d0._3 == 1 && d0._4 == 1 && d0._5 == 0 && d0._7 == 0)
  }

  test("q98: closed-form entropies — 0 for a constant doc, log2(n) for distinct") {
    val rows = run("q98_token_entropy")
      .select($"doc_id", $"n_tokens", $"n_distinct", $"entropy")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(40L)._2 == 4 && rows(40L)._3 == 1 && rows(40L)._4 == 0.0)
    assert(rows(41L)._2 == 4 && rows(41L)._3 == 4 && rows(41L)._4 == 2.0)
  }

  test("q99: alpha=0.5 reweighting and budget allocation, by hand") {
    // src_a: 10+10+10+10+4+4 = 48 tokens; src_b: 8+9+8 = 25 tokens
    val rows = run("q99_temperature_mix")
      .select($"source", $"n_tokens", $"p", $"q", $"alloc")
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (na, nb) = (48.0, 25.0)
    val (qa, qb) = (math.sqrt(na / 73), math.sqrt(nb / 73))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows("src_a")._2 == 48 && rows("src_b")._2 == 25)
    assert(rows("src_a")._4 == r6(qa / (qa + qb)))
    assert(rows("src_b")._4 == r6(qb / (qa + qb)))
    assert(rows("src_a")._5 == math.floor(100000 * rows("src_a")._4 + 0.5).toLong)
    // temperature flattens: q_a < p_a for the majority source, q_b > p_b
    assert(rows("src_a")._4 < rows("src_a")._3 && rows("src_b")._4 > rows("src_b")._3)
  }

  test("q100: every selection is its windows' min, every window is covered, " +
    "and a shared 6-token run shares a fingerprint") {
    val w = 4
    val fps = run("q100_winnow")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    val hsByDoc = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", hashAll(shingles(tokens($"text"), 3)).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((doc, hs) <- hsByDoc if hs.length >= w) {
      val sel = fps(doc)
      // validity: each (pos, h) is the leftmost min of SOME window
      for ((pos, h) <- sel) assert(hs(pos.toInt) == h)
      // coverage: every window of w consecutive hashes holds a selection
      for (i <- 0 to hs.length - w) {
        val win = (i until i + w)
        assert(win.exists(j => sel.contains((j.toLong, hs(j)))),
          s"doc $doc window $i has no selected fingerprint")
      }
    }
    // the MOSS guarantee: docs 30/31 share "p q r s t u" (= w+n-1 tokens)
    val shared = fps(30L).map(_._2) intersect fps(31L).map(_._2)
    assert(shared.nonEmpty, "6-token overlap must share a fingerprint")
    assert((fps(30L).map(_._2) intersect fps(32L).map(_._2)).isEmpty,
      "token-disjoint docs share nothing")
  }

  test("q104: pair counts are corpus-weighted through the vocab collapse; " +
    "single-char words drop out") {
    val d = Files.createTempDirectory("graft-bpe-sf").toFile.getAbsolutePath
    Seq(
      (0L, "ab ab cd x", "en", "src_a", 0L),
      (1L, "ab bc x x", "en", "src_a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    // vocab: ab→3, cd→1, bc→1, x→3 (len 1, excluded)
    val rows = SparkEntry.queries("q104_bpe_pairs")(spark, d)
      .as[(String, Long)].collect().toSeq
    assert(rows == Seq(("a+b", 3L), ("b+c", 1L), ("c+d", 1L)),
      "expected corpus-weighted pair counts in (cnt desc, pair asc) order")
  }

  test("q105: shared 5-grams count once per source pair even when repeated " +
    "within a source; disjoint sources produce no row") {
    val d = Files.createTempDirectory("graft-overlap-sf").toFile.getAbsolutePath
    Seq(
      (0L, "a b c d e f", "en", "s1", 0L),
      (1L, "a b c d e x", "en", "s2", 0L),
      // repeats s2's "a b c d e" (distinct-collapsed within s2) and adds
      // "b c d e f", shared with s1
      (2L, "a b c d e f", "en", "s2", 0L),
      (3L, "z1 z2 z3 z4 z5", "en", "s3", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("q105_source_overlap")(spark, d)
      .as[(String, String, Long)].collect().toSet
    assert(rows == Set(("s1", "s2", 2L)),
      "s1∩s2 = {abcde, bcdef}; s3 shares nothing")
  }

  test("q106: the shared 6-token run pairs docs 30/31; the token-disjoint " +
    "doc 32 pairs with nobody") {
    val pairs = run("q106_winnow_pairs")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(pairs.contains((30L, 31L)),
      "a w+n-1 token overlap must share a winnow fingerprint (MOSS guarantee)")
    assert(!pairs.exists(p => p._1 == 32L || p._2 == 32L),
      "doc 32 is token-disjoint from every other doc")
  }

  test("q107: within every shard, offsets are a gapless EOS-inclusive " +
    "prefix sum and block ids are offset/256") {
    val rows = run("q107_block_pack")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 9, "one row per doc")
    for ((_, shardDocs) <- rows.groupBy(_._2)) {
      // replay the pack: order by (h, doc_id) is not visible here, but the
      // offset set must be exactly the prefix sums of (n_tok + 1) in SOME
      // order — sorted by off, each doc starts where its predecessor ended
      val byOff = shardDocs.sortBy(_._4)
      assert(byOff.head._4 == 0L, "first doc of a shard packs at offset 0")
      for (Array(a, b) <- byOff.sliding(2).map(_.toArray) if byOff.length > 1)
        assert(b._4 == a._4 + a._3 + 1,
          s"doc ${b._1} must start at doc ${a._1}'s end + EOS")
      for ((_, _, nTok, off, blkFirst, blkLast) <- byOff) {
        assert(blkFirst == off / 256 && blkLast == (off + nTok) / 256)
      }
    }
  }

  test("q109: the composed build is consistent with its stages — every " +
    "packed doc passes rules, is decontaminated, deduped, and gapless-packed") {
    val sf = TestSession.sf
    val packed = SparkEntry.queries("q109_curated_pack")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val packedIds = packed.map(_._1).toSet
    assert(packedIds.nonEmpty)
    val rules = SparkEntry.queries("q97_gopher_rules")(spark, sf)
      .select($"doc_id", $"pass").as[(Long, Int)].collect().toMap
    val decont = SparkEntry.queries("q96_ngram_decontaminate")(spark, sf)
      .as[(Long, Int)].collect().toMap
    for (id <- packedIds) {
      assert(id >= 20L && rules(id) == 1, s"doc $id fails the rule gate")
      assert(decont(id) == 0, s"doc $id is contaminated")
    }
    // stage consistency the other way: a clean, rule-passing doc is packed
    // unless exact dedup dropped it for an earlier twin
    val shouldSurvive = rules.keySet.filter(id =>
      id >= 20L && rules(id) == 1 && decont.getOrElse(id, 1) == 0)
    assert(packedIds.subsetOf(shouldSurvive))
    // and the pack is gapless per shard (q107's invariant)
    for ((_, sh) <- packed.groupBy(_._2); byOff = sh.sortBy(_._4)) {
      assert(byOff.head._4 == 0L)
      for (Array(a, b) <- byOff.sliding(2).map(_.toArray) if byOff.length > 1)
        assert(b._4 == a._4 + a._3 + 1)
    }
  }

  test("q108: a two-point spectrum has a closed-form slope") {
    val d = Files.createTempDirectory("graft-zipf-sf").toFile.getAbsolutePath
    // vocab: a→4, b→2, c→2, d→1, e→1, f→1 ⇒ spectrum: (1,3) (2,2) (4,1)
    // fit log2 n_types = slope·log2 freq + b over x∈{0,1,2}, y={log2 3,1,0}
    Seq((0L, "a a b c d", "en", "s", 0L), (1L, "a a b c e f", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val Array(row) = SparkEntry.queries("q108_zipf")(spark, d)
      .as[(Long, Double, Double)].collect()
    val xs = Seq(0.0, 1.0, 2.0)
    val ys = Seq(math.log(3) / math.log(2), 1.0, 0.0)
    val xm = xs.sum / 3; val ym = ys.sum / 3
    val slope = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
      xs.map(x => (x - xm) * (x - xm)).sum
    assert(row._1 == 3L)
    assert(math.abs(row._2 - slope) < 1e-6, s"slope ${row._2} vs $slope")
    assert(math.abs(row._3 - (ym - slope * xm)) < 1e-6)
  }

  test("q119: exactly k per source, keys follow the A-ES formula, weights bias inclusion") {
    val got = CurationQueries.q119_weighted_sample(spark, TestSession.sf).collect()
    val bySource = got.groupBy(_.getString(0))
    bySource.values.foreach(rows => assert(rows.length == CurationQueries.WS_K))
    // replay the key for every sampled row
    got.foreach { r =>
      val id = r.getLong(1); val w = r.getLong(2)
      val u = ((id * CurationQueries.WS_MULT) % CurationQueries.WS_MOD + 1).toDouble /
        (CurationQueries.WS_MOD + 1)
      val key = -math.log(u) / w
      assert(math.abs(r.getDouble(3) - math.rint(key * 1e9) / 1e9) < 1e-9)
    }
    // bias: sampled docs should skew long — mean sampled n_chars above the
    // corpus mean (weights ∝ n_chars; u is uniform, so this holds with
    // overwhelming margin at 50 docs/source × 10 sources)
    val corpusMean = graft.core.Tables.Tpch(spark, TestSession.sf).documents
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    val sampleMean = got.map(_.getLong(2).toDouble).sum / got.length
    assert(sampleMean > corpusMean, s"sample $sampleMean vs corpus $corpusMean")
  }
}
