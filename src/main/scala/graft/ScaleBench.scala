package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.Tables
import graft.operators.{Ivf, Pq, Similarity}

/** Scaling bench (round-2 verdict item 4): the sf0.1 bench is fixed-cost
  * dominated (every query 0.2–2 s), so a regression hiding a super-linear
  * term is invisible there. This main runs the most expensive queries at
  * sf0.1 AND a 10× directory (written by [[ScaleData]]) and reports the
  * per-query scaling ratio — a query growing much faster than 10× at 10×
  * data has a hidden super-linear term. Results recorded in BASELINE.md.
  *
  * The LSH ANN family is additionally run with scale-adjusted planes
  * (4 → 8 at 10×): with FIXED planes the bucket count is constant, so
  * average bucket occupancy — and the pair work per bucket, which is
  * quadratic in occupancy — grows with the corpus. Growing planes with
  * log2(n) keeps occupancy (and therefore per-candidate cost) constant;
  * both variants are measured so the table shows the fixed-plane blowup
  * AND that the documented scale path removes it.
  *
  * Second decade (round-3 verdict item 8): when `SPARK_GRAFT_SF100_DIR`
  * exists (written by ScaleData factor=100), the five scale-risk families
  * — LSH pairs, IVF, tfidf, dup-spans, bloom-prune — plus the
  * newly-capped q73 run there too, confirming the log-scaling rules
  * across TWO decades instead of extrapolating from one. The fixed-plane
  * LSH variants are deliberately NOT run at 100×: constant buckets give
  * occupancy ×100 and pair work ×10⁴ — the measured 10× blowup already
  * demonstrates the failure, and the rule (planes ≈ log2 n: 4 → 8 → 11)
  * is what the 100× column validates. IVF runs both fixed-k (k=8, the
  * sf0.1 geometry) and the scale rule (kFor: constant list size, +
  * train-on-sample at 10%), mirroring the LSH pair of variants.
  */
object ScaleBench {

  private val DIMS = 64

  /** The most expensive oracle-checked queries of the round-3 bench
    * (q66 excluded: a composed pipeline whose cost is driver-synchronous
    * fixpoint rounds, not per-row work — its components are in the set).
    * The late-round additions with genuine scaling risk are measured too:
    * q75 (two windows over exploded positional trigrams), q68 (tf ⋈ df
    * re-key join), q73 (vocab agg → broadcast LM → per-doc re-agg), q80
    * (bloom build + pruned join).
    */
  private val sixthSessionAdds = Seq(
    "q125_ppjoin", "q126_merge_upsert", "q127_bfs_hops", "q129_minplus",
    "q130_triangle_sample",
    // the analytics monitoring passes a continuous ingest pays per batch:
    // q131 rides one (user) window exchange over the growing event log,
    // q132/q133 are narrow per-type aggregates (q111/q112's class)
    "q131_attribution", "q132_trend", "q133_volume_anomaly",
    // round-5: containment probe — ScaleData shifts doc_ids per replica,
    // so doc_id<50 stays the ORIGINAL 50 probe docs while the indexed
    // corpus grows: the real decontamination geometry (q96's class). The
    // scaling question is the index side's full element emission (O(Σ|y|)
    // rows) + per-probe Σ df(rare prefix element) — both should be ~linear
    "q137_containment",
    // round-5: LPA rides the densifying co-purchase graph (q127's class:
    // 3 driver-synchronous rounds of one E-row join + narrow agg + per-
    // node WindowGroupLimit; growth should track E like BFS)
    "q139_label_prop",
    // round-5: k-core peel — per round two semi-joins of E against the
    // alive set + one degree agg; same bounded-fixpoint class
    "q142_kcore",
    // round-6: BPE train+encode — per round one pair aggregate over the
    // (word, freq) dictionary; the scaling claim is Heaps-law sublinear
    // dictionary growth (q104's premise, here paid 6× + checkpoints)
    "q146_bpe_encode",
    // sampled quantiles: the WindowGroupLimit sample cut forwards ≤ k
    // rows per (source) group per map task, so the exchange is flat
    // while the SCAN grows — the decade ratio should approach scan cost
    "q154_sampled_quantiles",
    // canary decontamination: ScaleData shifts doc_ids per replica, so
    // the canary side stays the ORIGINAL eval docs while the scanned
    // corpus grows (q137's geometry) — the BNLJ contains() work is
    // |train| × |canaries|, expected ~linear
    "q155_canary_decontaminate",
    // weighted quantiles: q154's shape with the A-ES key — the same
    // WindowGroupLimit-bounded exchange, expected ~flat
    "q156_weighted_quantiles",
    // cluster-safe splits: q28's LSH pipeline + the min-label fixpoint
    // (round count ≈ cluster diameter, ~constant for near-dup clusters;
    // per-round cost grows with the pair set) — bench-excluded like q94,
    // decade-measured here; q158 adds the shard-vs-index probe on top of
    // its label side's fixpoint
    "q157_cluster_split", "q158_incremental_split",
    // round-7: the gram-prefilter canary route (forced by q159's
    // ceiling=1) — per-doc work is the rolling char-gram pass +
    // broadcast-hash probes, INDEPENDENT of the canary count; expected
    // ~scan-linear like q155's BNLJ at eval-sized lists, but this is the
    // route that must hold when canary lists outgrow the BNLJ
    "q159_canary_gated",
    // round-7: GD quality training — R driver-synchronous rounds (q146's
    // class) whose per-round cost is one scan + an F+2-number partial
    // aggregate; expected round-latency at small SF, ~scan at 100×
    "q161_quality_train",
    // round-7: snapshot diff — two fingerprint scans + one id-keyed
    // full-outer join of narrow (id, fp) rows; expected ~linear
    "q163_corpus_diff",
    // round-7: the exact-edge split — q125's prefix-join candidate growth
    // under q157's fixpoint; expected ~linear candidates + flat rounds
    "q164_split_exact",
    // round-8: the too-big-to-broadcast canary route (both ceilings
    // forced) — the shuffle carries (id, 8-byte gram hash) vs
    // (hash, phrase), candidates collapse per doc before the verify's id
    // join; expected ~scan-linear like q159's broadcast form
    "q165_canary_joined",
    // round-8: hold-out eval — q157's fixpoint + q161's GD rounds over
    // the split≠0 subset + one scoring scan of the held-out tenth;
    // expected the sum of its parts (round latency at small SF)
    "q166_holdout_eval",
    // round-8: eval-coverage report — the train side's distinct
    // shingle-hash exchange grows with the corpus while the eval side
    // stays fixed (q96/q137's geometry); expected ~linear in the
    // distinct-hash exchange. q167 (PII scrub) is scan-local zero-shuffle
    // — the q97/q101 no-scaling-question class, deliberately absent here
    "q168_eval_coverage",
    // round-9: image perceptual-hash dedup — per image one scan-local
    // PGM synth + decode + 64-bit dHash, then the pigeonhole self-join
    // shuffling 8 narrow (blk, bv, id, hash) tuples per image, with
    // runtime exchange reuse collapsing the two sides to ONE decode
    // (shuffle_hash-pinned — a self-join build side is never
    // broadcastable at scale); expected ~linear, the q30 geometry.
    // q169 (markup strip) is scan-local zero-shuffle like q167 —
    // deliberately absent
    "q170_image_neardup")

  private val scaleSet = Seq(
    "q30_simhash_pairs", "q12_join_chain", "q1_agg", "q9_join_inner",
    "q28_lsh_neardup", "q10_join_left", "q49_minhash_estimate",
    "q11_join_dict", "q57_order_uu_window", "q34_json_extract",
    "q75_dup_spans", "q68_tfidf", "q73_unigram_ll", "q80_bloom_prune",
    "q88_span_removal", "q91_dsir_select", "q93_cdc_chunks",
    "q84_incremental_dedup", "q95_incremental_bloomed",
    // round-4 curation ops with a scaling question worth answering:
    // q96 shuffle-joins corpus n-gram hashes against a FIXED eval set
    // (doc_ids shift per replica, so doc_id<20 stays the original 20 docs
    // — the real decontamination geometry); q98 shuffles (doc_id, tok)
    // counts; q100 is the native scan-local winnow pass
    "q96_ngram_decontaminate", "q98_token_entropy", "q100_winnow",
    // q103 windows capped postings over exploded distinct tokens; q104's
    // pair work must stay vocab-bound (Heaps-law sublinear) as the corpus
    // grows — both have a real scaling question. q101/q102 are excluded by
    // design: a fixed-size sketch state probed by constant-row tables has
    // no per-SF term beyond the scan.
    "q103_postings", "q104_bpe_pairs", "q105_source_overlap",
    "q106_winnow_pairs", "q109_curated_pack",
    // analytics family: q110 scans a growing corpus for a FIXED query's
    // postings (replica-suffixed tokens keep df flat, so the measured term
    // is the scan+dl pass — the realistic shape: one search query's work
    // must not inherit corpus growth beyond the scan); q111/q112 are the
    // narrow-agg monitoring passes a continuous ingest pays per batch
    "q110_bm25", "q111_retention", "q112_psi_drift",
    // round-4 additions: q117 shuffles the corpus BIGRAM table (larger than
    // the vocab — its model caps must keep broadcasts flat while the (w1,w2)
    // aggregate grows); q118's two windows ride one (user × ord) exchange
    // that grows with the event log. q114 itself is measured via the
    // growing-graph variant below (ScaleData leaves part/supp keys
    // unshifted, so the registered part→supp graph would collapse under
    // distinct instead of growing).
    "q117_bigram_ll", "q118_scd2",
    // q121's pair fan-out is Σ items-per-order² (replicated orders grow the
    // pair COUNTS over a fixed part vocabulary — the aggregate stays
    // vocab-bound); q122's wedge join fan-out is Σ deg(mid)² on the
    // co-purchase graph, the real scaling question of triangle counting
    "q121_basket_rules", "q122_triangles",
    // sixth-session adds (ONE definition — decade2 reuses it, so a new
    // entry can't silently drop from one of the two reports): q125's
    // candidate fan-out is Σ df² over prefix elements (replica-suffixed
    // shingles keep df flat, so the candidate table should grow ~linearly
    // — the prefix-filter scaling claim); q126 is the copy-on-write
    // merge, whose cost is the rewrite volume (linear in the affected
    // partitions' rows by design); q127/q129 ride the densifying
    // co-purchase graph (fixed part vocabulary, Σ deg² edge growth);
    // q130 is the sampled-triangle contrast to q122
  ) ++ sixthSessionAdds

  /** planes-scaled LSH variants: planesFor(sf0.1)=4 (the benched default),
    * planesFor(10×)=8, planesFor(100×)=11 — +log2(factor) rounded up,
    * keeping bucket occupancy roughly constant.
    */
  private def lshQ(name: String, planes: Int): (SparkSession, String) => DataFrame =
    if (name.startsWith("q33"))
      (s, dir) => Similarity.lshTopPairs(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", planes, DIMS, 50)
    else
      (s, dir) => Similarity.lshNearDupPairs(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", planes, DIMS, 0.35)

  /** OR-amplified near-dup variants (q147): `planes` holds per-band
    * occupancy (the log2 rule), `bands` dials recall. The scaled
    * geometry grows BOTH: planes 4 → 8 keeps buckets ∝ n, and bands
    * 4 → 13 compensates the per-band collision falloff (bands ≈
    * ln(1−r)/ln(1−p^planes) at the dedup-grade cos ≈ 0.8 band).
    */
  private def bandedQ(planes: Int, bands: Int): (SparkSession, String) => DataFrame =
    (s, dir) => Similarity.lshNearDupPairsBanded(
      Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
      planes, bands, DIMS, 0.35)

  /** IVF ANN variants for the scaling table. `scaledK`: k from the
    * [[Ivf.kFor]] rule (constant posting-list size, target = sf0.1's
    * 2000/8 = 250) and Lloyd's on a 10% sample — the production geometry;
    * fixed: the sf0.1 geometry (k=8, full train) carried up unchanged.
    *
    * `scaledNprobe` (round-6, from the measured recall rows): kFor with
    * nprobe FIXED at 2 holds per-query cost constant but shrinks the
    * probed FRACTION (2/8 → 2/80 a decade up), and recall follows it
    * down (measured 0.50 → 0.22). Scaling nprobe with k (constant
    * fraction, here k/4 = sf0.1's 2/8) buys recall back at linear —
    * not constant — per-query cost: the knob is a recall/cost dial, and
    * the decade rows now measure BOTH ends instead of asserting one.
    */
  private def ivfQ(scaledK: Boolean, scaledNprobe: Boolean = false)
      : (SparkSession, String) => DataFrame =
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val (cents, k) =
        if (scaledK) {
          val k = Ivf.kFor(emb.count(), targetListSize = 250)
          (Ivf.trainOnSample(emb, fraction = 0.1, seed = 42L, "vec_id",
            "embedding", k = k, dims = DIMS, iters = 2), k)
        } else
          (Ivf.train(emb, "vec_id", "embedding", k = 8, dims = DIMS, iters = 2), 8)
      val corpus = Ivf.assign(emb, "embedding", cents, DIMS)
      val nprobe = if (scaledNprobe) math.max(2, math.round(k / 4.0).toInt) else 2
      Ivf.knn(s, corpus, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", cents, DIMS, nprobe = nprobe, kNeighbors = 5)
    }

  /** PQ ADC as production uses it — candidate generation + EXACT rerank:
    * ADC walks every code once (linear scan), keeps a 10× over-fetch
    * (top-50), and the true top-5 comes from exact L2 on just those
    * candidates. Recall then measures what the over-fetch misses, not
    * the quantizer's raw @5 resolution (m=8×16 codebooks on 64 dims
    * measured 0.12 raw — unusable alone, standard with rerank).
    */
  private def pqRerankQ(sampled: Boolean): (SparkSession, String) => DataFrame =
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents =
        if (sampled)
          Pq.trainOnSample(emb, fraction = 0.1, seed = 42L, "vec_id",
            "embedding", m = 8, subDims = 8, k = 16, iters = 2)
        else Pq.train(emb, "vec_id", "embedding", m = 8, subDims = 8, k = 16, iters = 2)
      Pq.adcRerankTopK(Pq.assignCodes(emb, "embedding", cents, 8), emb,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding", cents,
        fetch = 50, kNeighbors = 5)
    }

  /** SemDeDup variants: same cluster-occupancy physics as IVF — fixed k
    * carried up a decade multiplies within-cluster pair work by 100 (the
    * measured blowup), the kFor rule holds occupancy (≈250) so pair work
    * grows linearly with n.
    */
  private def semQ(scaledK: Boolean): (SparkSession, String) => DataFrame =
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents =
        if (scaledK) {
          val k = Ivf.kFor(emb.count(), targetListSize = 250)
          Ivf.trainOnSample(emb, fraction = 0.1, seed = 42L, "vec_id",
            "embedding", k = k, dims = DIMS, iters = 2)
        } else Ivf.train(emb, "vec_id", "embedding", k = 8, dims = DIMS, iters = 2)
      Similarity.semanticDedup(emb, "vec_id", "embedding", cents, DIMS, 0.30)
    }

  /** Prototypicality variants: same model geometry question as IVF /
    * SemDeDup. Work is linear in n either way (one assignment pass + a
    * WindowGroupLimit that forwards ≤ kKeep rows per cluster per task);
    * fixed k only narrows the final exchange to k partitions, so unlike
    * the pair-join operators it degrades gracefully — both variants are
    * measured to show exactly that.
    */
  private def protoQ(scaledK: Boolean): (SparkSession, String) => DataFrame =
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents =
        if (scaledK) {
          val k = Ivf.kFor(emb.count(), targetListSize = 250)
          Ivf.trainOnSample(emb, fraction = 0.1, seed = 42L, "vec_id",
            "embedding", k = k, dims = DIMS, iters = 2)
        } else Ivf.train(emb, "vec_id", "embedding", k = 8, dims = DIMS, iters = 2)
      Similarity.prototypes(emb, "vec_id", "embedding", cents, DIMS, 16)
    }

  /** Block-packing variants: the scale rule is #shards ∝ corpus size
    * (production fixes a target tokens-per-shard, so per-task sort state
    * is constant). Fixed shards carried up a decade means each shard's
    * window sorts 10× the rows in one task; the scaled rule (8 → 80 →
    * 800) holds per-shard size flat. Same fixed/scaled contrast as the
    * LSH planes and IVF k rules.
    */
  private def packQ(shards: Int): (SparkSession, String) => DataFrame =
    (s, dir) => CurationQueries.blockPack(
      Tables.load(s, dir, "documents"), shards, 256)

  /** PQ flat-ADC variants: the scan is linear in n by construction (every
    * candidate pays one m-term codes walk), so the only super-constant
    * cost is training's Lloyd scans — the sampled variant (train on 10%)
    * bounds exactly that, mirroring ivfQ's train-on-sample form. At
    * 100 TB the flat scan itself yields to the composed IVF-PQ shape
    * (PqSpec's last case): q61 measures the probe half, these rows the
    * ADC half.
    */
  private def pqQ(sampled: Boolean): (SparkSession, String) => DataFrame =
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents =
        if (sampled)
          Pq.trainOnSample(emb, fraction = 0.1, seed = 42L, "vec_id",
            "embedding", m = 8, subDims = 8, k = 16, iters = 2)
        else Pq.train(emb, "vec_id", "embedding", m = 8, subDims = 8, k = 16, iters = 2)
      Pq.adcTopK(Pq.assignCodes(emb, "embedding", cents, 8),
        emb.filter(col("vec_id") < 10), "vec_id", "embedding", cents, 5)
    }

  /** PageRank over a graph that actually GROWS with the directory: orders
    * link the parts they contain (o_orderkey is replica-shifted by
    * ScaleData, so V and E scale ×factor while part hubs accumulate
    * in-links — the popular-domain shape of a web graph). Cost model:
    * 5 × (one contribution shuffle of E narrow rows + one aggregate);
    * expected ratio ≈ linear per decade.
    */
  private def prQ: (SparkSession, String) => DataFrame =
    (s, dir) => graft.operators.Graph.pageRank(
      Tables.load(s, dir, "lineitem").select(col("l_orderkey").as("src"),
        (col("l_partkey") + 10000000L).as("dst")),
      "src", "dst", iters = 5)

  def main(args: Array[String]): Unit = {
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE size-gated SMJ->SHJ conversion - the Bench session's
      // measured default (see Bench.scala)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[scalebench] failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    def median(ts0: Seq[Double]): Double = {
      val ts = ts0.filter(_ >= 0).sorted
      if (ts.isEmpty) -1.0
      else if (ts.size % 2 == 1) ts(ts.size / 2)
      else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2
    }
    def r2(x: Double) = math.rint(x * 100) / 100

    run(SparkEntry.queries("q1_agg"), sf01) // warm-up

    val sf100 = sys.env.get("SPARK_GRAFT_SF100_DIR")
      .orElse(Some("/tmp/graft-sf100"))
      .filter(d => new java.io.File(d).exists)

    // measurement CELLS (query × dir), deduplicated: the fixed-planes and
    // scaled-planes rows share the same p4/sf0.1 small-side cell, which
    // would otherwise be measured twice per iteration
    val cells = collection.mutable.LinkedHashMap[String, ((SparkSession, String) => DataFrame, String)]()
    def cell(key: String, fn: (SparkSession, String) => DataFrame, dir: String): String = {
      cells.getOrElseUpdate(key, (fn, dir)); key
    }
    // per row: cell keys for (sf0.1, 10×, optional 100×)
    val decade2 = Set("q68_tfidf", "q75_dup_spans", "q80_bloom_prune",
      "q73_unigram_ll", "q88_span_removal", "q91_dsir_select", "q93_cdc_chunks",
      "q84_incremental_dedup", "q95_incremental_bloomed",
      "q96_ngram_decontaminate", "q98_token_entropy", "q100_winnow",
      "q103_postings", "q104_bpe_pairs", "q105_source_overlap",
      "q106_winnow_pairs", "q109_curated_pack",
      "q110_bm25", "q111_retention", "q112_psi_drift",
      "q117_bigram_ll", "q118_scd2",
    // q121's pair fan-out is Σ items-per-order² (replicated orders grow the
    // pair COUNTS over a fixed part vocabulary — the aggregate stays
    // vocab-bound); q122's wedge join fan-out is Σ deg(mid)² on the
    // co-purchase graph, the real scaling question of triangle counting
    "q121_basket_rules", "q122_triangles") ++ sixthSessionAdds
    val rows: Seq[(String, String, String, Option[String])] =
      scaleSet.map { n =>
        (n, cell(s"$n|01", SparkEntry.queries(n), sf01),
            cell(s"$n|1", SparkEntry.queries(n), sf1),
            sf100.filter(_ => decade2(n))
              .map(d => cell(s"$n|100", SparkEntry.queries(n), d)))
      } ++ Seq(
        ("q33_lsh_ann_fixedp",
          cell("q33p4|01", lshQ("q33", 4), sf01),
          cell("q33p4|1", lshQ("q33", 4), sf1),
          None), // 100× fixed-plane: occupancy ×100 ⇒ pair work ×10⁴, prohibitive by design
        ("q33_lsh_ann_scaledp", "q33p4|01",
          cell("q33p8|1", lshQ("q33", 8), sf1),
          sf100.map(d => cell("q33p11|100", lshQ("q33", 11), d))),
        ("q64_neardup_fixedp",
          cell("q64p4|01", lshQ("q64", 4), sf01),
          cell("q64p4|1", lshQ("q64", 4), sf1),
          None),
        ("q64_neardup_scaledp", "q64p4|01",
          cell("q64p8|1", lshQ("q64", 8), sf1),
          sf100.map(d => cell("q64p11|100", lshQ("q64", 11), d))),
        ("q147_banded_fixedgeo",
          cell("q147f|01", bandedQ(4, 4), sf01),
          cell("q147f|1", bandedQ(4, 4), sf1),
          None), // fixed geometry a decade up: occupancy ×10 per band, the q64 fixedp blowup ×bands
        ("q147_banded_scaledgeo", "q147f|01",
          cell("q147s|1", bandedQ(8, 13), sf1),
          sf100.map(d => cell("q147s|100", bandedQ(11, 26), d))),
        ("q61_ivf_fixedk",
          cell("q61k8|01", ivfQ(scaledK = false), sf01),
          cell("q61k8|1", ivfQ(scaledK = false), sf1),
          sf100.map(d => cell("q61k8|100", ivfQ(scaledK = false), d))),
        ("q61_ivf_scaledk",
          cell("q61sk|01", ivfQ(scaledK = true), sf01),
          cell("q61sk|1", ivfQ(scaledK = true), sf1),
          sf100.map(d => cell("q61sk|100", ivfQ(scaledK = true), d))),
        ("q61_ivf_scalednp",
          cell("q61np|01", ivfQ(scaledK = true, scaledNprobe = true), sf01),
          cell("q61np|1", ivfQ(scaledK = true, scaledNprobe = true), sf1),
          sf100.map(d => cell("q61np|100", ivfQ(scaledK = true, scaledNprobe = true), d))),
        ("q87_semdedup_fixedk",
          cell("q87k8|01", semQ(scaledK = false), sf01),
          cell("q87k8|1", semQ(scaledK = false), sf1),
          None), // 100× fixed-k: 8 clusters of 25 k ⇒ pair work ×10⁴ — by design not run
        ("q87_semdedup_scaledk",
          cell("q87sk|01", semQ(scaledK = true), sf01),
          cell("q87sk|1", semQ(scaledK = true), sf1),
          sf100.map(d => cell("q87sk|100", semQ(scaledK = true), d))),
        ("q92_prototypes_fixedk",
          cell("q92k8|01", protoQ(scaledK = false), sf01),
          cell("q92k8|1", protoQ(scaledK = false), sf1),
          sf100.map(d => cell("q92k8|100", protoQ(scaledK = false), d))),
        ("q92_prototypes_scaledk",
          cell("q92sk|01", protoQ(scaledK = true), sf01),
          cell("q92sk|1", protoQ(scaledK = true), sf1),
          sf100.map(d => cell("q92sk|100", protoQ(scaledK = true), d))),
        ("q107_pack_fixed_shards",
          cell("q107s8|01", packQ(8), sf01),
          cell("q107s8|1", packQ(8), sf1),
          sf100.map(d => cell("q107s8|100", packQ(8), d))),
        ("q107_pack_scaled_shards", "q107s8|01",
          cell("q107s80|1", packQ(80), sf1),
          sf100.map(d => cell("q107s800|100", packQ(800), d))),
        ("q114_pagerank_growing",
          cell("q114g|01", prQ, sf01),
          cell("q114g|1", prQ, sf1),
          sf100.map(d => cell("q114g|100", prQ, d))),
        ("q113_pq_fulltrain",
          cell("q113f|01", pqQ(sampled = false), sf01),
          cell("q113f|1", pqQ(sampled = false), sf1),
          sf100.map(d => cell("q113f|100", pqQ(sampled = false), d))),
        ("q113_pq_sampledtrain",
          cell("q113s|01", pqQ(sampled = true), sf01),
          cell("q113s|1", pqQ(sampled = true), sf1),
          sf100.map(d => cell("q113s|100", pqQ(sampled = true), d))))

    // SPARK_GRAFT_SCALE_ONLY=q104,q105 measures just the named row
    // prefixes — re-measuring a new operator must not pay the full matrix
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val keptRows = only.map(f => rows.filter(r => f.exists(r._1.startsWith)))
      .getOrElse(rows)
    val keptKeys = keptRows.flatMap { case (_, a, b, c) => Seq(a, b) ++ c }.toSet

    // round-robin the iterations (iter 1 of every cell, then iter 2, …) so
    // slow phases of a shared host hit all measurements evenly instead of
    // wrecking whichever query they landed on — this sandbox demonstrably
    // drifts by 10×+ for minutes at a time
    val samples = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to iters; (key, (fn, dir)) <- cells if keptKeys(key))
      samples(key) :+= run(fn, dir)
    val out = keptRows.map { case (name, smallKey, bigKey, key100) =>
      val t01 = median(samples(smallKey))
      val t1 = median(samples(bigKey))
      val ratio = if (t01 > 0 && t1 > 0) r2(t1 / t01) else -1.0
      val (t100, r100) = key100.map { k =>
        val t = median(samples(k))
        (t, if (t > 0 && t1 > 0) r2(t / t1) else -1.0)
      }.getOrElse((-1.0, -1.0))
      val d2 = if (t100 >= 0) f", 100x=$t100%.2fs r100=$r100%.2f" else ""
      System.err.println(f"[scalebench] $name%-22s sf0.1=$t01%.2fs 10x=$t1%.2fs ratio=$ratio%.2f$d2")
      val j100 = if (t100 >= 0) s""","t100":${r2(t100)},"r100":$r100""" else ""
      s""""$name":{"t01":${r2(t01)},"t1":${r2(t1)},"ratio":$ratio$j100}"""
    }
    println(s"""{"metric":"scale_ratio","iters":$iters,"factor":10,""" +
      s""""queries":{${out.mkString(",")}},"sf01":"$sf01","sf1":"$sf1"""" +
      sf100.map(d => s""","sf100":"$d"""").getOrElse("") + "}")

    // ——— recall phase (SPARK_GRAFT_SCALE_RECALL=1): the ANN family's
    // decade rows measure RUNTIME scaling; this measures the other half
    // of each rule's claim — recall vs the exact answer, affordable at
    // 10× where the exact baselines are still brute-forceable. Fixed and
    // scaled geometries both run, so the table shows what the kFor /
    // planes / sampled-train rules actually COST in recall (if anything)
    // while they hold runtime linear. Results recorded in BASELINE.md.
    if (sys.env.get("SPARK_GRAFT_SCALE_RECALL").contains("1")) {
      import graft.operators.Similarity
      def r3(x: Double) = math.rint(x * 1000) / 1000

      def pairSet(df: DataFrame, c1: String, c2: String): Set[(Long, Long)] =
        df.select(col(c1).cast("long"), col(c2).cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallOf(approx: Set[(Long, Long)], exact: Set[(Long, Long)]): Double =
        if (exact.isEmpty) -1.0 else r3(approx.intersect(exact).size.toDouble / exact.size)

      // exact kNN by COSINE (q61's metric) — the O(n·q) brute force
      def exactCosKnn(dir: String): Set[(Long, Long)] = {
        val emb = Tables.load(spark, dir, "embeddings")
        pairSet(Similarity.knn(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", 5), "query_id", "neighbor_id")
      }
      // exact kNN by squared EUCLIDEAN (q113's ADC approximates L2)
      def exactL2Knn(dir: String): Set[(Long, Long)] = {
        val emb = Tables.load(spark, dir, "embeddings")
        val q = org.apache.spark.sql.functions.broadcast(
          emb.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"),
            Similarity.asDouble(col("embedding")).as("qv")))
        val c = emb.select(col("vec_id").as("neighbor_id"),
          Similarity.asDouble(col("embedding")).as("cv"))
        val d2 = Similarity.dot(col("qv"), col("qv")) -
          Similarity.dot(col("qv"), col("cv")) * 2 +
          Similarity.dot(col("cv"), col("cv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("l2").asc, col("neighbor_id").asc)
        pairSet(c.crossJoin(q).filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            org.apache.spark.sql.functions.round(d2, 6).as("l2"))
          .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("rank") <= 5), "query_id", "neighbor_id")
      }
      // exact semantic-dedup DROP set: no clustering, all pairs — the
      // approx drop set is structurally a subset (within-cluster pairs ⊆
      // all pairs), so recall is the whole story and precision is 1
      def exactSemDrops(dir: String, threshold: Double): Set[Long] = {
        val v = Tables.load(spark, dir, "embeddings")
          .select(col("vec_id").cast("long").as("id"),
            Similarity.asDouble(col("embedding")).as("v"))
          .withColumn("nrm", Similarity.norm(col("v")))
        val a = v.select(col("id").as("ia"), col("v").as("va"), col("nrm").as("na"))
        val b = v.select(col("id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
        a.crossJoin(b).filter(col("ia") < col("ib"))
          .filter(org.apache.spark.sql.functions.round(
            Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
            >= threshold)
          .select(col("ib")).distinct().collect().map(_.getLong(0)).toSet
      }
      def semRecall(dir: String, scaledK: Boolean, exactDrops: Set[Long]): Double = {
        val emb = Tables.load(spark, dir, "embeddings")
        val all = emb.select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
        val survivors = semQ(scaledK)(spark, dir)
          .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
        val approxDrops = all -- survivors
        if (exactDrops.isEmpty) -1.0
        else r3(approxDrops.intersect(exactDrops).size.toDouble / exactDrops.size)
      }
      def exactTopPairs(dir: String): Set[(Long, Long)] = {
        val emb = Tables.load(spark, dir, "embeddings")
        pairSet(Similarity.topPairs(emb, "vec_id", "embedding", 50), "d1", "d2")
      }

      // exact near-dup pair set (cos >= threshold, all pairs) — the task
      // the planes rule actually makes its occupancy claim about (q64)
      def exactNearDupPairs(dir: String, threshold: Double): Set[(Long, Long)] = {
        val v = Tables.load(spark, dir, "embeddings")
          .select(col("vec_id").cast("long").as("id"),
            Similarity.asDouble(col("embedding")).as("v"))
          .withColumn("nrm", Similarity.norm(col("v")))
        val a = v.select(col("id").as("d1"), col("v").as("va"), col("nrm").as("na"))
        val b = v.select(col("id").as("d2"), col("v").as("vb"), col("nrm").as("nb"))
        pairSet(a.crossJoin(b).filter(col("d1") < col("d2"))
          .filter(org.apache.spark.sql.functions.round(
            Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
            >= threshold), "d1", "d2")
      }

      val rec = collection.mutable.LinkedHashMap[String, Double]()
      for ((tag, dir) <- Seq(("01", sf01), ("10x", sf1))) {
        val cosExact = exactCosKnn(dir)
        rec(s"q61_ivf_fixedk|$tag") =
          recallOf(pairSet(ivfQ(scaledK = false)(spark, dir), "query_id", "neighbor_id"), cosExact)
        rec(s"q61_ivf_scaledk|$tag") =
          recallOf(pairSet(ivfQ(scaledK = true)(spark, dir), "query_id", "neighbor_id"), cosExact)
        rec(s"q61_ivf_scalednp|$tag") =
          recallOf(pairSet(ivfQ(scaledK = true, scaledNprobe = true)(spark, dir),
            "query_id", "neighbor_id"), cosExact)
        val l2Exact = exactL2Knn(dir)
        rec(s"q113_pq_fulltrain|$tag") =
          recallOf(pairSet(pqQ(sampled = false)(spark, dir), "query_id", "neighbor_id"), l2Exact)
        rec(s"q113_pq_sampledtrain|$tag") =
          recallOf(pairSet(pqQ(sampled = true)(spark, dir), "query_id", "neighbor_id"), l2Exact)
        rec(s"q113_pq_rerank|$tag") =
          recallOf(pairSet(pqRerankQ(sampled = true)(spark, dir), "query_id", "neighbor_id"), l2Exact)
        val semExact = exactSemDrops(dir, 0.30)
        rec(s"q87_semdedup_fixedk|$tag") = semRecall(dir, scaledK = false, semExact)
        rec(s"q87_semdedup_scaledk|$tag") = semRecall(dir, scaledK = true, semExact)
        // q33 measures the GLOBAL-top-pairs task (collision probability
        // falls with planes for moderate angles — the rule is NOT claimed
        // there); q64 measures the near-dup task the rule is for
        val pairExact = exactTopPairs(dir)
        rec(s"q33_lsh_ann_fixedp|$tag") =
          recallOf(pairSet(lshQ("q33", 4)(spark, dir), "d1", "d2"), pairExact)
        val ndExact = exactNearDupPairs(dir, 0.35)
        rec(s"q64_neardup_fixedp|$tag") =
          recallOf(pairSet(lshQ("q64", 4)(spark, dir), "d1", "d2"), ndExact)
        rec(s"q147_banded_fixedgeo|$tag") =
          recallOf(pairSet(bandedQ(4, 4)(spark, dir), "d1", "d2"), ndExact)
        if (tag != "01") {
          rec(s"q33_lsh_ann_scaledp|$tag") =
            recallOf(pairSet(lshQ("q33", 8)(spark, dir), "d1", "d2"), pairExact)
          rec(s"q64_neardup_scaledp|$tag") =
            recallOf(pairSet(lshQ("q64", 8)(spark, dir), "d1", "d2"), ndExact)
          rec(s"q147_banded_scaledgeo|$tag") =
            recallOf(pairSet(bandedQ(8, 13)(spark, dir), "d1", "d2"), ndExact)
        }
      }
      // ——— split-leakage cell: "leakage-free" is an LSH-RECALL claim —
      // a true related pair the bands miss is a pair that can straddle
      // train/val. Exact truth = the prefix-filtered exact join at
      // J >= 3/10; measured: same-cluster recall of the LSH split and
      // the fraction of true pairs landing in DIFFERENT splits, vs the
      // exact-edge form's structurally-zero straddle rate.
      for ((tag, dir) <- Seq("01" -> sf01, "10x" -> sf1)) {
        import graft.operators.{Dedup, SetSim}
        val docs = Tables.load(spark, dir, "documents")
        val sets = docs.select(col("doc_id"),
            org.apache.spark.sql.functions.array_distinct(
              graft.functions.TextFunctions.shingleHashes(col("text"), 3)).as("hs"))
          .filter(org.apache.spark.sql.functions.size(col("hs")) >= 1)
        val truePairs = pairSet(
          SetSim.jaccardSelfJoinSets(sets, "doc_id", "hs", 3, 10), "d1", "d2")
        def straddle(split: DataFrame): (Double, Double) = {
          val m = split.select(col("doc_id").cast("long"),
              col("cluster").cast("long"), col("split").cast("long"))
            .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
          val sameCluster = truePairs.count { case (a, b) => m(a)._1 == m(b)._1 }
          val crossSplit = truePairs.count { case (a, b) => m(a)._2 != m(b)._2 }
          (r3(sameCluster.toDouble / math.max(1, truePairs.size)),
            r3(crossSplit.toDouble / math.max(1, truePairs.size)))
        }
        val (lshRec, lshLeak) = straddle(Dedup.clusterSafeSplit(docs,
          "doc_id", "text", 3, 16, Dedup.lshBandsFor(16, 0.3), 0.3, 10))
        val (exRec, exLeak) = straddle(Dedup.clusterSafeSplitExact(docs,
          "doc_id", "text", 3, 3, 10, 10))
        rec(s"q157_split_lsh_samecluster|$tag") = lshRec
        rec(s"q157_split_lsh_leak|$tag") = lshLeak
        rec(s"q164_split_exact_samecluster|$tag") = exRec
        rec(s"q164_split_exact_leak|$tag") = exLeak
        System.err.println(s"[scalebench] split truePairs(J>=0.3)=${truePairs.size}")
      }
      rec.foreach { case (k, v) =>
        System.err.println(f"[scalebench] recall $k%-26s $v%.3f")
      }
      println(s"""{"metric":"scale_recall","queries":{""" +
        rec.map { case (k, v) => s""""$k":$v""" }.mkString(",") +
        s"""},"sf01":"$sf01","sf1":"$sf1"}""")
    }
    spark.stop()
  }
}
