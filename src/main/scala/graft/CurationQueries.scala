package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Corpus-curation operators, round 4: the remaining steps a production
  * pretraining-data pipeline runs that q22–q95 don't yet cover —
  * benchmark decontamination at eval-set scale (q96), a reason-coded
  * Gopher-style rule filter (q97), per-document token entropy (q98),
  * temperature-based mixture weighting (UniMax / mT5 alpha-sampling, q99),
  * MOSS-style winnowing fingerprints (q100) and their plagiarism-pair
  * match step (q106), BPE-training merge statistics (q104), the
  * cross-source overlap matrix (q105), GPT-style cross-document block
  * packing (q107) with its streaming continuation
  * (StreamOps.streamingBlockPack), the Zipf spectrum-slope diagnostic
  * (q108), and the composed rules → decontaminate → dedup → pack build
  * (q109).
  * Generalizes the same reference seam as TextQueries (the keyword UDTF,
  * …/app/func/KeywordUDTF.java:13-20): per-document text ops that must
  * survive a 100 TB corpus.
  *
  * Shapes: q97/q100 are scan-local HOF projections (zero shuffle); the
  * rest shuffle only narrow keys (hashes, token counts, word frequencies)
  * or collapse the corpus before any window (q99's per-source row, q104's
  * vocabulary, q108's frequency spectrum, q107's shard-local running sum).
  */
object CurationQueries {
  import Queries.Q

  private def t(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.Tpch(s, dir)

  /** Benchmark decontamination at n-gram granularity (the GPT-3 appendix-C
    * family: drop a training doc when any of its n-grams appears in an
    * eval benchmark; here n=5, eval = doc_id < 20). Contrast q69, which
    * broadcasts the eval side and counts pair overlaps: this is the SCALE
    * form for when the eval side is NOT small (all benchmarks × all
    * 13-grams = hundreds of millions of rows) — both sides shuffle only
    * (hash) longs into an equi-join, no forced broadcast, and AQE still
    * picks a broadcast when the eval side measures small at runtime. The
    * doc verdict is a semi-join + distinct, so no pair row ever
    * materializes; text never shuffles.
    */
  val q96_ngram_decontaminate: Q = (s, dir) => {
    val docs = t(s, dir).documents
    val hashes = docs.select(col("doc_id"), explode(shingleHashes(col("text"), 5)).as("h"))
    val evalH = hashes.filter(col("doc_id") < 20).select(col("h")).distinct()
    val contaminated = hashes.filter(col("doc_id") >= 20)
      .join(evalH, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.filter(col("doc_id") >= 20)
      .join(contaminated.withColumn("flag", lit(1)), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("flag"), lit(0)).as("contaminated"))
  }

  /** Exact-substring canary decontamination — the third member of the
    * decontamination trio (q69/q96 n-gram overlap, q137 set containment):
    * drop/flag a training doc when it contains any CANARY STRING verbatim
    * — the form used for held-out canaries and memorization probes, where
    * tokenization must not blur the match. Canaries here are a
    * deterministic 40-char span of each eval doc (doc_id < 20), so the
    * fixture exercises both verdicts wherever the corpus carries
    * exact/near duplicates of eval docs.
    *
    * Scale shape: the canary list is SMALL by definition (eval canaries,
    * not benchmark n-grams — q96 is the scale form when the probe side
    * is big), so it broadcasts and the match is a BroadcastNestedLoopJoin
    * LEFT SEMI: per-task `contains` evaluations over the scan, text never
    * shuffles, and the only exchange is the contaminated-id distinct
    * (narrow doc_id longs). The verdict join-back mirrors q96's.
    */
  val q155_canary_decontaminate: Q = (s, dir) => {
    val docs = t(s, dir).documents
    val canaries = docs.filter(col("doc_id") < 20)
      .select(substring(col("text"), 11, 40).as("phrase"))
      .filter(length(col("phrase")) === 40)
      .distinct()
    val train = docs.filter(col("doc_id") >= 20)
    val contaminated = graft.operators.Canary.contaminatedIds(
      train, "doc_id", "text", canaries, "phrase")
    train
      .join(contaminated.withColumn("flag", lit(1)), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("flag"), lit(0)).as("contaminated"))
  }

  /** q155 under the FORCED gram-prefilter route (`canaryCountCeiling = 1`
    * — the q150–q153 pessimized-twin convention): the large-canary-list
    * scale path of [[graft.operators.Canary.contaminatedIds]] — distinct
    * char-40-gram hashes emitted scan-locally, broadcast prefix-hash
    * candidates, exact contains() verify — runs under the driver's hash
    * gate pinned to q155's exact verdicts. Recall 1.0 by the prefix
    * pigeonhole; the oracle is q155's.
    */
  val q159_canary_gated: Q = (s, dir) => {
    val docs = t(s, dir).documents
    val canaries = docs.filter(col("doc_id") < 20)
      .select(substring(col("text"), 11, 40).as("phrase"))
      .filter(length(col("phrase")) === 40)
      .distinct()
    val train = docs.filter(col("doc_id") >= 20)
    val contaminated = graft.operators.Canary.contaminatedIds(
      train, "doc_id", "text", canaries, "phrase", canaryCountCeiling = 1)
    train
      .join(contaminated.withColumn("flag", lit(1)), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("flag"), lit(0)).as("contaminated"))
  }

  /** Reason-coded Gopher-style rule filter (Rae et al. table A1 family):
    * each doc carries one boolean PER RULE plus the conjunction, so the
    * funnel "which rule removed how much" is one groupBy away — the form
    * data-quality dashboards need, vs q23's single scalar score. All
    * per-row HOF arithmetic, zero shuffle; thresholds are deterministic
    * stand-ins for the published ones.
    */
  val q97_gopher_rules: Q = (s, dir) => {
    val toks = tokens(col("text"))
    val n = size(toks).cast("double")
    val meanLen = aggregate(toks, lit(0L), (acc, tk) => acc + length(tk)).cast("double") / n
    val nStop = size(filter(toks, tk => tk.isin("a", "the")))
    val uniqRatio = size(array_distinct(toks)) / n
    t(s, dir).documents.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tok"),
      round(meanLen, 6).as("mean_len"),
      (size(toks) >= 10 && size(toks) <= 500).cast("int").as("r_count"),
      (meanLen >= 2.0 && meanLen <= 8.0).cast("int").as("r_mean_len"),
      (nStop >= 1).cast("int").as("r_stop"),
      (uniqRatio >= 0.3).cast("int").as("r_uniq"))
      .withColumn("pass",
        (col("r_count") === 1 && col("r_mean_len") === 1 &&
          col("r_stop") === 1 && col("r_uniq") === 1).cast("int"))
  }

  /** Per-document token-distribution Shannon entropy — the compressibility
    * proxy quality filters use to drop keyboard-mash / template spam
    * (low-entropy) and encrypted/binary-ish noise (max-entropy), computed
    * as H = log2(n) − Σ c·log2(c) / n over token counts.
    *
    * Two exchanges, both narrow: groupBy (doc_id, tok) has doc_id in the
    * key so the partial agg combines map-side, and the shuffle carries
    * (doc_id, tok, count); the second groupBy carries three numbers per
    * distinct token. The oracle needs the literal token in the key — a
    * production run at 100 TB would key on xxhash64(tok) instead and
    * shuffle only longs (collisions merge counts, an error of ~2⁻⁶⁴ per
    * pair — invisible in an entropy score).
    */
  val q98_token_entropy: Q = (s, dir) => {
    // fanOut measured twice: it won before the Tables schema cache
    // (0.79→0.69 s — the query was load-overhead-bound) and LOSES after
    // it (0.44→0.57 s), so the scan stays unfanned
    val cnt = t(s, dir).documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    cnt.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(
          log2(sum(col("c")).cast("double")) -
            sum(col("c").cast("double") * log2(col("c").cast("double"))) /
              sum(col("c")).cast("double"),
          6).as("entropy"))
  }

  /** Temperature-based mixture weighting (mT5/UniMax alpha-sampling,
    * alpha = 0.5): per-source token mass → p_s, reweighted q_s ∝ p_s^α and
    * renormalized, then a 100k-token budget allocated per source. This is
    * the step that up-samples low-resource sources before q74's
    * budget-enforcement pass consumes the allocation.
    *
    * One groupBy collapses the corpus to ONE ROW PER SOURCE before the
    * unpartitioned normalization windows run — the single-partition window
    * sees #sources rows (a mixture table is ≤ thousands of entries at any
    * corpus size), never corpus rows. alloc derives from the ROUNDED q so
    * both engines floor the same 1-decimal multiple.
    */
  val q99_temperature_mix: Q = (s, dir) => {
    val w = Window.partitionBy()
    t(s, dir).documents
      .select(col("source"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"))
      .withColumn("p", col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
      .withColumn("q_raw", pow(col("p"), 0.5))
      .withColumn("q", round(col("q_raw") / sum(col("q_raw")).over(w), 6))
      .select(
        col("source"), col("n_tokens"), round(col("p"), 6).as("p"), col("q"),
        floor(lit(100000) * col("q") + 0.5).cast("long").as("alloc"))
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
    * MOSS algorithm): over the positional 3-shingle hash sequence, each
    * sliding window of w=4 selects its leftmost-minimum hash; the distinct
    * (position, hash) selections are the fingerprint set. Unlike MinHash
    * (q27), selections keep their POSITIONS, so shared fingerprints
    * localize the matching span, and the guarantee is combinatorial: any
    * shared token run of length ≥ w + n − 1 = 6 shares at least one
    * fingerprint. Entirely scan-local and zero-shuffle — one native
    * monotonic-deque pass per row (winnow_fps, O(tokens); the HOF
    * formulation re-scans every window, measured 1.5 s → see BASELINE.md);
    * downstream matching joins on (h) exactly like q96.
    */
  val q100_winnow: Q = (s, dir) =>
    t(s, dir).documents
      .select(col("doc_id"), explode(winnowFps(col("text"), 3, 4)).as("v"))
      .select(col("doc_id"), shiftright(col("v"), 32).as("pos"),
        col("v").bitwiseAND(lit(0xFFFFFFFFL)).as("h"))

  /** BPE-training merge statistics (Sennrich et al. 2016, algorithm 1's
    * hot loop): the top adjacent-symbol pairs by corpus-weighted count —
    * the candidates the first merge iteration would fuse. The scale move
    * is the VOCABULARY COLLAPSE the published algorithm itself relies on:
    * the corpus aggregates once to a (word, freq) dictionary — narrow keys,
    * map-side partials, Heaps-law sublinear row count — and all symbol-pair
    * work runs over that dictionary, never over corpus tokens. At 100 TB
    * the dictionary is millions of rows where the corpus is trillions of
    * tokens, and each further merge iteration (not materialized here)
    * re-scans only the dictionary rows containing the merged pair.
    *
    * Two narrow exchanges (word agg, pair agg) + a TakeOrdered top-20;
    * (cnt desc, pair asc) ordering makes the cut deterministic.
    */
  val q104_bpe_pairs: Q = (s, dir) => {
    val vocab = t(s, dir).documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
    vocab.filter(length(col("word")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), length(col("word")) - 1),
          i => concat(col("word").substr(i, lit(1)), lit("+"),
            col("word").substr(i + 1, lit(1))))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(20)
  }

  /** Cross-source duplication provenance: for every source pair, how many
    * distinct 5-gram fingerprints they share — the diagnostic that says
    * WHICH feeds mirror each other (and therefore which pair a dedup pass
    * should bucket together first). q96 answers "is this doc contaminated
    * by the eval set"; this answers the corpus-level "who overlaps whom".
    *
    * No self-join: each hash aggregates to its SOURCE SET (collect_set
    * partial-aggregates map-side, and is bounded by #sources — ≤ thousands
    * of short strings — never by the millions of documents that may carry
    * a boilerplate n-gram), and the pair fan-out explodes the ≤ |sources|²
    * upper triangle per hash. Two narrow exchanges: (h → source set),
    * then (src_a, src_b) counts; text never leaves its scan, and no
    * subtree is computed twice (the join formulation re-scans the
    * exploded distinct on both sides).
    */
  val q105_source_overlap: Q = (s, dir) => {
    // one-shot collect_set (no pre-distinct): a same-JVM alternating A/B
    // of {bare collect_set, distinct+collect_set, distinct+collect_list}
    // at 10× and 100× put bare collect_set fastest-or-tied (medians
    // 2.3/7.8 s vs 2.8/8.7 and 3.3/12.3) with the tightest spread at
    // 100× — the set's partial aggregate dedups map-side, so the extra
    // distinct exchange buys nothing (collect_list, which cannot dedup
    // partially, loses outright)
    val ss = Tables.fanOut(s, t(s, dir).documents) // balanced A/B 0.90→0.86 s
      .select(col("source"), explode(shingleHashes(col("text"), 5)).as("h"))
      .groupBy(col("h"))
      .agg(array_sort(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    ss.select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + 2, size(col("ss"))), y =>
          struct(x.as("src_a"), y.as("src_b")))))).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("shared"))
  }

  /** Winnowing plagiarism pairs (the MOSS match step over q100's
    * fingerprints): top document pairs by shared winnow fingerprint count.
    * Two scale guards, both from the published practice:
    *  - a DF CAP (`maxDf`): fingerprints appearing in more than maxDf
    *    docs are boilerplate and are dropped BEFORE pair generation — MOSS
    *    itself ignores over-common fingerprints. This bounds the per-hash
    *    doc set at maxDf, so pair fan-out is ≤ maxDf² per hash, never
    *    corpus-quadratic.
    *  - pair counting runs over (hash → doc set) aggregates like q105 —
    *    no self-join, no double scan; positions are dropped first (a pos
    *    disagreement never changes WHETHER a pair shares a fingerprint).
    * Top-k is (shared desc, d1 asc, d2 asc) TakeOrdered — deterministic.
    */
  val q106_winnow_pairs: Q = (s, dir) => {
    val maxDf = 20
    // one-shot collect_set, same A/B-measured canonical form as q105:
    // the set's partial aggregate dedups (doc per hash) map-side, so a
    // pre-distinct exchange buys nothing and collect_list (no partial
    // dedup possible) measures strictly slower
    // NO fanOut here (measured: 1.08→1.35 s with it): winnowFps emits far
    // fewer rows than it reads characters, so the win from parallelizing
    // the hash loses to re-serializing the full text into the exchange
    val docSets = t(s, dir).documents
      .select(col("doc_id"), explode(winnowFps(col("text"), 3, 4)).as("v"))
      .select(col("doc_id"), col("v").bitwiseAND(lit(0xFFFFFFFFL)).as("h"))
      .groupBy(col("h"))
      .agg(array_sort(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
    docSets.select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
          struct(x.as("d1"), y.as("d2")))))).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .orderBy(col("shared").desc, col("d1").asc, col("d2").asc)
      .limit(50)
  }

  /** GPT-style cross-document block packing: documents are concatenated
    * (with one EOS token each) in a seeded shuffle order and sliced into
    * fixed 256-token training blocks; each doc reports its token offset
    * and the first/last block it lands in. Contrast q71 (greedy first-fit
    * into per-doc-capped sequences) and q78 (per-doc chunking): this is
    * the packing that wastes zero tokens to padding, which is how large
    * pretraining runs actually feed data.
    *
    * Scale shape: the only exchange is the shard window — each doc's
    * offset is a running sum WITHIN its hash shard (q72's portable
    * seeded-shuffle geometry), so shards pack in parallel and block ids
    * are shard-local. Production sets #shards ≈ corpus_tokens /
    * target_shard_tokens, bounding per-task state; a global running sum
    * (one sequential partition) would serialize the corpus.
    */
  def blockPack(docs: org.apache.spark.sql.DataFrame, shards: Int,
                blockSize: Int): org.apache.spark.sql.DataFrame =
    blockPackCounts(docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tok")), shards, blockSize)

  /** [[blockPack]] over pre-computed per-doc token counts (doc_id, n_tok)
    * — the form a metadata-only pipeline (q109) feeds so the packer never
    * touches text.
    */
  def blockPackCounts(counts: org.apache.spark.sql.DataFrame, shards: Int,
                      blockSize: Int): org.apache.spark.sql.DataFrame = {
    val h = polyHash(concat(lit("s42|"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .select(col("doc_id"), h.as("h"), col("n_tok"))
      .withColumn("shard", pmod(col("h"), lit(shards)))
      .withColumn("off", coalesce(sum(col("n_tok") + 1).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tok"), col("off"),
        floor(col("off") / blockSize).cast("long").as("blk_first"),
        floor((col("off") + col("n_tok")) / blockSize).cast("long").as("blk_last"))
  }

  val q107_block_pack: Q = (s, dir) => blockPack(t(s, dir).documents, 8, 256)

  /** Zipf-fit corpus-health diagnostic: least-squares slope of the token
    * FREQUENCY SPECTRUM (log2 #types-with-frequency-f against log2 f) — a
    * natural corpus sits near the Zipf regime (spectrum slope ≈ −2 when
    * the rank exponent is 1); template spam or synthetic text bends it.
    *
    * Fitting the spectrum instead of the rank-frequency curve is the
    * scale move: a rank needs a global row_number over the whole
    * vocabulary (one sequential partition at 100 TB), while the spectrum
    * is two narrow aggregates — (word → freq), (freq → #types), each with
    * map-side partials — and the regression runs over the few hundred
    * distinct frequencies. No window anywhere.
    */
  val q108_zipf: Q = (s, dir) => {
    val spectrum = t(s, dir).documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .groupBy(col("freq")).agg(count(lit(1)).as("n_types"))
    spectrum.agg(
      count(lit(1)).as("n_points"),
      round(regr_slope(log2(col("n_types")), log2(col("freq"))), 6).as("slope"),
      round(regr_intercept(log2(col("n_types")), log2(col("freq"))), 6).as("intercept"))
  }

  /** The curation capstone: rules → decontamination → exact dedup →
    * block packing composed as ONE declarative plan — the "build the
    * training set" run, where q66 is the dedup-funnel recap. Stages:
    *
    *   1. reason-coded rule gate (q97's conjunction);
    *   2. eval-set 5-gram decontamination (q96's geometry — eval is
    *      doc_id < 20, hashes equi-join, text never shuffles);
    *   3. exact dedup (q26's min-id-per-fingerprint);
    *   4. GPT-style block packing of the survivors (q107).
    *
    * Stage order is the cost order: the scan-local rule gate runs first
    * (no shuffle spent on docs it drops), both shuffle stages see only
    * survivors, and packing — the only stage whose output depends on the
    * survivor SET — runs last. Catalyst pipelines the whole thing; the
    * oracle replays all four stages as chained CTEs, so the driver
    * hash-checks the composition, not just the parts.
    */
  val q109_curated_pack: Q = (s, dir) => {
    val docs = t(s, dir).documents
    val toks = tokens(col("text"))
    val n = size(toks).cast("double")
    val meanLen = aggregate(toks, lit(0L), (acc, tk) => acc + length(tk)).cast("double") / n
    val pass = size(toks) >= 10 && size(toks) <= 500 &&
      meanLen >= 2.0 && meanLen <= 8.0 &&
      size(filter(toks, tk => tk.isin("a", "the"))) >= 1 &&
      (size(array_distinct(toks)) / n) >= 0.3
    val ruleKept = docs.filter(col("doc_id") >= 20 && pass)

    val evalH = docs.filter(col("doc_id") < 20)
      .select(explode(shingleHashes(col("text"), 5)).as("h")).distinct()
    def contaminatedFrom(gated: org.apache.spark.sql.DataFrame,
                         h: org.apache.spark.sql.Column) = gated
      .select(col("doc_id"), explode(h).as("h"))
      .join(evalH, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()

    if (sys.props.get("graft.curated.meta").forall(_.toBoolean)) {
      if (sys.props.get("graft.curated.onescan").forall(_.toBoolean)) {
        // Round-10 single-wide-scan form (guide §8 one step further —
        // VERDICT r09 "Next round" #5): the round-9 metadata form still
        // ran the gated TEXT scan twice (metadata projection + shingle
        // explode for the decontamination probe). Computing the shingle
        // hashes IN the metadata scan reads text exactly ONCE; the
        // checkpoint then carries (doc_id, fp, n_tok, hs) — hs is ≤ n_tok
        // longs and the rule gate caps n_tok at 500, so the materialized
        // rows stay bounded at ~4 KB/doc, traded against a whole
        // rule-gated text scan (tokenize + 4 HOF predicates per doc).
        // The decontamination explode runs over the checkpointed arrays,
        // never re-reading parquet.
        val base = ruleKept
          .select(col("doc_id"),
            polyHash(trim(lower(col("text")))).as("fp"),
            size(toks).cast("long").as("n_tok"),
            shingleHashes(col("text"), 5).as("hs"))
          .transform(d => graft.core.Mat.checkpoint(d, "q109_base"))
        val contaminated = contaminatedFrom(base, col("hs"))
        val decontIds = base.select(col("doc_id"), col("fp"), col("n_tok"))
          .join(contaminated, Seq("doc_id"), "left_anti")
        val keepers = decontIds.groupBy(col("fp"))
          .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
        val survivors = decontIds.join(keepers, Seq("doc_id"), "left_semi")
        blockPackCounts(survivors.select(col("doc_id"), col("n_tok")), 8, 256)
      } else {
        // Guide-§8 form (round-9, measured): every decision after the
        // decontamination probe depends only on (doc_id, fp, n_tok) — so
        // extract that METADATA TABLE in one gated scan (checkpointed: ~40
        // bytes/doc, no text) and run dedup + packing over it. The text is
        // read exactly twice (metadata scan, shingle explode) instead of
        // re-running the rule-gate scan per stage reference; the dedup
        // fingerprint is the SAME polyHash(trim(lower(text))) expression
        // exactDedup computes, evaluated in the metadata scan.
        val contaminated = contaminatedFrom(ruleKept, shingleHashes(col("text"), 5))
        val meta = ruleKept
          .select(col("doc_id"),
            polyHash(trim(lower(col("text")))).as("fp"),
            size(toks).cast("long").as("n_tok"))
          .transform(d => graft.core.Mat.checkpoint(d, "q109_meta"))
        val decontIds = meta.join(contaminated, Seq("doc_id"), "left_anti")
        val keepers = decontIds.groupBy(col("fp"))
          .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
        val survivors = decontIds.join(keepers, Seq("doc_id"), "left_semi")
        blockPackCounts(survivors.select(col("doc_id"), col("n_tok")), 8, 256)
      }
    } else {
      val contaminated = contaminatedFrom(ruleKept, shingleHashes(col("text"), 5))
      val decont = ruleKept.join(contaminated, Seq("doc_id"), "left_anti")
      val survivors = decont.join(
        Dedup.exactDedup(decont, "doc_id", "text"), Seq("doc_id"), "left_semi")
      blockPack(survivors, 8, 256)
    }
  }

  /** A-ES deterministic-uniform parameters: the Knuth multiplicative hash
    * of doc_id modulo a prime, mapped into (0, 1]. Portable integer
    * arithmetic, so the oracle replays it exactly.
    */
  val WS_MULT = 2654435761L
  val WS_MOD = 1000000007L
  val WS_K = 10

  /** Weighted sampling WITHOUT replacement, k per source, inclusion
    * probability ∝ n_chars — Efraimidis–Spirakis A-ES by exponential race:
    * each doc draws key = -ln(u)/w and the k SMALLEST keys win (equivalent
    * to the largest u^(1/w); one race, no rejection/retry rounds). This is
    * the importance-weighted subsample step of mixture construction —
    * "take 100k docs from this source, longer docs proportionally more
    * often" — where per-row Bernoulli (q70) can't hit an exact k and
    * uniform top-k ignores the weights.
    *
    * Scale shape: the key is a scan-local expression (hash → u → -ln(u)/w,
    * no state, no model); per-source top-k compiles to WindowGroupLimit —
    * each task forwards ≤ k rows per source, so the single exchange
    * carries O(sources × k × tasks) rows, not the corpus. Deterministic
    * end-to-end: u is a pure function of doc_id.
    */
  val q119_weighted_sample: Q = (s, dir) => {
    // doc_id reduced mod the prime BEFORE multiplying (floorMod): ids past
    // ~3.47e9 must not wrap the long product (Sketch A-ES discipline)
    val u = (pmod(col("doc_id"), lit(WS_MOD)) * WS_MULT % WS_MOD + 1)
      .cast("double") / (WS_MOD + 1)
    val key = -log(u) / col("n_chars")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("key").asc, col("doc_id").asc)
    t(s, dir).documents
      .select(col("source"), col("doc_id"), col("n_chars"), key.as("key"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= WS_K)
      .select(col("source"), col("doc_id"), col("n_chars"),
        round(col("key"), 9).as("key"), col("rk"))
  }

  /** BPE train + ENCODE (q104's loop completed,
    * [[graft.operators.Bpe]]): train [[BPE_ROUNDS]] merges on the corpus
    * word dictionary, apply them round-for-round, and report the
    * corpus-weighted frequency of the top [[BPE_TOPK]] resulting subword
    * symbols — the token-id distribution the q71/q107 packing stages
    * would consume. Every round's merge choice is (cnt desc, pair asc)
    * over exact longs, so the oracle replays the whole loop as chained
    * CTEs (the q142 discipline) through an INDEPENDENT island-parity
    * formulation of the merge semantics — a real cross-check of the
    * engine's left-to-right fold, not an echo of it.
    */
  val BPE_ROUNDS = 6
  val BPE_TOPK = 50
  val q146_bpe_encode: Q = (s, dir) => {
    val vocab = t(s, dir).documents
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val (_, encoded) = graft.operators.Bpe.train(vocab, "word", "freq", BPE_ROUNDS)
    encoded.select(col("freq"), explode(col("syms")).as("tok"))
      .groupBy(col("tok")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(BPE_TOPK)
  }

  /** Trainable quality classifier
    * ([[graft.operators.QualityModel.trainLogistic]]): fit a
    * quasi-logistic model to predict q97's Gopher-pass verdict from
    * [[QT_F]] hashed token-residue features, by [[QT_ROUNDS]] bounded
    * GD rounds — the training half q90's fixed-weight scorer was
    * missing. Output is the weight vector AFTER EVERY round (round, j,
    * w), and the oracle replays the whole descent as chained
    * MATERIALIZED CTEs (the q146 discipline): decimal-summed gradients
    * make each round's sums exact and order-independent, the rational
    * sigmoid keeps the per-doc arithmetic engine-exact, and the 12-dp
    * weight rounding pins each round's model as a short literal.
    */
  val QT_F = 6
  val QT_ROUNDS = 5
  val QT_LR = 0.5
  private def gopherLabel = {
    val toks = tokens(col("text"))
    val n = size(toks).cast("double")
    val meanLen = aggregate(toks, lit(0L), (acc, tk) => acc + length(tk))
      .cast("double") / n
    val nStop = size(filter(toks, tk => tk.isin("a", "the")))
    val uniqRatio = size(array_distinct(toks)) / n
    (size(toks) >= 10 && size(toks) <= 500 &&
      meanLen >= 2.0 && meanLen <= 8.0 &&
      nStop >= 1 && uniqRatio >= 0.3).cast("double")
  }
  private def qtKey(dir: String) = s"qt|$dir|$QT_F|$QT_ROUNDS|$QT_LR"
  val q161_quality_train: Q = (s, dir) => {
    import s.implicits._
    val ws = graft.operators.QualityModel.trainCached(
      t(s, dir).documents, qtKey(dir), "text", gopherLabel,
      f = QT_F, rounds = QT_ROUNDS, lr = QT_LR)
    ws.zipWithIndex.flatMap { case (w, r) =>
      w.zipWithIndex.map { case (v, j) => ((r + 1).toLong, j.toLong, v) }
    }.toDF("round", "j", "w")
  }

  /** The learned model APPLIED ([[graft.operators.QualityModel.score]]):
    * train q161's descent, then score every doc with the FINAL weights —
    * q90's scoring pass with weights the pipeline learned rather than
    * fixed constants, end-to-end under the hash gate. Training is
    * deterministic (decimal-summed gradients) and MEMOIZED
    * (`trainCached`, the Ivf/Pq convention), so this shares q161's exact
    * weights without paying the rounds twice; the oracle replays the
    * descent CTEs and scores through the identical left-assoc chain.
    */
  val q162_quality_score: Q = (s, dir) => {
    val docs = t(s, dir).documents
    val ws = graft.operators.QualityModel.trainCached(
      docs, qtKey(dir), "text", gopherLabel,
      f = QT_F, rounds = QT_ROUNDS, lr = QT_LR)
    docs.filter(size(tokens(col("text"))) > 0)
      .select(col("doc_id"), gopherLabel.cast("int").as("y"),
        round(graft.operators.QualityModel.score(col("text"), ws.last), 9)
          .as("score"))
  }

  /** q155 under the FORCED too-big-to-broadcast route (both ceilings = 1
    * — the q150–q153/q159 pessimized-twin convention): the gram
    * prefilter as a shuffle equi-JOIN on the gram hash (q96's n-gram
    * join shape — (id, 8-byte hash) vs (hash, phrase) in the exchange,
    * text never shuffles; candidates collapse to one bounded
    * (id, phrases) row per doc before the exact-verify id join), PLUS a
    * planted sub-4-codepoint canary so the short-probe BNLJ branch and
    * its union run under the driver's hash gate too. The oracle is plain
    * contains over the union list — recall 1.0 on every route.
    */
  val q165_canary_joined: Q = (s, dir) => {
    val docs = t(s, dir).documents
    val long = docs.filter(col("doc_id") < 20)
      .select(substring(col("text"), 11, 40).as("phrase"))
      .filter(length(col("phrase")) === 40)
    val short = docs.filter(col("doc_id") < 3)
      .select(substring(col("text"), 11, 3).as("phrase"))
      .filter(length(col("phrase")) === 3)
    val canaries = long.unionByName(short).distinct()
    val train = docs.filter(col("doc_id") >= 20)
    val contaminated = graft.operators.Canary.contaminatedIds(
      train, "doc_id", "text", canaries, "phrase",
      canaryCountCeiling = 1, broadcastCharsCeiling = 1)
    train
      .join(contaminated.withColumn("flag", lit(1)), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("flag"), lit(0)).as("contaminated"))
  }

  /** Hold-out evaluation of the trained quality model — the composition
    * [[graft.operators.Dedup.clusterSafeSplit]] +
    * [[graft.operators.QualityModel.trainLogistic]] exists for: train on
    * splits ≠ 0, score split 0, and the cluster guarantee makes the
    * measurement honest (no near-duplicate of a held-out doc can sit in
    * train, so the accuracy is generalization, not leakage — the q164
    * lesson applied to model eval). Output is per-held-out-doc
    * (y, score, hit) — replayable end to end: the oracle rebuilds the
    * SAME split (q157's closure CTEs), runs the SAME descent over the
    * split-filtered subset (q161's round CTEs), and scores through the
    * identical left-assoc chain.
    *
    * Scale shape: the split costs q157's plan, training costs q161's
    * over ~9/10 of the corpus, eval is one scan-local scoring pass over
    * the held-out tenth joined to the split frame on id.
    */
  val q166_holdout_eval: Q = (s, dir) => {
    val docs = t(s, dir).documents
    val split = graft.operators.Dedup.clusterSafeSplit(docs, "doc_id", "text",
      DedupQueries.SHINGLE_N, DedupQueries.MINHASH_K, DedupQueries.LSH_BANDS,
      0.5, buckets = 10).select(col("doc_id"), col("split"))
    val train = docs.join(
      split.filter(col("split") =!= 0).select(col("doc_id")), Seq("doc_id"))
    val w = graft.operators.QualityModel.trainCached(
      train, s"qt-holdout|$dir|$QT_F|$QT_ROUNDS|$QT_LR", "text", gopherLabel,
      f = QT_F, rounds = QT_ROUNDS, lr = QT_LR).last
    docs.join(split.filter(col("split") === 0).select(col("doc_id")), Seq("doc_id"))
      .filter(size(tokens(col("text"))) > 0)
      .select(col("doc_id"), gopherLabel.cast("int").as("y"),
        round(graft.operators.QualityModel.score(col("text"), w), 9).as("score"))
      .withColumn("hit",
        ((col("score") >= 0.5) === (col("y") === 1)).cast("int"))
  }

  /** PII scrubbing ([[graft.operators.Scrub.scrubPii]]): the redaction
    * pass that runs before fingerprinting (emails / IPv4s / intl + NANP
    * phones / SSNs / card numbers → typed placeholders + per-doc
    * counts). The synthetic corpus carries no PII, so the fixture PLANTS
    * deterministic specimens: email + IP + intl phone on doc_id ≡ 0
    * (mod 3); paren + dashed NANP phone, SSN, contiguous + separated
    * card, AND a 17-digit near-miss ("ref 12345678901234567" — must
    * survive unscrubbed, putting the \b{13,16}\b boundary agreement
    * itself under the hash) on doc_id ≡ 1. The driver row then
    * hash-checks the scrubbed STRINGS, i.e. the cross-engine
    * regex-semantics claim itself (Java regex vs RE2 agree on the
    * restricted pattern subset). Scan-local, zero shuffle (the q97
    * class — no ScaleBench row).
    */
  val q167_pii_scrub: Q = (s, dir) => {
    val id4 = lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")
    val planted = t(s, dir).documents.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com via 10.0."),
          pmod(col("doc_id"), lit(256)), lit(".7 or +1 555 01"),
          lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
          lit(" 4242")))
      .when(pmod(col("doc_id"), lit(3)) === 1,
        concat(col("text"),
          lit(" call (555) 010-"), id4,
          lit(" or 555-867-5309, ssn 123-45-"), id4,
          lit(", card 4111111111111111 or 4242-4242-4242-4242, ref 12345678901234567")))
        .otherwise(col("text")).as("text"))
    graft.operators.Scrub.scrubPii(planted, "doc_id", "text")
  }

  /** The markup plants for q169: a full HTML wrap (script with the
    * old-school comment-hiding pattern, style, comment, DOCTYPE, tags,
    * entities incl. a double-escape) on doc_id ≡ 0 (mod 4); an
    * entities-and-inline-tags tail (incl. an UNKNOWN entity that must
    * survive — the over-deletion boundary under the hash) on ≡ 2. No
    * single quotes (they'd need SQL escaping in the oracle twin).
    */
  private val MarkupPre =
    "<!DOCTYPE html><html><head><title>Doc</title>" +
      "<style type=\"text/css\">p{margin:0}</style>" +
      "<script>var a=1; if (a<2) { a=3; }<!-- hide --></script>" +
      "</head><body><!-- hdr --><p class=\"main\">"
  private val MarkupPost =
    "</p><br/>tail &amp;amp; &lt;esc&gt;&nbsp;fin</body></html>"
  private val MarkupTail =
    " say &quot;hi&#39;s&quot; ok <b>bold</b> unknown &foo; stays"

  /** Markup stripping ([[graft.operators.Markup.stripMarkup]]): the
    * first cleaning pass a web-scrape corpus needs — script/style/
    * comments dropped with content, tags/DOCTYPE dropped keeping
    * content, common entities decoded (&amp; last — double-escapes
    * render one level), whitespace collapsed. The synthetic corpus
    * carries no markup, so the fixture PLANTS it (see [[MarkupPre]]);
    * the driver row hash-checks the stripped STRINGS — the cross-engine
    * lazy-quantifier/(?i) agreement claim itself. Scan-local, zero
    * shuffle (the q97 class — no ScaleBench row).
    */
  val q169_markup_strip: Q = (s, dir) => {
    val planted = t(s, dir).documents.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit(MarkupPre), col("text"), lit(MarkupPost)))
      .when(pmod(col("doc_id"), lit(4)) === 2,
        concat(col("text"), lit(MarkupTail)))
      .otherwise(col("text")).as("text"))
    graft.operators.Markup.stripMarkup(planted, "doc_id", "text")
  }

  def all: Map[String, Q] = Map(
    "q119_weighted_sample" -> q119_weighted_sample,
    "q96_ngram_decontaminate" -> q96_ngram_decontaminate,
    "q155_canary_decontaminate" -> q155_canary_decontaminate,
    "q159_canary_gated" -> q159_canary_gated,
    "q165_canary_joined" -> q165_canary_joined,
    "q166_holdout_eval" -> q166_holdout_eval,
    "q167_pii_scrub" -> q167_pii_scrub,
    "q169_markup_strip" -> q169_markup_strip,
    "q97_gopher_rules" -> q97_gopher_rules,
    "q98_token_entropy" -> q98_token_entropy,
    "q99_temperature_mix" -> q99_temperature_mix,
    "q100_winnow" -> q100_winnow,
    "q104_bpe_pairs" -> q104_bpe_pairs,
    "q105_source_overlap" -> q105_source_overlap,
    "q106_winnow_pairs" -> q106_winnow_pairs,
    "q107_block_pack" -> q107_block_pack,
    "q108_zipf" -> q108_zipf,
    "q109_curated_pack" -> q109_curated_pack,
    "q146_bpe_encode" -> q146_bpe_encode,
    "q161_quality_train" -> q161_quality_train,
    "q162_quality_score" -> q162_quality_score)

  /** One BPE round as chained CTEs (the q142 fixpoint-replay
    * discipline): pair counts over v{k-1}, the (cnt desc, pair asc)
    * top-1, then the merge applied through the ISLAND-PARITY rule — a
    * candidate position merges iff its offset from its candidate-run
    * start is even — which equals the engine's left-to-right fold
    * (adjacent candidates only occur for a = b, where both formulations
    * merge the 1st, 3rd, … of each run; for a ≠ b every candidate is an
    * island of one). An independent formulation, so the oracle checks
    * the fold rather than echoing it.
    */
  private def bpeRoundSql(k: Int): String =
    s"""p$k AS (
       |  SELECT syms[i] AS a, syms[i+1] AS b, sum(freq)::BIGINT AS cnt
       |  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM v${k - 1})
       |  GROUP BY 1, 2),
       |t$k AS MATERIALIZED (
       |  SELECT a, b FROM p$k ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
       |x$k AS (
       |  SELECT word, freq, i, syms[i] AS s,
       |    (i < len(syms) AND syms[i] = (SELECT a FROM t$k)
       |       AND syms[i+1] = (SELECT b FROM t$k)) AS cand
       |  FROM (SELECT word, freq, syms, unnest(range(1, len(syms) + 1)) AS i
       |        FROM v${k - 1})),
       |y$k AS (
       |  SELECT *, i - row_number() OVER (PARTITION BY word, cand ORDER BY i) AS isl
       |  FROM x$k),
       |z$k AS (
       |  SELECT word, freq, i, s,
       |    (cand AND (i - min(i) OVER (PARTITION BY word, cand, isl)) % 2 = 0) AS m
       |  FROM y$k),
       |w$k AS (
       |  SELECT word, freq, i, s, m,
       |    lag(m) OVER (PARTITION BY word ORDER BY i) AS pm
       |  FROM z$k),
       |v$k AS MATERIALIZED (
       |  SELECT word, freq,
       |    list(CASE WHEN m THEN (SELECT a FROM t$k) || (SELECT b FROM t$k)
       |         ELSE s END ORDER BY i) AS syms
       |  FROM w$k WHERE NOT coalesce(pm, false)
       |  GROUP BY 1, 2)""".stripMargin

  /** q161 oracle: the whole gradient descent replayed as chained
    * MATERIALIZED CTEs — w0 is the zero vector; each round k computes
    * every doc's z through the SAME left-associated weight·feature chain,
    * the rational sigmoid, per-doc terms rounded to 12 dp and summed as
    * DECIMAL(38,18) (exact, order-free), then the 12-dp weight update.
    * Weights live as F+1 pivoted columns so the fold order is explicit.
    */
  private def qtZChain: String = (0 to QT_F).map(j => s"w$j * x$j").mkString(" + ")

  /** The per-doc feature select list (y, x0..xF) over `d`'s `toks`. */
  private def qtFeatureSelect: String = {
    val f = QT_F
    val xdefs = (1 to f).map { j =>
      s"len(list_filter(toks, t -> ${polyHashSql("t")} % $f = ${j - 1}))::DOUBLE" +
        s" / len(toks) AS x$j"
    }.mkString(",\n    ")
    s"""(len(toks) BETWEEN 10 AND 500
       |     AND list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks) >= 2.0
       |     AND list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks) <= 8.0
       |     AND len(list_filter(toks, t -> t IN ('a', 'the'))) >= 1
       |     AND len(list_distinct(toks))::DOUBLE / len(toks) >= 0.3)::INT::DOUBLE AS y,
       |    1.0::DOUBLE AS x0,
       |    $xdefs""".stripMargin
  }

  /** The descent rounds (w0..wR) over training table `src` — each round
    * re-scans `src` with the previous round's weights, so q166 runs the
    * IDENTICAL arithmetic over its split-filtered subset.
    */
  private def qtRoundCtes(src: String): String = {
    val js = 0 to QT_F
    val rounds = (1 to QT_ROUNDS).map { k =>
      s"""s$k AS (
         |  SELECT y, ${js.map(j => s"x$j").mkString(", ")},
         |    0.5 + ($qtZChain) / (2.0 * (1.0 + abs($qtZChain))) AS sig
         |  FROM $src, w${k - 1}),
         |g$k AS (
         |  SELECT count(*)::DOUBLE AS n,
         |    ${js.map(j => s"sum(round((sig - y) * x$j, 12)::DECIMAL(38,18)) AS g$j").mkString(",\n    ")}
         |  FROM s$k),
         |w$k AS MATERIALIZED (
         |  SELECT ${js.map(j => s"round(w$j - $QT_LR * (g$j::DOUBLE / n), 12) AS w$j").mkString(",\n    ")}
         |  FROM w${k - 1}, g$k)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (SELECT ${js.map(j => s"0.0::DOUBLE AS w$j").mkString(", ")}),
       |$rounds""".stripMargin
  }

  /** The shared descent CTE chain (d, base incl. doc_id, w0..wR) — q161
    * unpivots the per-round weights from it, q162 scores `base` with the
    * final round's.
    */
  private def qtCtes: String =
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |base AS MATERIALIZED (
       |  SELECT doc_id,
       |    $qtFeatureSelect
       |  FROM d WHERE len(toks) > 0),
       |${qtRoundCtes("base")}""".stripMargin

  private def q161Oracle: String = {
    val unpivot = (1 to QT_ROUNDS).flatMap { k =>
      (0 to QT_F).map(j =>
        s"SELECT $k::BIGINT AS round, $j::BIGINT AS j, w$j AS w FROM w$k")
    }.mkString("\nUNION ALL ")
    s"""$qtCtes
       |$unpivot""".stripMargin
  }

  private def q162Oracle: String =
    s"""$qtCtes
       |SELECT doc_id, y::INT AS y,
       |  round(0.5 + ($qtZChain) / (2.0 * (1.0 + abs($qtZChain))), 9) AS score
       |FROM base, w$QT_ROUNDS""".stripMargin

  /** q166 oracle: q157's split closure (shared shingle/component CTEs)
    * feeding q161's descent rounds over the split≠0 subset, then the
    * identical scoring chain over split 0 — the whole
    * train-on-train/score-on-held-out composition replayed in SQL.
    */
  private def q166Oracle: String = {
    val scoreSql = s"round(0.5 + ($qtZChain) / (2.0 * (1.0 + abs($qtZChain))), 9)"
    s"""WITH RECURSIVE ${DedupQueries.shingleCtes},
       |${DedupQueries.componentCtes()},
       |m AS (SELECT d.doc_id, coalesce(lbl.cluster, d.doc_id) AS cluster
       |  FROM d LEFT JOIN lbl ON d.doc_id = lbl.doc_id),
       |sp AS MATERIALIZED (SELECT doc_id,
       |    ${polyHashSql("'split|' || cluster::VARCHAR")} % 10 AS split
       |  FROM m),
       |base AS MATERIALIZED (
       |  SELECT d.doc_id, sp.split,
       |    $qtFeatureSelect
       |  FROM d JOIN sp ON d.doc_id = sp.doc_id WHERE len(toks) > 0),
       |tr AS MATERIALIZED (SELECT * FROM base WHERE split <> 0),
       |${qtRoundCtes("tr")}
       |SELECT doc_id, y::INT AS y,
       |  $scoreSql AS score,
       |  (($scoreSql >= 0.5) = (y = 1))::INT AS hit
       |FROM base, w$QT_ROUNDS WHERE split = 0""".stripMargin
  }

  /** The q75-oracle polyhash over a shingle string, as DuckDB SQL. */
  private def polyHashSql(expr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |  list_transform(string_split($expr, ''), c -> ascii(c)::BIGINT)),
       |  (h, a) -> (h * 31 + a) % 1000000007)""".stripMargin

  /** q167 oracle: the identical plant, the identical replace chain in
    * the identical order ('g' — DuckDB replaces first-only by default
    * where Spark replaces all), counts via regexp_extract_all length.
    * Both the replace chain and the count expressions are GENERATED from
    * [[graft.operators.Scrub.PASSES]], so the oracle can never drift
    * from the operator's pattern list or pass order.
    */
  private def q167Oracle: String = {
    import graft.operators.Scrub
    val scrubbed = Scrub.PASSES.foldLeft("text") { case (acc, (p, repl, _)) =>
      s"regexp_replace($acc, '$p', '$repl', 'g')"
    }
    val counts = Scrub.COUNT_COLS.map { c =>
      val sum = Scrub.PASSES.filter(_._3 == c)
        .map { case (p, _, _) => s"len(regexp_extract_all(text, '$p'))" }
        .mkString(" + ")
      s"($sum)::BIGINT AS $c"
    }.mkString(",\n  ")
    s"""WITH p AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN
       |      text || ' contact user' || doc_id::VARCHAR || '@example.com via 10.0.' ||
       |      (doc_id % 256)::VARCHAR || '.7 or +1 555 01' ||
       |      lpad((doc_id % 100)::VARCHAR, 2, '0') || ' 4242'
       |    WHEN doc_id % 3 = 1 THEN
       |      text || ' call (555) 010-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
       |      ' or 555-867-5309, ssn 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
       |      ', card 4111111111111111 or 4242-4242-4242-4242, ref 12345678901234567'
       |    ELSE text END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  $scrubbed AS scrubbed,
       |  $counts
       |FROM p""".stripMargin
  }

  /** q169 oracle: the identical plant, the identical pass chain
    * GENERATED from [[graft.operators.Markup]]'s pass tables (the q167
    * no-drift discipline), trim(…) last. Plant strings contain no
    * single quotes; entity replacements escape theirs for the SQL
    * literal.
    */
  private def q169Oracle: String = {
    import graft.operators.Markup
    def q(s: String) = s.replace("'", "''")
    val noMarkup = Markup.STRIP.foldLeft("text") { (acc, p) =>
      s"regexp_replace($acc, '${q(p)}', ' ', 'g')"
    }
    val decoded = Markup.ENTITIES.foldLeft(noMarkup) { case (acc, (e, r)) =>
      s"regexp_replace($acc, '${q(e)}', '${q(r)}', 'g')"
    }
    val stripped = s"trim(regexp_replace($decoded, '${q(Markup.WS)}', ' ', 'g'))"
    s"""WITH p AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 4 = 0 THEN '${q(MarkupPre)}' || text || '${q(MarkupPost)}'
       |    WHEN doc_id % 4 = 2 THEN text || '${q(MarkupTail)}'
       |    ELSE text END AS text
       |  FROM documents)
       |SELECT doc_id, $stripped AS stripped FROM p""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q161_quality_train" -> q161Oracle,
    "q162_quality_score" -> q162Oracle,
    "q166_holdout_eval" -> q166Oracle,
    "q167_pii_scrub" -> q167Oracle,
    "q169_markup_strip" -> q169Oracle,
    // the forced shuffle-gram + short-probe union must produce plain
    // contains() verdicts over the union list — recall 1.0 on every route
    "q165_canary_joined" ->
      """WITH c AS (
        |  SELECT DISTINCT substring(text, 11, 40) AS phrase FROM documents
        |  WHERE doc_id < 20 AND length(substring(text, 11, 40)) = 40
        |  UNION
        |  SELECT substring(text, 11, 3) FROM documents
        |  WHERE doc_id < 3 AND length(substring(text, 11, 3)) = 3),
        |f AS (
        |  SELECT DISTINCT d.doc_id FROM documents d, c
        |  WHERE d.doc_id >= 20 AND contains(d.text, c.phrase))
        |SELECT d.doc_id,
        |  (CASE WHEN f.doc_id IS NULL THEN 0 ELSE 1 END) AS contaminated
        |FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id
        |WHERE d.doc_id >= 20""".stripMargin,
    "q119_weighted_sample" ->
      s"""WITH k AS (
         |  SELECT source, doc_id, n_chars,
         |    -ln(((((doc_id % $WS_MOD + $WS_MOD) % $WS_MOD) * $WS_MULT)
         |      % $WS_MOD + 1)::DOUBLE / ${WS_MOD + 1}) / n_chars AS key
         |  FROM documents)
         |SELECT source, doc_id, n_chars, round(key, 9) AS key, rk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY source ORDER BY key ASC, doc_id ASC) AS rk
         |  FROM k) WHERE rk <= $WS_K""".stripMargin,
    "q96_ngram_decontaminate" ->
      s"""WITH d AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, unnest(list_transform(
         |    list_transform(range(len(toks) - 4),
         |      i -> toks[i+1] || '_' || toks[i+2] || '_' || toks[i+3] || '_' ||
         |           toks[i+4] || '_' || toks[i+5]),
         |    s -> ${polyHashSql("s")})) AS h
         |  FROM d WHERE len(toks) >= 5),
         |e AS (SELECT DISTINCT h FROM p WHERE doc_id < 20),
         |c AS (SELECT DISTINCT doc_id FROM p
         |      WHERE doc_id >= 20 AND h IN (SELECT h FROM e))
         |SELECT d.doc_id, (CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END) AS contaminated
         |FROM d LEFT JOIN c ON d.doc_id = c.doc_id
         |WHERE d.doc_id >= 20""".stripMargin,
    "q155_canary_decontaminate" ->
      """WITH c AS (
        |  SELECT DISTINCT substring(text, 11, 40) AS phrase FROM documents
        |  WHERE doc_id < 20 AND length(substring(text, 11, 40)) = 40),
        |f AS (
        |  SELECT DISTINCT d.doc_id FROM documents d, c
        |  WHERE d.doc_id >= 20 AND contains(d.text, c.phrase))
        |SELECT d.doc_id,
        |  (CASE WHEN f.doc_id IS NULL THEN 0 ELSE 1 END) AS contaminated
        |FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id
        |WHERE d.doc_id >= 20""".stripMargin,
    // the gated gram route must produce q155's exact verdicts — the oracle
    // IS q155's (recall-1.0 prefilter + exact verify == plain contains)
    "q159_canary_gated" ->
      """WITH c AS (
        |  SELECT DISTINCT substring(text, 11, 40) AS phrase FROM documents
        |  WHERE doc_id < 20 AND length(substring(text, 11, 40)) = 40),
        |f AS (
        |  SELECT DISTINCT d.doc_id FROM documents d, c
        |  WHERE d.doc_id >= 20 AND contains(d.text, c.phrase))
        |SELECT d.doc_id,
        |  (CASE WHEN f.doc_id IS NULL THEN 0 ELSE 1 END) AS contaminated
        |FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id
        |WHERE d.doc_id >= 20""".stripMargin,
    "q97_gopher_rules" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    len(toks)::BIGINT AS n_tok,
        |    list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks) AS mean_raw,
        |    len(list_filter(toks, t -> t IN ('a', 'the'))) AS n_stop,
        |    len(list_distinct(toks))::DOUBLE / len(toks) AS uniq_ratio
        |  FROM d)
        |SELECT doc_id, n_tok, round(mean_raw, 6) AS mean_len,
        |  (n_tok BETWEEN 10 AND 500)::INT AS r_count,
        |  (mean_raw >= 2.0 AND mean_raw <= 8.0)::INT AS r_mean_len,
        |  (n_stop >= 1)::INT AS r_stop,
        |  (uniq_ratio >= 0.3)::INT AS r_uniq,
        |  (n_tok BETWEEN 10 AND 500 AND mean_raw >= 2.0 AND mean_raw <= 8.0
        |   AND n_stop >= 1 AND uniq_ratio >= 0.3)::INT AS pass
        |FROM m""".stripMargin,
    "q98_token_entropy" ->
      """WITH d AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM d GROUP BY 1, 2)
        |SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
        |  round(log2(sum(c)::DOUBLE)
        |    - sum(c::DOUBLE * log2(c::DOUBLE)) / sum(c)::DOUBLE, 6) AS entropy
        |FROM c GROUP BY 1""".stripMargin,
    "q99_temperature_mix" ->
      """WITH per AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT
        |      AS n_tokens
        |  FROM documents GROUP BY 1),
        |t AS (
        |  SELECT source, n_tokens,
        |    n_tokens::DOUBLE / sum(n_tokens) OVER () AS p,
        |    pow(n_tokens::DOUBLE / sum(n_tokens) OVER (), 0.5) AS q_raw
        |  FROM per),
        |n AS (
        |  SELECT source, n_tokens, p, round(q_raw / sum(q_raw) OVER (), 6) AS q
        |  FROM t)
        |SELECT source, n_tokens, round(p, 6) AS p, q,
        |  floor(100000 * q + 0.5)::BIGINT AS alloc
        |FROM n""".stripMargin,
    "q100_winnow" ->
      s"""WITH d AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |h AS (
         |  SELECT doc_id, list_transform(
         |    list_transform(range(len(toks) - 2),
         |      i -> toks[i+1] || '_' || toks[i+2] || '_' || toks[i+3]),
         |    s -> ${polyHashSql("s")}) AS hs
         |  FROM d WHERE len(toks) >= 3),
         |wnd AS (
         |  SELECT DISTINCT doc_id,
         |    (i + list_position(list_slice(hs, i + 1, i + 4),
         |       list_min(list_slice(hs, i + 1, i + 4))) - 1)::BIGINT AS pos,
         |    list_min(list_slice(hs, i + 1, i + 4)) AS h
         |  FROM h, unnest(range(len(hs) - 3)) AS t(i)
         |  WHERE len(hs) >= 4)
         |SELECT doc_id, pos, h FROM wnd""".stripMargin,
    "q146_bpe_encode" ->
      s"""WITH w0 AS (
         |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
         |  FROM documents),
         |v0 AS MATERIALIZED (
         |  SELECT word, count(*)::BIGINT AS freq,
         |    list_transform(range(1, len(word) + 1), i -> word[i]) AS syms
         |  FROM w0 GROUP BY 1),
         |${(1 to BPE_ROUNDS).map(bpeRoundSql).mkString(",\n")}
         |SELECT tok, sum(freq)::BIGINT AS cnt
         |FROM (SELECT freq, unnest(syms) AS tok FROM v$BPE_ROUNDS)
         |GROUP BY 1 ORDER BY cnt DESC, tok ASC LIMIT $BPE_TOPK""".stripMargin,
    "q104_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        |  FROM documents),
        |v AS (SELECT word, count(*) AS freq FROM w GROUP BY 1),
        |p AS (
        |  SELECT freq, unnest(list_transform(range(1, len(word)),
        |    i -> word[i] || '+' || word[i+1])) AS pair
        |  FROM v WHERE len(word) >= 2)
        |SELECT pair, sum(freq)::BIGINT AS cnt FROM p GROUP BY 1
        |ORDER BY cnt DESC, pair ASC LIMIT 20""".stripMargin,
    "q105_source_overlap" ->
      s"""WITH d AS (
         |  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |p AS (
         |  SELECT DISTINCT source, unnest(list_transform(
         |    list_transform(range(len(toks) - 4),
         |      i -> toks[i+1] || '_' || toks[i+2] || '_' || toks[i+3] || '_' ||
         |           toks[i+4] || '_' || toks[i+5]),
         |    s -> ${polyHashSql("s")})) AS h
         |  FROM d WHERE len(toks) >= 5)
         |SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
         |FROM p a JOIN p b ON a.h = b.h AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,
    "q106_winnow_pairs" ->
      s"""WITH d AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |hh AS (
         |  SELECT doc_id, list_transform(
         |    list_transform(range(len(toks) - 2),
         |      i -> toks[i+1] || '_' || toks[i+2] || '_' || toks[i+3]),
         |    s -> ${polyHashSql("s")}) AS hs
         |  FROM d WHERE len(toks) >= 3),
         |dh AS (
         |  SELECT DISTINCT doc_id, list_min(list_slice(hs, i + 1, i + 4)) AS h
         |  FROM hh, unnest(range(len(hs) - 3)) AS t(i)
         |  WHERE len(hs) >= 4),
         |g AS (SELECT h, count(*) AS df FROM dh GROUP BY 1),
         |k AS (SELECT dh.doc_id, dh.h FROM dh JOIN g USING (h)
         |      WHERE g.df BETWEEN 2 AND 20),
         |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2
         |      FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id)
         |SELECT d1, d2, count(*) AS shared FROM p GROUP BY 1, 2
         |ORDER BY shared DESC, d1 ASC, d2 ASC LIMIT 50""".stripMargin,
    "q107_block_pack" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tok,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(string_split('s42|' || doc_id::VARCHAR, ''),
        |        c -> ascii(c)::BIGINT)),
        |      (h, a) -> (h * 31 + a) % 1000000007) AS h
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, h % 8 AS shard, n_tok,
        |    coalesce(sum(n_tok + 1) OVER (
        |      PARTITION BY h % 8 ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
        |  FROM d)
        |SELECT doc_id, shard, n_tok, off,
        |  off // 256 AS blk_first, (off + n_tok) // 256 AS blk_last
        |FROM o""".stripMargin,
    "q108_zipf" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        |  FROM documents),
        |v AS (SELECT word, count(*) AS freq FROM w GROUP BY 1),
        |sp AS (SELECT freq, count(*) AS n_types FROM v GROUP BY 1)
        |SELECT count(*) AS n_points,
        |  round(regr_slope(log2(n_types), log2(freq)), 6) AS slope,
        |  round(regr_intercept(log2(n_types), log2(freq)), 6) AS intercept
        |FROM sp""".stripMargin,
    "q109_curated_pack" ->
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |keep0 AS (
         |  SELECT doc_id FROM d
         |  WHERE doc_id >= 20
         |    AND len(toks) BETWEEN 10 AND 500
         |    AND list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks)
         |          BETWEEN 2.0 AND 8.0
         |    AND len(list_filter(toks, t -> t IN ('a', 'the'))) >= 1
         |    AND len(list_distinct(toks))::DOUBLE / len(toks) >= 0.3),
         |p AS (
         |  SELECT doc_id, unnest(list_transform(
         |    list_transform(range(len(toks) - 4),
         |      i -> toks[i+1] || '_' || toks[i+2] || '_' || toks[i+3] || '_' ||
         |           toks[i+4] || '_' || toks[i+5]),
         |    s -> ${polyHashSql("s")})) AS h
         |  FROM d WHERE len(toks) >= 5),
         |e AS (SELECT DISTINCT h FROM p WHERE doc_id < 20),
         |c AS (SELECT DISTINCT p.doc_id FROM p JOIN keep0 USING (doc_id)
         |      WHERE h IN (SELECT h FROM e)),
         |keep1 AS (SELECT doc_id FROM keep0
         |          WHERE doc_id NOT IN (SELECT doc_id FROM c)),
         |fp AS (
         |  SELECT d.doc_id, ${polyHashSql("trim(lower(text))")} AS fp
         |  FROM d JOIN keep1 USING (doc_id)),
         |keep2 AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
         |h2 AS (
         |  SELECT d.doc_id, len(toks)::BIGINT AS n_tok,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform(string_split('s42|' || d.doc_id::VARCHAR, ''),
         |        c -> ascii(c)::BIGINT)),
         |      (h, a) -> (h * 31 + a) % 1000000007) AS h
         |  FROM d JOIN keep2 USING (doc_id)),
         |o AS (
         |  SELECT doc_id, h % 8 AS shard, n_tok,
         |    coalesce(sum(n_tok + 1) OVER (
         |      PARTITION BY h % 8 ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
         |  FROM h2)
         |SELECT doc_id, shard, n_tok, off,
         |  off // 256 AS blk_first, (off + n_tok) // 256 AS blk_last
         |FROM o""".stripMargin)
}
