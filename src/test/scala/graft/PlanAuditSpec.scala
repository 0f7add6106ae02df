package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-count regression net: each audited query's physical plan must
  * not grow extra shuffle exchanges. A plan that passes correctness but
  * gains an exchange is exactly the regression that stays invisible at
  * sf0.01 and dominates at 100 TB, so the budget is pinned here.
  *
  * Counts are `Exchange hashpartitioning`/`rangepartitioning` occurrences
  * in the pre-execution plan (AQE may later coalesce partitions but does
  * not remove a shuffle boundary); BroadcastExchange is deliberately NOT
  * counted — broadcasting dims is the design.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, TestSession.sf)
      .queryExecution.executedPlan.toString

  private def shuffles(q: String): Int =
    "Exchange (hash|range)partitioning".r.findAllIn(plan(q)).size

  // (query, max shuffle exchanges allowed)
  private val budget = Seq(
    "q1_agg" -> 1,                 // groupBy
    "q2_window_tumble" -> 1,       // window groupBy
    "q7_filter_project" -> 0,      // pure scan+project
    "q12_join_chain" -> 1,         // broadcast hops + one final agg
    "q26_dedup_exact" -> 1,        // fingerprint groupBy
    "q33_lsh_ann" -> 1,            // bucket join broadcasts at this SF; top-k sort is TakeOrdered
    "q57_order_uu_window" -> 2,    // user window + agg
    "q58_payment_uu" -> 2,
    "q59_home_detail_uv" -> 2,
    "q60_register_window" -> 2,
    "q62_bpe_tokens" -> 1,
    "q63_multimodal_resize" -> 0,
    "q65_dedup_exact_wide" -> 1,  // md5 fingerprint groupBy — same shape as q26
    "q67_repetition" -> 0,        // per-row HOFs only
    "q140_banded_range" -> 2,     // at most the two __band exchanges (broadcasts at small SF); the no-cartesian pin is in RelationalSpec
    "q68_tfidf" -> 2,             // tf agg, then df as a count window on the term
    "q69_contamination" -> 1,     // broadcast eval probe; one exchange for the pair count
    "q70_stratified_sample" -> 1, // per-row hash keep-rule, one source groupBy
    "q71_pack_sequences" -> 1,    // one window over (source, doc_id)
    "q72_shuffle_shard" -> 1,     // repartition-by-shard + in-partition sort
    "q73_unigram_ll" -> 2,        // vocab agg (broadcast LM); per-doc re-agg
    "q74_token_budget_mix" -> 1,  // window on source; groupBy reuses the partitioning
    "q75_dup_spans" -> 2,         // one window per key set: (h) dup-mark, (doc) runs
    "q76_pii_redact" -> 0,        // per-row regex projection only
    "q78_chunk_overlap" -> 0,     // sequence+posexplode fan-out, scan-stage only
    "q79_domain_cap" -> 1,        // one window on source (WindowGroupLimit)
    "q80_bloom_prune" -> 1,       // bloom pre-filter + broadcast join; one agg exchange
    "q81_zvalue" -> 0,            // pure bit-arithmetic projection
    "q82_equidepth" -> 1,         // window on event_type; the (type,tile) agg reuses it
    "q83_frequent_ngrams" -> 1,   // gram agg; top-k is TakeOrdered, no sort exchange
    "q84_incremental_dedup" -> 2, // (fp,id) agg + index anti-join; admitted ids broadcast back
    "q28_lsh_neardup" -> 1,       // band self-join broadcasts at this SF; pair distinct is the exchange
    "q85_lsh_salted" -> 5,        // + bucket-count agg, cold/hot pair joins, pair distinct — keys only in every one
    "q86_incremental_neardup" -> 3, // new-side band agg + (nid,xid) distinct + survivor anti-join
    "q87_semantic_dedup" -> 2,    // dropped-id distinct + anti-join; the centroid pair join broadcasts at this SF (shuffles on the centroid key at scale)
    "q88_span_removal" -> 2,      // q75's h-window + starts groupBy(doc); the text join-back broadcasts at this SF (doc-key shuffle at scale)
    "q89_incremental_semdedup" -> 2, // dropped-id distinct + anti-join; the centroid probe join broadcasts at this SF
    "q90_quality_classifier" -> 0, // one codegen'd fold per row, shuffle-free
    "q91_dsir_select" -> 2,       // bucket-count agg + per-doc sum; the O(CLS_DIM) ratio table broadcasts back
    "q92_prototypes" -> 1,        // centroid-key window; model + centroid frame broadcast
    "q93_cdc_chunks" -> 2,        // chunker is scan-local HOFs (text never shuffles); fp-window dup mark + doc rollup, longs only
    "q95_incremental_bloomed" -> 2, // q84's budget holds: (fp,id) agg + anti-join; the bloom adds scan-local filters only
    "q96_ngram_decontaminate" -> 2, // eval-hash distinct + contaminated-doc distinct; both joins broadcast at this SF (hash-equi-join on long keys at scale)
    "q97_gopher_rules" -> 0,      // per-row HOF rule arithmetic only
    "q98_token_entropy" -> 2,     // (doc,tok) count + per-doc entropy agg — doc_id in both keys, map-side partials
    "q99_temperature_mix" -> 1,   // source agg; the normalization windows run on the one-row-per-source table (SinglePartition by design)
    "q100_winnow" -> 0,           // native winnow_fps + explode, scan-stage only
    "q101_countmin" -> 2,         // cells agg (≤ d·w rows map-side) + exact-top agg; probe side is a 20-row TakeOrdered, grid broadcasts
    "q102_kmv_sample" -> 0,       // TakeOrdered bottom-k; estimator window runs on the 100-row result
    "q103_postings" -> 2,         // df agg + postings window; rnk<=10 is a Partial+Final WindowGroupLimit (shape-pinned below)
    "q104_bpe_pairs" -> 2,        // corpus→vocab word agg + pair agg — both narrow keys; top-20 is TakeOrdered
    "q105_source_overlap" -> 2,   // h → source-set agg (partial collect_set dedups map-side) + pair agg — no self-join, no double scan
    "q106_winnow_pairs" -> 2,     // h → doc-set agg (partial collect_set dedups, df cap filters) + pair agg; top-50 is TakeOrdered
    "q107_block_pack" -> 1,       // the shard window is the only exchange; offsets/blocks are scan-local arithmetic after it
    "q108_zipf" -> 2,             // word agg + spectrum agg; the regression runs in the final global agg (SinglePartition over ~hundreds of spectrum rows)
    "q109_curated_pack" -> 6,     // the composed build: eval-h distinct + contaminated-doc distinct + fp agg + shard window, plus the survivor-id semi-join's SMJ pair at this SF (AQE broadcasts the id set when it measures small; all keys narrow either way)
    "q110_bm25" -> 3,             // query-term tf agg + df count-window on tok + per-doc score agg — only query-term postings shuffle; N/avgdl is SinglePartition; top-N is TakeOrdered (shape-pinned below)
    "q111_retention" -> 3,        // distinct (user,day) + cohort min-window on user + (cohort,offset) agg; count(*) IS the distinct-user count (rows unique per (user,offset)) so no count-distinct expand
    "q112_psi_drift" -> 6,        // one CORPUS exchange — (source,bin) counts — printed 2× for the ref/cur branches plus grid distincts; identical subplans collapse via runtime exchange reuse, and everything after the counts is O(sources×bins) broadcast work
    "q113_pq_adc" -> 1,           // codes assign is scan-local (model is a plan literal); ADC join broadcasts the query set; the only exchange is the per-query top-k, pre-cut map-side by WindowGroupLimit
    "q114_pagerank" -> 10,        // 5 supersteps × (contribution agg + rank SMJ side) over the checkpointed edge/node bases; ed's shuffle collapses to ONE write via ReuseExchange at runtime (the printed count is static) — measured 144 s vs 202 s for checkpoint-per-superstep at the 100× graph
    "q115_ppr" -> 10,             // same superstep shape as q114
    "q116_hybrid_rrf" -> 3,       // the BM25 arm's budget; the cosine arm is a broadcast-1-query scan and the fusion join runs on 2×20 rows (broadcast)
    "q117_bigram_ll" -> 6,        // bigram agg + ctx agg + unigram agg + per-doc re-agg (+ the bc subtree printed again under btot — collapsed by runtime exchange reuse)
    "q118_scd2" -> 1,             // ONE (user × ord) exchange serves both windows and the change filter between them
    "q119_weighted_sample" -> 1,  // the per-source rank window; the A-ES key is scan-local
    "q125_ppjoin" -> 7,           // element-df agg + per-doc sort agg + the hinted shuffle_hash candidate self-join pair (reused at runtime) + (d1,d2) positional agg + the two verify joins — every one carries keys/positions or candidate rows, never full sets except the final verify attach
    "q126_merge_upsert" -> 1,     // the post-merge aggregate; the merge itself is write-bound (partition-pruned rewrite, pinned in MergeSpec). q127 is absent by design: its BFS rounds are driver-synchronous localCheckpoints, so the final plan is a lineage-truncated scan (0 exchanges) and a static count would pin nothing
    "q128_ppjoin_incremental" -> 4, // union-df agg + the two per-side sort aggs share partitioning; cross-side candidate join + positional agg + verify joins broadcast the small shard side at this SF (tok/key exchanges at scale)
    "q131_attribution" -> 3,      // one (user) exchange serves both window passes; purchases⋈touches rides it (user in the key) + the touch_type rollup; the join-back is purchase-row sized
    "q132_trend" -> 1,            // ONE per-type aggregate — all five regression sums ride a single exchange with map-side partials
    "q133_volume_anomaly" -> 2,   // (type, day) daily agg + the type-keyed trailing window; z arithmetic is scan-local after it
    "q134_edjoin" -> 11,          // q125's family shape + the occurrence-numbering window + the short-route broadcast pair + candidate distinct — every exchange carries gram keys, ids, or candidate rows
    "q135_overlap_join" -> 7,     // q125's exact shape with the absolute-count bound — element-df agg + ordered-prefix agg + hinted self-join pair + positional agg + verify joins
    "q146_bpe_encode" -> 1,       // training rounds are driver-synchronous localCheckpoints (lineage-truncated, the q126/q127 note); the FINAL plan is one (tok) agg over the checkpointed vocab + TakeOrdered
    "q147_banded_neardup" -> 1,   // the banded bucket self-join broadcasts at this SF (bucket-key shuffle pair at scale, the q28 convention); the one exchange is the (d1,d2) pair dedup, which carries only above-threshold pairs — the narrow-candidate alternative OOM'd at 100× (see lshNearDupPairsBanded's measured-decision note)
    "q148_pq_rerank" -> 1,        // q113's budget holds: the ADC candidate cut is WindowGroupLimit'd map-side, the rerank joins broadcast the query set and candidate rows, and the one exchange is the final per-query rank
    "q149_ivf_pq" -> 2,           // probe rank over queries×k rows + the final per-query ADC rank; the coarse/codebook models are plan literals and the probes broadcast to the posting-list join
    "q154_sampled_quantiles" -> 1, // ONE (source) exchange serves the sample window, the value-rank window, and the size count (same partitioning); the WindowGroupLimit cut caps it at k rows per group per map task, and the quantile list joins as a broadcast literal
    "q156_weighted_quantiles" -> 2, // q154's (source) exchange + the final per-(source, q) argmin aggregate over ≤ k·|qs| rows per group; the A-ES key is scan-local and the quantile list is a broadcast literal
    "q155_canary_decontaminate" -> 2, // the canary match itself is a BNLJ left-semi (zero exchange — text never shuffles); the two exchanges carry narrow doc_id longs: the contaminated-id distinct and the verdict join-back
    "q159_canary_gated" -> 3,     // q155's two narrow-long exchanges (canary distinct, contaminated-id distinct) + the verdict join-back, which q155's BNLJ-route stats broadcast but the gram route's unknown-size stats plan as an id-keyed SMJ — still doc_id longs only; gram emission is a scan-local explode and the prefix-hash join + exact verify are broadcast + filter (text never shuffles)
    "q160_persisted_ann" -> 3)    // q149's two query_id exchanges (probe rank + final ADC rank) + the shared probe subtree printed once more over the parquet-scan corpus (runtime exchange reuse collapses it — the q114 CountShuffles note); the loaded models are plan literals and the coded scan reads (id, codes, centroid) only

  budget.foreach { case (q, max) =>
    test(s"$q stays within $max shuffle exchange(s)") {
      val n = shuffles(q)
      assert(n <= max, s"$q now plans $n shuffle exchanges (budget $max) — " +
        "a new shuffle boundary appeared; check join strategy / window keys")
    }
  }

  // Plan-SHAPE pins: operators whose scale story depends on a specific
  // physical operator, not just the exchange count.
  test("q79 / q16 / q92 rank-filters compile to WindowGroupLimit (map-side per-group top-k)") {
    Seq("q79_domain_cap", "q16_topk", "q92_prototypes", "q103_postings").foreach { q =>
      assert(plan(q).contains("WindowGroupLimit"),
        s"$q must push a per-partition group limit below the shuffle — " +
          "without it the window shuffles the whole group contents")
    }
  }

  test("q110's top-N compiles to TakeOrdered; q113's per-query cut to WindowGroupLimit") {
    assert(plan("q110_bm25").contains("TakeOrderedAndProject"),
      "q110 must TakeOrdered the corpus-wide ranking — a global row_number " +
        "window would single-partition-sort every scored doc")
    assert(plan("q113_pq_adc").contains("WindowGroupLimit"),
      "q113 must pre-cut per-query candidates map-side before the rank shuffle")
  }

  /** The physical plan as a tree, descending into AQE wrappers (the
    * adaptive root is a leaf node, so a plain `collect` would stop at it).
    */
  private def tree(q: String): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case other => other +: other.children.flatMap(expand)
    }
    expand(SparkEntry.queries(q)(spark, TestSession.sf)
      .queryExecution.executedPlan)
  }

  test("global (unpartitioned) windows run on collapsed row sets, never the corpus") {
    // q110's rank window input must be the TakeOrdered top-N; q99's
    // normalization windows' input must be the one-row-per-source
    // aggregate. Without this pin, a future edit that reorders the limit/
    // aggregate under the window would silently single-partition-sort the
    // whole corpus — invisible in the WindowExec warnings every run prints.
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    for (q <- Seq("q110_bm25", "q99_temperature_mix")) {
      val globals = tree(q).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globals.nonEmpty, s"$q: expected a global window in the plan")
      globals.foreach { w =>
        val collapsed = w.collect {
          case t: TakeOrderedAndProjectExec => t: Any
          case a: BaseAggregateExec if a.groupingExpressions.nonEmpty => a: Any
        }
        assert(collapsed.nonEmpty,
          s"$q: a SinglePartition window's input is no longer a TakeOrdered/" +
            "grouped-aggregate row set — the corpus would flow into one partition")
      }
    }
  }

  test("q95's bloom probe is scan-local (xxhash64 filter in the plan, not a join)") {
    assert(plan("q95_incremental_bloomed").contains("xxhash64"),
      "the novelty fast path must probe the bitset in the scan stage — " +
        "without it every shard fp pays the index anti-join")
  }

  test("q100's fingerprint selection is the native one-pass expression, in the scan stage") {
    val p = plan("q100_winnow")
    assert(p.contains("winnow_fps"),
      "q100 must plan the O(tokens) monotonic-deque expression — the HOF " +
        "window re-scan form measured 7× slower at sf0.1")
    assert(!p.contains("Exchange hash"), "winnowing is per-row; no shuffle belongs here")
  }

  test("q102's bottom-k compiles to TakeOrderedAndProject (map-side k, no global sort)") {
    assert(plan("q102_kmv_sample").contains("TakeOrderedAndProject"),
      "the KMV sample must ship k rows per partition to the driver, " +
        "never a full sort exchange")
  }

  test("q73's LM broadcast is vocab-capped (TakeOrdered limit, no full-vocab broadcast)") {
    val p = plan("q73_unigram_ll")
    // the vocab side must be a top-V truncation — a broadcast whose input is
    // the raw token aggregate grows ~Heaps'-law with the corpus and OOMs at
    // 100 TB; with the cap the broadcast is O(V) rows no matter the corpus
    assert(p.contains("TakeOrderedAndProject(limit=16"),
      "q73's LM vocabulary must be capped via TakeOrderedAndProject — " +
        "a broadcast of the uncapped unigram table dies at 100x corpus scale")
    // and the cap must not be a global Sort + Limit (that materializes a
    // full sort of the vocab aggregate before truncating)
    assert(!"Sort \\[tf".r.findFirstIn(p).isDefined || p.contains("TakeOrderedAndProject"),
      "vocab cap must plan as TakeOrdered, not a global sort")
  }

  test("q83 / q104 global top-k compiles to TakeOrdered, not a global sort") {
    Seq("q83_frequent_ngrams", "q104_bpe_pairs").foreach { q =>
      assert(plan(q).contains("TakeOrderedAndProject"),
        s"$q must plan TakeOrderedAndProject; a Sort + Limit materializes " +
          "a global sort of the full aggregate")
    }
  }

  test("q117's model caps plan as TakeOrdered limits (q73's contract for BOTH LM tables)") {
    val p = plan("q117_bigram_ll")
    assert(p.contains(s"TakeOrderedAndProject(limit=${TextQueries.BG_BIGRAM_CAP}"),
      "the bigram model must cap via TakeOrdered BEFORE contexts attach — " +
        "broadcasting the Heaps-law bigram or context table dies at 100x")
    assert(p.contains(s"TakeOrderedAndProject(limit=${TextQueries.BG_UNIGRAM_CAP}"),
      "the unigram interpolation table must be capped like q73's")
  }

  test("q119's per-source cut compiles to WindowGroupLimit (map-side k before the exchange)") {
    assert(plan("q119_weighted_sample").contains("WindowGroupLimit"),
      "the A-ES top-k must forward ≤k rows per source per task — without " +
        "the group limit the exchange carries the whole corpus")
  }
}
