package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Relational, Similarity}
import graft.sinks.Sinks

/** End-to-end training-corpus cleaning pipeline — the composition a 100 TB
  * pretraining-data job runs, built from the engine's oracle-verified ops:
  *
  *   1. quality filter   (per-row ratios, no shuffle)
  *   2. exact dedup      (one shuffle on a 128-bit MD5 fingerprint — the
  *                        production-width key; q26's 30-bit poly variant
  *                        exists for arithmetic-portable oracles)
  *   3. near-dedup       (MinHash+LSH: shuffle O(bands) longs per doc;
  *                        pair graph → connected components → keep one)
  *   4. semantic dedup   (optional: embedding-cosine near-dup pairs over
  *                        LSH buckets → same component rule — the
  *                        exact → fuzzy-text → semantic ladder)
  *   5. stats            (per-language keep/drop accounting)
  *
  * Order matters at scale: quality + exact dedup run FIRST because they
  * are the cheap mass-removers (and de-fang LSH's hot-bucket skew from
  * boilerplate duplicates); MinHash-LSH sees only survivors, and the
  * embedding stage — the most expensive per-candidate (dims-long dot
  * products) — sees only MinHash survivors.
  *
  * Returns (cleaned corpus, per-stage stats).
  */
object CorpusPipeline {

  /** `embedBands`: OR-amplification bands for the semantic stage
    * ([[graft.operators.Similarity.lshNearDupPairsBanded]]). The default
    * 1 is the single-band form (bit-identical, SimilaritySpec) whose
    * near-dup recall measured 0.18 at 4 planes — raise it to dial
    * recall at bands× candidate cost (4 bands measured 0.47; the
    * cluster-based SemDeDup path reaches 0.92+ where recall dominates).
    */
  final case class Config(
      minQuality: Double = 0.35,
      shingleN: Int = 3,
      minhashK: Int = 16,
      lshBands: Int = 4,
      jaccardThreshold: Double = 0.5,
      embedPlanes: Int = 4,
      embedDims: Int = 64,
      embedCosThreshold: Double = 0.35,
      embedBands: Int = 1)

  /** `embeddings`: optional (vec_id, embedding array<float>) table keyed by
    * doc_id — when given, the semantic stage runs after text near-dedup.
    */
  def apply(docs: DataFrame, cfg: Config = Config(),
            embeddings: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val scored = docs.withColumn("quality", qualityScore(col("text")))
    val qualityPass = scored.filter(col("quality") >= cfg.minQuality)

    val exactKept = Dedup.exactDedup(qualityPass, "doc_id", "text", wide = true)
    val afterExact = qualityPass.join(exactKept, "doc_id")

    val nearPairs = Dedup.nearDupPairs(afterExact, "doc_id", "text",
      cfg.shingleN, cfg.minhashK, cfg.lshBands, cfg.jaccardThreshold)
    // resolve pair graph to components; keep one doc per duplicate cluster
    // (per-pair d2-dropping can orphan transitive members)
    val afterNear = afterExact.join(dropSet(nearPairs), Seq("doc_id"), "left_anti")

    // semantic stage: same bucket-join + component shape, edges from
    // embedding cosine — restricting the corpus first commutes with LSH
    // bucketing (the bucket is a function of the vector alone)
    val cleaned = embeddings match {
      case Some(emb) =>
        val survivorVecs = afterNear.select(col("doc_id"))
          .join(emb.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        val semPairs = Similarity.lshNearDupPairsBanded(survivorVecs, "doc_id",
          "embedding", cfg.embedPlanes, cfg.embedBands, cfg.embedDims,
          cfg.embedCosThreshold)
        afterNear.join(dropSet(semPairs), Seq("doc_id"), "left_anti")
      case None => afterNear
    }

    val stats = docs.select(col("lang"), lit("input").as("stage"))
      .unionByName(qualityPass.select(col("lang"), lit("quality_pass").as("stage")))
      .unionByName(afterExact.select(col("lang"), lit("exact_deduped").as("stage")))
      .unionByName(afterNear.select(col("lang"), lit("near_deduped").as("stage")))
      .unionByName(cleaned.select(col("lang"), lit("cleaned").as("stage")))
      .groupBy(col("stage"), col("lang"))
      .agg(count(lit(1)).as("docs"))

    (cleaned, stats)
  }

  /** Non-representative members of each duplicate component (doc_id only).
    * Star contraction, not min-label propagation: rounds are
    * driver-synchronous barriers, and star contraction converges in
    * O(log n) of them vs O(diameter) — same labels (component min), see
    * [[Dedup.duplicateClustersStar]].
    */
  private def dropSet(pairs: DataFrame): DataFrame =
    Dedup.duplicateClustersStar(pairs)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"))

  /** Sliding-window chunking: split each doc's token stream into windows
    * of `w` tokens every `s` tokens (overlap = w − s). Pure per-row
    * fan-out (sequence + posexplode + slice) — zero shuffles, so at scale
    * it fuses into whatever scan precedes it. Emits (idCol, chunk_id,
    * chunk_start, chunk array); q78 is the oracle-checked projection.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            w: Int, s: Int): DataFrame = {
    require(w >= s && s >= 1, s"need w >= s >= 1, got w=$w s=$s")
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(s))))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("chunk_start"),
        slice(col("__toks"), col("col") + 1, lit(w)).as("chunk"))
  }

  /** Default chunk geometry, shared with q78 (ScaleQueries). */
  val DefaultChunkW = 64
  val DefaultChunkS = 48

  /** Packaging stage — the step between "cleaned corpus" and "training
    * shards": cap documents per source (best-quality first, q79's
    * WindowGroupLimit shape, so the shuffle carries O(cap·sources) rows),
    * then chunk the survivors into context windows with overlap. Input
    * must carry `quality` (as produced by [[apply]]); output is
    * chunk-level with provenance and a portable fingerprint for
    * chunk-level dedup downstream.
    */
  def packageStage(cleaned: DataFrame, capPerSource: Int = 10,
                   chunkW: Int = DefaultChunkW,
                   chunkS: Int = DefaultChunkS): DataFrame = {
    val capped = Relational.topKPerGroup(cleaned, Seq("source"),
      Seq(col("quality").desc, col("doc_id").asc), capPerSource)
    // chunk() projects to (idCol, tokens) immediately, so capped's other
    // columns (incl. topKPerGroup's rank) never reach the output
    chunk(capped, "doc_id", "text", chunkW, chunkS)
      .withColumn("chunk_fp", polyHash(array_join(col("chunk"), " ")))
      .withColumn("n_chunk_tokens", size(col("chunk")))
      .drop("chunk")
  }

  /** Streaming ingest front of the pipeline: the stages that work
    * incrementally run AS the corpus arrives — per-row quality scoring and
    * filtering, then exact dedup as watermark-bounded keyed state on the
    * wide (MD5) fingerprint. First-arrival-wins within the watermark
    * horizon, which is the correct streaming analogue of keep-min-id (the
    * id order of a batch is arrival order of a stream). The LSH/semantic
    * stages are candidate-pair GRAPH problems over the whole corpus —
    * those stay periodic batch jobs over the ingested output (the standard
    * lambda split for dedup at scale; `apply` above is that batch job).
    *
    * Input must carry (`textCol`, event-time `tsCol`); output adds
    * `quality` and `fp` and keeps one row per fingerprint. The batch
    * fallback keeps an ARBITRARY row per fingerprint (batch has no arrival
    * order) — batch jobs should use `apply`, whose exact-dedup stage keeps
    * the deterministic min-id row.
    */
  def streamingIngest(docs: DataFrame, tsCol: String, delay: String,
                      textCol: String = "text",
                      minQuality: Double = Config().minQuality,
                      evalHashes: Array[Long] = Array.empty): DataFrame = {
    val scored = decontaminate(docs, evalHashes, textCol)
      .withColumn("quality", qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
      .withColumn("fp", md5(trim(lower(col(textCol)))))
    if (scored.isStreaming)
      scored.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("fp")
    else scored.dropDuplicates("fp")
  }

  /** Eval-set n-gram decontamination as a STATELESS stream stage: drop any
    * doc sharing a 5-gram hash with `evalHashes`. The eval set rides along
    * as a literal array probed scan-locally (`arrays_overlap`) — q69's
    * broadcast premise (benchmarks are bounded: all of them together are
    * thousands of docs) applied where a stream can't run q96's
    * aggregate-join form (the contaminated-id `distinct` is stateful).
    * Batch callers with an UNBOUNDED eval side use q96's equi-join
    * instead; an empty eval set is the identity.
    */
  def decontaminate(docs: DataFrame, evalHashes: Array[Long],
                    textCol: String = "text", n: Int = 5): DataFrame =
    if (evalHashes.isEmpty) docs
    else docs.filter(!arrays_overlap(
      shingleHashes(col(textCol), n),
      lit(evalHashes)))

  /** Exact-substring canary decontamination as a STATELESS stage — q155's
    * pipeline form, the third decontamination granularity alongside
    * [[decontaminate]] (any shared n-gram) and
    * [[decontaminateByContainment]] (graded coverage): drop any doc
    * containing one of `canaries` VERBATIM, the memorization-probe form
    * where tokenization must not blur the match. The canary list is a
    * literal array probed scan-locally (`exists` + `contains`) — no join,
    * no state, so it composes into any batch or streaming stage and
    * streamed survivors equal the batch filter on any arrival order
    * (spec-pinned). An empty list is the identity — including on NULL
    * text: `contains` propagates NULL through `exists`, so the predicate
    * coalesces to "no canary found" and a NULL-text row survives both
    * routes identically (it can't contain a canary).
    */
  def decontaminateByCanary(docs: DataFrame, canaries: Array[String],
                            textCol: String = "text"): DataFrame =
    if (canaries.isEmpty) docs
    else docs.filter(!coalesce(
      exists(lit(canaries), p => col(textCol).contains(p)), lit(false)))

  /** Containment-threshold decontamination — the graded form of
    * [[decontaminate]]: drop a training doc only when it COVERS at least
    * tNum/tDen of some eval doc's shingle set
    * ([[graft.operators.SetSim.containmentJoin]] with the eval docs as
    * the probe side), instead of on ANY single shared shingle. The
    * any-overlap form is the conservative recall-first pass (one
    * broadcast literal, scan-local); this one tolerates incidental
    * shared phrases and fires only on substantive coverage — the audit
    * setting where the any-overlap form deletes too much. Plan shape:
    * the eval side ships rare-shingle prefixes, the corpus side pays one
    * inverted-index emission (q137's geometry — measured SUB-linear
    * across two decades because eval sets don't grow with the corpus).
    */
  def decontaminateByContainment(docs: DataFrame, evalDocs: DataFrame,
                                 idCol: String, textCol: String,
                                 tNum: Int, tDen: Int,
                                 n: Int = 5): DataFrame = {
    val shingled = (df: DataFrame) => df.select(col(idCol),
      array_distinct(shingleHashes(col(textCol), n)).as("hs"))
    val contaminated = graft.operators.SetSim.containmentJoin(
        shingled(evalDocs), shingled(docs), idCol, "hs", tNum, tDen)
      .select(col("d2").as(idCol)).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Streaming incremental NEAR dedup — the continuous-ingest completion of
    * the dedup lambda ([[streamingIngest]] covers the exact path; this is
    * the fuzzy one). Each micro-batch:
    *
    *   1. resolves the batch's OWN near-dup graph (pairs → components →
    *      keep min-id, the same rule as the batch recap);
    *   2. drops survivors that near-dup any PREVIOUSLY-SEEN doc, probing
    *      the persisted signature index ([[Dedup.incrementalNearDup]] —
    *      band keys only in the shuffle);
    *   3. appends the signatures of ALL batch docs — admitted or dropped —
    *      to the index, so a chain whose middle was dropped still blocks
    *      its tail (A≈B dropped, C≈B arriving later is still caught);
    *   4. appends admitted rows to `outDir`.
    *
    * Keep rule: a doc survives iff it has no near-dup edge to an
    * earlier-seen doc — first-arrival-wins, the streaming analogue of the
    * recap's per-component min-id (identical whenever components grow
    * minimum-first: cliques, chains arriving in id order — the normal
    * boilerplate shape; a later doc BRIDGING two earlier non-neighbors is
    * the one divergence, which only the periodic batch recap (`apply`)
    * resolves — the standard lambda split).
    *
    * Replay safety (foreachBatch is at-least-once): the index probe
    * anti-joins the CURRENT batch's ids out of the index first, so a
    * replayed batch never collides with its own failed-attempt append —
    * the id list is O(one micro-batch) and broadcasts. Duplicate index
    * rows from a replayed append only duplicate candidates (collapsed by
    * the pair `distinct`); duplicate `outDir` rows follow the engine's
    * at-least-once + keyed last-write-wins convention (Sinks).
    *
    * Index size is O(docs seen), fingerprint-width rows (id + k longs +
    * hashes) — the price of fuzzy matching against history; prune or
    * re-shard it at the periodic recap.
    *
    * `evalContainment`: optional (evalDocs, tNum, tDen) — when set, each
    * micro-batch FIRST drops docs covering ≥ tNum/tDen of some eval
    * doc's shingle set ([[decontaminateByContainment]]), the streaming
    * lift of the batch containment stage. Containment is a pure
    * per-(eval, doc) predicate — no cross-batch state — so streamed
    * survivors equal the batch containment pass regardless of arrival
    * order (spec-pinned). Per-trigger cost: the eval side re-ships its
    * rare-shingle prefixes and the batch side one micro-batch-sized
    * inverted-index emission (q137's geometry at micro-batch scale);
    * cache the eval frame — it is re-read every trigger.
    */
  /** `splitLabels = Some((labelsDir, buckets, splitThreshold))` adds the
    * leakage-free split assignment to the ingest path: each batch's
    * ADMITTED docs run
    * [[graft.operators.Dedup.incrementalClusterSplit]] against the index
    * snapshot and the persisted labels table, and their (id, cluster,
    * split, bridged) rows append to `labelsDir` — so the next batch
    * adopts from them too, and [[graft.apps.SplitRecapApp]]'s periodic
    * rewrite of the same table resolves the bridges (the lambda loop,
    * now closed end-to-end: ingest adopts → recap rewrites → ingest
    * adopts from the rewrite).
    *
    * `splitThreshold` is deliberately SEPARATE from (and normally lower
    * than) the dedup threshold: the dedup gate drops docs at
    * `cfg.jaccardThreshold`-close to the corpus, so every admitted doc
    * is by construction NOT a near-dup at that radius — the split's
    * leakage radius ("related docs must not straddle train/val/test")
    * is the wider one, and only a lower threshold makes the adoption
    * non-vacuous.
    */
  def streamingNearDedup(docs: DataFrame, indexDir: String, outDir: String,
                         checkpoint: String, idCol: String = "doc_id",
                         textCol: String = "text", cfg: Config = Config(),
                         trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
                         evalContainment: Option[(DataFrame, Int, Int)] = None,
                         splitLabels: Option[(String, Int, Double)] = None)
      : StreamingQuery =
    Sinks.foreachBatchSink(docs, checkpoint, trigger, outputMode = "append") {
      (batch, _) =>
        val spark = batch.sparkSession
        val decon = evalContainment match {
          case Some((evalDocs, tNum, tDen)) =>
            decontaminateByContainment(batch, evalDocs, idCol, textCol, tNum, tDen)
          case None => batch
        }
        val b = decon.persist()
        try {
          val inPairs = Dedup.nearDupPairs(b, idCol, textCol, cfg.shingleN,
            cfg.minhashK, cfg.lshBands, cfg.jaccardThreshold)
          val inKept = b.join(
            dropSet(inPairs).withColumnRenamed("doc_id", idCol),
            Seq(idCol), "left_anti")
          val index = readSigIndex(spark, indexDir, b, idCol, textCol, cfg)
            .join(broadcast(b.select(col(idCol))), Seq(idCol), "left_anti")
          val admitted = Dedup.incrementalNearDup(inKept, index, idCol,
            textCol, cfg.shingleN, cfg.minhashK, cfg.lshBands,
            cfg.jaccardThreshold).persist()
          try {
            // admitted FIRST: it reads the index snapshot, which must not
            // see this batch's own signature append
            admitted.write.mode("append").parquet(outDir)
            splitLabels.foreach { case (labelsDir, buckets, splitThreshold) =>
              // readLabels' keyed dedup: a replayed batch's re-appended
              // rows must not double the adoption candidates
              val labels = readLabels(spark, labelsDir, idCol)
                .select(col(idCol), col("cluster"))
              // band geometry follows the SPLIT threshold (lshBandsFor's
              // S-curve rule): recall at the wider relatedness radius
              // needs more bands than the dedup stage's candidates
              Dedup.incrementalClusterSplit(admitted, index, labels,
                  idCol, textCol, cfg.shingleN, cfg.minhashK,
                  Dedup.lshBandsFor(cfg.minhashK, splitThreshold),
                  splitThreshold, buckets)
                .write.mode("append").parquet(labelsDir)
            }
            Dedup.minhashSignatures(b, idCol, textCol, cfg.shingleN, cfg.minhashK)
              .write.mode("append").parquet(indexDir)
          } finally { admitted.unpersist(); () }
        } finally { b.unpersist(); () }
    }

  /** Read a parquet dir, or `empty` when the path does not exist / has
    * no data files yet — matched by the stable error CONDITION
    * identifiers (`SparkThrowable.getCondition`), not message text,
    * which drifts across Spark versions.
    */
  private[graft] def readParquetOr(spark: SparkSession, dir: String)
                                  (empty: => DataFrame): DataFrame =
    try spark.read.parquet(dir)
    catch { case e: org.apache.spark.sql.AnalysisException
        if Option(e.getCondition).exists(c =>
          c == "PATH_NOT_FOUND" || c == "UNABLE_TO_INFER_SCHEMA") =>
      empty
    }

  /** The labels table as ONE row per doc. The ingest path's labels
    * append is foreachBatch parquet append, i.e. AT-LEAST-ONCE (the K1
    * sink convention): a replayed micro-batch re-appends its docs'
    * (id, cluster, split, bridged) rows — byte-identical, since the
    * adoption is deterministic against the immutable index snapshot the
    * batch read. This is the read-side key dedup every labels consumer
    * must apply (the adoption path's min-over-clusters tolerated the
    * duplicates by accident; a docs⋈labels join does not): collapse by
    * id, keeping the (cluster, split) pair together (min of the struct —
    * replay duplicates collapse to themselves) and the widest bridged
    * flag so no deferred merge is lost. Missing/empty dir → empty frame
    * of the labels schema.
    */
  def readLabels(spark: SparkSession, labelsDir: String,
                 idCol: String = "doc_id"): DataFrame =
    readParquetOr(spark, labelsDir) {
      spark.range(0).select(col("id").as(idCol),
        col("id").as("cluster"), col("id").as("split"),
        col("id").as("bridged"))
    }
      .groupBy(col(idCol))
      .agg(min(struct(col("cluster"), col("split"))).as("__cs"),
        max(col("bridged")).as("bridged"))
      .select(col(idCol), col("__cs.cluster").as("cluster"),
        col("__cs.split").as("split"), col("bridged"))

  /** The persisted signature index, or an empty frame of the right schema
    * before the first batch has written it (missing dir, or an existing
    * but still-empty one — parquet cannot infer a schema from either).
    */
  private def readSigIndex(spark: SparkSession, dir: String, batch: DataFrame,
                           idCol: String, textCol: String, cfg: Config): DataFrame =
    readParquetOr(spark, dir) {
      Dedup.minhashSignatures(batch.limit(0), idCol, textCol,
        cfg.shingleN, cfg.minhashK)
    }

  /** [[streamingNearDedup]] at recall 1.0: the EXACT prefix-filtered
    * Jaccard join ([[graft.operators.SetSim]]) replaces MinHash-LSH in
    * both legs — the batch's own pair graph and the probe against the
    * persisted shingle-SET index. Same keep rule (first-arrival-wins,
    * min-id within a batch), same replay safety (the probe anti-joins
    * the current batch's ids out of the index; duplicate index appends
    * only duplicate candidates), same index discipline (ALL batch docs'
    * sets append, admitted or not, so dropped-middle chains still block
    * their tails).
    *
    * The exactness price, paid per micro-batch: the join's global
    * element order is element frequency over index ∪ batch, so every
    * batch re-counts the index's element frequencies — one extra
    * index-sized aggregate per trigger (SetSim.jaccardJoinSets documents
    * the fixed-hash-order alternative that drops the recount at some
    * bucket-size cost). Use the LSH form when that aggregate dominates;
    * use this one where a miss is unacceptable.
    */
  def streamingExactNearDedup(docs: DataFrame, indexDir: String,
                              outDir: String, checkpoint: String,
                              idCol: String = "doc_id",
                              textCol: String = "text",
                              shingleN: Int = 3, tNum: Int = 3, tDen: Int = 5,
                              trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : StreamingQuery =
    Sinks.foreachBatchSink(docs, checkpoint, trigger, outputMode = "append") {
      (batch, _) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        try {
          val bSets = b.select(col(idCol),
            array_distinct(shingleHashes(col(textCol), shingleN)).as("hs"))
          val inPairs = graft.operators.SetSim
            .jaccardSelfJoinSets(bSets, idCol, "hs", tNum, tDen)
            .select(col("d1"), col("d2"))
          val inKept = b.join(
            dropSet(inPairs).withColumnRenamed("doc_id", idCol),
            Seq(idCol), "left_anti")
          val index = readParquetOr(spark, indexDir)(bSets.limit(0))
            .join(broadcast(b.select(col(idCol))), Seq(idCol), "left_anti")
          val matched = graft.operators.SetSim.jaccardJoinSets(
              bSets.join(inKept.select(col(idCol)), Seq(idCol), "left_semi"),
              index, idCol, "hs", tNum, tDen)
            .select(col("d1").as(idCol)).distinct()
          val admitted = inKept.join(matched, Seq(idCol), "left_anti")
          // admitted FIRST: it reads the index snapshot, which must not
          // see this batch's own set append
          admitted.write.mode("append").parquet(outDir)
          bSets.write.mode("append").parquet(indexDir)
        } finally { b.unpersist(); () }
    }
}
