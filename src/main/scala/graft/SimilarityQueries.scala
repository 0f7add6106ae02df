package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Similarity search over the 64-dim `embeddings` table: brute-force cosine
  * kNN (baseline), global most-similar pairs, and the LSH-bucketed ANN scale
  * path. Oracles fold dot products in identical index order (strict left
  * fold, double), so cosines match bit-for-bit.
  */
object SimilarityQueries {
  import Queries.Q

  private def t(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.Tpch(s, dir)

  val DIMS = 64
  val PLANES = 4

  val q31_knn: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    Similarity.knn(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  val q32_top_pairs: Q = (s, dir) =>
    Similarity.topPairs(t(s, dir).embeddings, "vec_id", "embedding", 100)

  val q33_lsh_ann: Q = (s, dir) =>
    Similarity.lshTopPairs(t(s, dir).embeddings, "vec_id", "embedding", PLANES, DIMS, 50)

  /** q33's top-k through the AUTO hot-bucket route
    * ([[Similarity.lshTopPairsAuto]]) with a deliberately tiny occupancy
    * ceiling, so the SALTED exactly-once cell plan is what the driver
    * gate hash-checks against q33's unchanged oracle — the
    * q150/q151/q152 convention. The top-k form is the one where a
    * duplicate pair row would CORRUPT the answer (displace a real pair
    * inside the limit), so the driver hash is the strongest check of the
    * once-only cell argument.
    */
  val q153_lsh_ann_salted: Q = (s, dir) =>
    Similarity.lshTopPairsAuto(t(s, dir).embeddings, "vec_id", "embedding",
      PLANES, DIMS, 50, bucketRowsCeiling = 1, maxSaltBuckets = 8)

  val IVF_K = 8
  val IVF_ITERS = 2
  val IVF_NPROBE = 2

  /** Register a tmp artifact tree for recursive deletion at JVM exit —
    * once per path (q160's per-process index must not outlive the
    * process that wrote it).
    */
  private val reapRegistered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def reapOnExit(path: String): Unit =
    if (reapRegistered.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(path))
      }))

  private def ivfKey(dir: String) = s"ivf|$dir|$IVF_K|$DIMS|$IVF_ITERS"

  /** Last-trained model key — lets [[oracles]] inline the EXACT centroid
    * array this query used as a SQL literal (Verify runs queries first,
    * dumps oracle SQL after, same JVM). Training is cached per (dir,
    * params): `avg`'s partial-merge order is only deterministic up to FP
    * reassociation, so a second train() could differ in the last ulp.
    */
  @volatile private var lastIvfKey: Option[String] = None

  /** IVF ANN. K-means training happens Spark-side; the oracle (below)
    * replays assignment + probe + top-k in DuckDB from the trained
    * centroids inlined as a literal — IvfSpec additionally pins recall +
    * full-probe exactness against the brute-force baseline.
    */
  val q61_ivf_ann: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    val cents = graft.operators.Ivf.trainCached(emb, ivfKey(dir), "vec_id",
      "embedding", k = IVF_K, dims = DIMS, iters = IVF_ITERS)
    lastIvfKey = Some(ivfKey(dir))
    val corpus = graft.operators.Ivf.assign(emb, "embedding", cents, DIMS)
    graft.operators.Ivf.knn(s, corpus, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", cents, DIMS, nprobe = IVF_NPROBE, kNeighbors = 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** Embedding-cosine near-dup pairs at threshold 0.35. The synthetic
    * embeddings carry no true duplicates (max same-bucket cosine ≈ 0.48),
    * so the low threshold exercises the operator shape; a production
    * near-dup pass runs the same plan at ~0.95.
    */
  val q64_embedding_neardup: Q = (s, dir) =>
    Similarity.lshNearDupPairs(t(s, dir).embeddings, "vec_id", "embedding",
      PLANES, DIMS, 0.35)

  /** OR-amplified near-dup pairs
    * ([[graft.operators.Similarity.lshNearDupPairsBanded]]): q64's task
    * with the recall dial engaged — BANDS independent PLANES-bit
    * bucketings, all derived from ONE native bucket evaluation
    * (shift/mask per band), pair recall 1 − (1 − p^planes)^bands vs the
    * single band's p^planes (measured 0.47 vs 0.18 at sf0.1 — the
    * BASELINE.md recall rows). The oracle replays the full
    * PLANES·BANDS-bit schedule and re-derives each band's sub-bucket by
    * integer division of the plane index.
    */
  val BANDS = 4
  val q147_banded_neardup: Q = (s, dir) =>
    Similarity.lshNearDupPairsBanded(t(s, dir).embeddings, "vec_id",
      "embedding", PLANES, BANDS, DIMS, 0.35)

  /** q147's pairs through the AUTO hot-bucket route
    * ([[Similarity.lshNearDupPairsBandedAuto]]) with a deliberately tiny
    * occupancy ceiling, so the SALTED (bucket, ci, cj) cell plan is what
    * the driver gate hash-checks: the oracle stays q147's flat-bit SQL,
    * proving the salted cells reproduce the plain semantics under the
    * real gate — the q150/q151 convention (production ceilings are
    * task-sized; 1 forces the fallback at every test SF).
    */
  val q152_banded_salted: Q = (s, dir) =>
    Similarity.lshNearDupPairsBandedAuto(t(s, dir).embeddings, "vec_id",
      "embedding", PLANES, BANDS, DIMS, 0.35,
      bucketRowsCeiling = 1, maxSaltBuckets = 8)

  /** Semantic-dedup threshold. As with q64, the synthetic embeddings carry
    * no true duplicates, so a low threshold exercises the drop path; a
    * production pass runs ~0.95.
    */
  val SEM_T = 0.30

  /** SemDeDup over the q61 k-means model (same cached training — one
    * Lloyd's run serves both the ANN index and the dedup pass, and the
    * oracle replays both from the same centroid literal).
    */
  val q87_semantic_dedup: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    val cents = graft.operators.Ivf.trainCached(emb, ivfKey(dir), "vec_id",
      "embedding", k = IVF_K, dims = DIMS, iters = IVF_ITERS)
    lastIvfKey = Some(ivfKey(dir))
    Similarity.semanticDedup(emb, "vec_id", "embedding", cents, DIMS, SEM_T)
  }

  /** q87's dedup through the AUTO hot-cluster route
    * ([[Similarity.semanticDedupAuto]]) with a deliberately tiny
    * occupancy ceiling, so the SALTED cell-decomposition plan is what
    * the driver gate hash-checks: the oracle stays q87's pairwise SQL,
    * proving the salted (centroid, ci, cj) plan reproduces the plain
    * semantics under the real gate, not only in fixture specs.
    * (Production ceilings are task-sized — 2^20 rows; 1 here is the
    * harness choice that forces the fallback at every test SF — the
    * q150 convention.)
    */
  val q151_semdedup_salted: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    val cents = graft.operators.Ivf.trainCached(emb, ivfKey(dir), "vec_id",
      "embedding", k = IVF_K, dims = DIMS, iters = IVF_ITERS)
    lastIvfKey = Some(ivfKey(dir))
    Similarity.semanticDedupAuto(emb, "vec_id", "embedding", cents, DIMS,
      SEM_T, clusterRowsCeiling = 1, maxSaltBuckets = 8)
  }

  /** Incremental semantic dedup (continuous ingest): the shard
    * vec_id >= 250 probes the admitted corpus vec_id < 250 — the
    * embedding-space twin of q84 (exact) and q86 (MinHash near-dup),
    * completing the incremental trio over the same split convention.
    */
  val q89_incremental_semdedup: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    val cents = graft.operators.Ivf.trainCached(emb, ivfKey(dir), "vec_id",
      "embedding", k = IVF_K, dims = DIMS, iters = IVF_ITERS)
    lastIvfKey = Some(ivfKey(dir))
    Similarity.incrementalSemanticDedup(
      emb.filter(col("vec_id") >= 250), emb.filter(col("vec_id") < 250),
      "vec_id", "embedding", cents, DIMS, SEM_T)
  }

  /** Prototypes kept per cluster — at 500 vectors / 8 clusters (~62 per
    * list) a 16-prototype cut exercises both the keep and the drop path.
    */
  val PROTO_K = 16

  /** Prototypicality filter over the SAME cached k-means model as
    * q61/q87/q89 — one Lloyd's run serves the ANN index, the semantic
    * dedup, and this outlier prune, exactly how D4 composes them.
    */
  val q92_prototypes: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    val cents = graft.operators.Ivf.trainCached(emb, ivfKey(dir), "vec_id",
      "embedding", k = IVF_K, dims = DIMS, iters = IVF_ITERS)
    lastIvfKey = Some(ivfKey(dir))
    Similarity.prototypes(emb, "vec_id", "embedding", cents, DIMS, PROTO_K)
  }

  /** PQ geometry: 64 dims → 8 subspaces × 8 dims, 16 centroids each — a
    * vector compresses to 8 codes (4 bytes at 4 bits/code). k=16 over 500
    * vectors ≈ 31 vectors/cell per subspace, enough to exercise real
    * quantization error (PqSpec measures recall vs exact L2).
    */
  val PQ_M = 8
  val PQ_SUBD = 8
  val PQ_K = 16
  val PQ_ITERS = 2

  private def pqKey(dir: String) = s"pq|$dir|$PQ_M|$PQ_SUBD|$PQ_K|$PQ_ITERS"

  @volatile private var lastPqKey: Option[String] = None

  /** PQ-compressed ANN (ADC over the full corpus — "flat PQ"): the memory
    * half of the 100 TB ANN story (IVF q61 is the probe half; PqSpec runs
    * them composed). Training happens Spark-side; the oracle replays code
    * assignment + reconstruction + top-k from the trained codebooks
    * inlined as a literal, exactly like q61's centroid-literal oracle.
    */
  val q113_pq_adc: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    val cents = graft.operators.Pq.trainCached(emb, pqKey(dir), "vec_id",
      "embedding", m = PQ_M, subDims = PQ_SUBD, k = PQ_K, iters = PQ_ITERS)
    lastPqKey = Some(pqKey(dir))
    val corpus = graft.operators.Pq.assignCodes(emb, "embedding", cents, PQ_SUBD)
    graft.operators.Pq.adcTopK(corpus, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", cents, kNeighbors = 5)
      .select(col("query_id"), col("neighbor_id"), col("adc"),
        col("rank").cast("long").as("rank"))
  }

  /** PQ as production runs it ([[graft.operators.Pq.adcRerankTopK]]):
    * the codes-only ADC scan over-fetches [[PQ_RERANK_FETCH]] candidates
    * per query, exact squared-L2 on just those rows decides the top-5.
    * Raw ADC@5 with these toy codebooks measured 0.12 recall; the rerank
    * form 3× that (BASELINE.md round-6 recall rows) — this query makes
    * the production shape oracle-checked, not just recall-measured.
    */
  val PQ_RERANK_FETCH = 50
  val q148_pq_rerank: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    val cents = graft.operators.Pq.trainCached(emb, pqKey(dir), "vec_id",
      "embedding", m = PQ_M, subDims = PQ_SUBD, k = PQ_K, iters = PQ_ITERS)
    lastPqKey = Some(pqKey(dir))
    val corpus = graft.operators.Pq.assignCodes(emb, "embedding", cents, PQ_SUBD)
    graft.operators.Pq.adcRerankTopK(corpus, emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", cents, fetch = PQ_RERANK_FETCH, kNeighbors = 5)
      .select(col("query_id"), col("neighbor_id"), col("l2"),
        col("rank").cast("long").as("rank"))
  }

  /** The composed IVF-PQ serving shape
    * ([[graft.operators.Pq.ivfPqTopK]]): coarse probe prunes to
    * [[IVF_NPROBE]] posting lists, ADC ranks only their members from
    * codes — per-query work bounded at nprobe × listSize code walks at
    * any corpus size, 64:1 memory. Both models are the cached q61/q113
    * trainings, and the oracle replays BOTH literals: coarse assignment
    * + probe ranking (q61's CTEs) and codebook reconstruction ADC
    * (q113's), joined on the probed lists.
    */
  val q149_ivf_pq: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    val coarse = graft.operators.Ivf.trainCached(emb, ivfKey(dir), "vec_id",
      "embedding", k = IVF_K, dims = DIMS, iters = IVF_ITERS)
    lastIvfKey = Some(ivfKey(dir))
    val pq = graft.operators.Pq.trainCached(emb, pqKey(dir), "vec_id",
      "embedding", m = PQ_M, subDims = PQ_SUBD, k = PQ_K, iters = PQ_ITERS)
    lastPqKey = Some(pqKey(dir))
    val corpus = graft.operators.Pq.assignCodes(
      graft.operators.Ivf.assign(emb, "embedding", coarse, DIMS),
      "embedding", pq, PQ_SUBD)
    graft.operators.Pq.ivfPqTopK(s, corpus, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", coarse, DIMS, pq,
      nprobe = IVF_NPROBE, kNeighbors = 5)
      .select(col("query_id"), col("neighbor_id"), col("adc"),
        col("rank").cast("long").as("rank"))
  }

  /** q149's serving shape from PERSISTED artifacts
    * ([[graft.operators.AnnIndex]]): the same cached models and coded
    * corpus are WRITTEN to parquet at construction (the bloom/occupancy
    * documented-eagerness convention), then the probe plan reads ONLY the
    * artifacts back — models re-collected from `<idx>/model`, posting
    * lists scanned from the centroid-partitioned `<idx>/coded`. Parquet
    * doubles/longs round-trip exactly, so the output contract — and the
    * oracle — stays q149's two-model-literal replay: a green driver row
    * proves the persisted lifecycle is lossless end-to-end.
    */
  val q160_persisted_ann: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    val coarse = graft.operators.Ivf.trainCached(emb, ivfKey(dir), "vec_id",
      "embedding", k = IVF_K, dims = DIMS, iters = IVF_ITERS)
    lastIvfKey = Some(ivfKey(dir))
    val pq = graft.operators.Pq.trainCached(emb, pqKey(dir), "vec_id",
      "embedding", m = PQ_M, subDims = PQ_SUBD, k = PQ_K, iters = PQ_ITERS)
    lastPqKey = Some(pqKey(dir))
    // per-process path: two harness processes on the same sfDir must not
    // clobber each other's artifacts mid-probe; reaped at JVM exit so
    // repeated harness runs don't accumulate index copies in tmp
    val idx = s"${System.getProperty("java.io.tmpdir")}/graft-annidx-" +
      java.lang.Integer.toHexString(dir.hashCode) +
      s"-${ProcessHandle.current().pid()}"
    reapOnExit(idx)
    graft.operators.AnnIndex.write(emb, "vec_id", "embedding",
      coarse, DIMS, pq, PQ_SUBD, idx)
    graft.operators.AnnIndex.probe(s, idx, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", nprobe = IVF_NPROBE, kNeighbors = 5)
      .select(col("query_id"), col("neighbor_id"), col("adc"),
        col("rank").cast("long").as("rank"))
  }

  def all: Map[String, Q] = Map(
    "q31_knn" -> q31_knn,
    "q32_top_pairs" -> q32_top_pairs,
    "q33_lsh_ann" -> q33_lsh_ann,
    "q153_lsh_ann_salted" -> q153_lsh_ann_salted,
    "q61_ivf_ann" -> q61_ivf_ann,
    "q64_embedding_neardup" -> q64_embedding_neardup,
    "q147_banded_neardup" -> q147_banded_neardup,
    "q152_banded_salted" -> q152_banded_salted,
    "q87_semantic_dedup" -> q87_semantic_dedup,
    "q151_semdedup_salted" -> q151_semdedup_salted,
    "q89_incremental_semdedup" -> q89_incremental_semdedup,
    "q92_prototypes" -> q92_prototypes,
    "q113_pq_adc" -> q113_pq_adc,
    "q148_pq_rerank" -> q148_pq_rerank,
    "q149_ivf_pq" -> q149_ivf_pq,
    "q160_persisted_ann" -> q160_persisted_ann)

  // ——— oracle SQL helpers (DuckDB) ———
  private[graft] def foldSum(terms: String) =
    s"list_reduce(list_prepend(0.0, $terms), (x, y) -> x + y)"
  private[graft] def dotSql(a: String, b: String) =
    foldSum(s"list_transform(range($DIMS), i -> $a[i+1] * $b[i+1])")
  private[graft] def cosSql(a: String, b: String) =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  private[graft] val vCte =
    "v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)"

  /** Sequential left-fold of squared diffs — the exact accumulation order of
    * the codegen'd `nearest_centroid` loop (FP addition is order-sensitive).
    */
  private def l2Sql(a: String, b: String) =
    foldSum(s"list_transform(range($DIMS), i -> ($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1]))")

  /** q61 oracle: assignment + probe ranking + per-query top-k replayed in
    * DuckDB over the Spark-trained centroids as a literal VALUES list.
    * Available only after the query trained a model this JVM (Verify's
    * order); absent → the driver's rows-only fallback, never a wrong hash.
    */
  private def q61Oracle: Option[String] =
    lastIvfKey.flatMap(graft.operators.Ivf.cachedModel).map { cents =>
      val centRows = cents.grouped(DIMS).zipWithIndex.map { case (c, i) =>
        s"($i, ${c.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(", ")
      // probe distance matches Ivf.knn exactly: (-dot(q,c))*2 + dot(c,c)
      s"""WITH $vCte,
         |cents AS (SELECT * FROM (VALUES $centRows) t(centroid, cvec)),
         |asg AS (
         |  SELECT vec_id, v, centroid FROM (
         |    SELECT v.vec_id, v.v, c.centroid,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${l2Sql("v.v", "c.cvec")} ASC, c.centroid ASC) AS rn
         |    FROM v CROSS JOIN cents c)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, centroid FROM (
         |    SELECT q.vec_id AS query_id, q.v AS qv, c.centroid,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ((-(${dotSql("q.v", "c.cvec")})) * 2 + ${dotSql("c.cvec", "c.cvec")}) ASC,
         |                 c.centroid ASC) AS pr
         |    FROM v q CROSS JOIN cents c WHERE q.vec_id < 10)
         |  WHERE pr <= $IVF_NPROBE),
         |scored AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id, ${cosSql("p.qv", "a.v")} AS cos
         |  FROM probes p JOIN asg a
         |    ON p.centroid = a.centroid AND p.query_id <> a.vec_id)
         |SELECT query_id, neighbor_id, cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored)
         |WHERE rank <= 5""".stripMargin
    }

  /** Shared centroid-literal CTE prefix (v + cents + asg) for the two
    * model-replaying oracles.
    */
  private def modelCtes(cents: Array[Double]): String = {
    val centRows = cents.grouped(DIMS).zipWithIndex.map { case (c, i) =>
      s"($i, ${c.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(", ")
    s"""$vCte,
       |cents AS (SELECT * FROM (VALUES $centRows) t(centroid, cvec)),
       |asg AS (
       |  SELECT vec_id, v, centroid FROM (
       |    SELECT v.vec_id, v.v, c.centroid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${l2Sql("v.v", "c.cvec")} ASC, c.centroid ASC) AS rn
       |    FROM v CROSS JOIN cents c)
       |  WHERE rn = 1)""".stripMargin
  }

  /** q87 oracle: same centroid-literal assignment, then the pairwise
    * drop rule — a doc is dropped when any smaller-id same-cluster doc
    * has cosine >= SEM_T (witness need not survive).
    */
  private def q87Oracle: Option[String] =
    lastIvfKey.flatMap(graft.operators.Ivf.cachedModel).map { cents =>
      s"""WITH ${modelCtes(cents)},
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM asg a JOIN asg b
         |    ON a.centroid = b.centroid AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v")} >= $SEM_T)
         |SELECT s.vec_id, s.centroid::BIGINT AS centroid FROM asg s
         |WHERE s.vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin
    }

  /** q89 oracle: centroid-literal assignment over ALL vectors, then the
    * shard-vs-index probe rule (new doc dropped iff any index member in
    * its cluster reaches SEM_T).
    */
  private def q89Oracle: Option[String] =
    lastIvfKey.flatMap(graft.operators.Ivf.cachedModel).map { cents =>
      s"""WITH ${modelCtes(cents)},
         |dropped AS (
         |  SELECT DISTINCT n.vec_id
         |  FROM asg n JOIN asg x
         |    ON n.centroid = x.centroid
         |   AND n.vec_id >= 250 AND x.vec_id < 250
         |  WHERE ${cosSql("n.v", "x.v")} >= $SEM_T)
         |SELECT n.vec_id, n.centroid::BIGINT AS centroid FROM asg n
         |WHERE n.vec_id >= 250
         |  AND n.vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin
    }

  /** q92 oracle: centroid-literal assignment, cosine to the member's own
    * centroid (rounded before ranking, matching the engine), per-cluster
    * row_number cut at PROTO_K.
    */
  private def q92Oracle: Option[String] =
    lastIvfKey.flatMap(graft.operators.Ivf.cachedModel).map { cents =>
      s"""WITH ${modelCtes(cents)},
         |sc AS (
         |  SELECT a.vec_id, a.centroid, ${cosSql("a.v", "c.cvec")} AS cos_c
         |  FROM asg a JOIN cents c ON a.centroid = c.centroid)
         |SELECT vec_id, centroid::BIGINT AS centroid, cos_c, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY centroid
         |    ORDER BY cos_c DESC, vec_id ASC) AS rank FROM sc)
         |WHERE rank <= $PROTO_K""".stripMargin
    }

  /** q113 oracle: per-subspace code assignment over the Spark-trained
    * codebooks as a literal VALUES list, reconstruction via an ORDERED
    * list aggregate (so the ADC fold runs in the same subspace-major dim
    * order as the codegen'd loop), squared-L2 + per-query top-k.
    */
  /** The shared q113/q148 CTE prefix through `scored` (per-query ADC
    * distances over the whole corpus) from the cached codebook literal.
    */
  private def pqAdcCtes(cents: Array[Double]): String = {
    val cbRows = (for (j <- 0 until PQ_M; c <- 0 until PQ_K) yield {
      val off = (j * PQ_K + c) * PQ_SUBD
      val vs = (0 until PQ_SUBD).map(t => cents(off + t)).mkString("[", ", ", "]")
      s"($j, $c, $vs::DOUBLE[])"
    }).mkString(", ")
    val subL2 = foldSum(
      s"list_transform(range($PQ_SUBD), t -> " +
        s"(v.v[cb.j*$PQ_SUBD + t + 1] - cb.cvec[t+1]) * (v.v[cb.j*$PQ_SUBD + t + 1] - cb.cvec[t+1]))")
    s"""$vCte,
       |cb AS (SELECT * FROM (VALUES $cbRows) t(j, c, cvec)),
       |asg AS (
       |  SELECT vec_id, j, cvec FROM (
       |    SELECT v.vec_id, cb.j, cb.cvec,
       |      row_number() OVER (PARTITION BY v.vec_id, cb.j
       |        ORDER BY $subL2 ASC, cb.c ASC) AS rn
       |    FROM v CROSS JOIN cb)
       |  WHERE rn = 1),
       |recon AS (
       |  SELECT vec_id, flatten(list(cvec ORDER BY j)) AS rv
       |  FROM asg GROUP BY vec_id),
       |scored AS (
       |  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
       |    round(${foldSum(s"list_transform(range(${PQ_M * PQ_SUBD}), i -> (q.v[i+1] - r.rv[i+1]) * (q.v[i+1] - r.rv[i+1]))")}, 6) AS adc
       |  FROM v q JOIN recon r ON q.vec_id < 10 AND q.vec_id <> r.vec_id)""".stripMargin
  }

  private def q113Oracle: Option[String] =
    lastPqKey.flatMap(graft.operators.Pq.cachedModel).map { cents =>
      s"""WITH ${pqAdcCtes(cents)}
         |SELECT query_id, neighbor_id, adc, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc ASC, neighbor_id ASC) AS rank FROM scored)
         |WHERE rank <= 5""".stripMargin
    }

  /** q148 oracle: q113's ADC CTEs cut at the over-fetch rank, then the
    * exact squared-L2 rerank on just those candidates — same qq − 2qc +
    * cc operand order as the engine's native-dot expression, rounded to
    * 6 dp before the final rank.
    */
  private def q148Oracle: Option[String] =
    lastPqKey.flatMap(graft.operators.Pq.cachedModel).map { cents =>
      s"""WITH ${pqAdcCtes(cents)},
         |cand AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc ASC, neighbor_id ASC) AS rk FROM scored)
         |  WHERE rk <= $PQ_RERANK_FETCH),
         |ex AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    round(${dotSql("q.v", "q.v")} - ${dotSql("q.v", "n.v")} * 2
         |      + ${dotSql("n.v", "n.v")}, 6) AS l2
         |  FROM cand c
         |  JOIN v q ON q.vec_id = c.query_id
         |  JOIN v n ON n.vec_id = c.neighbor_id)
         |SELECT query_id, neighbor_id, l2, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY l2 ASC, neighbor_id ASC) AS rank FROM ex)
         |WHERE rank <= 5""".stripMargin
    }

  /** q149 oracle: BOTH model literals — q61's coarse assignment + probe
    * ranking (CTEs renamed c*) and q113's codebook reconstruction (p*) —
    * ADC over the probed lists' members only. Needs both models trained
    * this JVM (Verify's order guarantees it: q61 and q113 run first).
    */
  private def q149Oracle: Option[String] =
    for {
      coarse <- lastIvfKey.flatMap(graft.operators.Ivf.cachedModel)
      pq <- lastPqKey.flatMap(graft.operators.Pq.cachedModel)
    } yield {
      val centRows = coarse.grouped(DIMS).zipWithIndex.map { case (c, i) =>
        s"($i, ${c.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(", ")
      val cbRows = (for (j <- 0 until PQ_M; c <- 0 until PQ_K) yield {
        val off = (j * PQ_K + c) * PQ_SUBD
        val vs = (0 until PQ_SUBD).map(t => pq(off + t)).mkString("[", ", ", "]")
        s"($j, $c, $vs::DOUBLE[])"
      }).mkString(", ")
      val subL2 = foldSum(
        s"list_transform(range($PQ_SUBD), t -> " +
          s"(v.v[cb.j*$PQ_SUBD + t + 1] - cb.cvec[t+1]) * (v.v[cb.j*$PQ_SUBD + t + 1] - cb.cvec[t+1]))")
      s"""WITH $vCte,
         |ccents AS (SELECT * FROM (VALUES $centRows) t(centroid, cvec)),
         |casg AS (
         |  SELECT vec_id, centroid FROM (
         |    SELECT v.vec_id, c.centroid,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${l2Sql("v.v", "c.cvec")} ASC, c.centroid ASC) AS rn
         |    FROM v CROSS JOIN ccents c)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, centroid FROM (
         |    SELECT q.vec_id AS query_id, q.v AS qv, c.centroid,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ((-(${dotSql("q.v", "c.cvec")})) * 2 + ${dotSql("c.cvec", "c.cvec")}) ASC,
         |                 c.centroid ASC) AS pr
         |    FROM v q CROSS JOIN ccents c WHERE q.vec_id < 10)
         |  WHERE pr <= $IVF_NPROBE),
         |cb AS (SELECT * FROM (VALUES $cbRows) t(j, c, cvec)),
         |pasg AS (
         |  SELECT vec_id, j, cvec FROM (
         |    SELECT v.vec_id, cb.j, cb.cvec,
         |      row_number() OVER (PARTITION BY v.vec_id, cb.j
         |        ORDER BY $subL2 ASC, cb.c ASC) AS rn
         |    FROM v CROSS JOIN cb)
         |  WHERE rn = 1),
         |recon AS (
         |  SELECT vec_id, flatten(list(cvec ORDER BY j)) AS rv
         |  FROM pasg GROUP BY vec_id),
         |scored AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id,
         |    round(${foldSum(s"list_transform(range(${PQ_M * PQ_SUBD}), i -> (p.qv[i+1] - r.rv[i+1]) * (p.qv[i+1] - r.rv[i+1]))")}, 6) AS adc
         |  FROM probes p
         |  JOIN casg a ON p.centroid = a.centroid AND p.query_id <> a.vec_id
         |  JOIN recon r ON r.vec_id = a.vec_id)
         |SELECT query_id, neighbor_id, adc, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc ASC, neighbor_id ASC) AS rank FROM scored)
         |WHERE rank <= 5""".stripMargin
    }

  def oracles: Map[String, String] = {
    val dynamic = Seq(
      "q61_ivf_ann" -> q61Oracle, "q87_semantic_dedup" -> q87Oracle,
      // q151 runs the salted plan; its output contract IS q87's
      "q151_semdedup_salted" -> q87Oracle,
      "q89_incremental_semdedup" -> q89Oracle,
      "q92_prototypes" -> q92Oracle,
      "q113_pq_adc" -> q113Oracle,
      "q148_pq_rerank" -> q148Oracle,
      "q149_ivf_pq" -> q149Oracle,
      // q160 probes the PERSISTED artifacts; its output contract IS
      // q149's (parquet round-trips the models and codes exactly)
      "q160_persisted_ann" -> q149Oracle)
      .collect { case (k, Some(sql)) => k -> sql }
    staticOracles ++ dynamic +
      // q152/q153 run the salted plans; their output contracts ARE
      // q147's / q33's
      ("q152_banded_salted" -> staticOracles("q147_banded_neardup")) +
      ("q153_lsh_ann_salted" -> staticOracles("q33_lsh_ann"))
  }

  private def staticOracles: Map[String, String] = Map(
    "q31_knn" ->
      s"""WITH $vCte,
         |s AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         ${cosSql("q.v", "c.v")} AS cos
         |  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |SELECT query_id, neighbor_id, cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
         |WHERE rank <= 5""".stripMargin,
    "q32_top_pairs" ->
      s"""WITH $vCte
         |SELECT a.vec_id AS d1, b.vec_id AS d2, ${cosSql("a.v", "b.v")} AS cos
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |ORDER BY cos DESC, d1 ASC, d2 ASC LIMIT 100""".stripMargin,
    "q33_lsh_ann" ->
      s"""WITH $vCte,
         |pr AS (
         |  SELECT vec_id, j,
         |    ${foldSum(s"""list_transform(range($DIMS), d ->
         |      v[d+1] * (((((j*$DIMS + d + 1) * 2654435761) % 1000000007) % 2001 - 1000) / 1000.0))""")} AS proj
         |  FROM v, (SELECT unnest(range($PLANES)) AS j)),
         |bk AS (
         |  SELECT vec_id,
         |    sum(CASE WHEN proj >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
         |  FROM pr GROUP BY vec_id),
         |vb AS (SELECT v.vec_id, v.v, bk.bucket FROM v JOIN bk ON v.vec_id = bk.vec_id)
         |SELECT a.vec_id AS d1, b.vec_id AS d2, ${cosSql("a.v", "b.v")} AS cos
         |FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |ORDER BY cos DESC, d1 ASC, d2 ASC LIMIT 50""".stripMargin,
    "q64_embedding_neardup" ->
      s"""WITH $vCte,
         |pr AS (
         |  SELECT vec_id, j,
         |    ${foldSum(s"""list_transform(range($DIMS), d ->
         |      v[d+1] * (((((j*$DIMS + d + 1) * 2654435761) % 1000000007) % 2001 - 1000) / 1000.0))""")} AS proj
         |  FROM v, (SELECT unnest(range($PLANES)) AS j)),
         |bk AS (
         |  SELECT vec_id,
         |    sum(CASE WHEN proj >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
         |  FROM pr GROUP BY vec_id),
         |vb AS (SELECT v.vec_id, v.v, bk.bucket FROM v JOIN bk ON v.vec_id = bk.vec_id)
         |SELECT a.vec_id AS d1, b.vec_id AS d2, ${cosSql("a.v", "b.v")} AS cos
         |FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v")} >= 0.35""".stripMargin,
    "q147_banded_neardup" ->
      s"""WITH $vCte,
         |pr AS (
         |  SELECT vec_id, j,
         |    ${foldSum(s"""list_transform(range($DIMS), d ->
         |      v[d+1] * (((((j*$DIMS + d + 1) * 2654435761) % 1000000007) % 2001 - 1000) / 1000.0))""")} AS proj
         |  FROM v, (SELECT unnest(range(${PLANES * BANDS})) AS j)),
         |-- band = j // PLANES; each band's sub-bucket packs its own
         |-- PLANES sign bits — the same bits the engine takes from one
         |-- lsh_bucket(vec, PLANES*BANDS) call by shift/mask
         |bk AS (
         |  SELECT vec_id, j // $PLANES AS band,
         |    (j // $PLANES) * ${1L << PLANES} +
         |      sum(CASE WHEN proj >= 0 THEN (1::BIGINT << (j % $PLANES))
         |          ELSE 0 END)::BIGINT AS bucket
         |  FROM pr GROUP BY 1, 2),
         |vb AS (SELECT v.vec_id, v.v, bk.bucket FROM v JOIN bk ON v.vec_id = bk.vec_id)
         |SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2, ${cosSql("a.v", "b.v")} AS cos
         |FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v")} >= 0.35""".stripMargin)
}
