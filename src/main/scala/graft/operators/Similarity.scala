package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Dot products and norms are strict left-folds (`aggregate`) in index
  * order, so results are bit-identical to any engine folding the same way
  * (the DuckDB oracles use `list_reduce`). All math is in double.
  *
  * Scale design:
  *  - brute-force kNN broadcasts the (small) query set against the corpus —
  *    one scan, no shuffle of the corpus, per-query top-k via window;
  *  - the all-pairs variants exist as verification baselines; the scale
  *    path is `lshTopPairs`, which buckets by deterministic random
  *    hyperplane signs and only scores within buckets (candidate count
  *    ~ n·avg_bucket_size instead of n²);
  *  - a production IVF step would replace the hash bucketing with k-means
  *    centroids but keep the identical bucket-join shape.
  */
object Similarity {

  /** float[] -> double[] (exact widening, engine-independent). */
  def asDouble(vec: Column): Column = vec.cast("array<double>")

  /** Native in-order dot product (plans.VecDot); HOF reference below. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** HOF reference implementation of [[dot]] (parity spec). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector (small set, broadcast),
    * score every corpus vector, keep the k best. Ties broken by neighbor id.
    */
  def knn(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
          k: Int): DataFrame = {
    // norms once per row BEFORE the pair join: each pair then costs one dot
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** All-pairs cosine, globally most-similar `limit` pairs (verification
    * baseline — O(n²); Spark plans the sort+limit as TakeOrderedAndProject,
    * so only `limit` rows ever reach the driver side of the exchange).
    */
  def topPairs(df: DataFrame, idCol: String, vecCol: String, limit: Int): DataFrame = {
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = v.select(col(idCol).as("d1"), col("v").as("v1"), col("nrm").as("n1"))
    val b = v.select(col(idCol).as("d2"), col("v").as("v2"), col("nrm").as("n2"))
    a.crossJoin(b).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 6).as("cos"))
      .orderBy(col("cos").desc, col("d1").asc, col("d2").asc)
      .limit(limit)
  }

  /** LSH bucket id from `planes` hyperplane sign bits — native codegen
    * expression (plans.LshBucket). Per-row, shuffle-free.
    */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column =
    call_function("lsh_bucket", vec, lit(planes), lit(dims))

  /** [[lshBucket]] over flat planes firstPlane .. firstPlane+planes−1 —
    * the chunking primitive for banded schemes past one long's 62 bits.
    */
  def lshBucketFrom(vec: Column, planes: Int, dims: Int, firstPlane: Int): Column =
    call_function("lsh_bucket_from", vec, lit(planes), lit(dims), lit(firstPlane))

  /** Deterministic pseudo-random hyperplane coefficient for (plane j, dim d):
    * uniform in [-1, 1] with step 1e-3, derived from the portable integer
    * hash so any engine reproduces it. HOF reference path only.
    */
  private def planeCoef(j: Int, dims: Int, d: Column): Column =
    (pmod(pmod((lit(j.toLong * dims) + d + 1L) * 2654435761L, lit(1000000007L)), lit(2001L)) - 1000L)
      .cast("double") / 1000.0

  /** HOF reference implementation of [[lshBucket]] (parity spec only —
    * interpreted lambdas, ~5 µs/eval; the native expression replaces it in
    * every query path).
    */
  def lshBucketHof(vec: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { j =>
      val proj = aggregate(
        transform(sequence(lit(0), lit(dims - 1)),
          d => element_at(vec, d + 1) * planeCoef(j, dims, d)),
        lit(0d), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN scale path: score only pairs sharing an LSH bucket, keep the
    * globally best `limit`. Recall < 1 by construction (measured against
    * `topPairs` in the spec); cost drops from n² to sum over buckets of
    * bucket_size². Skewed buckets (low-entropy corpora) take
    * [[lshTopPairsSalted]] via the [[lshTopPairsAuto]] occupancy gate
    * (driver-verified as q153).
    */
  def lshTopPairs(df: DataFrame, idCol: String, vecCol: String,
                  planes: Int, dims: Int, limit: Int): DataFrame =
    bucketedScoredPairs(df, idCol, vecCol, planes, dims)
      .orderBy(col("cos").desc, col("d1").asc, col("d2").asc)
      .limit(limit)

  /** [[lshTopPairs]] with hot buckets spread by the shared salted cell
    * engine ([[SaltedCells.pairs]], the single-band bucket as the key).
    * A top-k CANNOT absorb duplicate pair rows in a terminal dedup the
    * way the threshold forms do (duplicates would displace real rows
    * inside the limit) — the engine's exactly-once contract is what
    * makes it safe here with no dedup exchange. The sort+limit still
    * compiles to TakeOrderedAndProject (map-side k per task).
    */
  def lshTopPairsSalted(df: DataFrame, idCol: String, vecCol: String,
                        planes: Int, dims: Int, limit: Int,
                        hotBucketThreshold: Int,
                        maxSaltBuckets: Int = 256): DataFrame =
    saltedBucketScoredPairs(df, idCol, vecCol, planes, dims,
      hotBucketThreshold, maxSaltBuckets)
      .orderBy(col("cos").desc, col("d1").asc, col("d2").asc)
      .limit(limit)

  /** [[lshTopPairs]] behind the construction-time occupancy gate (the
    * `Relational.bandedIntervalJoinAuto` discipline): one narrow
    * (bucket, count) aggregate measures the hottest bucket; at or under
    * `bucketRowsCeiling` the plain plan runs untouched, above it the
    * salted cells engage with the ceiling as the per-task bound.
    */
  def lshTopPairsAuto(df: DataFrame, idCol: String, vecCol: String,
                      planes: Int, dims: Int, limit: Int,
                      bucketRowsCeiling: Long = 1L << 20,
                      maxSaltBuckets: Int = 256): DataFrame = {
    require(bucketRowsCeiling >= 1 && maxSaltBuckets >= 1,
      s"lshTopPairsAuto: ceilings must be >= 1, got " +
        s"bucketRowsCeiling=$bucketRowsCeiling maxSaltBuckets=$maxSaltBuckets")
    val hottest = df
      .select(lshBucket(asDouble(col(vecCol)), planes, dims).as("bucket"))
      .groupBy(col("bucket")).count()
      .agg(coalesce(max(col("count")), lit(0L))).collect()(0).getLong(0)
    if (hottest <= bucketRowsCeiling)
      lshTopPairs(df, idCol, vecCol, planes, dims, limit)
    else
      lshTopPairsSalted(df, idCol, vecCol, planes, dims, limit,
        math.min(bucketRowsCeiling, Int.MaxValue.toLong).toInt,
        maxSaltBuckets)
  }

  /** [[bucketedScoredPairs]] with hot buckets decomposed into salted
    * cells, each unordered pair emitted exactly once (see
    * [[lshTopPairsSalted]] for the once-only argument) — safe under a
    * downstream limit, filter, or aggregate alike.
    */
  private def saltedBucketScoredPairs(df: DataFrame, idCol: String,
                                      vecCol: String, planes: Int, dims: Int,
                                      hotBucketThreshold: Int,
                                      maxSaltBuckets: Int): DataFrame = {
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes, dims))
      .withColumn("nrm", norm(col("v")))
    SaltedCells.pairs(v, Seq("bucket"), idCol, hotBucketThreshold,
        maxSaltBuckets)
      .select(col(s"${idCol}_1").as("d1"), col(s"${idCol}_2").as("d2"),
        round(dot(col("v_1"), col("v_2")) / (col("nrm_1") * col("nrm_2")), 6)
          .as("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (dedup semantics, not search):
    * every same-bucket pair with cosine >= threshold. No global sort or
    * limit — the output is the edge set for `Dedup.duplicateClusters`'
    * keep-one-per-component rule, completing the dedup family (exact,
    * MinHash-Jaccard, SimHash-Hamming, embedding-cosine). SINGLE-band:
    * recall for a pair at angle θ is (1 − θ/π)^planes — measured 0.18 at
    * 4 planes / cos 0.35 (BASELINE.md recall rows), falling as the
    * planes-≈-log2(n) occupancy rule raises planes. The cheap low-recall
    * screen; for dial-able recall use [[lshNearDupPairsBanded]], and for
    * high recall at scale the cluster-based [[semanticDedup]] (measured
    * 0.92–0.98).
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      planes: Int, dims: Int, threshold: Double): DataFrame =
    bucketedScoredPairs(df, idCol, vecCol, planes, dims)
      .filter(col("cos") >= threshold)

  /** OR-amplified (banded) hyperplane near-dup pairs — the same
    * AND-then-OR construction MinHash-LSH uses for text (q27/q28),
    * applied to the hyperplane family: `bands` independent bucketings of
    * `planes` sign bits each; a pair is a candidate if it collides in
    * ANY band. Pair recall at angle θ rises from p^planes to
    * 1 − (1 − p^planes)^bands with p = 1 − θ/π — `planes` holds
    * per-band bucket occupancy (set it ≈ log2 n), `bands` dials recall
    * independently (bands ≈ ln(1−r)/ln(1−p^planes) for target r).
    *
    * O(1) native bucket evaluations per row: the coefficient schedule is
    * FLAT-plane-indexed, so all bands' sign bits come from
    * `lsh_bucket_from` calls over consecutive plane ranges (one long
    * holds ≤ 62 sign bits; bands chunk across calls transparently) and
    * each band's sub-bucket is a shift/mask — no per-band hashing, and
    * the oracle replays the identical flat-j bits (q147), oblivious to
    * the chunking. Shuffle carries `bands` narrow keyed rows per vector;
    * a pair colliding in several bands is reported once
    * (`dropDuplicates` AFTER the threshold filter, so the dedup exchange
    * carries only qualifying pairs). A pathologically hot (band, bucket)
    * key takes [[lshNearDupPairsBandedSalted]] — the q85 cell
    * decomposition with this operator's composite bucket as the band key
    * — via the [[lshNearDupPairsBandedAuto]] occupancy gate
    * (driver-verified as q152).
    *
    * Measured decision — vectors DO ride the band exchange here, unlike
    * `Dedup.nearDupPairs` where payloads never shuffle. The narrow
    * alternative (ship (bucket, id) only, `distinct` candidate pairs
    * across bands, re-attach vectors by id-keyed joins) was built and
    * measured at the decades: at dedup-grade thresholds candidate pairs
    * collide in ~one band each, so the distinct dedups almost nothing
    * while materializing the FULL candidate fan-out (~bands · Σ occ²/2
    * rows — 2.6e8 at 100×) through an exchange plus two sort-merge
    * attachment joins, where this form streams the fan-out through the
    * codegen'd dot product without ever sorting it. Measured: 2.8×
    * slower at sf0.1, equal at 10×, OOM-killed the 8 GiB-heap context at
    * 100× (shuffle read-ahead during the candidate sort) vs 78.7 s for
    * this form. The vector payload costs n·bands·dims through the bucket
    * exchange (~2.7 GiB at 100×) — bounded by geometry, not by pair
    * fan-out, which is the side that actually blows up.
    */
  def lshNearDupPairsBanded(df: DataFrame, idCol: String, vecCol: String,
                            planes: Int, bands: Int, dims: Int,
                            threshold: Double): DataFrame = {
    val banded = bandedBuckets(df, idCol, vecCol, planes, bands, dims)
    selfScoredPairs(banded, idCol, "bucket")
      .filter(col("cos") >= threshold)
      .dropDuplicates("d1", "d2")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means-cluster the embeddings, then within each cluster drop every
    * doc that has a smaller-id member with cosine >= `threshold` — the
    * keep-lowest-id representative of each semantic-duplicate
    * neighborhood survives. The witness need not itself survive (pairwise
    * rule, not transitive closure — the closure form is
    * `Dedup.duplicateClusters` over [[lshNearDupPairs]] edges).
    *
    * Scale shape: assignment is one codegen'd scan (no shuffle); the
    * pair join shuffles (id, vec, centroid) on the centroid key only,
    * and pair work is sum over clusters of size² — bounded by keeping
    * occupancy constant via `Ivf.kFor` (k grows with n), exactly the
    * posting-list rule the IVF index already applies. This is the whole
    * point of SemDeDup: clustering turns O(n²) semantic dedup into
    * per-cluster blocks sized to taste. A pathologically hot cluster (a
    * dense semantic mode k-means keeps merging) takes
    * [[semanticDedupSalted]] — the q85 cell decomposition with centroid
    * as the band key — via the [[semanticDedupAuto]] occupancy gate
    * (driver-verified as q151).
    *
    * Returns the admitted (idCol, centroid) rows.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    cents: Array[Double], dims: Int, threshold: Double): DataFrame = {
    val assigned = graft.operators.Ivf.assign(df, vecCol, cents, dims)
      .select(col(idCol), asDouble(col(vecCol)).as("v"),
        col("centroid").cast("long").as("centroid"))
      .withColumn("nrm", norm(col("v")))
    val dropped = selfScoredPairs(assigned, idCol, "centroid")
      .filter(col("cos") >= threshold)
      .select(col("d2").as(idCol))
      .distinct()
    assigned.select(col(idCol), col("centroid"))
      .join(dropped, Seq(idCol), "left_anti")
  }

  /** [[lshNearDupPairsBanded]] with hot (band, bucket) keys spread by
    * the shared salted cell engine ([[SaltedCells.pairs]], this
    * operator's composite bucket as the key) — the executable form of
    * the hot-bucket note above. The engine is exactly-once PER BUCKET;
    * the terminal dropDuplicates collapses pairs colliding in several
    * BANDS, exactly as the plain path's does. Vectors ride the bounded
    * cell replication so scoring streams through the join (the measured
    * decision above — never materialize the pair fan-out).
    *
    * Output is identical to [[lshNearDupPairsBanded]] (spec-pinned; q152
    * hash-checks the salted plan against q147's oracle under the driver
    * gate).
    */
  def lshNearDupPairsBandedSalted(df: DataFrame, idCol: String, vecCol: String,
                                  planes: Int, bands: Int, dims: Int,
                                  threshold: Double, hotBucketThreshold: Int,
                                  maxSaltBuckets: Int = 256): DataFrame =
    SaltedCells.pairs(bandedBuckets(df, idCol, vecCol, planes, bands, dims),
        Seq("bucket"), idCol, hotBucketThreshold, maxSaltBuckets)
      .select(col(s"${idCol}_1").as("d1"), col(s"${idCol}_2").as("d2"),
        round(dot(col("v_1"), col("v_2")) / (col("nrm_1") * col("nrm_2")), 6)
          .as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("d1", "d2")

  /** [[lshNearDupPairsBanded]] behind the construction-time occupancy
    * gate (the `Relational.bandedIntervalJoinAuto` discipline): one
    * narrow aggregate over (bucket) longs measures the hottest composite
    * bucket; at or under `bucketRowsCeiling` the plain plan runs
    * untouched, above it the salted cells engage with the ceiling as the
    * per-task bound. The measurement job shuffles only map-side-combined
    * (bucket, count) rows — vectors never leave the scan.
    */
  def lshNearDupPairsBandedAuto(df: DataFrame, idCol: String, vecCol: String,
                                planes: Int, bands: Int, dims: Int,
                                threshold: Double,
                                bucketRowsCeiling: Long = 1L << 20,
                                maxSaltBuckets: Int = 256): DataFrame = {
    require(bucketRowsCeiling >= 1 && maxSaltBuckets >= 1,
      s"lshNearDupPairsBandedAuto: ceilings must be >= 1, got " +
        s"bucketRowsCeiling=$bucketRowsCeiling maxSaltBuckets=$maxSaltBuckets")
    val hottest = bandedBuckets(df, idCol, vecCol, planes, bands, dims)
      .groupBy(col("bucket")).count()
      .agg(coalesce(max(col("count")), lit(0L))).collect()(0).getLong(0)
    if (hottest <= bucketRowsCeiling)
      lshNearDupPairsBanded(df, idCol, vecCol, planes, bands, dims, threshold)
    else
      lshNearDupPairsBandedSalted(df, idCol, vecCol, planes, bands, dims,
        threshold, math.min(bucketRowsCeiling, Int.MaxValue.toLong).toInt,
        maxSaltBuckets)
  }

  /** Shared banded-bucket construction for [[lshNearDupPairsBanded]] and
    * its salted/auto forms: `bands` rows per vector, each carrying the
    * composite (band << planes | sub-bucket) key derived by shift/mask
    * from the flat-plane-indexed native bucket chunks.
    */
  private def bandedBuckets(df: DataFrame, idCol: String, vecCol: String,
                            planes: Int, bands: Int, dims: Int): DataFrame = {
    require(planes >= 1 && planes <= 62 && bands >= 1,
      s"banded LSH: need 1 <= planes <= 62 and bands >= 1, " +
        s"got planes=$planes bands=$bands")
    val bandsPerChunk = math.max(1, 62 / planes)
    val nChunks = (bands + bandsPerChunk - 1) / bandsPerChunk
    val bitCols = (0 until nChunks).map { c =>
      val nb = math.min(bandsPerChunk, bands - c * bandsPerChunk)
      lshBucketFrom(col("v"), nb * planes, dims, c * bandsPerChunk * planes)
    }
    df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("__bits", array(bitCols: _*))
      .withColumn("nrm", norm(col("v")))
      .withColumn("__band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bucket",
        col("__band").cast("long") * lit(1L << planes) +
          call_function("shiftright",
            element_at(col("__bits"),
              (expr(s"__band div $bandsPerChunk") + 1).cast("int")),
            (pmod(col("__band"), lit(bandsPerChunk)) * planes).cast("int"))
            .bitwiseAND(lit((1L << planes) - 1)))
      .drop("__bits", "__band")
  }

  /** [[semanticDedup]] with hot clusters spread by the shared salted
    * cell engine ([[SaltedCells.pairs]], centroid as the key) — the
    * executable form of the hot-cluster note above. Vectors ride the
    * bounded cell replication so the cosine scoring streams through the
    * join (the q147 measured decision — never materialize the pair
    * fan-out); the hot-cluster list broadcasts at ≤ k rows (the model's
    * own bound).
    *
    * Output is identical to [[semanticDedup]] (spec-pinned on skewed
    * fixtures; q151 hash-checks the salted plan against the q87 oracle
    * under the driver gate).
    */
  def semanticDedupSalted(df: DataFrame, idCol: String, vecCol: String,
                          cents: Array[Double], dims: Int, threshold: Double,
                          hotClusterThreshold: Int,
                          maxSaltBuckets: Int = 256): DataFrame = {
    val assigned = graft.operators.Ivf.assign(df, vecCol, cents, dims)
      .select(col(idCol), asDouble(col(vecCol)).as("v"),
        col("centroid").cast("long").as("centroid"))
      .withColumn("nrm", norm(col("v")))
    // pairs leave the engine oriented id_1 < id_2, so id_2 is the member
    // the keep-lowest-id rule drops
    val dropped = SaltedCells.pairs(assigned, Seq("centroid"), idCol,
        hotClusterThreshold, maxSaltBuckets)
      .filter(round(dot(col("v_1"), col("v_2")) / (col("nrm_1") * col("nrm_2")), 6)
        >= threshold)
      .select(col(s"${idCol}_2").as(idCol))
      .distinct()
    assigned.select(col(idCol), col("centroid"))
      .join(dropped, Seq(idCol), "left_anti")
  }

  /** [[semanticDedup]] behind the construction-time occupancy gate — the
    * `Relational.bandedIntervalJoinAuto` discipline: one k-row aggregate
    * measures the hottest cluster; at or under `clusterRowsCeiling` the
    * plain plan runs untouched, above it the salted cell path engages
    * with the ceiling as the per-task bound. The measurement job costs
    * one codegen'd assignment scan over narrow (centroid) rows.
    */
  def semanticDedupAuto(df: DataFrame, idCol: String, vecCol: String,
                        cents: Array[Double], dims: Int, threshold: Double,
                        clusterRowsCeiling: Long = 1L << 20,
                        maxSaltBuckets: Int = 256): DataFrame = {
    require(clusterRowsCeiling >= 1 && maxSaltBuckets >= 1,
      s"semanticDedupAuto: ceilings must be >= 1, got " +
        s"clusterRowsCeiling=$clusterRowsCeiling maxSaltBuckets=$maxSaltBuckets")
    val hottest = graft.operators.Ivf.assign(df, vecCol, cents, dims)
      .groupBy(col("centroid")).count()
      .agg(coalesce(max(col("count")), lit(0L))).collect()(0).getLong(0)
    if (hottest <= clusterRowsCeiling)
      semanticDedup(df, idCol, vecCol, cents, dims, threshold)
    else
      semanticDedupSalted(df, idCol, vecCol, cents, dims, threshold,
        math.min(clusterRowsCeiling, Int.MaxValue.toLong).toInt,
        maxSaltBuckets)
  }

  /** Prototypicality filter — the D4 companion pass to [[semanticDedup]]
    * (Tirumala et al. 2023 run SemDeDup then prune low-density cluster
    * outliers): keep each cluster's `kKeep` most-central members by cosine
    * to their OWN centroid (cosine rounded to 6dp before ranking so ties
    * are well-defined; ties break toward the lower id). Survivors are the
    * cluster prototypes; what falls is the far-from-every-centroid noise.
    *
    * Scale shape: assignment is scan-local arithmetic against the
    * O(k·dims) model literal; the centroid-vector frame broadcasts at k
    * rows; the rank filter compiles to WindowGroupLimit (PlanAuditSpec
    * pins it), so each map task forwards at most `kKeep` rows per cluster
    * into the single centroid-key exchange. With k scaling as
    * [[Ivf.kFor]], per-cluster work stays bounded as the corpus grows.
    */
  def prototypes(df: DataFrame, idCol: String, vecCol: String,
                 cents: Array[Double], dims: Int, kKeep: Int): DataFrame = {
    require(kKeep > 0, s"kKeep must be positive, got $kKeep")
    val assigned = graft.operators.Ivf.assign(df, vecCol, cents, dims)
      .select(col(idCol), asDouble(col(vecCol)).as("v"),
        col("centroid").cast("long").as("centroid"))
    val cf = graft.operators.Ivf.centroidFrame(df.sparkSession, cents, dims)
      .select(col("centroid").cast("long").as("centroid"), col("cvec"))
    val w = Window.partitionBy(col("centroid"))
      .orderBy(col("cos_c").desc, col(idCol).asc)
    assigned.join(broadcast(cf), Seq("centroid"))
      .withColumn("cos_c", round(cosine(col("v"), col("cvec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kKeep) // int rank here: a cast wrapped around
      // row_number would block the InferWindowGroupLimit rewrite
      .select(col(idCol), col("centroid"), col("cos_c"),
        col("rank").cast("long").as("rank"))
  }

  /** Incremental [[semanticDedup]] (continuous ingest): a new shard
    * arrives against the already-admitted corpus; a new doc is dropped
    * when any INDEX member in its cluster sits at cosine >= `threshold`.
    * In-shard semantic dups are the batch operator's job (the ingest
    * pipeline runs [[semanticDedup]] on the shard first, then this probe
    * — same composition as the exact/near-dup incremental paths in
    * `Dedup.incrementalExact/incrementalNearDup`).
    *
    * Scale shape: both sides assign in one codegen'd scan (an index that
    * already CARRIES a `centroid` column — the persisted form, since
    * assignments must be stable across batches — is used as-is, never
    * re-assigned); the probe join shuffles on the centroid key only.
    * `pruneIndex = true` restricts the corpus scan to the clusters the
    * shard actually touches: the touched set is collected driver-side
    * (bounded by k, the same O(k) driver contract as the model itself)
    * and becomes a LITERAL isin, so a centroid-partitioned on-disk index
    * prunes at the source (PartitionFilters — proven in IvfSpec). Costs
    * one extra pass over the (small) shard; off by default for in-memory
    * or same-size sides. Returns the admitted (idCol, centroid) rows of
    * the new shard.
    */
  def incrementalSemanticDedup(newDocs: DataFrame, index: DataFrame,
                               idCol: String, vecCol: String,
                               cents: Array[Double], dims: Int,
                               threshold: Double,
                               pruneIndex: Boolean = false): DataFrame = {
    val nw = graft.operators.Ivf.assign(newDocs, vecCol, cents, dims)
      .select(col(idCol), asDouble(col(vecCol)).as("nv"), col("centroid"))
      .withColumn("nn", norm(col("nv")))
    val ixAssigned =
      if (index.columns.contains("centroid")) index
      else graft.operators.Ivf.assign(index, vecCol, cents, dims)
    val ixPruned = if (pruneIndex) {
      val touched = nw.select(col("centroid")).distinct()
        .collect().map(_.getInt(0)).toSeq
      ixAssigned.filter(col("centroid").isin(touched: _*))
    } else ixAssigned
    val ix = ixPruned
      .select(col(idCol).as("xid"), asDouble(col(vecCol)).as("xv"),
        col("centroid"))
      .withColumn("xn", norm(col("xv")))
    val dropped = nw.join(ix, Seq("centroid"))
      .filter(round(dot(col("nv"), col("xv")) / (col("nn") * col("xn")), 6)
        >= threshold)
      .select(col(idCol))
      .distinct()
    nw.select(col(idCol), col("centroid").cast("long").as("centroid"))
      .join(dropped, Seq(idCol), "left_anti")
  }

  /** Shared candidate generation: score every same-bucket pair once.
    * Each vector lands in exactly one bucket, so pairs are already unique
    * (no distinct — it would add a full-width exchange).
    */
  private def bucketedScoredPairs(df: DataFrame, idCol: String, vecCol: String,
                                  planes: Int, dims: Int): DataFrame = {
    val v = df.select(col(idCol),
      asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes, dims))
      .withColumn("nrm", norm(col("v")))
    selfScoredPairs(v, idCol, "bucket")
  }

  /** Bucket-keyed self-join of (key, id, v, nrm) rows scoring cosine per
    * colliding pair — the shared core of [[lshNearDupPairs]] /
    * [[lshNearDupPairsBanded]] / [[semanticDedup]].
    *
    * Round-9 A/B (measured, REJECTED): the dataset-alias self-join that
    * fixed q121/q125 (one canonical child so exchange reuse serves both
    * sides) is a WASH-to-loss here at BOTH sf0.1 (q147 1.08→1.17 s) and
    * 10× (9.75→10.16 s): these operators' cost is the Σ occupancy² pair
    * scoring streamed through the codegen'd dot product, not the
    * bucket/assignment pipeline — recomputing a scan-shaped subtree
    * twice is noise next to the fan-out, and forgoing the planner's
    * small-side broadcast costs more than the duplicated scan saves.
    */
  private def selfScoredPairs(v: DataFrame, idCol: String, key: String): DataFrame = {
    val a = v.select(col(key), col(idCol).as("d1"), col("v").as("v1"), col("nrm").as("n1"))
    val b = v.select(col(key), col(idCol).as("d2"), col("v").as("v2"), col("nrm").as("n2"))
    a.join(b, Seq(key)).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 6).as("cos"))
  }
}
