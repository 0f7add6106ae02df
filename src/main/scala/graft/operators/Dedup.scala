package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Mat
import graft.functions.TextFunctions._

/** Corpus deduplication operators for the training-data pipeline:
  * exact (fingerprint groupBy), MinHash+LSH banding, SimHash with
  * pigeonhole-banded Hamming search.
  *
  * All of these scale by construction:
  *  - signatures/fingerprints are per-row HOF expressions (one scan);
  *  - candidate generation shuffles O(k) longs per doc (band keys), never
  *    the text;
  *  - verification joins only the candidate pair set back to the shingle
  *    sets.
  * Skew note: a degenerate corpus (millions of identical docs) makes one
  * band bucket hot; the exact-dedup pass below runs FIRST in a real
  * pipeline precisely to remove that mass before LSH.
  */
object Dedup {

  /** The production-width normalized-text fingerprint — ONE definition
    * shared by [[exactDedup]], [[fingerprints]], and [[incrementalExact]]:
    * the incremental path matches the persisted index byte-for-byte only
    * because both sides compute exactly this expression.
    */
  private def wideFp(textCol: String): Column = md5(trim(lower(col(textCol))))

  /** Exact dedup: keep the smallest id per normalized-text fingerprint.
    * One shuffle (groupBy fp) with map-side partial min; the text itself
    * never shuffles.
    *
    * `wide = true` is the production path: a 128-bit MD5 fingerprint
    * (codegen'd, and identically computable by any engine — the q65 oracle
    * checks it), collision-free for any realistic corpus. The default
    * 30-bit poly hash stays for arithmetic-level oracle portability (q26)
    * and WILL collide at scale — e.g. "az"/"b[" share a 31-multiplier hash
    * (DedupSpec pins both behaviors). Structure is identical either way:
    * only the fingerprint expression and the shuffled key width change.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String,
                 wide: Boolean = false): DataFrame = {
    val fp = if (wide) wideFp(textCol)
             else polyHash(trim(lower(col(textCol))))
    df.select(fp.as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
  }

  /** Pick the (bands, rows) split of a k-entry MinHash signature for a
    * target Jaccard threshold — the standard S-curve design (Mining of
    * Massive Datasets §3.4.3; also how the reference era's dedup configs
    * are tuned by hand). A pair with similarity s collides in at least one
    * band with probability p(s) = 1 − (1 − s^r)^b; among the divisors of
    * k, we pick the (b, r) whose S-curve midpoint (1/b)^(1/r) — the
    * similarity at which p crosses ≈ 1 − 1/e — lands closest to
    * `threshold` in log space (log space because thresholds live on a
    * ratio scale: 0.4 vs 0.5 and 0.8 vs 1.0 are the same-sized miss).
    *
    * Driver-side arithmetic over the O(√k) divisors of k — call it once
    * and pass the result to [[lshCandidatePairs]] / [[nearDupPairs]];
    * nothing here touches data.
    */
  def lshBandsFor(k: Int, threshold: Double): Int = {
    require(k > 0 && threshold > 0 && threshold < 1,
      s"need k > 0 and 0 < threshold < 1, got k=$k threshold=$threshold")
    val candidates = (1 to k).filter(k % _ == 0)
    candidates.minBy { b =>
      val r = k / b
      val midpoint = math.pow(1.0 / b, 1.0 / r)
      math.abs(math.log(midpoint) - math.log(threshold))
    }
  }

  /** id + distinct word-n-gram shingle hashes + k-entry MinHash signature. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame =
    df.select(
      col(idCol),
      shingleHashes(col(textCol), n).as("hashes"))
      .withColumn("sig", minhash(col("hashes"), k))

  /** (id, band, bandKey) rows — one per doc per band, the shared candidate
    * key shape of [[lshCandidatePairs]] and [[lshCandidatePairsSalted]].
    */
  private def bandKeyed(sigs: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must divide into bands=$bands (trailing entries would be silently ignored)")
    val r = k / bands
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"), bandKey(col("sig"), b, r).as("bk"))
    }: _*)
    sigs
      .select(col(idCol), explode(bandStructs).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bk").as("bk"))
  }

  /** LSH candidate pairs: split the signature into `bands` bands of
    * `k/bands` rows, emit (band, bandKey) per doc, self-join on equality.
    * Shuffle payload per doc = `bands` longs. `distinct` collapses pairs
    * that collide in several bands.
    *
    * Skew contract: a bucket of m docs produces its m(m-1)/2 pairs in ONE
    * join task — fine when exact dedup ran first (identical docs, the mass
    * producers of hot buckets, are already gone) and residual buckets are
    * small. For boilerplate-heavy corpora where near-identical-but-not-
    * equal docs still pile 10%+ of a shard into one band bucket, use
    * [[lshCandidatePairsSalted]] — same output, bounded task size.
    */
  def lshCandidatePairs(sigs: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    val keyed = bandKeyed(sigs, idCol, k, bands)
    val a = keyed.select(col("band"), col("bk"), col(idCol).as("d1"))
    val b = keyed.select(col("band"), col("bk"), col(idCol).as("d2"))
    a.join(b, Seq("band", "bk")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
  }

  /** [[lshCandidatePairs]] with hot buckets spread by the shared salted
    * cell engine ([[SaltedCells.pairs]], (band, bk) as the key) —
    * identical pair output, per-task pair work bounded by
    * hotBucketThreshold² for buckets of ANY size. Only (band, bk, id)
    * rows enter the engine, so signatures and text never shuffle here;
    * the terminal distinct collapses pairs colliding in several bands
    * (the engine is exactly-once PER BAND).
    */
  def lshCandidatePairsSalted(sigs: DataFrame, idCol: String, k: Int, bands: Int,
                              hotBucketThreshold: Int = 4096): DataFrame = {
    require(hotBucketThreshold > 1,
      s"hotBucketThreshold must exceed 1, got $hotBucketThreshold")
    SaltedCells.pairs(bandKeyed(sigs, idCol, k, bands), Seq("band", "bk"),
        idCol, hotBucketThreshold)
      .select(col(s"${idCol}_1").as("d1"), col(s"${idCol}_2").as("d2"))
      .distinct()
  }

  /** Full near-dup pipeline: LSH candidates verified with exact Jaccard
    * over the distinct shingle-hash sets, kept at `jacc >= threshold`.
    * Only candidate pairs (a tiny fraction of n²) ever join back to the
    * shingle arrays. `hotBucketThreshold` (finite) routes candidate
    * generation through [[lshCandidatePairsSalted]] for boilerplate-heavy
    * corpora; the default plain path assumes exact dedup ran first.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, k: Int, bands: Int, threshold: Double,
                   hotBucketThreshold: Option[Int] = None): DataFrame = {
    // signature pipeline referenced 3× (band keys + both hash-array
    // attaches) under different keys — materialized once (round-9;
    // position-balanced A/B: q28 0.55→0.46 s, q85 1.23→0.95 s at sf0.1;
    // `-Dgraft.mh.materialize=false` restores recompute)
    val sigs0 = minhashSignatures(df, idCol, textCol, n, k)
    val sigs = graft.core.Mat.checkpoint(sigs0, "neardup_sigs",
      sys.props.get("graft.mh.materialize").forall(_.toBoolean))
    val cand = hotBucketThreshold match {
      case Some(t) => lshCandidatePairsSalted(sigs, idCol, k, bands, t)
      case None    => lshCandidatePairs(sigs, idCol, k, bands)
    }
    val sets = sigs.select(col(idCol), col("hashes"))
    val inter = size(array_intersect(col("h1"), col("h2"))).cast("double")
    val union = (size(col("h1")) + size(col("h2"))).cast("double") - inter
    cand
      .join(sets.select(col(idCol).as("d1"), col("hashes").as("h1")), "d1")
      .join(sets.select(col(idCol).as("d2"), col("hashes").as("h2")), "d2")
      .select(col("d1"), col("d2"), round(inter / union, 6).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** Incremental exact dedup: survivors of a NEW batch against a
    * persisted fingerprint index — the continuous-ingest form of
    * [[exactDedup]]. A growing corpus cannot rescan itself per shard; it
    * keeps an index of fingerprints already admitted and dedups each new
    * batch as (a) in-batch keep-min-id, then (b) anti-join against the
    * index.
    *
    * Shuffle shape: only (fp, id) pairs — 16 + 8 bytes — ever cross an
    * exchange (the keep-min-id aggregate and the index anti-join); the
    * shard's full rows never shuffle, because the admitted ID SET joins
    * back as a broadcast semi-join. The id set is O(one shard), which is
    * the bounded ingest unit by definition; the index side is
    * O(corpus fingerprints) and shuffles or broadcasts as the optimizer
    * sizes it. NULL-text rows carry a NULL fingerprint, which matches
    * nothing in the index; within the batch, ALL NULL-fp rows share one
    * NULL group in the aggregate, so the min-id one is admitted — matching
    * both [[exactDedup]]'s groupBy semantics and the q84 oracle's
    * NOT EXISTS.
    *
    * `index`: one column `fp` (as produced by [[fingerprints]]). Returns
    * the admitted rows of `newDocs` (full rows, `fp` attached) — append
    * their `fp` to the index to admit the next shard.
    */
  def incrementalExact(newDocs: DataFrame, index: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val withFp = newDocs.withColumn("fp", wideFp(textCol))
    val admittedIds = withFp
      .select(col("fp"), col(idCol))
      .groupBy(col("fp")).agg(min(col(idCol)).as(idCol)) // in-batch keep-min-id
      .join(index, Seq("fp"), "left_anti")               // not already admitted
      .select(col(idCol))
    withFp.join(broadcast(admittedIds), Seq(idCol), "left_semi")
  }

  /** The fingerprint index rows for a batch of admitted docs (wide MD5 —
    * the production width; see [[exactDedup]]'s contrast).
    */
  def fingerprints(docs: DataFrame, textCol: String): DataFrame =
    docs.select(wideFp(textCol).as("fp"))

  /** Snapshot diff between two corpus versions — the dataset-versioning
    * primitive ("what changed between yesterday's build and today's"):
    * every id present in either snapshot gets a status in {added,
    * removed, changed, unchanged}, decided by the wide MD5 fingerprint
    * of NORMALIZED text (trim + lower — [[exactDedup]]'s equality, so a
    * whitespace/case-only rewrite counts as unchanged, deliberately).
    *
    * Scale shape: each side reduces to (id, 128-bit fp) scan-locally,
    * ONE id-keyed full-outer join decides everything — text never
    * shuffles, and the output is id + a status string. Ids must be
    * unique within each snapshot (the corpus-table contract everywhere
    * else in this module).
    *
    * NULL text is IN-DOMAIN (the decontamination ops' contract): its
    * fingerprint is NULL, so presence is decided by explicit per-side
    * markers carried through the join — not fingerprint nullness — and
    * the changed/unchanged comparison is null-safe (`<=>`): a NULL-text
    * row present in both snapshots is `unchanged`, one that gained or
    * lost its text is `changed`.
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    for (c <- Seq("__fp_old", "__fp_new", "__in_old", "__in_new", "status"))
      require(idCol != c,
        s"snapshotDiff: column name '$c' is reserved by the operator")
    val o = oldDocs.select(col(idCol), lit(1).as("__in_old"),
      wideFp(textCol).as("__fp_old"))
    val n = newDocs.select(col(idCol), lit(1).as("__in_new"),
      wideFp(textCol).as("__fp_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__fp_old") <=> col("__fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Incremental NEAR dedup: drop new docs that are near-duplicates of
    * ALREADY-ADMITTED docs, using a persisted signature index — the
    * continuous-ingest form of [[nearDupPairs]].
    *
    * `indexSigs` is [[minhashSignatures]] output persisted from previous
    * shards (idCol, hashes, sig). Candidates = new docs sharing any LSH
    * band with an index doc (band keys only in the shuffle, exactly like
    * the batch form); verification = exact Jaccard on the stored distinct
    * shingle-hash sets, dropped at `jacc >= threshold`. In-batch near-dups
    * are NOT resolved here — run [[nearDupPairs]] + [[duplicateClusters]]
    * on the survivors (the batch recap), or admit shards small enough
    * that in-shard duplication is handled by the next index rebuild.
    * Returns the surviving rows of `newDocs`.
    */
  def incrementalNearDup(newDocs: DataFrame, indexSigs: DataFrame,
                         idCol: String, textCol: String,
                         n: Int, k: Int, bands: Int,
                         threshold: Double): DataFrame = {
    val dropped = incrementalNearDupPairs(newDocs, indexSigs, idCol, textCol,
        n, k, bands, threshold)
      .select(col("nid").as(idCol)).distinct()
    newDocs.join(dropped, Seq(idCol), "left_anti")
  }

  /** Verified shard-vs-index near-dup MATCH PAIRS (nid, xid) — the shared
    * probe behind [[incrementalNearDup]] (admission: any match drops nid)
    * and [[incrementalClusterSplit]] (label adoption: nid inherits the
    * minimum matched cluster). Band join carries IDS ONLY (O(bands) longs
    * per doc, the module invariant); multi-band collisions collapse to
    * distinct pairs BEFORE the shingle-hash arrays join back for
    * verification — near-dup pairs are exactly the ones matching many
    * bands, so verifying per band would multiply the most expensive
    * Jaccards.
    */
  def incrementalNearDupPairs(newDocs: DataFrame, indexSigs: DataFrame,
                              idCol: String, textCol: String,
                              n: Int, k: Int, bands: Int,
                              threshold: Double): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must divide into bands=$bands")
    val r = k / bands
    def bandKeys(sigs: DataFrame, side: String) = {
      val bandStructs = array((0 until bands).map { b =>
        struct(lit(b).as("band"), bandKey(col("sig"), b, r).as("bk"))
      }: _*)
      sigs.select(col(idCol).as(side), explode(bandStructs).as("bb"))
        .select(col(side), col("bb.band").as("band"), col("bb.bk").as("bk"))
    }
    // NOT materialized (round-9, measured TWICE; round-10 re-measured
    // under LAZY checkpointing): the shard pipeline is referenced twice
    // (band keys + hash-array attach), and a localCheckpoint first looked
    // like a win under the original fixed-order A/B harness (q86
    // 0.91→0.85 s, q158 2.17→1.69 s) — but that harness had a systematic
    // warm-slot bias toward its second variant (exposed by a no-op
    // control; see ProbeAb), and the POSITION-BALANCED rerun shows the
    // checkpoint as a slight LOSS (q86 0.41→0.46 s, q158 0.90→0.91 s over
    // 10 passes): a shard is bounded by the ingest unit, so its pipeline
    // recompute is cheaper than the materialization. The round-10 lazy
    // default (Mat.checkpoint eager=false) removed the barrier cost, so
    // the decision was RE-QUALIFIED under lazy: still a WASH (balanced
    // A/B, 10 passes: q86 0.72 vs 0.72 s, q158 1.65 vs 1.61 s), so the
    // toggle default stays OFF — recompute keeps the shard pipeline
    // scan-shaped with nothing to win from storing the blocks.
    // Contrast [[nearDupPairs]], whose
    // CORPUS-sized 3-reference pipeline does pay (balanced A/B
    // q28 0.55→0.46 s, q85 1.23→0.95 s).
    val newSigs = Mat.checkpoint(
      minhashSignatures(newDocs, idCol, textCol, n, k), "incr_sigs",
      sys.props.get("graft.incr.materialize").exists(_.toBoolean))
    val cand = bandKeys(newSigs, "nid")
      .join(bandKeys(indexSigs, "xid"), Seq("band", "bk"))
      .select(col("nid"), col("xid")).distinct()
    val inter = size(array_intersect(col("h_nid"), col("h_xid"))).cast("double")
    val union = (size(col("h_nid")) + size(col("h_xid"))).cast("double") - inter
    cand
      .join(newSigs.select(col(idCol).as("nid"), col("hashes").as("h_nid")), "nid")
      .join(indexSigs.select(col(idCol).as("xid"), col("hashes").as("h_xid")), "xid")
      .filter(round(inter / union, 6) >= threshold)
      .select(col("nid"), col("xid"))
  }

  /** Incremental [[clusterSafeSplit]] (continuous ingest): each new doc
    * adopts the split of its near-dup cluster in the ADMITTED corpus —
    * probe the persisted signature index for verified matches, inherit
    * the MINIMUM matched label from the persisted `labels`
    * (idCol, cluster) table, fall back to a self-labeled singleton.
    *
    * History is immutable by design: if a new doc BRIDGES two existing
    * clusters, it adopts the smaller label and leaves `bridged = 1` —
    * already-routed docs cannot move splits, so the merge is reconciled
    * at the periodic batch recap (re-run [[clusterSafeSplit]] over the
    * admitted corpus), the same lambda contract the streaming near-dedup
    * documents. Until the recap, a bridged doc's own assignment is still
    * leak-safe for ITS members (it sits with the adopted cluster); the
    * recap decides the merged cluster's final home.
    *
    * Returns (idCol, cluster, split, bridged) for every new doc.
    */
  def incrementalClusterSplit(newDocs: DataFrame, indexSigs: DataFrame,
                              labels: DataFrame, idCol: String, textCol: String,
                              n: Int, k: Int, bands: Int, threshold: Double,
                              buckets: Int): DataFrame = {
    require(buckets >= 1,
      s"incrementalClusterSplit: buckets must be >= 1, got $buckets")
    for (c <- Seq("cluster", "split", "bridged", "__adopt", "__nc", "xid", "nid"))
      require(idCol != c,
        s"incrementalClusterSplit: column name '$c' is reserved by the operator")
    val adopted = incrementalNearDupPairs(newDocs, indexSigs, idCol, textCol,
        n, k, bands, threshold)
      .join(labels.select(col(idCol).as("xid"), col("cluster")), "xid")
      .groupBy(col("nid"))
      .agg(min(col("cluster")).as("__adopt"),
        countDistinct(col("cluster")).as("__nc"))
      .withColumnRenamed("nid", idCol)
    newDocs.select(col(idCol))
      .join(adopted, Seq(idCol), "left_outer")
      .withColumn("cluster", coalesce(col("__adopt"), col(idCol)))
      .withColumn("split",
        pmod(polyHash(concat(lit("split|"), col("cluster").cast("string"))),
          lit(buckets.toLong)))
      .withColumn("bridged", (coalesce(col("__nc"), lit(1L)) > 1).cast("long"))
      .select(col(idCol), col("cluster"), col("split"), col("bridged"))
  }

  /** Duplicate-cluster resolution: connected components over the near-dup
    * pair graph by iterative min-label propagation — the correct keep rule
    * at scale (keep ONE doc per component; pairwise d2-dropping can drop
    * transitive members whose only witness was itself dropped).
    *
    * Pure DataFrame iteration to FIXPOINT: each round joins current labels
    * across edges and takes the min (one hop per round), stopping when no
    * label changed — so arbitrary-diameter chains (real at 100 TB:
    * boilerplate near-dup chains) resolve correctly, not just the
    * near-clique common case. `maxIter` is a runaway cap, not a tuning
    * knob — but note a graph whose diameter EXCEEDS the cap returns
    * silently-unconverged labels (a 64-node chain under the default 50
    * splits into two clusters); [[duplicateClustersStar]] converges in
    * O(log n) rounds, far inside any sane cap, and is the production
    * path. The per-round convergence probe here is a scalar label-sum
    * check (see below).
    *
    * Each round `localCheckpoint`s its labels: every iteration references
    * the previous labels twice (propagation + convergence probe), so an
    * un-truncated lineage doubles per round — O(2^rounds) plan nodes, a
    * driver OOM by round ~10. Checkpointing pins the O(V) label rows as
    * RDD blocks and restarts the plan, the standard shape for iterative
    * DataFrame graph algorithms (a production run on unreliable executors
    * would use `checkpoint()` to a reliable store instead). Returns
    * (doc_id, cluster) for every vertex in `pairs`.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    minLabelClustersWithRounds(pairs, maxIter)._1

  /** [[duplicateClusters]] exposing its round count (for the scaling table
    * in BASELINE.md — rounds are the driver-synchronous cost).
    */
  def minLabelClustersWithRounds(pairs: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    val edges = pairs.select(col("d1"), col("d2"))
      .union(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .distinct().cache()
    var labels = edges.select(col("d1").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id"))
      .localCheckpoint(graft.core.Mat.eager)
    // convergence probe: min-propagation only ever DECREASES labels, so the
    // label sum is strictly monotone until fixpoint — "sum unchanged" is an
    // exact convergence test costing one scalar aggregation per round
    // (cheaper than the labels⋈next changed-row join it replaces).
    // decimal(38,0): a Long sum overflows at production id ranges.
    // Empty label set (a pair-free graph — normal for a clean corpus) sums
    // to SQL NULL; treat it as zero so the loop converges immediately
    // instead of NPE-ing on the comparison.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("cluster").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("doc_id", "d2"), "d2")
        .select(col("d1").as("doc_id"), col("cluster"))
      val next = labels.union(viaNeighbor)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster")).as("cluster"))
        .localCheckpoint(graft.core.Mat.eager)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    edges.unpersist()
    (labels, iter)
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the O(log n)-round replacement for
    * [[duplicateClusters]]' one-hop min-label propagation, whose round
    * count is O(diameter): real boilerplate near-dup chains at 100 TB have
    * diameters in the hundreds, and every round is a driver-synchronous
    * barrier, so the ROUND COUNT is the wall-clock at scale (each round
    * here does strictly more work — two shuffles, not one — and still wins
    * once the diameter beats a few dozen; DedupSpec measures 10 vs 3
    * rounds on a 64-node chain).
    *
    *  - large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u),
    *    v > u — hooks every larger neighbor onto the local minimum,
    *    halving long paths (the doubling step);
    *  - small-star(u): m = min of u's SMALLER neighbors; re-point u and
    *    all of them at m — flattens the partial trees into stars.
    *
    * Both steps keep edges canonically (hi > lo) oriented and are pure
    * groupBy-min + join (per-node neighborhood mins — key-partitioned,
    * no driver state); the fixpoint is "edge set unchanged", checked with
    * one anti-join count per round. At fixpoint the edge set IS the answer:
    * (v, component-min) stars. Labels match [[duplicateClusters]] exactly
    * (component min as cluster id), so the two are interchangeable —
    * CorpusPipeline resolves its duplicate graphs through this one.
    *
    * Skew note: a mega-component's hub node concentrates its neighborhood
    * into one groupBy key; alternation keeps intermediate degrees bounded
    * by star-collapse (the paper's argument), and the per-round payload is
    * two longs per edge — no text, no signatures.
    */
  def duplicateClustersStar(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    starClustersWithRounds(pairs, maxIter)._1

  /** [[duplicateClustersStar]] exposing its round count. */
  def starClustersWithRounds(pairs: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    // canonical undirected edges: hi > lo, self-loops dropped
    val init = pairs
      .select(greatest(col("d1"), col("d2")).as("hi"),
        least(col("d1"), col("d2")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct()
      .localCheckpoint(graft.core.Mat.eager)
    val vertices = init.select(col("hi").as("doc_id"))
      .union(init.select(col("lo").as("doc_id"))).distinct()

    // large-star: per node u over the FULL neighborhood (both directions),
    // attach strictly-larger neighbors to m = min(Γ(u) ∪ {u}). Emitted
    // edges (v, m) satisfy v > u ≥ m, so canonical orientation holds.
    def largeStar(e: DataFrame): DataFrame = {
      val und = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = und.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      und.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
    }

    // small-star: per node u (= hi side), m = min of its smaller
    // neighbors; re-point u and each smaller neighbor at m. lo > m for
    // every emitted (lo, m) edge since m is the neighborhood min.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val withM = e.join(mins, "hi")
      val nbr = withM.filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
      val self = mins.select(col("hi"), col("m").as("lo"))
      nbr.union(self).distinct()
    }

    var e = init
    var converged = e.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(graft.core.Mat.eager)
      // exact fixpoint test: both sides are distinct canonical sets, so
      // equal count + empty one-sided anti-join ⇒ set equality
      converged = next.count() == e.count() &&
        next.join(e, Seq("hi", "lo"), "left_anti").isEmpty
      e = next
      iter += 1
    }
    // at fixpoint e is (member, component-min); centers label themselves
    val labels = vertices
      .join(e.select(col("hi").as("doc_id"), col("lo").as("cluster")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
    (labels, iter)
  }

  /** Per-doc SimHash over distinct token hashes (a token is a 1-shingle,
    * so the native one-pass shingle hasher feeds the native simhash).
    */
  def simhashOf(df: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame =
    df.select(
      col(idCol),
      simhash(shingleHashes(col(textCol), 1), bits).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, found by
    * pigeonhole banding: the `bits`-wide hash is split into
    * `maxHamming + 1` blocks — any pair within distance maxHamming must
    * agree on at least one whole block, so an equality self-join per block
    * finds every qualifying pair (no recall loss), then the exact Hamming
    * filter removes false candidates. Same output as the O(n²) scan the
    * oracle runs, at O(n · blocks) shuffle cost.
    *
    * Pairs colliding in SEVERAL blocks are deduplicated by the
    * first-matching-block rule: a pair is kept only where no earlier
    * block also matches — a scan-local filter on the two signatures,
    * instead of a `distinct()` that re-shuffles the whole candidate-pair
    * set (at 100 TB the pair set is the largest intermediate; probed
    * 1.95 s → 0.69 s at sf0.1).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bits: Int, maxHamming: Int): DataFrame =
    hammingPairs(simhashOf(df, idCol, textCol, bits),
      idCol, "simhash", bits, maxHamming)

  /** The pigeonhole-banded Hamming self-join over ANY precomputed
    * `bits`-wide hash column — the engine behind [[simhashPairs]] and
    * the image perceptual-hash dedup
    * ([[graft.operators.Multimodal.imageNearDupPairs]]). See
    * [[simhashPairs]] for the recall argument (block equality is
    * complete for distance <= maxHamming) and the first-matching-block
    * dedup rule (scan-local, no candidate-set re-shuffle).
    */
  def hammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
                   bits: Int, maxHamming: Int): DataFrame = {
    val blocks = maxHamming + 1
    val w = bits / blocks // bits must divide evenly for full coverage
    require(w * blocks == bits, s"bits=$bits not divisible into $blocks blocks")
    def blockOf(c: Column, j: Int) =
      shiftright(c, j * w).bitwiseAND((1L << w) - 1)
    val blockStructs = array((0 until blocks).map { j =>
      struct(lit(j).as("blk"), blockOf(col(hashCol), j).as("bv"))
    }: _*)
    val keyed = hashes.select(col(idCol), col(hashCol), explode(blockStructs).as("bb"))
      .select(col(idCol), col(hashCol), col("bb.blk").as("blk"), col("bb.bv").as("bv"))
    val a = keyed.select(col("blk"), col("bv"), col(idCol).as("d1"), col(hashCol).as("s1"))
    val b = keyed.select(col("blk"), col("bv"), col(idCol).as("d2"), col(hashCol).as("s2"))
    // keep the pair only at its FIRST matching block: for every i < blk
    // the i-th blocks must differ (computable from s1/s2 alone)
    val firstMatch = (0 until blocks).map { i =>
      (col("blk") <= i) || (blockOf(col("s1"), i) =!= blockOf(col("s2"), i))
    }.reduce(_ && _)
    // shuffle_hash pinned: in a SELF-join both sides are corpus-sized,
    // so the static planner's broadcast pick (its estimate does not
    // survive the Generate explode) is never right at scale — and with
    // BOTH sides shuffled on (blk, bv) over the same child plan,
    // runtime exchange reuse computes the hash pipeline ONCE where a
    // broadcast build recomputes it (decode is the expensive stage for
    // image hashes). AQE still demotes to broadcast when genuinely tiny.
    a.join(b.hint("shuffle_hash"), Seq("blk", "bv"))
      .filter(col("d1") < col("d2"))
      .filter(firstMatch)
      .select(col("d1"), col("d2"), hamming(col("s1"), col("s2")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** [[incrementalExact]] with a bloom fast path over the persisted index
    * — the continuous-ingest geometry that matters at 100 TB: the
    * fingerprint index is corpus-sized, but a typical shard is mostly
    * NOVEL text, and a bloom filter of the index proves novelty
    * scan-locally. Bloom-negative fingerprints are admitted without
    * touching the index; only the bloom-positive minority anti-joins the
    * index, where false positives die — the result is EXACTLY
    * [[incrementalExact]]'s (DedupSpec pins it, including under a
    * deliberately saturated bloom, where every fp degrades to the plain
    * anti-join path).
    *
    * `indexBloom` is the O(numBits) bitset over the index fps
    * ([[RuntimeFilter.bloomBits]]). Build it when the index is
    * (re)written and maintain it incrementally — admitted fps OR into the
    * bitset — rather than per shard; size per
    * [[RuntimeFilter.requiredBits]] (10⁹ fps at 1% fpp ≈ 1.2 GB — an
    * executor broadcast, not driver state).
    *
    * Scale shape: at false-positive rate ε and novel fraction ν the
    * anti-join's shard side shrinks to (1−ν) + νε of the batch, and with
    * the index bucketed by fp the join prunes to matching buckets. The
    * shard's (fp, id) aggregate is planned under both branches (union) —
    * exchange reuse collapses it at runtime. NULL-fp rows probe negative
    * and take the novel path, preserving the min-id-per-NULL-group rule.
    */
  def incrementalExactBloomed(newDocs: DataFrame, index: DataFrame,
                              indexBloom: Array[Long], numBits: Int,
                              idCol: String, textCol: String,
                              numHashes: Int = 3): DataFrame = {
    val withFp = newDocs.withColumn("fp", wideFp(textCol))
    val first = withFp.select(col("fp"), col(idCol))
      .groupBy(col("fp")).agg(min(col(idCol)).as(idCol))
    val maybe = RuntimeFilter.mightContain(col("fp"), indexBloom, numBits, numHashes)
    val novel = first.filter(!maybe) // definite: no index I/O for these
    val confirmed = first.filter(maybe).join(index, Seq("fp"), "left_anti")
    val admittedIds = novel.unionByName(confirmed).select(col(idCol))
    withFp.join(broadcast(admittedIds), Seq(idCol), "left_semi")
  }

  /** Resolve duplicate clusters by QUALITY — the production keep rule
    * (keep the best member of each near-dup cluster, not the lowest id,
    * which is what RefinedWeb/Gopher-style pipelines actually do): label
    * components with [[duplicateClustersStar]], attach each member's
    * quality score, and mark per cluster the single keeper — highest
    * quality, ties toward the lower id. Returns every clustered doc as
    * (idCol, cluster, qualityCol, keep 0|1); unclustered docs are implied
    * keepers and never enter the component machinery.
    *
    * Scale shape: components cost O(log n) star rounds over edges only;
    * the score attach is an id-key join of (id, double) pairs; the keeper
    * mark is one window over the cluster key. Ids, labels and doubles
    * shuffle — never text.
    */
  def resolveClustersByQuality(pairs: DataFrame, scores: DataFrame,
                               idCol: String, qualityCol: String): DataFrame = {
    val labels = duplicateClustersStar(pairs).withColumnRenamed("doc_id", idCol)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    labels.join(scores, Seq(idCol))
      .withColumn("keep", (row_number().over(w) === 1).cast("long"))
      .select(col(idCol), col("cluster"), col(qualityCol), col("keep"))
  }

  /** Leakage-free train/val/test split: assign every doc a split bucket
    * by hashing its DUPLICATE-CLUSTER label, not its id — members of a
    * near-dup cluster land in the same split BY CONSTRUCTION, so a
    * near-duplicate of a validation doc can never sit in train (the
    * split-leakage failure mode per-doc hashing has, and the reason
    * dedup-then-split orderings still leak when dedup keeps one member
    * per cluster but the split hashes survivors independently of their
    * dropped twins' history). Unclustered docs are their own singleton
    * cluster (label = id).
    *
    * Returns (idCol, cluster, split) with split in [0, buckets) — the
    * caller maps buckets to splits (e.g. 0–7 train / 8 val / 9 test).
    * Deterministic end-to-end: the near-dup edges, the min-label
    * components, and the portable split hash all replay on any engine.
    *
    * Scale shape: edges from the LSH pipeline (narrow keys, text never
    * shuffles); components cost the min-label fixpoint's O(diameter)
    * rounds over (id, label) longs; the split is scan-local arithmetic
    * on the label. The singleton fill is one id-key left join.
    */
  def clusterSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, k: Int, bands: Int, threshold: Double,
                       buckets: Int): DataFrame = {
    require(buckets >= 1, s"clusterSafeSplit: buckets must be >= 1, got $buckets")
    val pairs = nearDupPairs(docs, idCol, textCol, n, k, bands, threshold)
      .select(col("d1"), col("d2"))
    splitByPairs(docs, pairs, idCol, buckets, "clusterSafeSplit")
  }

  /** [[clusterSafeSplit]] with EXACT near-dup edges — the audit-grade
    * form: the LSH form's leakage-freedom is only as strong as its
    * candidate RECALL, and a true related pair its bands MISS is exactly
    * a pair that can straddle train and val. Measured (ScaleBench
    * split-leakage cell, BASELINE.md round-7 rows): the lshBandsFor
    * geometry at J ≥ 0.3 showed 0.000 leak over 256 exact pairs at
    * sf0.1 — corpus luck — and REAL 0.001 leak over 2560 pairs a decade
    * up: true related pairs whose bands never collided, split across
    * train and val. Only THIS form guarantees zero structurally, at
    * every scale. Here the edge set is the
    * prefix-filtered exact set-similarity self-join
    * ([[SetSim.jaccardSelfJoinSets]] over distinct word-n-gram shingle
    * sets, threshold the exact rational tNum/tDen), so EVERY true pair
    * clusters — at the exact join's measured-linear (but larger)
    * candidate cost. Use this to cut the splits that define evals; the
    * LSH form for bulk assignment where a measured miss rate is
    * acceptable.
    */
  def clusterSafeSplitExact(docs: DataFrame, idCol: String, textCol: String,
                            n: Int, tNum: Int, tDen: Int,
                            buckets: Int): DataFrame = {
    require(buckets >= 1,
      s"clusterSafeSplitExact: buckets must be >= 1, got $buckets")
    val sets = docs.select(col(idCol),
        array_distinct(shingleHashes(col(textCol), n)).as("hs"))
      .filter(size(col("hs")) >= 1)
    val pairs = SetSim.jaccardSelfJoinSets(sets, idCol, "hs", tNum, tDen)
      .select(col("d1"), col("d2"))
    splitByPairs(docs, pairs, idCol, buckets, "clusterSafeSplitExact")
  }

  /** Shared split tail: components over the given edge set, singleton
    * fill, portable split hash of the CLUSTER label.
    */
  private def splitByPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                           buckets: Int, op: String): DataFrame = {
    for (c <- Seq("cluster", "split"))
      require(idCol != c, s"$op: column name '$c' is reserved by the operator")
    val labeled = duplicateClusters(pairs).withColumnRenamed("doc_id", idCol)
    docs.select(col(idCol))
      .join(labeled, Seq(idCol), "left_outer")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .withColumn("split",
        pmod(polyHash(concat(lit("split|"), col("cluster").cast("string"))),
          lit(buckets.toLong)))
  }

  /** Content-defined chunking (FastCDC-style, at token granularity): a
    * chunk boundary falls BEFORE token i whenever the content hash of the
    * two-token window lands on the cut mask — poly_hash(prev‿'_'‿tok) ≡ 0
    * (mod avgChunk) — so boundaries move WITH the content. An edit near a
    * document's head re-chunks only its own neighborhood and every chunk
    * downstream keeps its fingerprint, which is the property fixed-width
    * chunking lacks and the reason storage/corpus dedup systems chunk this
    * way. Expected chunk length ≈ avgChunk tokens.
    *
    * Returns one row per chunk: (idCol, chunk, fp, n_toks), fp the
    * portable poly hash of the space-joined chunk content (q88's 'x'-
    * prefix convention so the empty chunk hashes nonzero). Empty docs
    * yield no chunks.
    *
    * Scale shape: ZERO shuffles — boundaries depend only on a document's
    * own token adjacency, so the whole chunker is per-row HOF arithmetic
    * (cut positions → start/end zip → sliced joins) and an explode; the
    * text never leaves its scan partition, and this works unchanged on a
    * stream (stateless, like CorpusPipeline.chunk). Downstream dedup then
    * shuffles fp LONGS, never content.
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                avgChunk: Int = 8): DataFrame = {
    require(avgChunk > 1, s"avgChunk must exceed 1, got $avgChunk")
    val toks = col("__toks")
    val n = size(toks)
    // 0-based positions where a new chunk starts: the two-token window
    // hash lands on the cut mask (guarded: sequence(1, 0) would DESCEND)
    val cuts = when(n >= 2,
      filter(sequence(lit(1), n - 1), i =>
        pmod(polyHash(concat(element_at(toks, i), lit("_"),
          element_at(toks, i + 1))), lit(avgChunk)) === 0))
      .otherwise(array().cast("array<int>"))
    val contents = zip_with(
      concat(array(lit(0)), col("__cuts")),
      concat(col("__cuts"), array(n)),
      (s, e) => array_join(slice(toks, s + 1, e - s), " "))
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .where(n > 0)
      .withColumn("__cuts", cuts)
      .select(col(idCol), posexplode(contents).as(Seq("chunk", "content")))
      .select(col(idCol), col("chunk").cast("long").as("chunk"),
        polyHash(concat(lit("x"), col("content"))).as("fp"),
        size(tokens(col("content"))).cast("long").as("n_toks"))
  }
}
