package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Explicit runtime-filter (bloom) join pruning (SURVEY §2 "Optimize for
  * scale" — no reference counterpart; the pattern is Spark's own AQE
  * `InjectRuntimeFilter`, here as a deterministic operator the planner
  * can't decline).
  *
  * Motivation at 100 TB: a selective dimension predicate (`orders WHERE
  * priority='1-URGENT'`) should keep most of the FACT side from ever
  * entering the join shuffle. A shuffled join materializes and repartitions
  * every fact row first; a bloom filter built from the filtered build side
  * and evaluated scan-local on the fact side drops non-joining rows before
  * the exchange, shrinking shuffle I/O by the filter's selectivity.
  *
  * Design constraints honored here:
  *  - The build is ONE distributed aggregation: distinct bit positions of
  *    the build keys (bounded by `numBits`, default 2^16 → ≤ 8 KiB bitset)
  *    are collected, never the keys themselves — driver memory is O(numBits)
  *    regardless of build-side cardinality.
  *  - The probe is a pure projection over a literal Long-array bitset:
  *    `element_at` + bit test, whole-stage-codegen friendly, no UDF, no
  *    broadcast variable plumbing.
  *  - False positives are harmless: the REAL join follows and removes them,
  *    so results are exactly the plain join's (RuntimeFilterSpec proves
  *    equality; the oracle for q80 is the plain SQL join).
  *  - Hashing is WIDTH-CANONICAL: `xxhash64` hashes an Int and a Long of
  *    the same value differently, while joins compare through implicit
  *    casts — so every entry point resolves its key's type from the
  *    DataFrame and hashes integral keys through `long`. Build and probe
  *    sides therefore agree even when their key widths differ.
  *
  * Spark's AQE bloom injection (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled`) covers the automatic case behind size thresholds; this
  * operator is the explicit form for when the pipeline author KNOWS the
  * build side is selective (and for engines reading these plans where the
  * optimizer cannot see through a checkpoint or an exchange reuse).
  */
object RuntimeFilter {

  private def integral(t: DataType) =
    t == ByteType || t == ShortType || t == IntegerType || t == LongType

  /** The key as hashed: integral types widen to long so mixed-width
    * build/probe pairs hash identically. Resolved against `df`'s schema
    * (a bare Column has no type until resolved).
    */
  private def canon(df: DataFrame, key: Column): Column = {
    val dt = df.select(key).schema.head.dataType
    if (integral(dt)) key.cast("long") else key
  }

  /** k hash positions for a key column: `xxhash64(i, key) mod numBits`.
    * Seeding by prepending the function index makes the k functions
    * independent; xxhash64 is codegen'd and cheap (one pass per row).
    */
  private def positions(key: Column, numBits: Int, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i => pmod(xxhash64(lit(i), key), lit(numBits.toLong)))

  /** Saturation math — the guard rails for the fixed-size default.
    * A 2^16-bit / 3-hash bloom is right for its intended use (a
    * SELECTIVELY-FILTERED dimension, thousands of keys) but saturates on
    * non-selective builds: ~15k distinct keys fill ~50% of the bits
    * (fpp ≈ 12.5%), and at ~65k keys fpp ≈ 86% — the prune becomes a
    * no-op that still pays the build pass. [[bloomBitsSized]] below sizes
    * the bitset from a one-pass cardinality estimate instead of trusting
    * the caller's guess, and refuses loudly when no affordable bitset can
    * make the filter useful.
    */
  /** Projected false-positive rate of an n-key, m-bit, k-hash bloom:
    * (1 − e^(−kn/m))^k.
    */
  def projectedFpp(nKeys: Long, numBits: Int, numHashes: Int): Double =
    math.pow(1 - math.exp(-numHashes.toDouble * nKeys / numBits), numHashes)

  /** Bits needed for `targetFpp` at `nKeys` keys (m = −n·ln p / ln²2),
    * rounded up to a multiple of 64.
    */
  def requiredBits(nKeys: Long, targetFpp: Double): Long = {
    require(targetFpp > 0 && targetFpp < 1, s"targetFpp must be in (0,1), got $targetFpp")
    val m = math.ceil(-nKeys.max(1) * math.log(targetFpp) / (math.log(2) * math.log(2))).toLong
    ((m + 63) / 64) * 64
  }

  /** fpp-optimal hash count for an m-bit, n-key bloom: k = m/n · ln 2. */
  def optimalHashes(numBits: Long, nKeys: Long): Int =
    math.max(1, math.round(numBits.toDouble / nKeys.max(1) * math.log(2)).toInt)

  /** Build a bitset SIZED from the build side's measured cardinality: one
    * `approx_count_distinct` pass picks (numBits, numHashes) for
    * `targetFpp`, clamped at `maxBits` (the driver/plan-literal budget —
    * 2^24 bits = 2 MiB of Longs by default). If even `maxBits` cannot get
    * the projected fpp under `fppCeiling`, the build side is simply not
    * selective enough for a bloom to pay for itself — refuse loudly
    * instead of shipping a saturated filter that prunes nothing and still
    * costs a build pass plus a per-row probe.
    *
    * Cardinality is estimated (±~2%); the 1.1× headroom below keeps the
    * realized fpp near target through that error band. Returns
    * (words, numBits, numHashes) — feed all three to [[prune]] /
    * [[mightContain]].
    */
  def bloomBitsSized(build: DataFrame, key: Column, targetFpp: Double = 0.03,
                     maxBits: Long = 1L << 24,
                     fppCeiling: Double = 0.25): (Array[Long], Int, Int) = {
    val nKeys = math.ceil(
      build.agg(approx_count_distinct(canon(build, key))).head().getLong(0) * 1.1).toLong
    val bits = math.min(requiredBits(nKeys, targetFpp), (maxBits / 64) * 64)
    val hashes = optimalHashes(bits, nKeys)
    val fpp = projectedFpp(nKeys, bits.toInt, hashes)
    require(fpp <= fppCeiling,
      f"bloomBitsSized: ~$nKeys distinct build keys need ${requiredBits(nKeys, targetFpp)} bits " +
        f"for fpp=$targetFpp but maxBits=$maxBits caps projected fpp at $fpp%.3f > ceiling " +
        f"$fppCeiling%.2f — the build side is not selective enough for a runtime filter; " +
        "join directly (or raise maxBits if the plan can afford the literal)")
    (bloomBits(build, key, bits.toInt, hashes), bits.toInt, hashes)
  }

  /** Build the bitset from the build side's keys (integral keys hashed as
    * long — see [[canon]]). Runs one Spark job: explode k positions per
    * row → distinct (≤ numBits values) → collect.
    *
    * The caller owns the size/saturation trade-off here; use
    * [[bloomBitsSized]] when the build cardinality isn't known by
    * construction.
    */
  def bloomBits(build: DataFrame, key: Column, numBits: Int = 1 << 16,
                numHashes: Int = 3): Array[Long] = {
    require(numBits % 64 == 0, s"numBits must be a multiple of 64, got $numBits")
    val words = new Array[Long](numBits / 64)
    // the bitset assembles DISTRIBUTED: positions fold into per-word OR
    // masks (map-side partial, OR is idempotent so no distinct pass), and
    // the driver collects at most numBits/64 (word, mask) rows — a
    // position-row collect at a few million build keys was measured as
    // the operator's bottleneck at 100× (BASELINE.md)
    build
      .select(explode(array(
        positions(canon(build, key), numBits, numHashes): _*)).as("pos"))
      .where(col("pos").isNotNull)
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), col("pos").bitwiseAND(63L).cast("int")).as("b"))
      .groupBy(col("w"))
      .agg(call_function("bit_or", col("b")).as("word"))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Standalone probe-side pruning: keep the rows whose key might be in
    * the bloom. This is the entry point for semi-join-style use without a
    * trailing exact join — it canonicalizes the key like [[bloomBits]]
    * does, so mixed integral widths stay correct. Output may contain
    * false positives (bounded by the bloom's fpp), never false negatives.
    */
  def prune(probe: DataFrame, key: Column, words: Array[Long],
            numBits: Int = 1 << 16, numHashes: Int = 3): DataFrame =
    probe.filter(mightContain(canon(probe, key), words, numBits, numHashes))

  /** Low-level membership probe against a literal bitset: all k bits must
    * be set. The key is hashed AS PASSED — callers with integral keys must
    * pre-cast to long to match [[bloomBits]]'s canonical form (or use
    * [[prune]]/[[bloomPrunedJoin]], which do it from the schema).
    * NULL keys are rejected explicitly (`isNotNull` leads the conjunction)
    * — Spark's `xxhash64` SKIPS null inputs rather than returning null, so
    * without the guard a NULL key would probe the seed-only positions and
    * could pass a well-filled bloom. Matches inner-join semantics where
    * NULL never joins.
    */
  def mightContain(key: Column, words: Array[Long], numBits: Int = 1 << 16,
                   numHashes: Int = 3): Column = {
    val bitsLit = lit(words)
    key.isNotNull && positions(key, numBits, numHashes)
      .map { pos =>
        // word = bits[pos >> 6]; test bit (pos & 63). The shift amount is a
        // column, so this goes through the SQL shiftright (the Scala-API
        // overload only takes a literal Int shift).
        val word = element_at(bitsLit, shiftright(pos, 6).cast("int") + 1)
        call_function("shiftright", word, pos.bitwiseAND(63L).cast("int"))
          .bitwiseAND(1L) === 1L
      }
      .reduce(_ && _)
  }

  /** Bloom-pruned inner equi-join: build a bloom filter from `build`'s
    * keys, pre-filter `probe` scan-local, then run the exact join. The
    * output equals `probe.join(build, probeKey === buildKey)` exactly.
    * Key types must match or both be integral (canonicalized to long for
    * hashing); anything else is rejected loudly rather than silently
    * returning an empty result.
    *
    * The build side is materialized twice (once for the bitset, once for
    * the join) — at scale, cache or checkpoint it if it is expensive to
    * recompute; for the intended use (a selectively-filtered dimension) the
    * rebuild is a cheap pushed-down scan.
    *
    * EAGER: the bitset build (a distributed job + driver collect) runs at
    * CONSTRUCTION time — when this method returns — not when the returned
    * DataFrame is acted on. Plan-only consumers (explain, plan audits,
    * repeated query-map construction) pay a full build-side scan per call,
    * and the bitset snapshots the build side AS OF construction — a build
    * side that changes before the action leaves a stale filter (harmless
    * to correctness only if rows were removed, since the exact join
    * follows; added build rows would be wrongly pruned from the probe).
    * Construct it where you'd `.cache()`: once, at execution time.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
                      probeKey: String, buildKey: String,
                      numBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    checkKeyTypes(probe, build, probeKey, buildKey)
    val words = bloomBits(build, col(buildKey), numBits, numHashes)
    joinPruned(probe, build, probeKey, buildKey, words, numBits, numHashes)
  }

  /** [[bloomPrunedJoin]] with the bitset sized from the build side's
    * measured cardinality ([[bloomBitsSized]] — same eager-construction
    * caveat, plus one `approx_count_distinct` pass). Throws when the build
    * side is too large for any affordable bitset to prune usefully —
    * prefer this entry point whenever the build cardinality is not known
    * small by construction.
    */
  def bloomPrunedJoinSized(probe: DataFrame, build: DataFrame,
                           probeKey: String, buildKey: String,
                           targetFpp: Double = 0.03,
                           maxBits: Long = 1L << 24): DataFrame = {
    checkKeyTypes(probe, build, probeKey, buildKey)
    val (words, bits, hashes) = bloomBitsSized(build, col(buildKey), targetFpp, maxBits)
    joinPruned(probe, build, probeKey, buildKey, words, bits, hashes)
  }

  /** [[bloomPrunedJoinSized]] that DEGRADES to the plain join instead of
    * throwing when the bloom cannot pay — the decision a production
    * operator should make on its own. Two degrade triggers, both measured
    * (BASELINE.md):
    *
    *  - `nKeys > keysCeiling`: the bitset is inlined as `numBits/64`
    *    Literal nodes, so a big build explodes the PLAN, not just driver
    *    memory — at ~3.3 M urgent-order keys (2²⁴ bits, 262 k literals)
    *    the pruned join measured 24–39 s vs 6.4 s for the plain join at
    *    the same scale: the expression tree broke whole-stage codegen and
    *    out-cost any prune. Above the ceiling a build side is also SMJ /
    *    AQE territory (or Spark's own injected runtime bloom filter,
    *    which lives off-plan); the explicit literal bitset is the wrong
    *    tool there no matter how good its fpp looks.
    *  - projected fpp above `fppCeiling`: a saturated bloom is a no-op
    *    prune that still pays the build pass (the fixed-size form
    *    measured exactly that at 100× corpus scale).
    *
    * Output is the plain inner join's in all branches; only the plan
    * differs. Same eager-measurement caveat as the sized form (one
    * `approx_count_distinct` pass at construction).
    */
  /** The number of hash functions the ONE-PASS auto path builds with —
    * fixed, because the bitset is built before the cardinality is known.
    * k=3 is within a few percent of optimal across the whole admissible
    * range (the fold-down below always lands fill near the k·n/m ≈ ln 2
    * regime or better).
    */
  val AutoHashes = 3

  /** Bits needed for `targetFpp` at `nKeys` keys under a FIXED k hashes
    * (the [[AutoHashes]] regime — [[requiredBits]] assumes k is free):
    * solve (1 − e^(−kn/m))^k ≤ p for m.
    */
  def requiredBitsFixedK(nKeys: Long, k: Int, targetFpp: Double): Long = {
    require(targetFpp > 0 && targetFpp < 1, s"targetFpp must be in (0,1), got $targetFpp")
    val m = math.ceil(
      k.toDouble * nKeys.max(1) / -math.log1p(-math.pow(targetFpp, 1.0 / k))).toLong
    ((m + 63) / 64) * 64
  }

  /** Standard bloom fill-based cardinality estimate: n ≈ −(m/k)·ln(1 − X/m)
    * where X is the number of set bits. Accurate to a few percent below
    * ~80% fill; returns Long.MaxValue at saturation (the caller degrades).
    */
  def estimateKeysFromFill(setBits: Long, numBits: Long, k: Int): Long =
    if (setBits >= numBits) Long.MaxValue
    else math.ceil(-(numBits.toDouble / k) *
      math.log1p(-setBits.toDouble / numBits)).toLong

  /** Fold a power-of-two bitset down to `targetBits` (also a power of two
    * dividing the source size): position p's target is p mod targetBits,
    * and because both sizes are multiples of 64, whole words OR together —
    * word i folds onto i mod (targetBits/64). Membership is preserved
    * exactly for every inserted key (positions were h mod 2^a; the folded
    * bit is h mod 2^b with b ≤ a, the same value the probe computes).
    */
  def foldBits(words: Array[Long], targetBits: Int): Array[Long] = {
    require(Integer.bitCount(targetBits) == 1 && targetBits % 64 == 0,
      s"targetBits must be a power of two ≥ 64, got $targetBits")
    val srcW = words.length; val dstW = targetBits / 64
    require(srcW % dstW == 0, s"$targetBits must divide ${srcW * 64L}")
    val out = new Array[Long](dstW)
    var i = 0
    while (i < srcW) { out(i % dstW) |= words(i); i += 1 }
    out
  }

  /** The probe-bitset size the one-pass auto path builds at: a power of
    * two with room for `keysCeiling` keys at the default fpp, so any build
    * the auto path would ACCEPT is sized correctly from one job (2^21 bits
    * = 32 Ki words collected, still driver-trivial).
    */
  val AutoProbeBits: Int = 1 << 21

  /** [[bloomPrunedJoinAuto]]'s decision + sizing in ONE build-side pass
    * (round-9 optimization; the previous form ran TWO eager jobs — an
    * `approx_count_distinct` sizing pass, then the bitset build — and the
    * sizing pass was ~45% of warm construction time at sf0.1). The bitset
    * is built once at [[AutoProbeBits]] (power of two), the build
    * cardinality is estimated from the bitset's fill — the standard
    * n ≈ −(m/k)·ln(1−X/m), exact enough (±few %) everywhere below the
    * saturation the ceilings reject anyway — and the bitset FOLDS DOWN
    * (mod a smaller power of two, membership-preserving) to the smallest
    * size meeting `targetFpp`, so the plan literal stays as small as the
    * two-pass form's. Degrade cases (estimated keys over `keysCeiling`,
    * or projected fpp over `fppCeiling` at the affordable size) return
    * the plain join exactly as before — they now cost one build pass
    * instead of one acd pass, the price of the accept path being one job
    * cheaper. Output is the plain inner join's in all branches.
    */
  def bloomPrunedJoinAuto(probe: DataFrame, build: DataFrame,
                          probeKey: String, buildKey: String,
                          targetFpp: Double = 0.03,
                          maxBits: Long = 1L << 24,
                          fppCeiling: Double = 0.25,
                          keysCeiling: Long = 1L << 17): DataFrame = {
    checkKeyTypes(probe, build, probeKey, buildKey)
    val full = bloomBits(build, col(buildKey), AutoProbeBits, AutoHashes)
    val setBits = full.foldLeft(0L)((a, w) => a + java.lang.Long.bitCount(w))
    val est = estimateKeysFromFill(setBits, AutoProbeBits, AutoHashes)
    val nKeys = if (est == Long.MaxValue) Long.MaxValue
                else math.ceil(est * 1.1).toLong // same headroom as the acd form
    // smallest power of two meeting targetFpp at k=AutoHashes, clamped to
    // [64, AutoProbeBits] (we cannot unfold upward) and to maxBits
    def ceilPow2(x: Long): Long = java.lang.Long.highestOneBit(math.max(64L, x) - 1) << 1
    val bits = if (nKeys == Long.MaxValue) AutoProbeBits else math.min(math.min(
      ceilPow2(requiredBitsFixedK(nKeys, AutoHashes, targetFpp)),
      AutoProbeBits.toLong), java.lang.Long.highestOneBit(maxBits)).toInt
    if (nKeys > keysCeiling ||
        projectedFpp(nKeys, bits, AutoHashes) > fppCeiling)
      probe.join(build, probe(probeKey) === build(buildKey)) // bloom can't pay — plain join
    else
      joinPruned(probe, build, probeKey, buildKey,
        foldBits(full, bits), bits, AutoHashes)
  }

  private def checkKeyTypes(probe: DataFrame, build: DataFrame,
                            probeKey: String, buildKey: String): Unit =
    (probe.schema(probeKey).dataType, build.schema(buildKey).dataType) match {
      case (p, b) if p == b =>
      case (p, b) if integral(p) && integral(b) =>
      case (p, b) => throw new IllegalArgumentException(
        s"bloomPrunedJoin: key types must match or both be integral, " +
          s"got $probeKey: $p vs $buildKey: $b")
    }

  private def joinPruned(probe: DataFrame, build: DataFrame,
                         probeKey: String, buildKey: String,
                         words: Array[Long], numBits: Int, numHashes: Int): DataFrame = {
    // dataframe-qualified join keys: with probeKey == buildKey the bare
    // col(...) form would be ambiguous against the joined plan
    val pruned = prune(probe, col(probeKey), words, numBits, numHashes)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
