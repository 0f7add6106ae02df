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

  /** Build the bitset from the build side's keys (integral keys hashed as
    * long — see [[canon]]). Runs one Spark job: explode k positions per
    * row → distinct (≤ numBits values) → collect.
    */
  def bloomBits(build: DataFrame, key: Column, numBits: Int = 1 << 16,
                numHashes: Int = 3): Array[Long] = {
    require(numBits % 64 == 0, s"numBits must be a multiple of 64, got $numBits")
    val words = new Array[Long](numBits / 64)
    build
      .select(explode(array(
        positions(canon(build, key), numBits, numHashes): _*)).as("pos"))
      .distinct()
      .collect()
      .foreach { r =>
        val pos = r.getLong(0)
        words((pos / 64).toInt) |= 1L << (pos % 64)
      }
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
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
                      probeKey: String, buildKey: String,
                      numBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    (probe.schema(probeKey).dataType, build.schema(buildKey).dataType) match {
      case (p, b) if p == b =>
      case (p, b) if integral(p) && integral(b) =>
      case (p, b) => throw new IllegalArgumentException(
        s"bloomPrunedJoin: key types must match or both be integral, " +
          s"got $probeKey: $p vs $buildKey: $b")
    }
    val words = bloomBits(build, col(buildKey), numBits, numHashes)
    // dataframe-qualified join keys: with probeKey == buildKey the bare
    // col(...) form would be ambiguous against the joined plan
    val pruned = prune(probe, col(probeKey), words, numBits, numHashes)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
