package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text/hash column builders.
  *
  * Everything here is built from Spark's native higher-order functions
  * (`transform`/`aggregate`/`filter`/`zip_with`), so the expressions are
  * Catalyst-native (no Scala UDF serialization, null-safety for free, and
  * the surrounding plan stays in whole-stage codegen). Each formula is
  * deliberately *portable*: the DuckDB oracle replicates it operation for
  * operation, so hash values compare bit-for-bit across engines.
  *
  * Scale notes: all of these are per-row, shuffle-free, and columnar-input
  * friendly — at 100 TB they cost one scan, no exchange.
  *
  * Reference analogue: the one true custom function of the reference system
  * is the IK tokenizer UDTF (…/app/func/KeywordUDTF.java:13-20,
  * …/utils/KeywordUtil.java:15-30); `tokens` + `explode` is its Spark shape
  * (SURVEY.md §2.4 X2).
  */
object TextFunctions {

  /** Prime modulus for the portable polynomial hash. Chosen < 2^30 so that
    * `h*31 + a` (< 2^35) and `a_i*h + b_i` (< 2^60) stay well inside Long.
    */
  val HashMod: Long = 1000000007L

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Portable polynomial string hash: fold over characters of
    * `h = (h*31 + codepoint) mod HashMod`. Expressible as a left-fold in
    * any SQL engine with lambda support (DuckDB: `list_reduce`), which is
    * exactly what the oracles do. The engine-side implementation is the
    * native codegen expression `plans.PolyHash` (byte-walking, no per-char
    * allocation); `polyHashHof` below is the reference formulation the
    * spec proves equal.
    */
  def polyHash(text: Column): Column =
    graft.plans.GraftFunctions.poly_hash(text)

  /** HOF reference implementation of [[polyHash]] (oracle-parity spec). */
  def polyHashHof(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, a) => pmod(h * 31 + a, lit(HashMod)))

  /** Hash each element of a string array. */
  def hashAll(arr: Column): Column = transform(arr, polyHash(_))

  /** The engine's document quality score: unique-token ratio discounted by
    * stopword ratio, rounded to 6 decimals for cross-engine stability.
    * ONE definition shared by q23/q79, CorpusPipeline's quality gate, and
    * packageStage's cap ordering — a tweak here moves all of them
    * together (the oracles replicate the formula in SQL).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val uniqRatio = size(array_distinct(toks)) / nTok
    val stopRatio = size(filter(toks, t => t.isin("a", "the"))) / nTok
    round(uniqRatio * (lit(1.0) - stopRatio), 6)
  }

  /** `n`-token shingles (joined with '_'), e.g. tokens [a,b,c,d], n=3 →
    * ["a_b_c","b_c_d"]. Empty when the document has fewer than n tokens
    * — including a NULL token array (same contract as the original
    * `when(size >= n)` form). Elements must be non-null ([[tokens]]
    * guarantees this); an interior null would null out its shingles and
    * shift later positions.
    *
    * Built by zipping the token array with its own tails (n−1 `zip_with`
    * passes) instead of `transform(sequence(...), i -> slice(...))`: the
    * index-array form allocates a per-index slice and probed ~6× slower
    * on the corpus scan (q83's first formulation). `zip_with` null-pads
    * the shorter side, so entries past position size−n concat to null and
    * the final filter drops exactly that tail — positions of surviving
    * shingles are unchanged (q75 depends on them).
    */
  def shingles(toks: Column, n: Int): Column = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    val joined = (1 until n).foldLeft(toks)((acc, off) =>
      zip_with(acc, slice(toks, lit(off + 1), size(toks)),
        (a, b) => concat(a, lit("_"), b)))
    coalesce(filter(joined, _.isNotNull), array().cast("array<string>"))
  }

  /** Distinct shingle hashes — the standard MinHash input set. Native
    * one-pass expression (plans.TextExprs); HOF reference kept below.
    */
  def shingleHashes(text: Column, n: Int): Column =
    call_function("shingle_hashes", text, lit(n))

  /** HOF reference implementation of [[shingleHashes]] (parity spec). */
  def shingleHashesHof(text: Column, n: Int): Column =
    array_distinct(hashAll(shingles(tokens(text), n)))

  /** MinHash signature of a hash set: for each of `k` permutations
    * `h_i(x) = (a_i*x + b_i) mod HashMod` with Knuth-style constants
    * `a_i = (2654435761*(i+1)) mod HashMod`, `b_i = (40503*(i+1)+17) mod
    * HashMod`, the signature entry is `min_x h_i(x)`.
    *
    * Caveat: the `a_i` are MULTIPLES of one constant, so the k
    * "permutations" are linearly correlated, not independent — for a
    * specific unlucky shingle-set pair the band-miss probability can sit
    * far above the `1-(1-s^r)^b` independence estimate (observed: a
    * jacc=0.75 pair missed by 12 r=2 bands, nominal miss 4e-5). Averaged
    * over a corpus the estimator is fine (q49 oracle-matches), but
    * fixtures that must deterministically pair should use near-identical
    * docs (append-a-word, jacc ≥ 0.9), and production recall targets
    * should come from measured band-hit rates, not the formula.
    *
    * Returns an array<long> of length k (HashMod sentinel for empty input
    * so downstream banding stays total). Per-row only — the signature
    * replaces the O(|doc|) shingle set with O(k) longs, which is the whole
    * point at 100 TB: the LSH band join shuffles k longs per doc, not the
    * text.
    */
  def minhash(hashes: Column, k: Int): Column =
    call_function("minhash_sig", hashes, lit(k))

  /** HOF reference implementation of [[minhash]] (parity spec). */
  def minhashHof(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i => {
      val a = pmod(lit(2654435761L) * (i + 1), lit(HashMod))
      val b = pmod(lit(40503L) * (i + 1) + 17, lit(HashMod))
      coalesce(
        array_min(transform(hashes, x => pmod(a * x + b, lit(HashMod)))),
        lit(HashMod))
    })

  /** LSH band key: fold `r` consecutive signature entries (band `b`) into
    * one long. Docs sharing any band key are near-dup candidates.
    */
  def bandKey(sig: Column, band: Int, r: Int): Column =
    aggregate(slice(sig, band * r + 1, r), lit(0L),
      (h, x) => pmod(h * 31 + x, lit(HashMod)))

  /** SimHash over a set of token hashes, `bits` wide (≤ 30 — the poly hash
    * has ~30 usable bits). Bit j of the result is 1 iff the count of
    * hashes with bit j set exceeds half the set size (the ±1 vote sum is
    * positive).
    */
  def simhash(hashes: Column, bits: Int): Column =
    call_function("simhash_of", hashes, lit(bits))

  /** HOF reference implementation of [[simhash]] (parity spec). */
  def simhashHof(hashes: Column, bits: Int): Column = {
    val n = size(hashes)
    (0 until bits).map { j =>
      val ones = aggregate(hashes, lit(0L),
        (c, h) => c + shiftright(h, j).bitwiseAND(1L))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowing fingerprints (Schleimer et al. / MOSS): each w-window over
    * the positional n-shingle hashes selects its leftmost minimum;
    * distinct selections return encoded `(pos << 32) | hash`. Native
    * one-pass monotonic-deque expression (plans.TextExprs); HOF reference
    * below re-scans each window — O(len·w) — and exists for the parity
    * spec only.
    */
  def winnowFps(text: Column, n: Int, w: Int): Column =
    call_function("winnow_fps", text, lit(n), lit(w))

  /** HOF reference implementation of [[winnowFps]] (parity spec). */
  def winnowFpsHof(text: Column, n: Int, w: Int): Column = {
    val hs = hashAll(shingles(tokens(text), n))
    val sel = transform(sequence(lit(0), size(hs) - w), i => {
      val win = slice(hs, i + 1, lit(w))
      val m = array_min(win)
      shiftleft((i + array_position(win, m) - 1).cast("long"), 32).bitwiseOR(m)
    })
    when(size(hs) >= w, array_distinct(sel))
      .otherwise(array().cast("array<long>"))
  }
}
