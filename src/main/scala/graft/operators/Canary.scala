package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.polyHash

/** Exact-substring canary decontamination (the memorization-probe form —
  * Carlini et al., "The Secret Sharer", USENIX Security 2019: planted
  * canaries must be verbatim-absent from training data for the exposure
  * measurement to mean anything) with construction-time size gates (the
  * `RuntimeFilter.keysCeiling` / `bandedIntervalJoinAuto` discipline).
  * Three routes, identical verdicts:
  *
  *  - at or under `canaryCountCeiling`: broadcast BroadcastNestedLoopJoin
  *    LEFT SEMI `contains` — per-task work is |docs|·|canaries| contains()
  *    calls, the right plan for eval-sized canary lists (reference shape:
  *    q155; text never shuffles, the only exchange is the id distinct);
  *  - above it: hashed char-gram prefilter — g = the SHORTEST long
  *    canary's codepoint length; every canary contributes only the
  *    poly-hash of its g-prefix, docs emit their distinct char-g-gram
  *    hashes scan-locally (one rolling O(len) native pass,
  *    `char_gram_hashes`), and only (doc, canary) pairs sharing a hash
  *    pay the exact contains() verify. Per-task doc work becomes O(len)
  *    hash ops + broadcast-hash probes — INDEPENDENT of the canary
  *    count — while recall stays 1.0: a doc containing a canary verbatim
  *    contains its g-prefix, so the true pair always survives the
  *    prefilter. False candidates (hash collisions at
  *    ~|grams|·|canaries|/2³⁰ expected, plus real shared prefixes) are
  *    killed by the verify;
  *  - above `broadcastCharsCeiling` total long-canary codepoints (the
  *    too-big-to-BROADCAST regime — the default admits ~10⁶ typical
  *    canaries; past it the (hash, phrase) table stops being an
  *    eval-list and starts being a corpus): the SAME gram prefilter as
  *    an equi-JOIN on the gram hash (q96's n-gram join shape) — the
  *    shuffle carries (id, 8-byte hash) and (hash, phrase), never text;
  *    surviving (id, candidate phrases) collapse to one bounded row per
  *    candidate doc (true matches + collisions — small by construction),
  *    and the exact verify re-attaches text by ONE id join against that
  *    bounded side (AQE broadcasts it when it fits, the common case).
  *    Recall 1.0 by the same prefix pigeonhole.
  *
  * Canaries SHORTER than 4 codepoints cannot prefilter anything (their
  * whole body is shorter than a useful gram), so above the count ceiling
  * they are split off and routed through the BNLJ contains path — a list
  * that merely grows past the ceiling keeps working with short probes in
  * it (and g is computed over the LONG canaries only, so one short probe
  * no longer drags every canary to g < 4). NULL/empty text matches
  * nothing on any route (it cannot contain a canary) — the
  * `CorpusPipeline.decontaminateByCanary` contract.
  *
  * The default count ceiling is MEASURED, not guessed (ProbeAb, sf0.1
  * documents, identical verdicts both routes): BNLJ scales linearly in
  * the canary count (0.48 s at 20 canaries → 5.10 s at 2000) while the
  * gram route is flat (0.57–0.58 s at both sizes) — crossover ≈ 60
  * canaries, so 128 keeps genuinely eval-sized lists on the cheaper
  * BNLJ and hands everything larger to the count-independent route.
  */
object Canary {

  /** Distinct ids of docs containing ANY canary phrase verbatim. */
  def contaminatedIds(docs: DataFrame, idCol: String, textCol: String,
                      canaries: DataFrame, phraseCol: String,
                      canaryCountCeiling: Long = 128,
                      broadcastCharsCeiling: Long = 32L << 20): DataFrame = {
    require(canaryCountCeiling >= 1,
      s"Canary.contaminatedIds: canaryCountCeiling must be >= 1, got $canaryCountCeiling")
    require(broadcastCharsCeiling >= 1,
      s"Canary.contaminatedIds: broadcastCharsCeiling must be >= 1, got $broadcastCharsCeiling")
    for (c <- Seq("__phrase", "__ph", "__gh", "__cands"))
      require(idCol != c && textCol != c,
        s"Canary.contaminatedIds: column name '$c' is reserved by the operator")
    val can = canaries.select(col(phraseCol).as("__phrase"))
      .filter(col("__phrase").isNotNull && length(col("__phrase")) > 0)
      .distinct()
    // ONE bounded aggregate decides the route: canary count, short-probe
    // count, the shortest LONG canary's length (the gram size g; counted
    // in codepoints, matching substring/char_gram_hashes semantics), and
    // the long side's total codepoints (the broadcast-size gate)
    val longSide = length(col("__phrase")) >= 4
    val gate = can.agg(
      count(lit(1)).as("n"),
      count(when(!longSide, 1)).as("n_short"),
      coalesce(min(when(longSide, length(col("__phrase")))), lit(0)).as("g"),
      coalesce(sum(when(longSide, length(col("__phrase")))), lit(0L)).as("chars_long")
    ).collect()(0)
    val nCan = gate.getLong(0)
    val nShort = gate.getLong(1)
    val g = gate.getInt(2)
    val charsLong = gate.getLong(3)
    if (nCan == 0)
      // empty list contaminates nothing (the identity contract)
      docs.select(col(idCol)).limit(0)
    else if (nCan <= canaryCountCeiling || nCan == nShort)
      // all-short lists have no gram route at any size — BNLJ is the
      // only exact plan for sub-4-codepoint probes, whatever the count
      bnljIds(docs, idCol, textCol, can)
    else {
      val pref = can.filter(longSide).select(
        polyHash(substring(col("__phrase"), 1, g)).as("__ph"), col("__phrase"))
      val longIds =
        if (charsLong <= broadcastCharsCeiling)
          gramBroadcastIds(docs, idCol, textCol, pref, g)
        else gramJoinIds(docs, idCol, textCol, pref, g)
      if (nShort == 0) longIds
      else longIds.unionByName(
        bnljIds(docs, idCol, textCol, can.filter(!longSide))).distinct()
    }
  }

  /** The eval-list plan: broadcast nested-loop LEFT SEMI contains. */
  private def bnljIds(docs: DataFrame, idCol: String, textCol: String,
                      can: DataFrame): DataFrame =
    // projected first: an unrelated docs column named __phrase must not
    // make the join condition ambiguous (the gram routes project too)
    docs.select(col(idCol), col(textCol))
      .join(broadcast(can),
        col(textCol).contains(col("__phrase")), "left_semi")
      .select(col(idCol)).distinct()

  /** The count-independent plan: scan-local gram emission, broadcast-hash
    * membership, pipelined exact verify — text never leaves its scan.
    */
  private def gramBroadcastIds(docs: DataFrame, idCol: String, textCol: String,
                               pref: DataFrame, g: Int): DataFrame = {
    val grams = docs.select(col(idCol), col(textCol),
      explode(call_function("char_gram_hashes", col(textCol), lit(g))).as("__gh"))
    grams.join(broadcast(pref), col("__gh") === col("__ph"))
      .filter(col(textCol).contains(col("__phrase"))) // exact verify, scan-local
      .select(col(idCol)).distinct()
  }

  /** The too-big-to-broadcast plan: the same prefilter as a shuffle
    * equi-join on the gram hash — (id, hash) vs (hash, phrase), text
    * stays out of the wide exchange; the distinct (id, phrase) candidate
    * PAIRS (bounded: true matches + ~|grams|·|canaries|/2³⁰ collisions)
    * then join docs on id for the exact verify, so text is re-read, not
    * shuffled per gram, and AQE broadcasts the candidate side when it
    * fits (the common case). The verify is a plain two-attribute
    * `contains` across the join — deliberately NOT an `exists()` lambda
    * over a per-doc collect_list: an outer column reference inside a
    * higher-order function above this self-join shape mis-binds after
    * attribute dedup at some plan sizes (measured at 10×:
    * INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND from BindReferences) and defeats
    * the filter's pipelining at the sizes where it survives.
    */
  private def gramJoinIds(docs: DataFrame, idCol: String, textCol: String,
                          pref: DataFrame, g: Int): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(call_function("char_gram_hashes", col(textCol), lit(g))).as("__gh"))
    // BOTH joins carry explicit shuffle_hash BUILD-side hints: the static
    // planner's size estimate of a scan does not survive the Generate
    // explode (measured at 10×: it chose BuildLeft BROADCAST of the
    // 27M-row exploded gram table, and of the full docs-with-text side in
    // the verify — 18 s where the route costs 3). The hinted build sides
    // are the genuinely bounded ones (canaries/candidates, partitioned by
    // the join key so per-partition builds stay flat — safe where a
    // broadcast of the same table is not); AQE still demotes to broadcast
    // at runtime when the materialized side turns out tiny.
    val cands = grams.join(pref.hint("shuffle_hash"),
        col("__gh") === col("__ph"))
      .select(col(idCol), col("__phrase")).distinct()
    docs.select(col(idCol), col(textCol))
      .join(cands.hint("shuffle_hash"), Seq(idCol))
      .filter(col(textCol).contains(col("__phrase"))) // exact verify
      .select(col(idCol)).distinct()
  }
}
