package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.polyHash

/** Exact-substring canary decontamination (the memorization-probe form —
  * Carlini et al., "The Secret Sharer", USENIX Security 2019: planted
  * canaries must be verbatim-absent from training data for the exposure
  * measurement to mean anything) with a construction-time size gate (the
  * `RuntimeFilter.keysCeiling` / `bandedIntervalJoinAuto` discipline).
  * Two routes, identical verdicts:
  *
  *  - at or under `canaryCountCeiling`: broadcast BroadcastNestedLoopJoin
  *    LEFT SEMI `contains` — per-task work is |docs|·|canaries| contains()
  *    calls, the right plan for eval-sized canary lists (reference shape:
  *    q155; text never shuffles, the only exchange is the id distinct);
  *  - above it: hashed char-gram prefilter — g = the SHORTEST canary's
  *    codepoint length; every canary contributes only the poly-hash of its
  *    g-prefix, docs emit their distinct char-g-gram hashes scan-locally
  *    (one rolling O(len) native pass, `char_gram_hashes`), and only
  *    (doc, canary) pairs sharing a hash pay the exact contains() verify.
  *    Per-task doc work becomes O(len) hash ops + broadcast-hash probes —
  *    INDEPENDENT of the canary count — while recall stays 1.0: a doc
  *    containing a canary verbatim contains its g-prefix, so the true
  *    pair always survives the prefilter. False candidates (hash
  *    collisions at ~|grams|·|canaries|/2³⁰ expected, plus real shared
  *    prefixes) are killed by the verify.
  *
  * The gated route still BROADCASTS the (prefix-hash, phrase) table —
  * fine to ~10⁶ canaries × typical phrase lengths; a canary list too big
  * to broadcast at all is q96's n-gram equi-join territory, not a canary
  * probe. NULL text matches nothing on either route (it cannot contain a
  * canary) — the `CorpusPipeline.decontaminateByCanary` contract.
  *
  * The default ceiling is MEASURED, not guessed (ProbeAb, sf0.1
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
                      canaryCountCeiling: Long = 128): DataFrame = {
    require(canaryCountCeiling >= 1,
      s"Canary.contaminatedIds: canaryCountCeiling must be >= 1, got $canaryCountCeiling")
    for (c <- Seq("__phrase", "__ph", "__gh"))
      require(idCol != c && textCol != c,
        s"Canary.contaminatedIds: column name '$c' is reserved by the operator")
    val can = canaries.select(col(phraseCol).as("__phrase"))
      .filter(col("__phrase").isNotNull && length(col("__phrase")) > 0)
      .distinct()
    // ONE bounded aggregate decides the route: canary count + shortest
    // canary length (the gram size g; counted in codepoints, matching
    // substring/char_gram_hashes semantics)
    val gate = can.agg(count(lit(1)).as("n"),
      coalesce(min(length(col("__phrase"))), lit(0)).as("g")).collect()(0)
    val nCan = gate.getLong(0)
    val g = gate.getInt(1)
    if (nCan == 0)
      // empty list contaminates nothing (the identity contract)
      docs.select(col(idCol)).limit(0)
    else if (nCan <= canaryCountCeiling)
      // projected first: an unrelated docs column named __phrase must not
      // make the join condition ambiguous (the gram route projects too)
      docs.select(col(idCol), col(textCol))
        .join(broadcast(can),
          col(textCol).contains(col("__phrase")), "left_semi")
        .select(col(idCol)).distinct()
    else {
      require(g >= 4,
        s"Canary.contaminatedIds: the gated gram route needs every canary to " +
          s"be >= 4 codepoints (shortest is $g) — shorter probes prefilter " +
          s"nothing; shrink the list or raise canaryCountCeiling")
      val pref = can.select(
        polyHash(substring(col("__phrase"), 1, g)).as("__ph"), col("__phrase"))
      // candidates: scan-local gram emission, broadcast-hash membership —
      // text never shuffles; the join key is the 8-byte gram hash
      val grams = docs.select(col(idCol), col(textCol),
        explode(call_function("char_gram_hashes", col(textCol), lit(g))).as("__gh"))
      grams.join(broadcast(pref), col("__gh") === col("__ph"))
        .filter(col(textCol).contains(col("__phrase"))) // exact verify, scan-local
        .select(col(idCol)).distinct()
    }
  }
}
