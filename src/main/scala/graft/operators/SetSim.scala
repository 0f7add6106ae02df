package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (the AllPairs /
  * PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08). Finds ALL
  * document pairs with token-set Jaccard ≥ t — exactly, no probabilistic
  * recall loss — without the all-pairs cross join.
  *
  * This is the deterministic complement to the MinHash-LSH path in
  * [[Dedup]]: LSH trades a tunable S-curve of recall for O(bands) shuffle
  * keys per doc; prefix filtering keeps recall at 1.0 and instead bounds
  * candidate generation by a provable pruning rule. Use it where misses
  * are not acceptable (legal dedup, eval-set decontamination audits) or
  * where the corpus's similarity mass sits near the threshold, which is
  * exactly where the LSH S-curve is softest.
  *
  * The pruning rule: order every token set by a GLOBAL total order —
  * ascending document frequency, ties by token — and keep only each set's
  * first |x| − ⌈t·|x|⌉ + 1 tokens (its "prefix"). Any pair with
  * J(x,y) ≥ t has intersection o ≥ t·max(|x|,|y|) (from
  * o/(|x|+|y|−o) ≥ t and |min| ≥ t·|max|), so a set's suffix of
  * ⌈t·|x|⌉ − 1 tokens cannot hold all common tokens: every qualifying
  * pair shares at least one PREFIX token and is found by the equi-join on
  * prefix tokens (SetSimSpec pins recall against the brute-force join,
  * including threshold-boundary pairs).
  *
  * Scale shape at 100 TB:
  *  - the shuffle for candidate generation carries (prefix-token, id, n)
  *    only — O(prefix) rows per doc, never the text or the full set;
  *  - rarest-first ordering makes prefix tokens each doc's LOWEST-df
  *    tokens, so join buckets are small by construction — the hot-bucket
  *    risk of the LSH path is designed out rather than salted away
  *    (residual pathologies — a corpus of docs built entirely from a few
  *    common tokens — fall back to the same salting playbook as
  *    [[Dedup.lshCandidatePairsSalted]]);
  *  - the length filter t·max(n1,n2) ≤ min(n1,n2) prunes candidates
  *    before the verify join ever sees a token array;
  *  - verification joins full token sets only for surviving candidate
  *    pairs.
  *
  * The threshold is a RATIONAL tNum/tDen (e.g. 3/5 for 0.6) so every
  * filter is integer arithmetic — ⌈t·n⌉ = (tNum·n + tDen − 1) div tDen and
  * J ≥ t ⇔ inter·tDen ≥ tNum·union — bit-identical in any engine (the
  * q125 oracle replays the definition all-pairs in DuckDB).
  */
object SetSim {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Internal working columns of the prefix machinery. A caller id column
    * shadowing one of these would silently corrupt the groupBy keys in
    * [[prepare]]/[[orderedPrefix]] (e.g. an idCol literally named "n" or
    * "tok") — fail loudly at the entry points instead.
    */
  private val Reserved = Set("tk", "n", "tok", "pos", "df", "d1", "d2",
    "n1", "n2", "p1", "p2", "s", "len", "g", "l1", "l2",
    "sid", "sl", "oid", "ol", "dist", "tk1", "tk2", "s1", "s2",
    "inter_cnt", "union_cnt", "overlap_cnt", "ord", "col")

  private def checkIdCol(idCol: String): Unit =
    require(!Reserved.contains(idCol),
      s"idCol '$idCol' collides with an internal working column; " +
        s"rename it before the join (reserved: ${Reserved.toSeq.sorted.mkString(", ")})")

  /** Candidate-join strategy for the SELF-join forms: shuffle_hash by
    * default, with `-Dgraft.setsim.shuffleHash=false` handing strategy to
    * AQE (the [[Graph]] superstep decision). The asymmetry with Graph is
    * deliberate and MEASURED (BASELINE.md "SetSim SHJ vs Graph" note):
    * the SHJ build here is the PREFIX table — each doc's few rarest
    * elements, whose per-partition row count stays orders of magnitude
    * under the edge table that killed SHJ on q114 — but any corpus where
    * the prefix buckets do go hot (docs drawn from a tiny common-element
    * pool) can flip the flag without a code change. The R×S form never
    * hints (sides differ wildly; AQE broadcasts the small one).
    */
  private def maybeShj(df: DataFrame): DataFrame =
    if (sys.props.get("graft.setsim.shuffleHash").forall(_.toBoolean))
      df.hint("shuffle_hash")
    else df

  /** l-prefix depth (Wang et al. SIGMOD'12 "Can we beat the prefix
    * filtering?", the ℓ-prefix scheme): prefixes are lengthened by l − 1
    * elements and a candidate pair must collide on ≥ min(l, C) of them,
    * where C is the pair's required overlap — if |x∩y| ≥ C, the l-th
    * smallest common element t_l has ≥ C − l common elements after it,
    * so pos(t_l) ≤ n − C + l in BOTH sets and t_1..t_l are all
    * collisions. Kills the single-shared-rare-element false positives
    * the first-collision positional bound cannot touch (measured on
    * q135: 319 k of 342 k joined pairs reached the verify at l=1; q125:
    * 68.7 k candidates). l=2 measured best at sf0.1 (l=3 adds more
    * prefix-join rows than it removes candidates);
    * `-Dgraft.setsim.lprefix` overrides.
    */
  private def lConf: Int = math.max(1,
    sys.props.get("graft.setsim.lprefix").map(_.toInt).getOrElse(2))

  /** Per-doc distinct token sets: (id, tk: array<string>, n). Docs with
    * empty token sets are dropped — Jaccard is undefined on empty sets and
    * they can match nothing.
    */
  def tokenSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        array_distinct(filter(split(col(textCol), " "), t => t =!= "")).as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") >= 1)

  /** ⌈tNum·n/tDen⌉ in exact integer arithmetic. n is bounded by tokens-
    * per-doc, so tNum·n stays far inside the double-exact integer range
    * and floor() introduces no rounding.
    */
  private def ceilMul(n: Column, tNum: Int, tDen: Int): Column =
    floor((n * tNum + (tDen - 1)) / tDen).cast("int")

  /** All pairs (d1 < d2) with token-set Jaccard ≥ tNum/tDen over
    * whitespace TOKEN sets. Granularity caveat: token sets are the right
    * unit for short records (titles, queries); for document near-dup they
    * are coarse — two long docs over one topical vocabulary share most
    * token TYPES without sharing any phrasing, so prefer
    * [[jaccardSelfJoinSets]] over shingle-hash sets (q125), which keep
    * both the pair count and the prefix-bucket sizes sparse.
    */
  def jaccardSelfJoin(df: DataFrame, idCol: String, textCol: String,
                      tNum: Int, tDen: Int): DataFrame =
    jaccardSelfJoinSets(tokenSets(df, idCol, textCol), idCol, "tk", tNum, tDen)

  /** All pairs (d1 < d2) with set Jaccard ≥ tNum/tDen over an arbitrary
    * set column (array of any orderable atomic type — token strings,
    * shingle hashes, feature ids), as (d1, d2, inter_cnt, union_cnt).
    * Exact — recall 1.0 by the prefix argument above. Rows must carry
    * DISTINCT elements ([[tokenSets]]-style preparation) and non-empty
    * sets.
    *
    * Plan: one element-frequency agg, one per-doc sort to order sets, a
    * prefix-element equi-join for candidates, then a set-verify join.
    */
  def jaccardSelfJoinSets(sets0: DataFrame, idCol: String, setCol: String,
                          tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum < tDen,
      s"threshold must be a rational in (0,1), got $tNum/$tDen")
    val sets = prepare(sets0, idCol, setCol)
    val dfreq = sets.select(explode(col("tk")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val pref = prefixes(sets, idCol, dfreq, tNum, tDen)
    // shuffle_hash: a SELF-join's sides are by definition the same size,
    // so broadcasting one side both caps scale (the prefix table grows
    // with the corpus) and recomputes the whole prefix pipeline for the
    // build side; the shuffled form keys both sides on `tok` so AQE can
    // reuse one exchange for both (and no sort, unlike merge).
    val cand = selfCandidates(pref, idCol, tNum, tDen)
    verify(cand, sets, sets, idCol, tNum, tDen)
  }

  /** Cross-corpus form: all (left, right) pairs with set Jaccard ≥
    * tNum/tDen — the EXACT incremental-dedup probe ("which docs of the
    * new shard near-duplicate the admitted corpus", the recall-1.0 twin
    * of [[Dedup.incrementalNearDup]]'s LSH probe). Same prefix/length/
    * positional pruning as the self-join; the one structural change is the
    * global element order, which must be IDENTICAL on both sides to keep
    * the prefix guarantee — so element frequencies are counted over the
    * UNION of both corpora. (Any consistent total order preserves
    * correctness; union-df is the bucket-size heuristic. A continuous
    * ingest that cannot afford the union recount each batch can order by
    * a fixed hash instead — correct, with more populous candidate
    * buckets.) Returns (d1 ∈ left, d2 ∈ right, inter_cnt, union_cnt);
    * ids may repeat across sides and are reported as given.
    */
  def jaccardJoinSets(left: DataFrame, right: DataFrame,
                      idCol: String, setCol: String,
                      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum < tDen,
      s"threshold must be a rational in (0,1), got $tNum/$tDen")
    val l = prepare(left, idCol, setCol)
    val r = prepare(right, idCol, setCol)
    val dfreq = l.select(explode(col("tk")).as("tok"))
      .unionAll(r.select(explode(col("tk")).as("tok")))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // R×S sides can differ wildly in size (daily shard vs full corpus) —
    // join strategy stays with AQE, which broadcasts the small prefix side.
    val cand = candidates(prefixes(l, idCol, dfreq, tNum, tDen),
      prefixes(r, idCol, dfreq, tNum, tDen), idCol, tNum, tDen,
      selfPairs = false)
    verify(cand, l, r, idCol, tNum, tDen)
  }

  /** Containment join: all (x ∈ probe, y ∈ index) pairs with
    * |x ∩ y| ≥ ⌈t·|x|⌉ — coverage of the PROBE side's set, as
    * (d1 ∈ probe, d2 ∈ index, inter_cnt, n1). The decontamination
    * primitive: x = an eval/benchmark doc's shingle set, y = a training
    * doc; containment flags y even when y is 100× larger and the pair's
    * JACCARD sits near 0 — which is exactly why eval-leakage audits need
    * asymmetric coverage, not symmetric similarity
    * ([[jaccardJoinSets]] would miss a verbatim eval question embedded
    * in a long document).
    *
    * Exact, recall 1.0: if x ∩ y misses ALL of x's prefix (its
    * n − ⌈t·n⌉ + 1 rarest elements under the shared union-df order),
    * the overlap is at most ⌈t·n⌉ − 1 < required — so every qualifying
    * pair collides on a probe-prefix element. The index side has no
    * symmetric bound (y may be any size, there is no length filter in a
    * containment join), so it emits ALL its elements: an inverted-index
    * build, O(Σ|y|) rows, built once per corpus in production and probed
    * by eval sets whose prefixes are tiny — per-probe cost is
    * Σ df(prefix element), small because prefixes are each set's RAREST
    * elements. The positional filter carries over verbatim: both sides
    * are sorted by the same global order, so the first collision at
    * (p1, p2) bounds overlap ≤ 1 + min(n1−p1, n2−p2). No join hint: the
    * sides differ wildly by design (AQE broadcasts the small prefix
    * side). Ids may repeat across sides and are reported as given (a
    * corpus probed against itself reports its self-pairs — filter
    * `d1 =!= d2` downstream if unwanted), the [[jaccardJoinSets]]
    * convention.
    */
  def containmentJoin(probe: DataFrame, index: DataFrame,
                      idCol: String, setCol: String,
                      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a rational in (0,1], got $tNum/$tDen")
    val l = prepare(probe, idCol, setCol)
    val r = prepare(index, idCol, setCol)
    val dfreq = l.select(explode(col("tk")).as("tok"))
      .unionAll(r.select(explode(col("tk")).as("tok")))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // l-prefix (see [[lConf]]): the required overlap C = ⌈t·n1⌉ is PER
    // ROW here, so the extension and the collision-count floor are both
    // least(L, C) — the probe prefix grows to n − C + min(L, C) and a
    // candidate must collide on ≥ min(L, C) elements (the index side
    // ships full sets, so every common probe-prefix element is a
    // collision row).
    def lOf(n: Column) = least(lit(lConf), ceilMul(n, tNum, tDen))
    val prefL = orderedPrefix(
      l.select(col(idCol), col("n"), explode(col("tk")).as("tok")),
      idCol, dfreq, col("n") - ceilMul(col("n"), tNum, tDen) + lOf(col("n")))
    val full = orderedPrefix(
      r.select(col(idCol), col("n"), explode(col("tk")).as("tok")),
      idCol, dfreq, col("n"))
    val a = prefL.select(col("tok"), col(idCol).as("d1"),
      col("n").as("n1"), col("pos").as("p1"))
    val b = full.select(col("tok"), col(idCol).as("d2"),
      col("n").as("n2"), col("pos").as("p2"))
    val cand = a.join(b, Seq("tok"))
      .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(min(col("p1")).as("p1"), min(col("p2")).as("p2"),
        count(lit(1)).as("k"))
      .filter(col("k") >= lOf(col("n1")) &&
        lit(1) + least(col("n1") - col("p1"), col("n2") - col("p2"))
        >= ceilMul(col("n1"), tNum, tDen))
      .select(col("d1"), col("d2"))
    val s1 = l.select(col(idCol).as("d1"), col("tk").as("tk1"), col("n").as("n1"))
    val s2 = r.select(col(idCol).as("d2"), col("tk").as("tk2"))
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("inter_cnt",
        size(array_intersect(col("tk1"), col("tk2"))).cast("long"))
      .filter(col("inter_cnt") * tDen >= col("n1") * tNum)
      .select(col("d1"), col("d2"), col("inter_cnt"), col("n1").cast("long").as("n1"))
  }

  /** Overlap (T-overlap) self-join: all pairs (d1 < d2) sharing at least
    * `minOverlap` set elements, as (d1, d2, overlap_cnt) — the
    * absolute-count sibling of the Jaccard form (co-citation networks,
    * shared-feature linkage, "documents quoting ≥ C of the same
    * passages"). Same machinery, simpler bound: a set's prefix is its
    * first n − C + 1 rarest elements (missing all of them caps shared
    * elements at C − 1), sets with n < C drop (they can never reach C),
    * and the first-collision positional bound 1 + min(n1−p1, n2−p2)
    * must itself reach C. Exact — recall 1.0 by the same alignment
    * argument as [[jaccardSelfJoinSets]] (SetSimSpec pins brute parity
    * including the exactly-at-C boundary).
    */
  def overlapSelfJoin(sets0: DataFrame, idCol: String, setCol: String,
                      minOverlap: Int): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val sets = prepare(sets0, idCol, setCol).filter(col("n") >= minOverlap)
    val dfreq = sets.select(explode(col("tk")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // l-prefix (see [[lConf]]): prefixes lengthened to n − C + l, and a
    // candidate must collide on ≥ l prefix elements. C is the constant
    // minOverlap here, so l is a plain min.
    val lPref = math.min(lConf, minOverlap)
    val pref = orderedPrefix(
      sets.select(col(idCol), col("n"), explode(col("tk")).as("tok")),
      idCol, dfreq, col("n") - minOverlap + lPref)
    // aliased self-join over ONE prefix subtree (see [[selfCandidates]])
    val joined =
      if (sys.props.get("graft.setsim.selfAlias").forall(_.toBoolean))
        maybeShj(pref.alias("a"))
          .join(pref.alias("b"), col("a.tok") === col("b.tok"))
          .filter(col(s"a.$idCol") < col(s"b.$idCol"))
          .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"),
            col("a.n").as("n1"), col("b.n").as("n2"),
            col("a.pos").as("p1"), col("b.pos").as("p2"))
      else {
        val a = pref.select(col("tok"), col(idCol).as("d1"),
          col("n").as("n1"), col("pos").as("p1"))
        val b = pref.select(col("tok"), col(idCol).as("d2"),
          col("n").as("n2"), col("pos").as("p2"))
        maybeShj(a).join(maybeShj(b), Seq("tok")).filter(col("d1") < col("d2"))
      }
    val cand = joined
      .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(min(col("p1")).as("p1"), min(col("p2")).as("p2"),
        count(lit(1)).as("k"))
      .filter(col("k") >= lPref &&
        lit(1) + least(col("n1") - col("p1"), col("n2") - col("p2"))
        >= minOverlap)
      .select(col("d1"), col("d2"))
    val s1 = sets.select(col(idCol).as("d1"), col("tk").as("tk1"))
    val s2 = sets.select(col(idCol).as("d2"), col("tk").as("tk2"))
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("overlap_cnt",
        size(array_intersect(col("tk1"), col("tk2"))).cast("long"))
      .filter(col("overlap_cnt") >= minOverlap)
      .select(col("d1"), col("d2"), col("overlap_cnt"))
  }

  /** Edit-distance self-join (the Ed-Join family — Xiao et al. VLDB'08):
    * all pairs (d1 < d2) with levenshtein(s1, s2) ≤ k, as (d1, d2, dist).
    * Exact. The blocked route rests on the q-gram count filter: one edit
    * disturbs at most q of a string's positional q-grams, so ed ≤ k
    * forces a BAG overlap of ≥ max(g1, g2) − k·q gram occurrences
    * (g = len − q + 1). Bag semantics are made joinable by numbering each
    * gram's occurrences — the element is (gram, occurrence-index), so an
    * equi-join counts true bag intersection. The same prefix argument as
    * [[jaccardSelfJoinSets]] then applies with a CONSTANT prefix of
    * k·q + 1 rarest elements: a qualifying pair missing from x's prefix
    * could share at most g_x − k·q − 1 < g_max − k·q elements —
    * contradiction — and alignment puts the first shared element in both
    * prefixes. Candidates verify with one native `levenshtein` call.
    *
    * Strings too short for the gram evidence to bind (len ≤ k·q + q − 1,
    * where the required overlap is ≤ 0 — including len < q with no grams
    * at all) cannot be pruned by ANY gram filter: they take a dense route
    * against every length-compatible string. Length compatibility caps the
    * other side too (|l1 − l2| ≤ k ⇒ len ≤ k·q + q − 1 + k), so the dense
    * route is a short-strings-only subproblem on BOTH sides. Its size is
    * MEASURED, not assumed (one count at construction — the q80
    * keysCeiling pattern): up to `shortsCeiling` gram-starved strings the
    * (id, len) build broadcasts; above it, a broadcast would OOM the
    * executors, so the route degrades loudly to a shuffle-replicate
    * nested-loop all-pairs join — the honest O(n²) cost the gram filter
    * provably cannot beat for these strings, paid distributed instead of
    * through a driver broadcast. Zero gram-starved strings skip the dense
    * route entirely.
    *
    * Scale shape: the prefix join shuffles (rare-gram, id, len) rows —
    * k·q + 1 per string; the verify join carries strings only for
    * candidate pairs; rarest-first ordering keeps gram buckets small
    * exactly as in the Jaccard form.
    *
    * EAGER: the gram-starved count runs one Spark job at CONSTRUCTION
    * time (like [[RuntimeFilter.bloomPrunedJoinAuto]]'s sizing pass), not
    * when the returned DataFrame is acted on.
    */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
                           k: Int, q: Int = 2,
                           shortsCeiling: Long = 1L << 17): DataFrame = {
    require(k >= 0 && q >= 1, s"need k >= 0 and q >= 1, got k=$k q=$q")
    checkIdCol(idCol)
    val strs = df.select(col(idCol), col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
    val shortLen = k * q + q - 1

    // positional q-gram bag, each occurrence numbered per (id, gram) in
    // position order → unique (gram#occ) elements per string
    val wOcc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol), col("g")).orderBy(col("pos"))
    val grams = strs.filter(col("len") > shortLen)
      .select(col(idCol), col("len"),
        posexplode(transform(sequence(lit(1), col("len") - q + 1),
          i => col("s").substr(i, lit(q)))))
      .select(col(idCol), col("len"), col("pos"), col("col").as("g"))
      .withColumn("tok", concat(col("g"), lit("#"),
        row_number().over(wOcc).cast("string")))
      .select(col(idCol), col("len"), col("tok"))

    // materialized once: the gram stream (posexplode + per-(id,gram)
    // occurrence window — an exchange + sort over Σ grams) feeds BOTH the
    // frequency agg and the prefix ordering; without the checkpoint that
    // window pipeline runs twice (measured: q134 warm 1.1 → 0.9 s)
    val gramsM = graft.core.Mat.checkpoint(grams, "setsim_grams",
      sys.props.get("graft.setsim.materialize").forall(_.toBoolean))
    // rarest-first global order; constant prefix of k·q + 1 elements
    // (orderedPrefix — the same order definition as the Jaccard joins)
    val dfreq = gramsM.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val pref = orderedPrefix(
      gramsM.select(col(idCol), col("len").as("n"), col("tok")),
      idCol, dfreq, lit(k * q + 1))

    // aliased self-join over ONE prefix subtree (see [[selfCandidates]])
    val longCand =
      if (sys.props.get("graft.setsim.selfAlias").forall(_.toBoolean))
        maybeShj(pref.alias("a"))
          .join(pref.alias("b"), col("a.tok") === col("b.tok"))
          .filter(col(s"a.$idCol") < col(s"b.$idCol") &&
            abs(col("a.n") - col("b.n")) <= k)
          .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      else {
        val a = pref.select(col("tok"), col(idCol).as("d1"), col("n").as("l1"))
        val b = pref.select(col("tok"), col(idCol).as("d2"), col("n").as("l2"))
        maybeShj(a).join(maybeShj(b), Seq("tok"))
          .filter(col("d1") < col("d2") && abs(col("l1") - col("l2")) <= k)
          .select(col("d1"), col("d2"))
      }

    // dense route for gram-starved strings against every length-compatible
    // string (itself length-bounded: |ol − sl| ≤ k ⇒ ol ≤ shortLen + k, a
    // scan-local prune), both orientations normalized to d1 < d2
    val shorts = strs.filter(col("len") <= shortLen)
      .select(col(idCol).as("sid"), col("len").as("sl"))
    val others = strs.filter(col("len") <= shortLen + k)
      .select(col(idCol).as("oid"), col("len").as("ol"))
    val denseCond = abs(col("ol") - col("sl")) <= k && col("oid") =!= col("sid")
    val nShorts = shorts.count() // eager sizing pass — see the doc comment
    val shortCand =
      if (nShorts == 0) None
      else if (nShorts <= shortsCeiling)
        Some(others.join(broadcast(shorts), denseCond))
      else {
        log.warn(s"editDistanceSelfJoin: $nShorts gram-starved strings " +
          s"(len <= $shortLen) exceed shortsCeiling=$shortsCeiling — dense " +
          "route degrades from broadcast to a shuffle-replicate nested-loop " +
          "all-pairs join (honest O(n^2) over the short subset, no driver " +
          "broadcast); a corpus OF short strings should use plain all-pairs " +
          "levenshtein instead")
        Some(others.hint("shuffle_replicate_nl")
          .join(shorts.hint("shuffle_replicate_nl"), denseCond))
      }
    val cand = shortCand.fold(longCand) { sc =>
      longCand.unionAll(sc
        .select(least(col("sid"), col("oid")).as("d1"),
          greatest(col("sid"), col("oid")).as("d2")))
    }

    val s1 = strs.select(col(idCol).as("d1"), col("s").as("s1"))
    val s2 = strs.select(col(idCol).as("d2"), col("s").as("s2"))
    cand.distinct()
      .join(s1, "d1").join(s2, "d2")
      .withColumn("dist", levenshtein(col("s1"), col("s2")).cast("long"))
      .filter(col("dist") <= k)
      .select(col("d1"), col("d2"), col("dist"))
  }

  /** Normalize to (id, tk, n≥1) — see [[jaccardSelfJoinSets]]'s contract.
    *
    * Materialized ONCE (localCheckpoint): every join in this file
    * references its prepared sets 3-4 times (element-frequency agg, prefix
    * elements, and both verify sides), under DIFFERENT downstream keys, so
    * exchange reuse can never collapse them — without the checkpoint the
    * caller's whole set-construction pipeline (typically a text scan +
    * shingle hashing + array_distinct) re-executes per reference, and the
    * duplicated subtrees quadruple the codegen surface. Measured at sf0.1
    * (ProbeAb same-JVM alternating medians, 4 passes): q125 2.64→1.60 s,
    * q135 2.75→1.76 s, q134 1.27→0.93 s, q128 1.61→1.24 s,
    * q137 1.40→1.14 s. The stored rows are the (id, elements, n) sets
    * themselves — the same bound the verify join already holds per
    * partition. `-Dgraft.setsim.materialize=false` restores the
    * recompute-per-reference plan for deployments where executor
    * storage is tighter than scan+hash recompute (the
    * `graft.setsim.shuffleHash` convention).
    */
  private def prepare(sets0: DataFrame, idCol: String, setCol: String): DataFrame = {
    checkIdCol(idCol)
    val s = sets0.select(col(idCol), col(setCol).as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") >= 1)
    graft.core.Mat.checkpoint(s, "setsim_prepare",
      sys.props.get("graft.setsim.materialize").forall(_.toBoolean))
  }

  /** Shared order-and-slice core — ONE definition of the global element
    * order for every prefix-filtered join in this file (Jaccard and
    * edit-distance): ascending element frequency, ties by element. No
    * global rank/window is needed — (df, elem) pairs compare
    * lexicographically, so sorting each row's struct array yields the
    * same order every engine would. `elems` rows are (idCol, n, tok)
    * with n the full bag/set size (functionally dependent on the id, so
    * it rides the groupBy key); `prefLen` is the caller's prefix-length
    * expression over `n`. Returns (idCol, n, pos, tok) with `pos` the
    * element's 1-based position (for positional filters).
    */
  private def orderedPrefix(elems: DataFrame, idCol: String,
                            dfreq: DataFrame, prefLen: Column): DataFrame =
    elems.join(dfreq, "tok")
      .groupBy(col(idCol), col("n"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"))
      .select(col(idCol), col("n"),
        posexplode(slice(col("ord"), lit(1), prefLen)))
      .select(col(idCol), col("n"), (col("pos") + 1).as("pos"),
        col("col.tok").as("tok"))

  /** Jaccard prefix: the first n − ⌈t·n⌉ + min(L, ⌈t·n⌉) elements of
    * each set (the l-prefix extension, see [[lConf]] — jacc ≥ t forces
    * overlap ≥ ⌈t·n⌉ on each side, so the l-th smallest common element
    * sits within this slice of BOTH sets and candidates must collide on
    * ≥ min(L, ⌈t·n1⌉, ⌈t·n2⌉) elements, enforced in the candidate
    * aggregates).
    */
  private def prefixes(sets: DataFrame, idCol: String, dfreq: DataFrame,
                       tNum: Int, tDen: Int): DataFrame =
    orderedPrefix(
      sets.select(col(idCol), col("n"), explode(col("tk")).as("tok")),
      idCol, dfreq, col("n") - ceilMul(col("n"), tNum, tDen) +
        least(lit(lConf), ceilMul(col("n"), tNum, tDen)))

  /** Candidate pairs: share a prefix element, length-compatible, and
    * POSITION-compatible (PPJoin's positional filter). Both sets are
    * sorted by the same global order, so shared elements are aligned:
    * every shared element beyond the FIRST shared one sits after its
    * positions in BOTH sets, and any shared element before the first
    * collision would itself be a both-prefix collision — so
    *   overlap ≤ 1 + min(n1 − p1, n2 − p2)
    * at the first collision's positions (p1, p2) = (min p1, min p2 over
    * collision rows — the same row, by alignment). Requiring that upper
    * bound to reach the threshold overlap ⌈t(n1+n2)/(1+t)⌉ prunes the
    * long tail of single-shared-rare-element candidates before the
    * verify join ever materializes a token array (measured: 193k → ~2k
    * candidates on the sf0.1 shingle corpus). `selfPairs` adds the
    * d1 < d2 canonical cut of a self-join.
    */
  /** SELF-join candidates over ONE prefix table via dataset aliases
    * (round-9: `candidates(pref, pref, …)` projected two
    * differently-aliased copies of the prefix pipeline, and the
    * d1/d2 Alias nodes defeat exchange canonicalization — so the whole
    * orderedPrefix subtree (explode + df join + per-set sort + slice)
    * executed once PER SIDE. Aliasing the SAME child plan lets runtime
    * exchange reuse serve the build side from the probe's shuffle.)
    * Filters are identical to [[candidates]] with selfPairs=true.
    * Position-balanced A/B at sf0.1: q125 1.88→1.74 s, q135
    * 2.25→2.07 s, q134 a wash (its prefix reads the checkpointed gram
    * stream). `-Dgraft.setsim.selfAlias=false` restores the
    * two-projection form.
    */
  private def selfCandidates(pref: DataFrame, idCol: String,
                             tNum: Int, tDen: Int): DataFrame = {
    if (!sys.props.get("graft.setsim.selfAlias").forall(_.toBoolean))
      return candidates(maybeShj(pref), maybeShj(pref), idCol, tNum, tDen,
        selfPairs = true)
    val j = maybeShj(pref.alias("a"))
      .join(pref.alias("b"), col("a.tok") === col("b.tok"))
      .filter(greatest(col("a.n"), col("b.n")) * tNum <=
        least(col("a.n"), col("b.n")) * tDen)
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"),
        col("a.n").as("n1"), col("b.n").as("n2"),
        col("a.pos").as("p1"), col("b.pos").as("p2"))
    j.groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(min(col("p1")).as("p1"), min(col("p2")).as("p2"),
        count(lit(1)).as("k"))
      .filter(col("k") >= least(lit(lConf),
          ceilMul(col("n1"), tNum, tDen), ceilMul(col("n2"), tNum, tDen)) &&
        (lit(1) + least(col("n1") - col("p1"), col("n2") - col("p2")))
        * (tNum + tDen) >= (col("n1") + col("n2")) * tNum)
      .select(col("d1"), col("d2"))
  }

  private def candidates(prefL: DataFrame, prefR: DataFrame, idCol: String,
                         tNum: Int, tDen: Int, selfPairs: Boolean): DataFrame = {
    val a = prefL.select(col("tok"), col(idCol).as("d1"),
      col("n").as("n1"), col("pos").as("p1"))
    val b = prefR.select(col("tok"), col(idCol).as("d2"),
      col("n").as("n2"), col("pos").as("p2"))
    val joined = a.join(b, Seq("tok"))
      .filter(greatest(col("n1"), col("n2")) * tNum <=
        least(col("n1"), col("n2")) * tDen)
    val cut = if (selfPairs) joined.filter(col("d1") < col("d2")) else joined
    cut.groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(min(col("p1")).as("p1"), min(col("p2")).as("p2"),
        count(lit(1)).as("k"))
      .filter(col("k") >= least(lit(lConf),
          ceilMul(col("n1"), tNum, tDen), ceilMul(col("n2"), tNum, tDen)) &&
        (lit(1) + least(col("n1") - col("p1"), col("n2") - col("p2")))
        * (tNum + tDen) >= (col("n1") + col("n2")) * tNum)
      .select(col("d1"), col("d2"))
  }

  /** Exact intersection over the full distinct-element sets — arrays
    * travel only for candidate docs.
    */
  private def verify(cand: DataFrame, setsL: DataFrame, setsR: DataFrame,
                     idCol: String, tNum: Int, tDen: Int): DataFrame = {
    val s1 = setsL.select(col(idCol).as("d1"), col("tk").as("tk1"), col("n").as("n1"))
    val s2 = setsR.select(col(idCol).as("d2"), col("tk").as("tk2"), col("n").as("n2"))
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("inter_cnt", size(array_intersect(col("tk1"), col("tk2"))).cast("long"))
      .withColumn("union_cnt", (col("n1") + col("n2")).cast("long") - col("inter_cnt"))
      .filter(col("inter_cnt") * tDen >= col("union_cnt") * tNum)
      .select(col("d1"), col("d2"), col("inter_cnt"), col("union_cnt"))
  }
}
