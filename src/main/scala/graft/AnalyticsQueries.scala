package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.tokens

/** Retrieval ranking and corpus-monitoring analytics: BM25 (the scoring
  * head on top of the q103 postings family), cohort retention (the classic
  * warehouse activity matrix the reference's DWS layer feeds), and PSI
  * distribution drift (how a production corpus pipeline notices that this
  * week's crawl stopped looking like last week's).
  */
object AnalyticsQueries {
  import Queries.Q

  private def t(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.Tpch(s, dir)

  /** BM25 parameters (Robertson-Spärck Jones defaults) and the query term
    * set. Terms are a literal: a search head scores ONE query at a time,
    * so only matching postings ever leave the scan stage.
    */
  val BM25_K1 = 1.2
  val BM25_B = 0.75
  val BM25_TERMS = Seq("spark", "join", "window", "data")
  val BM25_TOPN = 20

  /** BM25 ranked retrieval, top-20 docs for the literal term set.
    *
    * Scale shape: the `tok isin terms` filter runs BEFORE the (doc, tok)
    * aggregate, so only query-term postings shuffle (a few rows/doc, no
    * text); doc length is scan-local `size(tokens)`; N and avgdl are one
    * global aggregate that cross-joins back as a 1-row broadcast; df is a
    * count window over the tf aggregate — |terms| distinct keys. Scores
    * round to 6 before ranking (tie-break doc_id asc); top-N compiles to
    * TakeOrdered. idf is the standard `ln(1 + (N - df + .5)/(df + .5))`
    * (always positive, unlike the raw RSJ form).
    */
  val q110_bm25: Q = (s, dir) => {
    val docs = t(s, dir).documents
      .select(col("doc_id"), size(tokens(col("text"))).as("dl"),
        tokens(col("text")).as("tk"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("tk")).as("tok"))
      .filter(col("tok").isin(BM25_TERMS: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * (col("tf") * (BM25_K1 + 1)) /
          (col("tf") + lit(BM25_K1) * (lit(1 - BM25_B) + lit(BM25_B) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("w")), 6).as("bm25"),
        count(lit(1)).as("n_terms"))
    // top-N first (TakeOrdered — map-side N, no global sort), THEN the rank
    // window, which therefore runs on BM25_TOPN rows, not the corpus
    val top = scored.orderBy(col("bm25").desc, col("doc_id").asc).limit(BM25_TOPN)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("bm25").desc, col("doc_id").asc)).cast("long"))
  }

  /** Cohort retention matrix over the events stream: users grouped by
    * first-active day, counted on each later active day (offset in days).
    *
    * Scale shape: one events scan; distinct (user, day) first — the raw
    * stream never reaches the window — then the cohort via a min-window on
    * user, then the (cohort, offset) aggregate. `count(*)` IS the distinct
    * user count there: rows are distinct (user, day) and a user's offset
    * is a function of its day, so (user, offset) is unique within a cohort
    * — no count-distinct expand needed. All three exchanges carry narrow
    * (user/date) keys.
    */
  val q111_retention: Q = (s, dir) => {
    val ua = t(s, dir).events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val wc = ua.withColumn("cohort_d",
      min(col("d")).over(Window.partitionBy(col("user_id"))))
    wc.groupBy(
        date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort"),
        datediff(col("d"), col("cohort_d")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** PSI binning: fixed-width n_chars bins (width 64, capped at bin 15) —
    * fixed edges rather than reference deciles so the bin rule is a pure
    * per-row expression (no quantile pass, engine-independent). PSI floors
    * empty cells at 1e-6, the conventional epsilon.
    */
  val PSI_BINW = 64.0
  val PSI_BINMAX = 15
  val PSI_EPS = 1e-6
  val PSI_REF = "src0"

  /** Population-stability-index drift of the n_chars distribution, each
    * source scored against the reference snapshot `src0`.
    *
    * Scale shape: ONE corpus-wide exchange (the (source, bin) count, ≤16
    * rows per source after map-side partials); everything after it —
    * per-source shares, the source×bin grid (so bins missing on either
    * side still contribute), the epsilon floor, the PSI sum — runs on
    * O(sources × 16) rows with broadcast joins. The monitoring query a
    * 100 TB ingest runs per batch for the cost of one narrow aggregate.
    */
  val q112_psi_drift: Q = (s, dir) => {
    val counts = t(s, dir).documents
      .select(col("source"),
        least(floor(col("n_chars") / PSI_BINW), lit(PSI_BINMAX)).cast("int").as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val shares = counts.withColumn("p",
      col("c") / sum(col("c")).over(Window.partitionBy(col("source"))))
    val ref = shares.filter(col("source") === PSI_REF)
      .select(col("bin"), col("p").as("pr"))
    val cur = shares.filter(col("source") =!= PSI_REF)
      .select(col("source"), col("bin"), col("p"))
    val grid = cur.select(col("source")).distinct()
      .crossJoin(broadcast(counts.select(col("bin")).distinct()))
    val psi = grid
      .join(broadcast(ref), Seq("bin"), "left")
      .join(broadcast(cur), Seq("source", "bin"), "left")
      .select(col("source"),
        greatest(coalesce(col("p"), lit(0.0)), lit(PSI_EPS)).as("q"),
        greatest(coalesce(col("pr"), lit(0.0)), lit(PSI_EPS)).as("pb"))
      .groupBy(col("source"))
      .agg(round(sum((col("q") - col("pb")) * log(col("q") / col("pb"))), 6).as("psi"))
    psi
  }

  /** RRF constant (Cormack et al.'s 60) and arm/output depths. */
  val RRF_K = 60
  val RRF_ARM_N = 20
  val RRF_TOPN = 10
  val RRF_QUERY_VEC = 0L

  /** Hybrid retrieval: BM25 lexical arm fused with an embedding cosine arm
    * by reciprocal-rank fusion — the standard head of a production RAG
    * stack (each arm covers the other's blind spot: BM25 exact terms,
    * embeddings paraphrase). Σ 1/(k + rank) over the arms that returned
    * the doc; vec_id doubles as doc_id in the synthetic tables.
    *
    * Scale shape: each arm is already top-N (BM25's TakeOrdered, the
    * cosine arm's broadcast-1-query scan + TakeOrdered), so the fusion
    * full-outer join runs on 2×RRF_ARM_N rows — driver-trivial no matter
    * the corpus. At 100 TB the arms are the expensive part and both stay
    * index-shaped (postings filter / ANN probe); fusion cost never grows.
    */
  val q116_hybrid_rrf: Q = (s, dir) => {
    val W = Window
    val lex = q110_bm25(s, dir).select(col("doc_id"), col("rank").as("lex_rank"))
    val emb = t(s, dir).embeddings
    val qv = emb.filter(col("vec_id") === RRF_QUERY_VEC)
      .select(graft.operators.Similarity.asDouble(col("embedding")).as("qv"))
    val sem = emb.filter(col("vec_id") =!= RRF_QUERY_VEC)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(graft.operators.Similarity.cosine(
          graft.operators.Similarity.asDouble(col("embedding")), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc).limit(RRF_ARM_N)
      .withColumn("sem_rank",
        row_number().over(W.orderBy(col("cos").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("sem_rank"))
    val fused = lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        round(
          coalesce(lit(1.0) / (lit(RRF_K) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RRF_K) + col("sem_rank")), lit(0.0)), 6).as("rrf"))
    fused.orderBy(col("rrf").desc, col("doc_id").asc).limit(RRF_TOPN)
      .withColumn("fused_rank",
        row_number().over(W.orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
  }

  /** The funnel's ordered steps (event_type values, in required order). */
  val FUNNEL_STEPS = Seq("view", "click", "purchase")

  /** Ordered conversion funnel: users who did view → click → purchase IN
    * ORDER (each step strictly after the previous one's first completion —
    * the min-ts chaining definition, so a purchase before any click does
    * not count). The product-analytics staple over the reference's traffic
    * domain; emits per-step user counts + conversion-from-start.
    *
    * Scale shape: one filtered scan per step feeding a per-user min
    * aggregate — all three aggregates and both chaining joins share the
    * user_id key, so AQE plans one exchange lineage per step and the
    * chained tables shrink monotonically (step k+1 aggregates only step-k
    * completers' events). The final rollup is three 1-row counts unioned —
    * no wide state anywhere.
    */
  val q120_funnel: Q = (s, dir) => {
    val ev = t(s, dir).events
    def stepMin(typ: String) = ev.filter(col("event_type") === typ)
      .groupBy(col("user_id")).agg(min(col("ts")).as("mts"))
    val s1 = stepMin(FUNNEL_STEPS(0)).select(col("user_id"), col("mts").as("t1"))
    val s2 = ev.filter(col("event_type") === FUNNEL_STEPS(1))
      .join(s1, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === FUNNEL_STEPS(2))
      .join(s2, Seq("user_id")).filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val counts = Seq(s1, s2, s3).zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).cast("long").as("step"),
          lit(FUNNEL_STEPS(i)).as("event_type"), col("users"))
    }
    val u = counts.reduce(_ unionByName _)
    val base = s1.agg(count(lit(1)).as("base_users"))
    u.crossJoin(broadcast(base))
      .select(col("step"), col("event_type"), col("users"),
        round(col("users").cast("double") / col("base_users"), 6).as("conv"))
  }

  /** Last-touch attribution: each purchase's value is credited to the
    * user's most recent NON-purchase event before it (the marketing
    * "which touch gets the sale" rollup). Formulated without IGNORE NULLS
    * so both engines replay it identically: per-user row_number, the
    * touch = max(rn where non-purchase) over the preceding frame, one
    * join back to fetch the touch's type. Purchases with no prior touch
    * credit "(none)". One (user) exchange serves the window; the
    * join-back is purchases × events on (user, rn) — purchase-row sized.
    */
  val q131_attribution: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = t(s, dir).events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("touch_rn",
        max(when(col("event_type") =!= "purchase", col("rn")))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("touch_rn"), col("value"))
    val touches = ev.select(col("user_id"), col("rn").as("touch_rn"),
      col("event_type").as("touch_type"))
    purchases.join(touches, Seq("user_id", "touch_rn"), "left_outer")
      .select(coalesce(col("touch_type"), lit("(none)")).as("touch_type"),
        col("value"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("purchases"),
        // dsum pattern: the last raw-decimal output column in the repo —
        // a decimal output type can never hash-match a DuckDB oracle
        // whose sum widens differently (the q126_r4 failure class)
        Queries.dsum(col("value")).as("revenue"))
  }

  /** Per-group OLS trend: closed-form slope/intercept of value over time
    * (x = epoch day) per event_type — the monitoring question "is this
    * metric drifting, and how fast" as one aggregate. Exactness recipe
    * (q73's contract): per-point y rounds to 6 dp and joins the sums as
    * DECIMAL (order-independent addition); x/x²/xy sums are integer/
    * decimal-exact; only the final slope/intercept divisions run in
    * IEEE double with a fixed operand order, then round to 6 dp.
    */
  val q132_trend: Q = (s, dir) => {
    val x = floor(col("ts").cast("long") / 86400).cast("long")
    val y6 = round(col("value"), 6).cast("decimal(18,6)")
    val agg = t(s, dir).events
      .select(col("event_type"), x.as("x"), y6.as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y")).as("sy"),
        sum((col("y") * col("x")).cast("decimal(38,6)")).as("sxy"))
    val nD = col("n").cast("double"); val sxD = col("sx").cast("double")
    val sxxD = col("sxx").cast("double")
    val syD = col("sy").cast("double"); val sxyD = col("sxy").cast("double")
    // den = n·Σx² − (Σx)² ≥ 0, and 0 exactly when every point shares one
    // x (a single day of data): slope is undefined — NULL, not 0/0 NaN
    val den = nD * sxxD - sxD * sxD
    val slope = round((nD * sxyD - sxD * syD) / den, 6)
    agg.select(col("event_type"), col("n"),
      when(den > 0, slope).as("slope"),
      when(den > 0, round((syD - slope * sxD) / nD, 6)).as("intercept"))
  }

  /** Trailing z-score anomaly detection: each (event_type, day)'s event
    * count against the mean/std of the preceding 7 CALENDAR days (a
    * RANGE frame on the day number — a ROWS frame would silently widen
    * the baseline across gaps to the last 7 OBSERVED days). The window
    * sums are INTEGER (count and count² of daily totals), so
    * mean/variance inputs are exact and the z arithmetic is fixed-order
    * IEEE double → cross-engine deterministic without trusting any
    * engine's streaming stddev. Days with fewer than 3 in-range
    * observations, or zero baseline variance, emit NULL z (the oracle
    * guards identically). Known blind spot, by construction: a day with
    * ZERO events produces no row at all, so a full outage never scores —
    * outage detection needs a calendar scaffold (types × day range, cnt
    * 0 filled) composed upstream; this query monitors volume SHIFTS on
    * days that have volume.
    */
  val ZWIN = 7
  val q133_volume_anomaly: Q = (s, dir) => {
    val day = floor(col("ts").cast("long") / 86400).cast("long")
    val daily = t(s, dir).events
      .select(col("event_type"), day.as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-ZWIN, -1)
    val st = daily
      .withColumn("m", count(col("cnt")).over(w))
      .withColumn("sc", sum(col("cnt")).over(w))
      .withColumn("scc", sum(col("cnt") * col("cnt")).over(w))
    val mD = col("m").cast("double"); val scD = col("sc").cast("double")
    val sccD = col("scc").cast("double"); val cntD = col("cnt").cast("double")
    val mean = scD / mD
    val variance = (sccD - scD * scD / mD) / (mD - lit(1.0))
    st.select(col("event_type"), col("day"), col("cnt"),
      when(col("m") >= 3 && variance > 0,
        round((cntD - mean) / sqrt(variance), 6)).as("z"))
  }

  val BASKET_MIN_PAIR = 2L
  val BASKET_TOPN = 20

  /** Market-basket association rules over co-ordered parts: for part pairs
    * appearing in ≥ BASKET_MIN_PAIR orders, emit support, confidence
    * (pair/p1-count) and lift (confidence / p2's base rate) — the
    * recommendation starter kit over the reference's trade domain.
    *
    * Scale shape: the self-join runs on the (order, part) DISTINCT pairs
    * co-partitioned by order key — one exchange serves both sides and the
    * pair fan-out is Σ items-per-order², bounded by basket size, never
    * corpus size. Item counts broadcast back (one row per part appearing
    * in a kept pair). Top-N by lift compiles to TakeOrdered.
    */
  val q121_basket_rules: Q = (s, dir) => {
    val op0 = t(s, dir).lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    // shuffle_hash pin on the self-join (round-9 optimization, measured):
    // both sides are the SAME corpus-sized distinct table, so the static
    // planner's broadcast choice (it broadcast all of op at sf0.1) cannot
    // be right at scale — the round-8 q165 / round-9 hammingPairs lesson —
    // and with both sides hashed on `o` over one child plan, exchange
    // reuse plans a single shuffle serving both. Position-balanced same-JVM
    // A/B at sf0.1: broadcast 1.51 s vs pinned 1.34 s — the scale-correct
    // plan is also the faster one here. A localCheckpoint of op (the
    // SetSim.prepare pattern — op is referenced 5×) was ALSO measured and
    // LOSES (even under the pre-fix harness that favored it): the
    // distinct is one cheap pushed-down scan, and the checkpoint's
    // synchronous materialization barrier costs more than four recomputes
    // at every scale where the scan is the cheap part. `-Dgraft.basket.shuffleHash=false` restores
    // the planner's choice (the `graft.setsim.shuffleHash` convention).
    // Self-join via dataset aliases over the SAME child plan (not two
    // differently-aliased projections, whose p1/p2 Alias nodes defeat
    // exchange-canonicalization): both sides hash on `o` over one
    // canonical subtree, so ReusedExchange serves the build side and the
    // scan+distinct runs once for the pair stage.
    // Round-10 negative, kept as a toggle: pair generation via one
    // per-order collect_set + array pair explode (q106's canonical
    // form) measured SLOWER than the o-keyed self-join here — balanced
    // A/B 1.52 vs 1.77 s. Baskets are small (~4 items), so the join's
    // per-order fan-out is cheap while the set aggregate pays object
    // arrays + sort per order and forfeits the reused exchange's
    // codegen'd join. `-Dgraft.basket.pairsViaSets=true` selects it.
    val pairs0 = if (sys.props.get("graft.basket.pairsViaSets").exists(_.toBoolean)) {
      t(s, dir).lineitem
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .groupBy(col("o")).agg(array_sort(collect_set(col("p"))).as("ps"))
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + 2, size(col("ps"))), y =>
            struct(x.as("p1"), y.as("p2")))))).as("pr"))
        .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
    } else {
      val lhs0 = op0.alias("a")
      val lhs = if (sys.props.get("graft.basket.shuffleHash").forall(_.toBoolean))
        lhs0.hint("shuffle_hash") else lhs0
      lhs
        .join(op0.alias("b"), col("a.o") === col("b.o"))
        .filter(col("a.p") < col("b.p"))
        .select(col("a.p").as("p1"), col("b.p").as("p2"))
    }
    val pairs = pairs0
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= BASKET_MIN_PAIR)
    val items = op0.groupBy(col("p").as("pid")).agg(count(lit(1)).as("item_cnt"))
    val nOrders = op0.select(col("o")).distinct().agg(count(lit(1)).as("n_orders"))
    // Round-10: BOTH item-count attaches ride ONE broadcast build — the
    // previous differently-renamed projections (pid→p1/c1, pid→p2/c2)
    // defeated exchange canonicalization, so the scan+distinct+aggregate
    // subtree built TWO broadcast relations per run. Dataset aliases over
    // the same child leave the exchanges canonically equal and the second
    // build is a ReusedExchange (the q121/SetSim round-9 pattern, now on
    // the broadcast side). `-Dgraft.basket.itemsAlias=false` restores the
    // two-projection form.
    val attached = if (sys.props.get("graft.basket.itemsAlias").forall(_.toBoolean)) {
      val ib = broadcast(items)
      pairs
        .join(ib.alias("i1"), col("p1") === col("i1.pid"))
        .join(ib.alias("i2"), col("p2") === col("i2.pid"))
        .select(col("p1"), col("p2"), col("pair_cnt"),
          col("i1.item_cnt").as("c1"), col("i2.item_cnt").as("c2"))
    } else pairs
      .join(broadcast(items.select(col("pid").as("p1"), col("item_cnt").as("c1"))), Seq("p1"))
      .join(broadcast(items.select(col("pid").as("p2"), col("item_cnt").as("c2"))), Seq("p2"))
    attached
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("pair_cnt"),
        round(col("pair_cnt").cast("double") / col("n_orders"), 6).as("support"),
        round(col("pair_cnt").cast("double") / col("c1"), 6).as("confidence"),
        round((col("pair_cnt").cast("double") / col("c1")) * col("n_orders") / col("c2"), 6).as("lift"))
      .orderBy(col("lift").desc, col("p1").asc, col("p2").asc)
      .limit(BASKET_TOPN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("lift").desc, col("p1").asc, col("p2").asc)).cast("long"))
  }

  def all: Map[String, Q] = Map(
    "q121_basket_rules" -> q121_basket_rules,
    "q110_bm25" -> q110_bm25,
    "q111_retention" -> q111_retention,
    "q112_psi_drift" -> q112_psi_drift,
    "q116_hybrid_rrf" -> q116_hybrid_rrf,
    "q120_funnel" -> q120_funnel,
    "q131_attribution" -> q131_attribution,
    "q132_trend" -> q132_trend,
    "q133_volume_anomaly" -> q133_volume_anomaly)

  private val toksSql = "list_filter(string_split(text, ' '), x -> x <> '')"

  /** The BM25 scoring pipeline as a reusable CTE chain ending in `lexr`
    * (doc_id, bm25, n_terms, rank) — shared by the q110 oracle and q116's
    * lexical arm.
    */
  private def bm25Ctes: String = {
    val termsIn = BM25_TERMS.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""d AS (SELECT doc_id, len($toksSql) AS dl, $toksSql AS tk FROM documents),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
       |ex AS (SELECT doc_id, dl, unnest(tk) AS tok FROM d),
       |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM ex
       |       WHERE tok IN $termsIn GROUP BY 1, 2, 3),
       |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |w AS (SELECT tf.doc_id,
       |        ln(1 + (s.n_docs - dfx.df + 0.5) / (dfx.df + 0.5)) *
       |          (tf.tf * ${BM25_K1 + 1}) /
       |          (tf.tf + $BM25_K1 * (1 - $BM25_B + $BM25_B * tf.dl / s.avgdl)) AS w
       |      FROM tf JOIN dfx USING (tok) CROSS JOIN stats s),
       |sc AS (SELECT doc_id, round(sum(w), 6) AS bm25, count(*) AS n_terms
       |       FROM w GROUP BY 1),
       |lexr AS (SELECT doc_id, bm25, n_terms,
       |           row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
       |         FROM sc)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // Same exactness recipe as the Spark side: rounded-decimal y, integer
    // x sums, one fixed-order double division per output, intercept reuses
    // the ROUNDED slope.
    "q132_trend" ->
      """WITH pts AS (
        |  SELECT event_type, (floor(epoch(ts) / 86400))::BIGINT AS x,
        |    round(value, 6)::DECIMAL(18,6) AS y
        |  FROM events),
        |agg AS (
        |  SELECT event_type, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |    sum(x * x)::BIGINT AS sxx, sum(y) AS sy,
        |    sum((y * x)::DECIMAL(38,6)) AS sxy
        |  FROM pts GROUP BY 1)
        |SELECT event_type, n,
        |  CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0 THEN
        |    round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
        |  END AS slope,
        |  CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0 THEN
        |    round((sy::DOUBLE -
        |      round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |        / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
        |      * sx::DOUBLE) / n::DOUBLE, 6)
        |  END AS intercept
        |FROM agg""".stripMargin,
    "q133_volume_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, (floor(epoch(ts) / 86400))::BIGINT AS day,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, day, cnt,
        |    count(cnt) OVER w AS m,
        |    sum(cnt) OVER w AS sc,
        |    sum(cnt * cnt) OVER w AS scc
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, cnt,
        |  CASE WHEN m >= 3 AND
        |    (scc::DOUBLE - sc::DOUBLE * sc::DOUBLE / m::DOUBLE) / (m::DOUBLE - 1.0) > 0
        |  THEN round((cnt::DOUBLE - sc::DOUBLE / m::DOUBLE) /
        |    sqrt((scc::DOUBLE - sc::DOUBLE * sc::DOUBLE / m::DOUBLE) / (m::DOUBLE - 1.0)), 6)
        |  END AS z
        |FROM st""".stripMargin,
    "q131_attribution" ->
      """WITH base AS (
        |  SELECT user_id, event_type, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |ev AS (
        |  SELECT *,
        |    max(CASE WHEN event_type <> 'purchase' THEN rn END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_rn
        |  FROM base)
        |SELECT coalesce(t.event_type, '(none)') AS touch_type,
        |  count(*)::BIGINT AS purchases,
        |  (round(sum((p.value)::DECIMAL(18,6)), 2))::DOUBLE AS revenue
        |FROM (SELECT user_id, touch_rn, value FROM ev
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN ev t ON t.user_id = p.user_id AND t.rn = p.touch_rn
        |GROUP BY 1""".stripMargin,
    "q110_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT doc_id, bm25, n_terms, rank FROM lexr
         |WHERE rank <= $BM25_TOPN""".stripMargin,
    "q116_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
         |${SimilarityQueries.vCte},
         |sq AS (SELECT v AS qv FROM v WHERE vec_id = $RRF_QUERY_VEC),
         |cs AS (SELECT v.vec_id AS doc_id, ${SimilarityQueries.cosSql("v.v", "sq.qv")} AS cos
         |       FROM v CROSS JOIN sq WHERE v.vec_id <> $RRF_QUERY_VEC),
         |semr AS (SELECT doc_id, sem_rank FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS sem_rank
         |  FROM cs) WHERE sem_rank <= $RRF_ARM_N),
         |lex AS (SELECT doc_id, rank AS lex_rank FROM lexr WHERE rank <= $RRF_ARM_N),
         |f AS (SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
         |        round(coalesce(1.0::DOUBLE / ($RRF_K + l.lex_rank), 0) +
         |              coalesce(1.0::DOUBLE / ($RRF_K + s.sem_rank), 0), 6) AS rrf
         |      FROM lex l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id)
         |SELECT doc_id, lex_rank, sem_rank, rrf, fused_rank FROM (
         |  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS fused_rank
         |  FROM f)
         |WHERE fused_rank <= $RRF_TOPN""".stripMargin,
    "q121_basket_rules" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |pairs AS (
         |  SELECT a.p AS p1, b.p AS p2, count(*) AS pair_cnt
         |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
         |  GROUP BY 1, 2 HAVING count(*) >= $BASKET_MIN_PAIR),
         |items AS (SELECT p AS pid, count(*) AS item_cnt FROM op GROUP BY 1),
         |n AS (SELECT count(DISTINCT o) AS n_orders FROM op),
         |scored AS (
         |  SELECT p1, p2, pair_cnt,
         |    round(pair_cnt::DOUBLE / n.n_orders, 6) AS support,
         |    round(pair_cnt::DOUBLE / i1.item_cnt, 6) AS confidence,
         |    round((pair_cnt::DOUBLE / i1.item_cnt) * n.n_orders / i2.item_cnt, 6) AS lift
         |  FROM pairs
         |  JOIN items i1 ON pairs.p1 = i1.pid
         |  JOIN items i2 ON pairs.p2 = i2.pid
         |  CROSS JOIN n)
         |SELECT p1, p2, pair_cnt, support, confidence, lift, rank FROM (
         |  SELECT *, row_number() OVER (
         |    ORDER BY lift DESC, p1 ASC, p2 ASC) AS rank
         |  FROM scored)
         |WHERE rank <= $BASKET_TOPN""".stripMargin,
    "q120_funnel" ->
      s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
         |            WHERE event_type = '${FUNNEL_STEPS(0)}' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
         |       JOIN s1 ON e.user_id = s1.user_id
         |       WHERE e.event_type = '${FUNNEL_STEPS(1)}' AND e.ts > s1.t1
         |       GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
         |       JOIN s2 ON e.user_id = s2.user_id
         |       WHERE e.event_type = '${FUNNEL_STEPS(2)}' AND e.ts > s2.t2
         |       GROUP BY 1),
         |u AS (
         |  SELECT 1::BIGINT AS step, '${FUNNEL_STEPS(0)}' AS event_type,
         |         (SELECT count(*) FROM s1) AS users
         |  UNION ALL SELECT 2, '${FUNNEL_STEPS(1)}', (SELECT count(*) FROM s2)
         |  UNION ALL SELECT 3, '${FUNNEL_STEPS(2)}', (SELECT count(*) FROM s3))
         |SELECT step, event_type, users,
         |  round(users::DOUBLE / (SELECT count(*) FROM s1), 6) AS conv
         |FROM u""".stripMargin,
    "q111_retention" ->
      """WITH ua AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
        |wc AS (SELECT user_id, d, min(d) OVER (PARTITION BY user_id) AS cohort_d
        |       FROM ua)
        |SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort,
        |       date_diff('day', cohort_d, d)::BIGINT AS day_offset,
        |       count(*) AS users
        |FROM wc GROUP BY 1, 2""".stripMargin,
    "q112_psi_drift" ->
      s"""WITH b AS (SELECT source,
         |             least(floor(n_chars / $PSI_BINW), $PSI_BINMAX)::INT AS bin
         |           FROM documents),
         |c AS (SELECT source, bin, count(*) AS c FROM b GROUP BY 1, 2),
         |sh AS (SELECT source, bin,
         |         c / (sum(c) OVER (PARTITION BY source)) AS p FROM c),
         |ref AS (SELECT bin, p AS pr FROM sh WHERE source = '$PSI_REF'),
         |cur AS (SELECT source, bin, p FROM sh WHERE source <> '$PSI_REF'),
         |grid AS (SELECT s.source, bn.bin
         |         FROM (SELECT DISTINCT source FROM cur) s
         |         CROSS JOIN (SELECT DISTINCT bin FROM c) bn),
         |j AS (SELECT g.source,
         |        greatest(coalesce(cur.p, 0), $PSI_EPS) AS q,
         |        greatest(coalesce(ref.pr, 0), $PSI_EPS) AS pb
         |      FROM grid g
         |      LEFT JOIN ref ON g.bin = ref.bin
         |      LEFT JOIN cur ON cur.source = g.source AND cur.bin = g.bin)
         |SELECT source, round(sum((q - pb) * ln(q / pb)), 6) AS psi
         |FROM j GROUP BY 1""".stripMargin)
}
