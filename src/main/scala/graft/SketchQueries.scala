package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Bounded-memory sketch operators — the structures that replace exact
  * aggregation state when the key domain itself outgrows memory at
  * 100 TB (q83's heavy-hitter caveat made the count-min promise; this
  * file keeps it). Both sketches are built with the engine's portable
  * poly-hash + the MinHash permutation constants, so the DuckDB oracle
  * replays them bit-for-bit — the sketch ESTIMATES are deterministic even
  * though they are approximate.
  */
object SketchQueries {
  import Queries.Q

  private def t(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.Tpch(s, dir)

  private val Mod = HashMod
  private val CmsWidth = graft.operators.Sketch.CmsWidth

  /** Count-min sketch over corpus token frequencies (Cormode &
    * Muthukrishnan): a d=4 × w=1024 counter grid — O(d·w) memory no
    * matter the corpus — probed here for the top-20 exact tokens so the
    * output carries (exact, estimate) side by side; est ≥ exact always,
    * inflation = bucket collisions. At 100 TB the sketch is the scale
    * path where q83's exact per-token aggregate state (one counter per
    * DISTINCT token, Heaps'-law growth) stops fitting; the grid stays
    * 4096 longs and merges by cell-wise addition across partitions or
    * micro-batches.
    *
    * Shuffle shape: occurrences fold to ≤ d·w partial cells per
    * partition map-side, so the sketch exchange is O(d·w) rows regardless
    * of corpus size; the probe side broadcasts the 4096-row grid.
    */
  val q101_countmin: Q = (s, dir) => {
    import graft.operators.Sketch
    val toks = t(s, dir).documents
      .select(explode(tokens(col("text"))).as("tok"))
    val cells = Sketch.cmsCells(toks, "tok")
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("tok").asc).limit(20)
    val probes = top
      .select(col("tok"), col("exact"), Sketch.cmsEntries(col("tok")).as("p"))
      .select(col("tok"), col("exact"), col("p.i").as("i"), col("p.bucket").as("bucket"))
    probes.join(broadcast(cells), Seq("i", "bucket"))
      .groupBy(col("tok"), col("exact"))
      .agg(min(col("c")).as("est"))
  }

  /** KMV / bottom-k sample: the k=100 documents with the smallest
    * poly-hash of a salted id — a uniform, REPLAYABLE corpus sample (no
    * rand(); same winner set on any engine, any partitioning, any day),
    * plus the classic k-minimum-values distinct estimate
    * `(k−1)·M / max(h)` carried on every row. One TakeOrdered — map-side
    * top-k per partition, k rows to the driver — no matter the corpus
    * size; this is how a 100 TB pipeline draws eyeball/eval samples and
    * sizes a corpus without a full count.
    */
  val q102_kmv_sample: Q = (s, dir) => {
    val k = 100
    val hk = polyHash(concat(lit("sample|"), col("doc_id").cast("string")))
    val w = Window.partitionBy()
    t(s, dir).documents
      .select(col("doc_id"), hk.as("hk"))
      .orderBy(col("hk").asc, col("doc_id").asc)
      .limit(k)
      .withColumn("est_distinct",
        floor(lit((k - 1).toDouble) * lit(Mod.toDouble) / max(col("hk")).over(w))
          .cast("long"))
  }

  /** HyperLogLog distinct-token estimate per source, exact count alongside
    * ([[graft.operators.Sketch.hllRegisters]]): the vocabulary-size
    * question every corpus dashboard asks, answered in m=256 longs per
    * source instead of one counter per distinct token (Heaps'-law state —
    * the same blowup q101's grid dodges for frequencies). Shuffle shape:
    * register maxes fold map-side, so the sketch exchange is
    * ≤ |sources|·256 rows at any corpus size; the EXACT count alongside is
    * the verification baseline (it shuffles distinct (source, token) pairs
    * — the thing you can't afford at 100 TB, which is the point).
    * Registers and estimate replay bit-for-bit in the oracle; the spec
    * additionally pins the m-register merge identity and the error bound.
    */
  val q145_hll: Q = (s, dir) => {
    import graft.operators.Sketch
    val tk = t(s, dir).documents
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(tk, Seq("source"), "tok"), Seq("source"))
    val exact = tk.groupBy(col("source"))
      .agg(countDistinct(col("tok")).as("exact"))
    est.join(exact, "source")
      .select(col("source"), col("filled"), col("est"), col("exact"))
  }

  /** Sampled per-group quantiles
    * ([[graft.operators.Sketch.sampledQuantiles]]): document-length
    * p50/p90/p99 per source over a k=64 bottom-hash sample per group —
    * the percentile question q43/q82 answer exactly, answered at sketch
    * cost (one WindowGroupLimit-bounded exchange of ≤ k rows per group)
    * with a deterministic, bit-replayable sample. The fixture sources
    * hold more than k docs each, so the driver row checks the SAMPLED
    * path, not the exact small-group degenerate case (the spec covers
    * that one).
    */
  val q154_sampled_quantiles: Q = (s, dir) => {
    import graft.operators.Sketch
    val docs = t(s, dir).documents
      .select(col("source"), col("doc_id"), col("text"))
    Sketch.sampledQuantiles(docs, Seq("source"),
      size(tokens(col("text"))).cast("long"), "doc_id",
      k = 64, qs = Seq(0.5, 0.9, 0.99))
  }

  /** Token-weighted doc-length quantiles per source
    * ([[graft.operators.Sketch.weightedSampledQuantiles]]): "the length
    * under which q of the TOKEN MASS lives" — the weighted companion of
    * q154 (a long doc counts by its tokens, not once), over a k=64 A-ES
    * sample per group (q119's race — inclusion ∝ weight,
    * deterministic). Empty docs carry zero weight and are excluded
    * up-front (the A-ES contract is w > 0, checked fail-loud).
    */
  val q156_weighted_quantiles: Q = (s, dir) => {
    import graft.operators.Sketch
    val docs = t(s, dir).documents
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(tokens(col("text"))).cast("long").as("ntok"))
      .filter(col("ntok") > 0)
    Sketch.weightedSampledQuantiles(docs, Seq("source"),
      col("n_chars"), col("ntok"), "doc_id",
      k = 64, qs = Seq(0.5, 0.9, 0.99))
  }

  def all: Map[String, Q] = Map(
    "q101_countmin" -> q101_countmin,
    "q102_kmv_sample" -> q102_kmv_sample,
    "q154_sampled_quantiles" -> q154_sampled_quantiles,
    "q156_weighted_quantiles" -> q156_weighted_quantiles,
    "q145_hll" -> q145_hll)

  /** The engine poly-hash over an arbitrary SQL string expression. */
  private def polyHashSql(expr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |  list_transform(string_split($expr, ''), c -> ascii(c)::BIGINT)),
       |  (h, a) -> (h * 31 + a) % 1000000007)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q101_countmin" ->
      s"""WITH tk AS (
         |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         |  FROM documents),
         |hx AS (SELECT tok, ${polyHashSql("tok")} AS x FROM tk),
         |cells AS (
         |  SELECT i,
         |    ((((2654435761 * (i+1)) % 1000000007) * x
         |      + (40503 * (i+1) + 17) % 1000000007) % 1000000007) % $CmsWidth
         |      AS bucket,
         |    count(*) AS c
         |  FROM hx, unnest([0, 1, 2, 3]) AS u(i) GROUP BY 1, 2),
         |exact AS (SELECT tok, count(*) AS exact FROM tk GROUP BY 1),
         |top AS (SELECT tok, exact FROM exact ORDER BY exact DESC, tok ASC LIMIT 20),
         |pr AS (
         |  SELECT tok, exact, i,
         |    ((((2654435761 * (i+1)) % 1000000007) * ${polyHashSql("tok")}
         |      + (40503 * (i+1) + 17) % 1000000007) % 1000000007) % $CmsWidth
         |      AS bucket
         |  FROM top, unnest([0, 1, 2, 3]) AS u(i))
         |SELECT pr.tok, pr.exact, min(cells.c) AS est
         |FROM pr JOIN cells USING (i, bucket)
         |GROUP BY 1, 2""".stripMargin,
    "q154_sampled_quantiles" ->
      s"""WITH base AS (
         |  SELECT source, doc_id,
         |    length(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS val,
         |    ${polyHashSql("'qtile|' || doc_id::VARCHAR")} AS hk
         |  FROM documents),
         |sample AS (
         |  SELECT source, doc_id, val FROM (
         |    SELECT *, row_number() OVER (PARTITION BY source
         |      ORDER BY hk ASC, doc_id ASC) AS sr FROM base)
         |  WHERE sr <= 64),
         |ranked AS (
         |  SELECT source, val,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY val ASC, doc_id ASC) AS vr,
         |    count(*) OVER (PARTITION BY source) AS m
         |  FROM sample)
         |SELECT source, q, val AS value, m AS sample_n
         |FROM ranked, unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS u(q)
         |WHERE vr = ceil(q * m)::BIGINT""".stripMargin,
    "q156_weighted_quantiles" ->
      s"""WITH base AS (
         |  SELECT source, doc_id, n_chars,
         |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS w
         |  FROM documents),
         |keyed AS (
         |  SELECT *, -ln(((((doc_id % 1000000007 + 1000000007) % 1000000007)
         |      * 2654435761) % 1000000007 + 1)::DOUBLE
         |    / 1000000008.0) / w::DOUBLE AS key
         |  FROM base WHERE w > 0),
         |sample AS (
         |  SELECT source, doc_id, n_chars AS val, w FROM (
         |    SELECT *, row_number() OVER (PARTITION BY source
         |      ORDER BY key ASC, doc_id ASC) AS sr FROM keyed)
         |  WHERE sr <= 64),
         |cum AS (
         |  SELECT source, doc_id, val, w,
         |    sum(w) OVER (PARTITION BY source ORDER BY val ASC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) AS c,
         |    sum(w) OVER (PARTITION BY source) AS tot
         |  FROM sample)
         |SELECT source, q, val AS value, tot::BIGINT AS sample_w FROM (
         |  SELECT *, row_number() OVER (PARTITION BY source, q
         |    ORDER BY val ASC, doc_id ASC) AS pr
         |  FROM cum, unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS u(q)
         |  WHERE c::DOUBLE >= q * tot::DOUBLE)
         |WHERE pr = 1""".stripMargin,
    "q102_kmv_sample" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ${polyHashSql("'sample|' || doc_id::VARCHAR")} AS hk
         |  FROM documents),
         |s AS (SELECT doc_id, hk FROM h ORDER BY hk ASC, doc_id ASC LIMIT 100)
         |SELECT doc_id, hk,
         |  floor(99.0 * 1000000007.0 / max(hk) OVER ())::BIGINT AS est_distinct
         |FROM s""".stripMargin,
    "q145_hll" ->
      s"""WITH tk AS (
         |  SELECT source,
         |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         |  FROM documents),
         |hx AS (SELECT source, tok, ${polyHashSql("tok")} AS h FROM tk),
         |rr AS (
         |  SELECT source, h % 256 AS reg,
         |    CASE WHEN h // 256 = 0 THEN 23
         |         ELSE 23 - length(bin(h // 256)) END AS rho
         |  FROM hx),
         |regs AS (SELECT source, reg, max(rho) AS mr FROM rr GROUP BY 1, 2),
         |-- order-free: every term is an exact power of two >= 2^-23, so
         |-- all partial sums fit 31 mantissa bits and add EXACTLY
         |agg AS (
         |  SELECT source, count(*) AS filled,
         |    sum(1.0 / power(2, mr)) AS s
         |  FROM regs GROUP BY 1),
         |e AS (
         |  SELECT source, filled,
         |    -- trailing factor = HashMod / 2^30: the engine's hash-range
         |    -- bias correction (Sketch.hllEstimate), operand order exact
         |    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
         |      * (1000000007.0 / 1073741824.0)
         |      / (s + (256 - filled)::DOUBLE) AS raw
         |  FROM agg),
         |ex AS (SELECT source, count(DISTINCT tok) AS exact FROM tk GROUP BY 1)
         |SELECT e.source, filled::BIGINT AS filled,
         |  round(CASE WHEN raw <= 640.0 AND (256 - filled) > 0
         |    THEN 256.0 * ln(256.0 / (256 - filled)::DOUBLE)
         |    ELSE raw END, 4) AS est,
         |  exact::BIGINT AS exact
         |FROM e JOIN ex ON e.source = ex.source""".stripMargin)
}
