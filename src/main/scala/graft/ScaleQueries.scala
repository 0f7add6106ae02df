package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._
import graft.operators.{Layout, Merge, Relational, RuntimeFilter}

/** Scale-technique queries: operators whose POINT is the 100 TB plan shape
  * — chunking fan-out without shuffles, per-domain caps as a rank
  * window-limit, runtime bloom-filter join pruning, and z-order layout
  * math. Each is oracle-checked like every other query; the layout/pruning
  * side effects (partition skipping, pre-shuffle row reduction) are pinned
  * in ZOrderSpec / RuntimeFilterSpec.
  */
object ScaleQueries {
  import Queries.Q

  private def t(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.Tpch(s, dir)

  // chunk geometry shared with CorpusPipeline.packageStage
  private val ChunkW = graft.pipelines.CorpusPipeline.DefaultChunkW
  private val ChunkS = graft.pipelines.CorpusPipeline.DefaultChunkS

  /** Sliding-window document chunking with overlap — the step that turns a
    * cleaned corpus into training/RAG chunks. Per-row fan-out only
    * (sequence + posexplode + slice): zero shuffles, so at 100 TB it runs
    * entirely inside the scan stage. Each chunk carries its provenance
    * (doc_id, chunk_id, token offset) and a portable fingerprint so
    * chunk-level dedup can chain downstream.
    */
  val q78_chunk_overlap: Q = (s, dir) =>
    graft.pipelines.CorpusPipeline
      .chunk(t(s, dir).documents, "doc_id", "text", ChunkW, ChunkS)
      .select(
        col("doc_id"), col("chunk_id"), col("chunk_start"),
        size(col("chunk")).as("n_chunk_tokens"),
        polyHash(array_join(col("chunk"), " ")).as("chunk_fp"))

  /** Per-domain document cap (RefinedWeb/CCNet-style): keep at most K=10
    * docs per source, best-quality first. Expressed as the rank
    * window-limit so Spark's WindowGroupLimit keeps only K rows per group
    * on the map side — the shuffle carries O(K · sources) rows, not the
    * corpus. Ordering is total (quality desc, doc_id) — deterministic
    * under retries. K=10 binds at the verify scale factor (~25
    * docs/source at sf0.01), so the oracle checks the cap, not a no-op.
    */
  val q79_domain_cap: Q = (s, dir) => {
    val scored = t(s, dir).documents.select(
      col("doc_id"), col("source"),
      qualityScore(col("text")).as("quality"))
    Relational.topKPerGroup(scored, Seq("source"),
        Seq(col("quality").desc, col("doc_id").asc), 10)
      .select(col("source"), col("doc_id"), col("quality"),
        col("rank").cast("long").as("rank"))
  }

  /** Runtime bloom-filter join pruning: revenue of lineitems belonging to
    * URGENT orders. The bloom filter built from the filtered orders keys
    * drops ~80 % of lineitem rows scan-local, BEFORE the join shuffle —
    * the explicit form of AQE's InjectRuntimeFilter. Results are exactly
    * the plain join's (the oracle IS the plain join). The AUTO form sizes
    * the bitset from measured build cardinality and skips the bloom
    * entirely once no affordable bitset prunes usefully — the fixed-size
    * form measured as a saturated no-op at 100× (300k keys already fill
    * 2^16 bits at 10×; BASELINE.md).
    */
  val q80_bloom_prune: Q = (s, dir) => {
    val urgent = t(s, dir).orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    RuntimeFilter.bloomPrunedJoinAuto(t(s, dir).lineitem, urgent,
        "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt"),
        Queries.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
  }

  private val ZBits = 8 // 8 bits per dimension -> 16-bit z-values

  /** Z-order (Morton) values for a 2-D layout over (custkey, nationkey):
    * the bit-interleave every engine can recompute (the oracle is the same
    * arithmetic in SQL). `z_bucket` (top 8 z bits) is the directory
    * partition key ZOrderSpec writes and prunes on.
    */
  val q81_zvalue: Q = (s, dir) => {
    val x = pmod(col("c_custkey"), lit(256L))
    val y = pmod(col("c_nationkey").cast("long"), lit(256L))
    t(s, dir).customer.select(
      col("c_custkey"),
      x.as("zx"),
      y.as("zy"),
      Layout.zValue(x, y, ZBits).as("zv"),
      shiftright(Layout.zValue(x, y, ZBits), ZBits).as("z_bucket"))
  }

  private val ZBits3 = 6 // 6 bits × 3 dims -> 18-bit z-values

  /** 3-D Morton values ([[Layout.zValueN]]) over (custkey, nationkey,
    * custkey-block): the multi-column layout key a 100 TB table clusters
    * on (date × tenant × region in production). Same portable-arithmetic
    * oracle contract as q81; `z_bucket` (top 6 z bits) is the directory
    * key.
    */
  val q141_zvalue3: Q = (s, dir) => {
    val x = pmod(col("c_custkey"), lit(64L))
    val y = pmod(col("c_nationkey").cast("long"), lit(64L))
    val z = pmod(expr("c_custkey div 64"), lit(64L))
    t(s, dir).customer.select(
      col("c_custkey"),
      x.as("zx"), y.as("zy"), z.as("zz"),
      Layout.zValueN(Seq(x, y, z), ZBits3).as("zv"),
      shiftright(Layout.zValueN(Seq(x, y, z), ZBits3), 2 * ZBits3).as("z_bucket"))
  }

  /** Equi-depth histogram per event type: ntile(8) over a TOTAL order
    * (value, event_id — ties on value alone would make tile assignment
    * engine-dependent), then per-tile count/lo/hi. This is the exact,
    * per-group-sort formulation — right up to the scale where one group's
    * rows exceed a task; past that, compute boundaries with
    * approx_percentile (one pass, mergeable sketch) and bucket by range
    * instead. The exact form stays here because it is oracle-checkable;
    * the approx form trades the sort for a sketch with no shuffle change.
    */
  val q82_equidepth: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    t(s, dir).events
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("tile", ntile(8).over(w).cast("long"))
      .groupBy(col("event_type"), col("tile"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("value")).as("lo"),
        max(col("value")).as("hi"))
  }

  /** Exact heavy-hitter n-grams: global top-50 bigrams by count — the
    * corpus diagnostic behind boilerplate/template detection. Expand is
    * scan-local; counting is one shuffle on the gram with map-side partial
    * aggregation; the top-k is TakeOrdered (no global sort materializes).
    * Ties at the cut broken by the gram string, so the result is total.
    * At 100 TB the same shape holds; if even the gram-keyed aggregate is
    * too hot, a count-min sketch + candidate re-count replaces exactness.
    */
  val q83_frequent_ngrams: Q = (s, dir) =>
    t(s, dir).documents
      .select(explode(shingles(tokens(col("text")), 2)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(50)

  /** Inverted-index postings build — the retrieval-side index construction
    * a corpus serves search from: per token, document frequency plus the
    * first 10 postings in doc_id order. The posting CAP is the scale move:
    * `row_number <= 10` compiles to WindowGroupLimit (map-side per-group
    * top-k, like q79), so a stop-word's millions of postings never
    * materialize — production would page postings in doc_id ranges off
    * the same shape. Token selection (top-50 by df) is its own aggregate;
    * df rides the broadcast join back onto the capped postings.
    */
  val q103_postings: Q = (s, dir) => {
    val pairs = t(s, dir).documents
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
    val top = pairs.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc).limit(50)
    val wTok = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok")).orderBy(col("doc_id"))
    pairs.join(broadcast(top), "tok")
      .withColumn("rnk", row_number().over(wTok))
      .filter(col("rnk") <= 10)
      .select(col("tok"), col("df"), col("rnk"), col("doc_id"))
  }

  /** Copy-on-write MERGE upsert ([[graft.operators.Merge]]): write orders
    * as a partitioned table, upsert updates (+1000 on every 97th key) and
    * inserts (same rows re-keyed +1e9 — above any ScaleData dir's dense keyspace, so the insert never collides with a real base key; +10M collided at the 100x dir, silently turning ~51k inserts into replacements), then aggregate the merged table.
    * The partition-pruned rewrite contract — untouched partitions'
    * files stay byte-identical — is pinned in MergeSpec; here the oracle
    * checks the MERGE SEMANTICS end-to-end through real parquet rewrites.
    */
  val q126_merge_upsert: Q = (s, dir) => {
    val orders = t(s, dir).orders
    // Scratch root keyed on the FULL sanitized dir path plus this JVM's pid:
    // a 32-bit hashCode can collide across data dirs, and two concurrent
    // bench/verify processes on the same dir must not share one mutable
    // table root mid-overwrite.
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_merge_" +
      dir.replaceAll("[^A-Za-z0-9]+", "_") + "_" + ProcessHandle.current().pid()
    val base = if (sys.props.get("graft.merge.rebalance").forall(_.toBoolean))
      orders.hint("rebalance", col("o_orderpriority")) else orders
    base.write.partitionBy("o_orderpriority").mode("overwrite").parquet(root)
    val touched = orders.filter(pmod(col("o_orderkey"), lit(97)) === 0)
    val updates = touched.withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(touched.withColumn("o_orderkey", col("o_orderkey") + 1000000000L))
    Merge.into(s, root, updates, "o_orderkey", "o_orderpriority")
    s.read.parquet(root)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        // dsum pattern (Queries.dsum): exact decimal aggregation, one final
        // cast to double — Spark's sum(decimal(18,2)) widens to
        // DECIMAL(28,2) while DuckDB widens differently, so a raw decimal
        // output type can never hash-match the oracle's.
        Queries.dsum(col("o_totalprice")).as("total"))
  }

  def all: Map[String, Q] = Map(
    "q126_merge_upsert" -> q126_merge_upsert,
    "q103_postings" -> q103_postings,
    "q78_chunk_overlap" -> q78_chunk_overlap,
    "q79_domain_cap" -> q79_domain_cap,
    "q80_bloom_prune" -> q80_bloom_prune,
    "q81_zvalue" -> q81_zvalue,
    "q141_zvalue3" -> q141_zvalue3,
    "q82_equidepth" -> q82_equidepth,
    "q83_frequent_ngrams" -> q83_frequent_ngrams)

  /** The z-value arithmetic as portable SQL (matches Layout.zValue). */
  private val zTerms: String = (0 until ZBits).map { i =>
    s"(((c_custkey % 256) >> $i) & 1) * ${1L << (2 * i)} + " +
      s"(((c_nationkey % 256) >> $i) & 1) * ${1L << (2 * i + 1)}"
  }.mkString(" + ")

  /** 3-D z arithmetic as portable SQL (matches Layout.zValueN). */
  private val zTerms3: String = (0 until ZBits3).map { i =>
    s"(((c_custkey % 64) >> $i) & 1) * ${1L << (3 * i)} + " +
      s"(((c_nationkey % 64) >> $i) & 1) * ${1L << (3 * i + 1)} + " +
      s"((((c_custkey // 64) % 64) >> $i) & 1) * ${1L << (3 * i + 2)}"
  }.mkString(" + ")

  def oracles: Map[String, String] = Map(
    "q141_zvalue3" ->
      s"""SELECT c_custkey,
         |  (c_custkey % 64)::BIGINT AS zx,
         |  (c_nationkey % 64)::BIGINT AS zy,
         |  ((c_custkey // 64) % 64)::BIGINT AS zz,
         |  ($zTerms3)::BIGINT AS zv,
         |  (($zTerms3)::BIGINT >> ${2 * ZBits3})::BIGINT AS z_bucket
         |FROM customer""".stripMargin,
    // MERGE semantics replayed relationally: survivors (keys not updated)
    // ∪ updates ∪ inserts, then the same aggregate. Base keys stay far
    // below 1e9 at every scale dir, so the re-key never collides.
    "q126_merge_upsert" ->
      """WITH touched AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |upd AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice + 1000.0 AS o_totalprice
        |  FROM touched
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_orderpriority, o_totalprice
        |  FROM touched),
        |merged AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT * FROM upd)
        |SELECT o_orderpriority, count(*)::BIGINT AS cnt,
        |  (round(sum((o_totalprice)::DECIMAL(18,6)), 2))::DOUBLE AS total
        |FROM merged GROUP BY 1""".stripMargin,
    "q103_postings" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))
        |      AS tok
        |  FROM documents),
        |top AS (
        |  SELECT tok, count(*) AS df FROM p GROUP BY 1
        |  ORDER BY df DESC, tok ASC LIMIT 50),
        |r AS (
        |  SELECT p.tok, t.df, p.doc_id,
        |    row_number() OVER (PARTITION BY p.tok ORDER BY p.doc_id) AS rnk
        |  FROM p JOIN top t USING (tok))
        |SELECT tok, df, rnk, doc_id FROM r WHERE rnk <= 10""".stripMargin,
    "q78_chunk_overlap" ->
      s"""WITH d AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, toks, unnest(range(0, len(toks), $ChunkS)) AS chunk_start
         |  FROM d WHERE len(toks) > 0),
         |c AS (
         |  SELECT doc_id, chunk_start // $ChunkS AS chunk_id, chunk_start,
         |    list_slice(toks, chunk_start + 1,
         |      least(chunk_start + $ChunkW, len(toks))) AS chunk
         |  FROM s)
         |SELECT doc_id, chunk_id::BIGINT AS chunk_id,
         |  chunk_start::BIGINT AS chunk_start,
         |  len(chunk)::INT AS n_chunk_tokens,
         |  list_reduce(list_prepend(0::BIGINT,
         |    list_transform(string_split(array_to_string(chunk, ' '), ''),
         |      c -> ascii(c)::BIGINT)),
         |    (h, a) -> (h * 31 + a) % 1000000007) AS chunk_fp
         |FROM c""".stripMargin,
    "q79_domain_cap" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    round((len(list_distinct(toks)) / len(toks)::DOUBLE)
        |      * (1.0 - len(list_filter(toks, t -> t IN ('a','the')))
        |          / len(toks)::DOUBLE), 6) AS quality
        |  FROM d),
        |k AS (
        |  SELECT source, doc_id, quality,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id) AS "rank"
        |  FROM r)
        |SELECT source, doc_id, quality, "rank" FROM k WHERE "rank" <= 10""".stripMargin,
    "q80_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  (round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2))::DOUBLE AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,
    "q81_zvalue" ->
      s"""SELECT c_custkey,
         |  (c_custkey % 256)::BIGINT AS zx,
         |  (c_nationkey % 256)::BIGINT AS zy,
         |  ($zTerms)::BIGINT AS zv,
         |  (($zTerms)::BIGINT >> $ZBits)::BIGINT AS z_bucket
         |FROM customer""".stripMargin,
    "q82_equidepth" ->
      """WITH t AS (
        |  SELECT event_type, value, event_id,
        |    ntile(8) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS tile
        |  FROM events)
        |SELECT event_type, tile, count(*) AS cnt,
        |  min(value) AS lo, max(value) AS hi
        |FROM t GROUP BY 1, 2""".stripMargin,
    "q83_frequent_ngrams" ->
      """WITH d AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT unnest(list_transform(range(len(toks) - 1),
        |    i -> toks[i+1] || '_' || toks[i+2])) AS gram
        |  FROM d WHERE len(toks) >= 2)
        |SELECT gram, count(*) AS cnt FROM g GROUP BY 1
        |ORDER BY cnt DESC, gram LIMIT 50""".stripMargin)
}
