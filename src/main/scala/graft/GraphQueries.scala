package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Graph

/** Link-graph ranking over the part→supplier supply graph (a stand-in for
  * the crawl's domain link graph): global PageRank as the corpus-quality
  * authority prior, and personalized PageRank as the trusted-seed
  * expansion (TrustRank) form. Oracles replay the exact fixed-iteration
  * recurrence as chained CTEs — decimal contribution sums make the
  * per-iteration aggregate order-independent, so the replay hash-matches.
  */
object GraphQueries {
  import Queries.Q

  private def t(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.Tpch(s, dir)

  val PR_ITERS = 5
  val PR_DAMPING = 0.85
  /** Offset keeps supplier node ids disjoint from part node ids. */
  val PR_SUPP_OFFSET = 1000000L
  val PPR_SEEDS = Seq(1L, 2L, 3L)

  private def edges(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir).lineitem.select(
      col("l_partkey").as("src"),
      (col("l_suppkey") + PR_SUPP_OFFSET).as("dst"))

  /** Co-purchased part pairs — the shared base of every co-purchase graph
    * query: the distinct (order, part) table self-joined on the order key
    * via DATASET ALIASES over one child plan with a pinned shuffle_hash
    * build (the q121 round-9 lesson: differently-aliased projections
    * defeat exchange canonicalization, so the scan+distinct subtree ran
    * once PER SIDE, and the static planner broadcast the corpus-sized
    * table). Returns the raw joined pairs as (p1, p2); callers filter
    * to canonical (<) or symmetric (≠) form.
    */
  private def coPurchasePairs(s: org.apache.spark.sql.SparkSession,
                              dir: String,
                              dedupItems: Boolean = true): org.apache.spark.sql.DataFrame = {
    val op0 = t(s, dir).lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val op = if (dedupItems) op0.distinct() else op0
    // -Dgraft.graph.edgeAlias=false restores the round-8 TWO-PROJECTION
    // build (the p1/p2 renames defeat exchange canonicalization, so the
    // scan+distinct subtree executes once PER SIDE and the planner
    // broadcasts a corpus-sized table) — kept as a measurement toggle so
    // the round-9 aliasing fix (cb103a5) can be A/B'd on the
    // bench-excluded fixpoint members at decade scale (VERDICT r09
    // item 8), where their per-round data cost lives.
    if (!sys.props.get("graft.graph.edgeAlias").forall(_.toBoolean))
      op.select(col("o"), col("p").as("p1"))
        .join(op.select(col("o"), col("p").as("p2")), Seq("o"))
        .select(col("p1"), col("p2"))
    else
      op.alias("a").hint("shuffle_hash")
        .join(op.alias("b"), col("a.o") === col("b.o"))
        .select(col("a.p").as("p1"), col("b.p").as("p2"))
  }

  /** Canonical (x < y) co-purchase edge list (distinct).
    *
    * Round-10: the inner (order, part) `distinct` is SKIPPED here — the
    * final edge-level distinct subsumes it (duplicate lineitems of one
    * (order, part) only replicate pair rows the edge dedup drops anyway),
    * and the inner distinct cost a whole extra exchange+aggregate of the
    * lineitem projection before the self-join's own shuffle (measured:
    * 599,935 distinct of 600,000 rows at sf0.1 — a near-no-op dedup for
    * a full shuffle). The SYMMETRIC pair stream (q127/q129/q139/q142)
    * keeps it: per-order multiplicity is semantic there.
    * `-Dgraft.graph.innerDistinct=true` restores the old plan.
    */
  private def coEdgesCanonical(s: org.apache.spark.sql.SparkSession, dir: String) =
    coPurchasePairs(s, dir,
      dedupItems = sys.props.get("graft.graph.innerDistinct").exists(_.toBoolean))
      .filter(col("p1") < col("p2"))
      .select(col("p1").as("x"), col("p2").as("y")).distinct()

  /** Symmetric (src ≠ dst) co-purchase pair stream (NOT deduplicated —
    * per-order multiplicity preserved, exactly as the inline form was). */
  private def coPairsSymmetric(s: org.apache.spark.sql.SparkSession, dir: String) =
    coPurchasePairs(s, dir)
      .filter(col("p1") =!= col("p2"))
      .select(col("p1").as("src"), col("p2").as("dst"))

  /** Global PageRank over distinct part→supplier edges. */
  val q114_pagerank: Q = (s, dir) =>
    Graph.pageRank(edges(s, dir), "src", "dst", PR_ITERS, PR_DAMPING)

  /** Personalized PageRank from a 3-part seed set. */
  val q115_ppr: Q = (s, dir) =>
    Graph.personalizedPageRank(edges(s, dir), "src", "dst",
      PPR_SEEDS, PR_ITERS, PR_DAMPING)

  /** Multiplicity-weighted PageRank: the part→supplier graph WITHOUT the
    * distinct — each lineitem row contributes weight 1, so a supplier
    * shipping a part 50× draws 50× the rank mass of a one-off. The
    * frequency-weighted form q114's distinct-edge reading ignores.
    */
  val q138_pagerank_weighted: Q = (s, dir) =>
    Graph.pageRankWeighted(
      edges(s, dir).withColumn("w", lit(1L)),
      "src", "dst", "w", PR_ITERS, PR_DAMPING)

  /** Sink-mass-conserving PageRank: every supplier node is dangling on
    * this bipartite graph (dst-only, no out-edges), so the conserving and
    * leak forms differ on EVERY node — the oracle replays the dm_k
    * redistribution recurrence exactly.
    */
  val q136_pagerank_conserve: Q = (s, dir) =>
    Graph.pageRank(edges(s, dir), "src", "dst", PR_ITERS, PR_DAMPING,
      conserveDanglingMass = true)

  /** Triangle count over the co-purchase part graph (parts co-occurring in
    * an order are linked). Triangle density separates organic neighborhoods
    * from link-farm/spam cliques in web graphs — the standard graph-quality
    * companion to PageRank.
    *
    * Shape: [[graft.operators.Graph.triangleCount]] — degree-ordered
    * orientation, so each triangle is enumerated exactly once at its
    * lowest-(deg, id) vertex and the wedge fan-out is Σ out-deg² with
    * out-deg O(√E) even on skewed graphs. Measured parity with the
    * id-ordered wedge join at sf0.1 (~8 s warm either way — this
    * co-purchase graph is near-degree-uniform, so every orientation
    * yields the same wedge count); the orientation is the insurance that
    * a power-law graph can't make one hub's wedges quadratic. The count
    * itself is orientation-independent, so the oracle needs no
    * orientation logic.
    */
  val q122_triangles: Q = (s, dir) =>
    // Round-10: one composed pipeline — triangleCountStats' internal edge
    // checkpoint serves the triangle build AND both count aggregates
    // (nodes = COUNT over the degree table it computes anyway, edges =
    // COUNT over the checkpointed edge set). The previous form
    // pre-checkpointed the self-join+distinct here, paid a SECOND
    // checkpoint copy inside triangleCount, and ran the O(E) endpoint
    // union twice (once for degrees, once for the nodes count).
    Graph.triangleCountStats(coEdgesCanonical(s, dir), "x", "y")

  val HITS_ITERS = 3

  /** HITS hubs/authorities on the part→supplier bipartite graph: parts
    * score as hubs (they "cite" many suppliers), suppliers as
    * authorities.
    */
  val q123_hits: Q = (s, dir) =>
    Graph.hits(edges(s, dir), "src", "dst", HITS_ITERS)

  /** Multi-source BFS over the (symmetric) co-purchase part graph: min
    * hop distance from the q115 seed parts, bounded at [[BFS_HOPS]] — the
    * reachability companion to the rank family ("blast radius" of a
    * compromised item / proximity to a trusted whitelist). The frontier
    * form expands each node once (O(E) total work across rounds); the
    * oracle replays it as a level-bounded recursive CTE whose UNION
    * dedups (node, dist) rows, so both sides compute exact BFS levels.
    */
  val BFS_HOPS = 3
  val q127_bfs_hops: Q = (s, dir) =>
    Graph.shortestHops(coPairsSymmetric(s, dir), "src", "dst", PPR_SEEDS, BFS_HOPS)

  /** Community detection over the symmetric co-purchase part graph:
    * synchronous LPA, [[LPA_ITERS]] fixed rounds, min-label ties —
    * deterministic, so the oracle replays every round as CTEs. The
    * corpus-curation reading: co-purchase communities are the graph twin
    * of the embedding clusters (q87's SemDeDup cells), from structure
    * instead of geometry.
    */
  val LPA_ITERS = 3
  val q139_label_prop: Q = (s, dir) =>
    Graph.labelPropagation(coPairsSymmetric(s, dir), "src", "dst", LPA_ITERS)

  /** Bounded k-core peel over the symmetric co-purchase graph
    * ([[Graph.kCoreBounded]]): [[KCORE_ROUNDS]] rounds at k =
    * [[KCORE_K]] — the dense-core extraction that separates the heavily
    * co-purchased assortment from long-tail items (on a web graph: the
    * link-farm-resistant core).
    */
  val KCORE_K = 60
  val KCORE_ROUNDS = 3
  val q142_kcore: Q = (s, dir) =>
    Graph.kCoreBounded(coPairsSymmetric(s, dir), "src", "dst", KCORE_K, KCORE_ROUNDS)

  /** Bounded Bellman-Ford over the same co-purchase graph with a
    * key-derived integer edge weight (1 + (src+dst) mod 5 — deterministic
    * and identically computable in SQL): min route cost from the seed
    * parts within [[BFS_HOPS]] relaxation rounds. The weighted q127 —
    * a longer-hop cheaper path wins where BFS would stop at hop count
    * (GraphSpec pins exactly that case); oracle replays the recurrence
    * as chained per-round CTEs, all-integer.
    */
  val q129_minplus: Q = (s, dir) => {
    val e = coPairsSymmetric(s, dir)
      .withColumn("w", lit(1) + pmod(col("src") + col("dst"), lit(5)))
    Graph.minPlus(e, "src", "dst", "w", PPR_SEEDS, BFS_HOPS)
  }

  /** DOULION sampled triangle estimate over the same co-purchase graph —
    * the scale path for q122's dense-graph Σ out-deg² ceiling: a 3/10
    * deterministic-hash edge sample cuts wedge work ~9× and estimates the
    * count as sampled/p³ ([[graft.operators.Graph.triangleCountSampled]]).
    * The oracle replays sample, count, and the one-division scale exactly.
    */
  val TRI_P_NUM = 3
  val TRI_P_DEN = 10
  val q130_triangle_sample: Q = (s, dir) =>
    Graph.triangleCountSampled(coEdgesCanonical(s, dir), "x", "y",
      TRI_P_NUM, TRI_P_DEN)

  def all: Map[String, Q] = Map(
    "q114_pagerank" -> q114_pagerank,
    "q115_ppr" -> q115_ppr,
    "q136_pagerank_conserve" -> q136_pagerank_conserve,
    "q138_pagerank_weighted" -> q138_pagerank_weighted,
    "q139_label_prop" -> q139_label_prop,
    "q142_kcore" -> q142_kcore,
    "q122_triangles" -> q122_triangles,
    "q123_hits" -> q123_hits,
    "q127_bfs_hops" -> q127_bfs_hops,
    "q129_minplus" -> q129_minplus,
    "q130_triangle_sample" -> q130_triangle_sample)

  // ——— oracle SQL (DuckDB) ———

  private val edgeCtes =
    s"""e AS (SELECT DISTINCT l_partkey::BIGINT AS src,
       |       (l_suppkey + $PR_SUPP_OFFSET)::BIGINT AS dst FROM lineitem),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))""".stripMargin

  /** One PageRank iteration as a (contrib, rank) CTE pair; `teleport` and
    * `init` parameterize the global vs personalized forms.
    */
  private def iterCtes(k: Int, rankRel: String, teleportSql: String): String =
    s"""c$k AS (SELECT e.dst AS node,
       |  sum(round(r.r / deg.deg, 12)::DECIMAL(26,12)) AS s
       |  FROM $rankRel r JOIN e ON r.node = e.src JOIN deg ON e.src = deg.src
       |  GROUP BY 1),
       |r$k AS (SELECT n.node,
       |  round($teleportSql + ($PR_DAMPING)::DOUBLE * coalesce(c$k.s::DOUBLE, 0), 12) AS r
       |  FROM nodes n LEFT JOIN c$k ON n.node = c$k.node)""".stripMargin

  private def prSql: String = {
    val chain = (1 to PR_ITERS).map { k =>
      iterCtes(k, if (k == 1) "r0" else s"r${k - 1}",
        s"(${1.0 - PR_DAMPING})::DOUBLE / (SELECT count(*) FROM nodes)")
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |r0 AS (SELECT node,
       |  round(1.0::DOUBLE / (SELECT count(*) FROM nodes), 12) AS r FROM nodes),
       |$chain
       |SELECT node, round(r, 6) AS pr FROM r$PR_ITERS""".stripMargin
  }

  /** One conserving-PageRank iteration: the (dm, contrib, rank) CTE
    * triple. dm_k sums the dangling nodes' 12-dp-rounded ranks as exact
    * decimals (the LEFT JOIN … IS NULL anti form — portable SQL); the
    * rank row adds its uniform share inside the damped term, operand
    * order matching the Spark expression exactly.
    */
  private def iterCtesConserve(k: Int, rankRel: String): String =
    s"""dm$k AS (SELECT coalesce(sum(round(r.r, 12)::DECIMAL(26,12)),
       |    0::DECIMAL(26,12)) AS dm
       |  FROM $rankRel r LEFT JOIN deg ON r.node = deg.src
       |  WHERE deg.src IS NULL),
       |c$k AS (SELECT e.dst AS node,
       |  sum(round(r.r / deg.deg, 12)::DECIMAL(26,12)) AS s
       |  FROM $rankRel r JOIN e ON r.node = e.src JOIN deg ON e.src = deg.src
       |  GROUP BY 1),
       |r$k AS (SELECT n.node,
       |  round((${1.0 - PR_DAMPING})::DOUBLE / (SELECT count(*) FROM nodes) +
       |    ($PR_DAMPING)::DOUBLE * (coalesce(c$k.s::DOUBLE, 0) +
       |      (SELECT dm FROM dm$k)::DOUBLE / (SELECT count(*) FROM nodes)), 12) AS r
       |  FROM nodes n LEFT JOIN c$k ON n.node = c$k.node)""".stripMargin

  /** Weighted-PageRank oracle: multiplicity-weighted edges (no distinct),
    * integer W(u), one r·w/W division per edge — operand order matching
    * the Spark expression.
    */
  private def prWeightedSql: String = {
    val chain = (1 to PR_ITERS).map { k =>
      val prev = if (k == 1) "r0" else s"r${k - 1}"
      s"""c$k AS (SELECT e.dst AS node,
         |  sum(round(r.r * e.w / ws.wsum, 12)::DECIMAL(26,12)) AS s
         |  FROM $prev r JOIN e ON r.node = e.src JOIN ws ON e.src = ws.src
         |  GROUP BY 1),
         |r$k AS (SELECT n.node,
         |  round((${1.0 - PR_DAMPING})::DOUBLE / (SELECT count(*) FROM nodes) +
         |    ($PR_DAMPING)::DOUBLE * coalesce(c$k.s::DOUBLE, 0), 12) AS r
         |  FROM nodes n LEFT JOIN c$k ON n.node = c$k.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT l_partkey::BIGINT AS src,
       |       (l_suppkey + $PR_SUPP_OFFSET)::BIGINT AS dst,
       |       count(*)::BIGINT AS w
       |     FROM lineitem GROUP BY 1, 2),
       |ws AS (SELECT src, sum(w)::BIGINT AS wsum FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |r0 AS (SELECT node,
       |  round(1.0::DOUBLE / (SELECT count(*) FROM nodes), 12) AS r FROM nodes),
       |$chain
       |SELECT node, round(r, 6) AS pr FROM r$PR_ITERS""".stripMargin
  }

  private def prConserveSql: String = {
    val chain = (1 to PR_ITERS).map { k =>
      iterCtesConserve(k, if (k == 1) "r0" else s"r${k - 1}")
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |r0 AS (SELECT node,
       |  round(1.0::DOUBLE / (SELECT count(*) FROM nodes), 12) AS r FROM nodes),
       |$chain
       |SELECT node, round(r, 6) AS pr FROM r$PR_ITERS""".stripMargin
  }

  /** k-core oracle: each round = induced-subgraph degrees, keep ≥ k;
    * final degrees over the last survivor set.
    */
  private def kcoreSql: String = {
    def degCte(name: String, aliveRel: String) =
      s"""$name AS (SELECT e.src AS node, count(*) AS c
         |  FROM e
         |  JOIN $aliveRel s ON e.src = s.node
         |  JOIN $aliveRel t ON e.dst = t.node
         |  GROUP BY 1)""".stripMargin
    val chain = (1 to KCORE_ROUNDS).map { r =>
      s"""${degCte(s"d$r", s"a${r - 1}")},
         |a$r AS (SELECT node FROM d$r WHERE c >= $KCORE_K)""".stripMargin
    }.mkString(",\n")
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS (SELECT DISTINCT a.p::BIGINT AS src, b.p::BIGINT AS dst
       |      FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
       |a0 AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |$chain,
       |${degCte("df", s"a$KCORE_ROUNDS")}
       |SELECT node, c::BIGINT AS degree FROM df""".stripMargin
  }

  /** LPA oracle: each round = count in-neighbor labels, top-1 by
    * (count desc, label asc), keep-own-label fallback.
    */
  private def lpaSql: String = {
    val chain = (1 to LPA_ITERS).map { k =>
      val prev = s"l${k - 1}"
      s"""c$k AS (SELECT e.dst AS nd, l.lbl, count(*) AS c
         |  FROM $prev l JOIN e ON e.src = l.node GROUP BY 1, 2),
         |t$k AS (SELECT nd AS node, lbl FROM (
         |  SELECT nd, lbl,
         |    row_number() OVER (PARTITION BY nd ORDER BY c DESC, lbl ASC) AS rn
         |  FROM c$k) WHERE rn = 1),
         |l$k AS (SELECT n.node, coalesce(t$k.lbl, $prev.lbl) AS lbl
         |  FROM nodes n JOIN $prev ON n.node = $prev.node
         |  LEFT JOIN t$k ON n.node = t$k.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS (SELECT DISTINCT a.p::BIGINT AS src, b.p::BIGINT AS dst
       |      FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |l0 AS (SELECT node, node AS lbl FROM nodes),
       |$chain
       |SELECT node, lbl AS community FROM l$LPA_ITERS""".stripMargin
  }

  private def pprSql: String = {
    val seedList = PPR_SEEDS.mkString("(", ", ", ")")
    val tele = s"(CASE WHEN n.node IN $seedList THEN (${1.0 - PR_DAMPING})::DOUBLE / ${PPR_SEEDS.size} ELSE 0 END)"
    val chain = (1 to PR_ITERS).map { k =>
      iterCtes(k, if (k == 1) "r0" else s"r${k - 1}", tele)
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |r0 AS (SELECT node,
       |  round(CASE WHEN node IN $seedList THEN 1.0::DOUBLE / ${PPR_SEEDS.size} ELSE 0::DOUBLE END, 12) AS r
       |  FROM nodes),
       |$chain
       |SELECT node, round(r, 6) AS ppr FROM r$PR_ITERS""".stripMargin
  }

  private def hitsSql: String = {
    val chain = (1 to HITS_ITERS).map { k =>
      val prevH = if (k == 1) "h0" else s"h${k - 1}"
      s"""a${k}r AS (SELECT e.dst AS node, sum(round(h.h, 12)::DECIMAL(26,12)) AS ar
         |  FROM $prevH h JOIN e ON h.node = e.src GROUP BY 1),
         |a$k AS (SELECT node,
         |  round(ar::DOUBLE / (SELECT sum(ar) FROM a${k}r)::DOUBLE, 12) AS a
         |  FROM a${k}r),
         |h${k}r AS (SELECT e.src AS node, sum(round(a.a, 12)::DECIMAL(26,12)) AS hr
         |  FROM a$k a JOIN e ON a.node = e.dst GROUP BY 1),
         |h$k AS (SELECT node,
         |  round(hr::DOUBLE / (SELECT sum(hr) FROM h${k}r)::DOUBLE, 12) AS h
         |  FROM h${k}r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |h0 AS (SELECT node,
       |  round(1.0::DOUBLE / (SELECT count(*) FROM nodes), 12) AS h FROM nodes),
       |$chain
       |SELECT n.node,
       |  round(coalesce(h$HITS_ITERS.h, 0), 6) AS hub,
       |  round(coalesce(a$HITS_ITERS.a, 0), 6) AS auth
       |FROM nodes n
       |LEFT JOIN h$HITS_ITERS ON n.node = h$HITS_ITERS.node
       |LEFT JOIN a$HITS_ITERS ON n.node = a$HITS_ITERS.node""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q114_pagerank" -> prSql,
    "q115_ppr" -> pprSql,
    "q136_pagerank_conserve" -> prConserveSql,
    "q138_pagerank_weighted" -> prWeightedSql,
    "q139_label_prop" -> lpaSql,
    "q142_kcore" -> kcoreSql,
    "q123_hits" -> hitsSql,
    "q122_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS x, b.p AS y
        |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)
        |SELECT
        |  (SELECT count(*) FROM e e1
        |   JOIN e e2 ON e1.y = e2.x
        |   JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y) AS triangles,
        |  (SELECT count(*) FROM (SELECT x AS n FROM e UNION SELECT y FROM e)) AS nodes,
        |  (SELECT count(*) FROM e) AS edges""".stripMargin,
    "q127_bfs_hops" ->
      s"""WITH RECURSIVE
         |op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e AS (SELECT DISTINCT a.p::BIGINT AS src, b.p::BIGINT AS dst
         |      FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
         |r AS (
         |  SELECT s::BIGINT AS node, 0 AS dist
         |  FROM (VALUES ${PPR_SEEDS.map(s => s"($s)").mkString(", ")}) AS sv(s)
         |  UNION
         |  SELECT e.dst, r.dist + 1
         |  FROM r JOIN e ON e.src = r.node WHERE r.dist < $BFS_HOPS)
         |SELECT node, min(dist)::INT AS dist FROM r GROUP BY 1""".stripMargin,
    "q129_minplus" -> {
      val roundCtes = (1 to BFS_HOPS).map { k =>
        s"""d$k AS (SELECT node, min(cost)::BIGINT AS cost FROM (
           |  SELECT node, cost FROM d${k - 1}
           |  UNION ALL
           |  SELECT e.dst, d${k - 1}.cost + e.w FROM d${k - 1}
           |  JOIN e ON e.src = d${k - 1}.node) GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |e AS (SELECT DISTINCT a.p::BIGINT AS src, b.p::BIGINT AS dst,
         |        (1 + (a.p + b.p) % 5)::BIGINT AS w
         |      FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
         |d0 AS (SELECT s::BIGINT AS node, 0::BIGINT AS cost
         |  FROM (VALUES ${PPR_SEEDS.map(s => s"($s)").mkString(", ")}) AS sv(s)),
         |$roundCtes
         |SELECT node, cost FROM d$BFS_HOPS""".stripMargin
    },
    "q130_triangle_sample" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |eall AS (SELECT DISTINCT a.p AS x, b.p AS y
         |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
         |e AS (SELECT x, y FROM eall
         |      WHERE ((x * 2654435761 + y * 40503) % 1000000007) % $TRI_P_DEN < $TRI_P_NUM),
         |tri AS (SELECT count(*)::BIGINT AS sampled_triangles FROM e e1
         |   JOIN e e2 ON e1.y = e2.x
         |   JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
         |se AS (SELECT count(*)::BIGINT AS sampled_edges FROM e)
         |SELECT se.sampled_edges, tri.sampled_triangles,
         |  round(tri.sampled_triangles *
         |    (${TRI_P_DEN.toLong * TRI_P_DEN * TRI_P_DEN}.0 / ${TRI_P_NUM.toLong * TRI_P_NUM * TRI_P_NUM}.0), 6)
         |    AS est_triangles
         |FROM tri, se""".stripMargin)
}
