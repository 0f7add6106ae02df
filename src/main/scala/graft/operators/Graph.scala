package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph ranking over edge lists — the second fixpoint family
  * next to [[Dedup.duplicateClusters]]' connected components. The driving
  * use at 100 TB is crawl curation: PageRank-style domain authority is a
  * standard quality prior for web corpora (a page on a well-linked domain
  * is likelier to be worth training on than one on a link-farm island),
  * computed once per snapshot and joined onto documents as a feature.
  *
  * Scale shape: state per iteration is one (node, rank) table — O(V) rows,
  * two narrow columns. Each iteration is one join (ranks × out-edges,
  * shuffling only (dst, contribution) pairs — never adjacency lists) and
  * one aggregate. The edge table with out-degrees is built ONCE and reused
  * by every iteration, so a cluster run caches/checkpoints `ed` and the
  * per-iteration cost is a single shuffle of E contribution rows. Fixed
  * iteration count (the production form: convergence-delta stopping needs
  * a driver-side action per round; snapshot ranking runs a known budget,
  * e.g. ~10 iterations for web-scale graphs).
  *
  * Determinism contract (shared with the DuckDB oracle): contributions
  * round to 12 dp and sum as DECIMAL(26,12) — decimal addition is
  * associative, so the aggregate is partition-order independent — and each
  * new rank rounds to 12 dp after the scalar teleport arithmetic. Every
  * remaining operation is a scalar double op with a fixed operand order,
  * identical in any IEEE-754 engine.
  */
object Graph {

  /** Damped PageRank, `iters` fixed iterations.
    *
    * Semantics: r0(v) = 1/N; r_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_k(u)/deg(u)
    * over the DISTINCT edge set. Dangling nodes (no out-edges) leak their
    * mass by default — the classic simplification. With
    * `conserveDanglingMass = true` each iteration redistributes the
    * dangling nodes' aggregate rank uniformly:
    * r_{k+1}(v) = (1-d)/N + d * (Σ contributions + dm_k/N), where
    * dm_k = Σ_{deg(u)=0} r_k(u) — the standard sink-mass-conserving form
    * for web-graph authority (total mass stays ≈ 1 up to 12-dp rounding;
    * GraphSpec pins both that and the no-dangling equivalence of the two
    * forms). Cost: one extra scalar aggregate per iteration, attached as
    * a broadcast scalar so each superstep remains one lazy plan — plus a
    * per-iteration rank localCheckpoint, because the rank table is
    * referenced TWICE per superstep (contributions and dm) and an
    * unchecked lineage would double per iteration. Nodes are the union of
    * both endpoint sets; a node with no in-edges holds the teleport floor
    * (plus its dm share in the conserving form).
    *
    * Returns (node, pr) with pr rounded to 6 dp.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               checkpointRanks: Boolean = false,
               conserveDanglingMass: Boolean = false): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
                         col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // (e_src, e_dst, e_deg) — the one table every iteration joins against;
    // renamed so the rank ⋈ edges self-lineage join resolves unambiguously.
    // CHECKPOINTED once so no superstep's lineage re-derives the edge
    // distinct + degree aggregate (the fully unrolled form printed 56
    // exchanges). Rank tables stay ONE plan by default: with every
    // superstep in the same job, ed's shuffle write is reused across all
    // `iters` joins (ReuseExchange) — measured 144 s vs 202 s for
    // checkpoint-per-superstep on the 15M-edge 100× graph, where each
    // synchronous superstep re-shuffled ed. `checkpointRanks = true` is
    // for DEEP iteration counts (tens+), where lineage depth and plan
    // compile time dominate and the Pregel-style cut is worth the
    // re-shuffle.
    val ed = e.join(deg, Seq("src"))
      .select(col("src").as("e_src"), col("dst").as("e_dst"), col("deg").as("e_deg"))
      .localCheckpoint(graft.core.Mat.eager)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // N rides along as a broadcast-scalar column so each superstep is one
    // self-contained 2-exchange plan
    val nn = nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("n"))))
      .localCheckpoint(graft.core.Mat.eager)
    // dangling nodes (no out-edges) — materialized once, only when the
    // conserving form needs them per iteration
    val dangling: Option[DataFrame] =
      if (conserveDanglingMass)
        Some(nodes.join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
          .localCheckpoint(graft.core.Mat.eager))
      else None
    var r = nn.select(col("node"), col("n"),
      round(lit(1.0) / col("n"), 12).as("r"))
    for (k <- 1 to iters) {
      // join strategy stays with the planner: a shuffle_hash hint reads
      // 30% faster at sf0.1 (no per-superstep re-sort) but DIES at the
      // 100× graph — "Can't acquire … bytes to build hash relation" when
      // an ed partition outgrows execution memory. SMJ's spillable sort is
      // the price of surviving arbitrary graph size; AQE already picks
      // hash joins when the build side measures small.
      val contrib = r.join(ed, col("node") === col("e_src"))
        .select(col("e_dst").as("node"),
          round(col("r") / col("e_deg"), 12).cast("decimal(26,12)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      val next = dangling match {
        case None =>
          nn.join(contrib, Seq("node"), "left")
            .select(col("node"), col("n"),
              round(lit(1.0 - damping) / col("n") +
                lit(damping) * coalesce(col("s").cast("double"), lit(0.0)), 12).as("r"))
        case Some(dang) =>
          // dm_k as an exact decimal sum (the same 12-dp-round-then-
          // decimal idiom as the contributions), riding the superstep as
          // a broadcast scalar — no driver action per iteration
          val dm = r.join(dang, Seq("node"))
            .agg(coalesce(sum(round(col("r"), 12).cast("decimal(26,12)")),
              lit(0).cast("decimal(26,12)")).as("dm"))
          nn.join(contrib, Seq("node"), "left")
            .crossJoin(broadcast(dm))
            .select(col("node"), col("n"),
              round(lit(1.0 - damping) / col("n") +
                lit(damping) * (coalesce(col("s").cast("double"), lit(0.0)) +
                  col("dm").cast("double") / col("n")), 12).as("r"))
      }
      r = if ((checkpointRanks || conserveDanglingMass) && k < iters)
        next.localCheckpoint(graft.core.Mat.eager)
      else next
    }
    r.select(col("node"), round(col("r"), 6).as("pr"))
  }

  /** Weighted PageRank: contributions proportional to edge weight —
    * r_{k+1}(v) = (1-d)/N + d · Σ_{(u,v)} r_k(u) · w(u,v)/W(u), with
    * W(u) the source's total out-weight. The natural crawl/co-purchase
    * form where edge STRENGTH matters (link frequency, interaction
    * count): a domain linked 100× from one page outranks a domain linked
    * once, which the distinct-edge [[pageRank]] deliberately ignores.
    *
    * Weights are INTEGRAL (cast to long) and parallel edges SUM into one
    * weighted edge — so W(u) is an exact integer aggregate and the one
    * per-edge division r·w/W replays bit-identically cross-engine (the
    * q129 integer-weight discipline). Pass `lit(1)` per raw edge row to
    * get multiplicity weighting. Uniform weights with no parallel edges
    * reproduce [[pageRank]] exactly (GraphSpec pins the equivalence).
    * Dangling nodes leak mass as in the default [[pageRank]] form.
    * Non-positive total out-weight is rejected LOUDLY at construction
    * (w ≥ 0 per summed edge and W(u) > 0 per source — the fail-loud
    * `require` contract style): a silent violation would NULL the r·w/W
    * division (the source degrades to dangling) or flip contribution
    * signs. The check folds into the W(u) aggregate the algorithm
    * already computes, so it costs one extra construction-time action
    * over that narrow (src, w) frame, no extra plan work per superstep.
    *
    * Same plan shape and determinism contract as [[pageRank]]: weighted
    * edge table built and checkpointed once, per-superstep one narrow
    * (dst, contribution) shuffle, decimal contribution sums.
    * Returns (node, pr) rounded to 6 dp.
    */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, iters: Int, damping: Double = 0.85,
                       checkpointRanks: Boolean = false): DataFrame = {
    require(iters >= 1, s"pageRankWeighted: iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
                         col(dstCol).cast("long").as("dst"),
                         col(wCol).cast("long").as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val wsum0 = e.groupBy(col("src"))
      .agg(sum(col("w")).as("wsum"), min(col("w")).as("__minw"))
    val bad = wsum0.filter(col("__minw") < 0 || col("wsum") <= 0)
      .select(col("src"), col("__minw"), col("wsum")).limit(1).collect()
    require(bad.isEmpty, {
      val r = bad.head
      s"pageRankWeighted: contract w >= 0 and W(u) > 0 violated at " +
        s"src=${r.getLong(0)} (min summed edge weight ${r.getLong(1)}, " +
        s"total out-weight ${r.getLong(2)})"
    })
    val wsum = wsum0.drop("__minw")
    val ed = e.join(wsum, Seq("src"))
      .select(col("src").as("e_src"), col("dst").as("e_dst"),
        col("w").as("e_w"), col("wsum").as("e_wsum"))
      .localCheckpoint(graft.core.Mat.eager)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nn = nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("n"))))
      .localCheckpoint(graft.core.Mat.eager)
    var r = nn.select(col("node"), col("n"),
      round(lit(1.0) / col("n"), 12).as("r"))
    for (k <- 1 to iters) {
      val contrib = r.join(ed, col("node") === col("e_src"))
        .select(col("e_dst").as("node"),
          round(col("r") * col("e_w") / col("e_wsum"), 12)
            .cast("decimal(26,12)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      val next = nn.join(contrib, Seq("node"), "left")
        .select(col("node"), col("n"),
          round(lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("s").cast("double"), lit(0.0)), 12).as("r"))
      r = if (checkpointRanks && k < iters) next.localCheckpoint(graft.core.Mat.eager) else next
    }
    r.select(col("node"), round(col("r"), 6).as("pr"))
  }

  /** HITS (Kleinberg): mutually-recursive hub/authority scores with L1
    * normalization per half-step — a_k(v) = Σ_{u→v} h_{k-1}(u) then
    * a_k /= Σa; h_k(u) = Σ_{u→v} a_k(v) then h_k /= Σh. On a bipartite
    * graph (e.g. parts → suppliers) the two sides separate cleanly:
    * sources score as hubs, targets as authorities — the complementary
    * ranking to [[pageRank]]'s single authority axis.
    *
    * Same plan discipline as pageRank: edge/node bases checkpointed once,
    * supersteps stay one plan (exchange reuse), every aggregate sums
    * 12-dp DECIMAL terms so the oracle's CTE replay matches exactly; the
    * L1 norms are exact decimal sums, so even the normalizers replay.
    * Nodes with no score on an axis (no in-edges / no out-edges) hold 0.
    *
    * Returns (node, hub, auth) rounded to 6 dp.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int, checkpointRanks: Boolean = false): DataFrame = {
    require(iters >= 1, s"hits: iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("e_src"),
                         col(dstCol).cast("long").as("e_dst"))
      .distinct().localCheckpoint(graft.core.Mat.eager)
    val nodes = e.select(col("e_src").as("node"))
      .union(e.select(col("e_dst").as("node"))).distinct().localCheckpoint(graft.core.Mat.eager)
    val n = nodes.count() // O(1) driver scalar, mirrors the oracle's count(*)
    var h = nodes.select(col("node"), round(lit(1.0 / n), 12).as("h"))
    var a = nodes.select(col("node"), lit(0.0).as("a")).limit(0)
    for (k <- 1 to iters) {
      val araw = h.join(e, col("node") === col("e_src"))
        .select(col("e_dst").as("node"),
          round(col("h"), 12).cast("decimal(26,12)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("ar"))
      val an = araw.agg(sum(col("ar")).as("an"))
      a = araw.crossJoin(broadcast(an))
        .select(col("node"),
          round(col("ar").cast("double") / col("an").cast("double"), 12).as("a"))
      val hraw = a.join(e, col("node") === col("e_dst"))
        .select(col("e_src").as("node"),
          round(col("a"), 12).cast("decimal(26,12)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("hr"))
      val hn = hraw.agg(sum(col("hr")).as("hn"))
      h = hraw.crossJoin(broadcast(hn))
        .select(col("node"),
          round(col("hr").cast("double") / col("hn").cast("double"), 12).as("h"))
      // same deep-iteration lineage trade as pageRank's checkpointRanks
      if (checkpointRanks && k < iters) {
        h = h.localCheckpoint(graft.core.Mat.eager); a = a.localCheckpoint(graft.core.Mat.eager)
      }
    }
    nodes
      .join(h, Seq("node"), "left")
      .join(a, Seq("node"), "left")
      .select(col("node"),
        round(coalesce(col("h"), lit(0.0)), 6).as("hub"),
        round(coalesce(col("a"), lit(0.0)), 6).as("auth"))
  }

  /** Synchronous label propagation (LPA, Raghavan et al. 2007) with a
    * DETERMINISTIC tie-break — community detection as fixed-point label
    * spreading: label_0(v) = v; each round every node adopts the most
    * frequent label among its in-neighbors, ties broken by the SMALLEST
    * label (the randomized-order original is irreproducible; synchronous
    * + total tie order makes every round an exact relational statement
    * the oracle replays as chained CTEs). A node with no in-edges keeps
    * its current label. Labels flow along edge direction — callers
    * wanting undirected communities symmetrize the edge list first.
    *
    * Fixed iteration budget like [[pageRank]] (synchronous LPA can
    * 2-cycle on bipartite structure, so a convergence loop may never
    * terminate — a fixed budget is the production form). Communities come
    * out labeled by one member's id; the min-id of a converged community
    * wins ties everywhere, so labels are stable across replays.
    *
    * Scale shape: per round one (label ⋈ edges) shuffle of E narrow rows,
    * one (node, label) count aggregate, one per-node top-1 window
    * (rank-1 filter compiles to WindowGroupLimit — map-side cut). The
    * label table is referenced twice per round (count + keep-own-label
    * fallback), so rounds are localCheckpoint-materialized like the
    * conserving PageRank — O(V) state per round.
    *
    * Returns (node, community).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1, s"labelPropagation: iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("e_src"),
                         col(dstCol).cast("long").as("e_dst"))
      .distinct().localCheckpoint(graft.core.Mat.eager)
    val nodes = e.select(col("e_src").as("node"))
      .union(e.select(col("e_dst").as("node"))).distinct().localCheckpoint(graft.core.Mat.eager)
    var lbl = nodes.select(col("node"), col("node").as("lbl"))
    for (k <- 1 to iters) {
      val cnt = lbl.join(e, col("node") === col("e_src"))
        .groupBy(col("e_dst").as("nd"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("nd")).orderBy(col("c").desc, col("lbl").asc)
      val top = cnt.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("nd").as("node"), col("lbl").as("newLbl"))
      lbl = nodes
        .join(lbl, Seq("node"))
        .join(top, Seq("node"), "left")
        .select(col("node"), coalesce(col("newLbl"), col("lbl")).as("lbl"))
        .localCheckpoint(graft.core.Mat.eager)
    }
    lbl.select(col("node"), col("lbl").as("community"))
  }

  /** Bounded k-core peel — `rounds` synchronous rounds of removing every
    * node whose degree in the SURVIVING subgraph is < k (the spam-core /
    * dense-community extraction companion to [[labelPropagation]]: a
    * web-graph k-core isolates the densely-interlinked region that
    * degree alone overstates). Run to convergence the survivor set IS the
    * k-core; the fixed budget keeps each round an exact relational
    * statement the oracle replays as chained CTEs (the bounded-fixpoint
    * discipline of [[shortestHops]]/[[minPlus]] — convergence-loop
    * stopping needs a driver action per round either way, so production
    * picks the budget from the graph's known peel depth).
    *
    * Edges are treated as DIRECTED as given; symmetrize first for the
    * undirected reading (degree = out-degree in the induced subgraph).
    * Returns the survivors after `rounds` peels as (node, degree) with
    * degree measured in the FINAL induced subgraph — a node whose degree
    * fell below k on the last round is still present (the budget ended),
    * exactly as the oracle computes it; a survivor whose every neighbor
    * peeled (degree 0 in the final subgraph) is absent from the output,
    * the join-based degree convention on both sides.
    *
    * Scale shape: per round two semi-joins of the edge list against the
    * alive set plus one degree aggregate — all keyed on node ids, the
    * frontier-free O(E) per-round cost; alive sets localCheckpoint per
    * round (referenced twice: both endpoints).
    */
  def kCoreBounded(edges: DataFrame, srcCol: String, dstCol: String,
                   k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1,
      s"kCoreBounded: need k >= 1 and rounds >= 1, got k=$k rounds=$rounds")
    val e = edges.select(col(srcCol).cast("long").as("e_src"),
                         col(dstCol).cast("long").as("e_dst"))
      .distinct().localCheckpoint(graft.core.Mat.eager)
    var alive = e.select(col("e_src").as("node"))
      .union(e.select(col("e_dst").as("node"))).distinct().localCheckpoint(graft.core.Mat.eager)
    def degrees(a: DataFrame): DataFrame =
      e.join(a.select(col("node").as("e_src")), Seq("e_src"), "left_semi")
        .join(a.select(col("node").as("e_dst")), Seq("e_dst"), "left_semi")
        .groupBy(col("e_src").as("node"))
        .agg(count(lit(1)).as("degree"))
    for (_ <- 1 to rounds)
      alive = degrees(alive).filter(col("degree") >= k)
        .select(col("node")).localCheckpoint(graft.core.Mat.eager)
    degrees(alive)
  }

  /** Personalized PageRank: same recurrence, but the teleport mass lands
    * only on the seed set S — r0 = 1/|S| on S else 0; teleport term
    * (1-d)/|S| on S else 0. The "related domains" / "expand from a trusted
    * whitelist" form of the ranking (TrustRank): scores measure proximity
    * to the seeds rather than global authority.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: Seq[Long], iters: Int,
                           damping: Double = 0.85,
                           checkpointRanks: Boolean = false): DataFrame = {
    require(iters >= 1 && seeds.nonEmpty,
      s"personalizedPageRank: need iters>=1 and a non-empty seed set")
    val e = edges.select(col(srcCol).cast("long").as("src"),
                         col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, Seq("src"))
      .select(col("src").as("e_src"), col("dst").as("e_dst"), col("deg").as("e_deg"))
      .localCheckpoint(graft.core.Mat.eager)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(graft.core.Mat.eager)
    val isSeed: Column = col("node").isin(seeds: _*)
    val teleport: Column =
      when(isSeed, lit(1.0 - damping) / seeds.size).otherwise(lit(0.0))
    var r = nodes.select(col("node"),
      round(when(isSeed, lit(1.0) / seeds.size).otherwise(lit(0.0)), 12).as("r"))
    for (k <- 1 to iters) {
      val contrib = r.join(ed, col("node") === col("e_src"))
        .select(col("e_dst").as("node"),
          round(col("r") / col("e_deg"), 12).cast("decimal(26,12)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(teleport +
            lit(damping) * coalesce(col("s").cast("double"), lit(0.0)), 12).as("r"))
      r = if (checkpointRanks && k < iters) next.localCheckpoint(graft.core.Mat.eager) else next
    }
    r.select(col("node"), round(col("r"), 6).as("ppr"))
  }

  /** Triangle count over an undirected edge list given as canonical
    * (x < y) pairs, using DEGREE-ORDERED orientation — the standard fix
    * for the wedge-join blowup: orient every edge from its lower-(deg,
    * id) endpoint, enumerate wedges as out-neighbor pairs of the lowest
    * vertex, and close with the oriented (b, c) edge. Each triangle
    * {u<v<w in π} is counted exactly once (wedge at u, closing edge
    * v→w). Out-degree under this orientation is O(√E) on ANY graph
    * (a vertex keeps only edges to higher-degree peers), so the wedge
    * fan-out is Σ out-deg² ≤ E·√E even on skewed graphs — where id-
    * ordered orientation leaves hub wedges quadratic in hub degree.
    * Returns a single row (triangles).
    */
  def triangleCount(und: DataFrame, xCol: String, yCol: String): DataFrame =
    triangleClose(trianglePrep(und, xCol, yCol))

  /** q122's composition — (triangles, nodes, edges) in ONE pipeline.
    * Round-10: the caller previously pre-checkpointed its edge set and
    * counted nodes with its own union+distinct aggregate while
    * [[triangleCount]] checkpointed the edges AGAIN and computed the
    * identical union internally for degrees — so the bench paid one
    * redundant E-row copy job and two executions of the same O(E)
    * node-union aggregate per run. Here the internal edge checkpoint and
    * degree table serve all three outputs: nodes = COUNT(deg) (deg has
    * exactly one row per distinct endpoint), edges = COUNT(e).
    */
  def triangleCountStats(und: DataFrame, xCol: String, yCol: String): DataFrame = {
    val p = trianglePrep(und, xCol, yCol)
    triangleClose(p)
      .crossJoin(broadcast(p.deg.agg(count(lit(1)).as("nodes"))))
      .crossJoin(broadcast(p.e.agg(count(lit(1)).as("edges"))))
  }

  private case class TrianglePrep(e: DataFrame, deg: DataFrame, adj: DataFrame)

  /** Shared orientation/adjacency build behind [[triangleCount]] /
    * [[triangleCountStats]]. Materialization points (round-10 shape,
    * all behind `graft.graph.materialize`, plan-dumpable via
    * [[graft.core.Mat]]):
    *
    *  - `e` — the caller's edge-construction pipeline (typically a
    *    co-occurrence self-join + distinct) feeds the degree agg, the
    *    orientation join and the edge count under different keys, so
    *    exchange reuse can never collapse them. SKIPPED when the input
    *    is already checkpoint-backed (round-10: q130 checkpoints its
    *    sampled edges, and the old unconditional internal checkpoint
    *    copied every row a second time for nothing).
    *  - `deg` — one row per node. It is referenced twice (the x- and
    *    y-side degree attaches are differently-aliased projections, the
    *    round-9 canonicalization-defeat pattern), so without the barrier
    *    the O(E) node-union aggregate executes once PER SIDE — the same
    *    double-aggregate the round-9 plan audit caught on `adj`.
    *  - `adj` — (node, sorted out-neighbors): referenced by the explode
    *    side and the closing attach. Σ out-deg = E array elements, the
    *    bytes the closing join moves anyway.
    *
    * The oriented edge table `g` is round-10 DERIVED from `adj` by
    * explode instead of being checkpointed and joined twice: adj's
    * collect_list over the distinct oriented edges loses nothing, so
    * `adj.select(src, nb, explode(nb) as dst)` IS g with nb(src) already
    * attached — one join and one checkpoint fewer than the round-9 plan
    * (g → join adj on dst → join adj on src).
    */
  private def trianglePrep(und: DataFrame, xCol: String, yCol: String): TrianglePrep = {
    import graft.core.Mat
    val matOn = sys.props.get("graft.graph.materialize").forall(_.toBoolean)
    val e0 = und.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val e = if (Mat.isMaterialized(und)) e0
            else Mat.checkpoint(e0, "triangle_edges", matOn)
    val deg = Mat.checkpoint(
      e.select(col("x").as("n")).unionAll(e.select(col("y").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg")),
      "triangle_deg", matOn)
    val withDeg = e
      .join(deg.select(col("n").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("n").as("y"), col("deg").as("dy")), "y")
    val xFirst = (col("dx") < col("dy")) ||
      (col("dx") === col("dy") && col("x") < col("y"))
    val g = withDeg.select(
      when(xFirst, col("x")).otherwise(col("y")).as("src"),
      when(xFirst, col("y")).otherwise(col("x")).as("dst"))
    val adj = Mat.checkpoint(
      g.groupBy(col("src")).agg(sort_array(collect_list(col("dst"))).as("nb")),
      "triangle_adj", matOn)
    TrianglePrep(e, deg, adj)
  }

  /** Adjacency-intersection closing (replaces the wedge-enumeration
    * join): a triangle u→v, u→w, v→w is counted exactly once at its base
    * edge (u, v) as a common out-neighbor w of u and v — the same
    * once-per-triangle guarantee the (deg, id)-ordered wedge filter gave,
    * because the orientation is a strict total order. The round-8 plan
    * shuffled Σ out-deg² wedge ROWS into a second sort-merge join
    * (measured 28 s at sf0.1, ~180M wedges); this one recovers the
    * oriented edges from `adj` itself (explode — nb(src) rides along, so
    * only ONE attach join remains) and closes with one codegen'd merge
    * walk per edge (sorted_inter_count — plans/VectorExprs). Edges whose
    * dst has no out-neighbors drop at the inner join exactly as they
    * contributed 0 before. Out-deg stays O(√E) under the orientation,
    * bounding array length and per-edge walk cost on any graph.
    * Join strategy stays with the planner: shuffle_hash pins measured a
    * wash here (±0.3 s inside host noise at sf0.1, both directions) and
    * the pageRank 100× lesson stands — a pinned hash build on a
    * graph-sized side dies when a partition outgrows execution memory,
    * while SMJ spills (the session's size-gated AQE SMJ→SHJ conversion
    * is the safe form).
    */
  private def triangleClose(p: TrianglePrep): DataFrame =
    p.adj.select(col("src"), col("nb"), explode(col("nb")).as("dst"))
      .join(p.adj.select(col("src").as("dst"), col("nb").as("nb2")), "dst")
      .select(call_function("sorted_inter_count", col("nb"), col("nb2")).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("triangles"))

  /** DOULION (Tsourakakis et al. KDD'09): triangle-count ESTIMATE from a
    * pNum/pDen edge sample — the scale path where [[triangleCount]]'s
    * exact Σ out-deg² wedge work is the ceiling (dense co-occurrence
    * graphs: q122's measured cost is ~180M wedges at sf0.1 because the
    * co-purchase graph is near-complete). Each triangle survives the
    * sample with probability p³, so sampled_count/p³ is unbiased while
    * wedge work drops by ~p²; variance shrinks as the true count grows —
    * exactly the regime (huge dense graphs) where sampling is needed.
    *
    * The "coin flip" is a DETERMINISTIC portable hash of the edge
    * ((x·2654435761 + y·40503) mod 1e9+7 mod pDen < pNum — the engine's
    * minhash constant family), so runs are reproducible, retries see the
    * same sample, and an external engine can replay the estimate exactly.
    * Returns one row: (sampled_edges, sampled_triangles, est_triangles —
    * count·pDen³/pNum³ rounded to 6 dp in IEEE double).
    */
  def triangleCountSampled(und: DataFrame, xCol: String, yCol: String,
                           pNum: Int, pDen: Int): DataFrame = {
    require(pNum > 0 && pDen > 0 && pNum <= pDen,
      s"sampling rate must be a rational in (0,1], got $pNum/$pDen")
    val keep = pmod(pmod(col(xCol).cast("long") * 2654435761L +
        col(yCol).cast("long") * 40503L, lit(1000000007L)), lit(pDen)) < pNum
    // materialized once: feeds both the count and the triangle pipeline,
    // so the caller's edge construction runs a single time (and
    // triangleCount skips its own edge checkpoint — the input is already
    // block-backed)
    val sampled = graft.core.Mat.checkpoint(und.filter(keep), "triangle_sampled",
      sys.props.get("graft.graph.materialize").forall(_.toBoolean))
    // pDen³/pNum³ as ONE IEEE division of exact integers — bit-identical
    // in any engine, unlike a pow() call
    val scale = (pDen.toLong * pDen * pDen).toDouble / (pNum.toLong * pNum * pNum)
    triangleCount(sampled, xCol, yCol)
      .select(col("triangles").as("sampled_triangles"))
      .crossJoin(broadcast(sampled.agg(count(lit(1)).as("sampled_edges"))))
      .select(col("sampled_edges"), col("sampled_triangles"),
        round(col("sampled_triangles") * scale, 6).as("est_triangles"))
  }

  /** Bounded Bellman-Ford: min total WEIGHT from a seed set within
    * `rounds` relaxation rounds — the weighted companion to
    * [[shortestHops]] (cheapest supply route, weighted proximity to a
    * trusted set). Directed over the DISTINCT (src, dst, w) edge set;
    * INTEGER weights ≥ 0 so the arithmetic is exact in any engine (the
    * q129 oracle replays the recurrence as chained CTEs).
    *
    * d_0 = 0 on seeds; d_{k+1}(v) = min(d_k(v), min over (u,v,w) of
    * d_k(u) + w). Unlike BFS, a settled node can improve later (a
    * longer-hop cheaper path), so every round relaxes the FULL reached
    * set — O(E·rounds) join work, the honest cost of bounded-round
    * min-plus; `rounds` ≥ graph diameter gives the exact fixpoint.
    * Returns (node, cost) for nodes reachable within `rounds` hops.
    */
  def minPlus(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
              seeds: Seq[Long], rounds: Int): DataFrame = {
    require(rounds >= 0 && seeds.nonEmpty,
      "minPlus: need rounds >= 0 and a non-empty seed set")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("e_src"),
        col(dstCol).cast("long").as("e_dst"),
        col(wCol).cast("long").as("e_w")).distinct()
      .localCheckpoint(graft.core.Mat.eager)
    var d = seeds.distinct.toDF("node")
      .select(col("node").cast("long").as("node"), lit(0L).as("cost"))
      .localCheckpoint(graft.core.Mat.eager)
    for (k <- 1 to rounds) {
      val relaxed = d.join(e, col("node") === col("e_src"))
        .select(col("e_dst").as("node"), (col("cost") + col("e_w")).as("cost"))
      d = d.union(relaxed)
        .groupBy(col("node")).agg(min(col("cost")).as("cost"))
        .localCheckpoint(graft.core.Mat.eager)
    }
    d
  }

  /** Multi-source BFS: min hop distance from a seed set, bounded at
    * `maxHops` — the reachability companion to the rank family (blast
    * radius of a poisoned domain, "within K citation hops of a trusted
    * corpus", supply-chain exposure). Directed over the DISTINCT edge set;
    * symmetrize (union of both directions) for undirected graphs.
    *
    * Frontier form, not dense re-propagation: round k joins only the
    * nodes FIRST discovered in round k−1 against the edge table and
    * anti-joins the known set, so each node is expanded exactly once and
    * total join work is O(E) across ALL rounds — the property that makes
    * BFS affordable where the dense min-plus form ([[minPlus]]: every
    * node re-expanded every round, O(E·rounds)) is not. Per-round
    * frontier/known tables are localCheckpointed: like
    * [[Dedup.duplicateClusters]], rounds are driver-synchronous, and the
    * checkpoint keeps round k's plan O(1) deep instead of O(k); an empty
    * frontier ENDS the loop (no per-remaining-hop no-op jobs).
    *
    * Returns (node, dist) for every node within `maxHops`, dist = exact
    * BFS level (deterministic: a node's level is the unique first round
    * that reaches it — no tie-break needed). Seeds not present in the
    * graph still report dist 0: reachability of a seed is a fact about
    * the QUERY, not the edge table.
    */
  def shortestHops(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: Seq[Long], maxHops: Int): DataFrame = {
    require(maxHops >= 0 && seeds.nonEmpty,
      "shortestHops: need maxHops >= 0 and a non-empty seed set")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("e_src"),
        col(dstCol).cast("long").as("e_dst")).distinct()
      .localCheckpoint(graft.core.Mat.eager)
    var known = seeds.distinct.toDF("node")
      .select(col("node").cast("long").as("node"), lit(0).as("dist"))
      .localCheckpoint(graft.core.Mat.eager)
    var frontier = known
    var k = 1
    while (k <= maxHops && !frontier.isEmpty) {
      val discovered = frontier.join(e, col("node") === col("e_src"))
        .select(col("e_dst").as("node")).distinct()
        .join(known, Seq("node"), "left_anti")
        .select(col("node"), lit(k).as("dist"))
        .localCheckpoint(graft.core.Mat.eager)
      known = known.union(discovered).localCheckpoint(graft.core.Mat.eager)
      frontier = discovered
      k += 1
    }
    known
  }
}
