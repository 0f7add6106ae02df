package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Pins the PageRank recurrence against hand-computed fixpoints: symmetry,
  * teleport floors, dangling-mass leakage, and the personalized form's
  * seed-proximity semantics.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Double] = {
    val df = edges.toDF("src", "dst")
    Graph.pageRank(df, "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("3-cycle is already at the uniform fixpoint: every rank stays 1/3") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(r.size == 3)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6, s"got $r"))
  }

  test("star: the hub collects the spokes' mass; spokes sit near the teleport floor") {
    // 2,3,4 all point at 1; 1 points back at 2 only
    val r = ranks(Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L)))
    assert(r(1L) > r(2L) && r(2L) > r(3L), s"got $r")
    // 3 and 4 are structurally identical (in-edges only from nothing)
    assert(math.abs(r(3L) - r(4L)) < 1e-9, s"got $r")
    // nodes with no in-edges hold exactly the teleport floor (1-d)/N
    assert(math.abs(r(3L) - 0.15 / 4) < 1e-6, s"got $r")
  }

  test("dangling sink leaks mass: total rank < 1 and shrinks with iterations") {
    val e = Seq((1L, 2L), (2L, 3L)) // 3 is dangling
    val total1 = ranks(e, 1).values.sum
    val total5 = ranks(e, 5).values.sum
    assert(total1 < 1.0 + 1e-9 && total5 < total1, s"$total1 -> $total5")
  }

  private def ranksConserve(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Double] = {
    val df = edges.toDF("src", "dst")
    Graph.pageRank(df, "src", "dst", iters, conserveDanglingMass = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("conserving form: dangling mass is redistributed — total stays 1, forms provably differ") {
    val e = Seq((1L, 2L), (2L, 3L)) // 3 is dangling
    val leak = ranks(e, 5)
    val cons = ranksConserve(e, 5)
    // total mass conserved up to 12-dp/6-dp rounding
    assert(math.abs(cons.values.sum - 1.0) < 1e-5, s"got $cons")
    // the leak form demonstrably loses what the conserving form keeps
    assert(leak.values.sum < cons.values.sum - 0.1, s"leak=$leak cons=$cons")
    // every node gains its share of the redistributed sink mass
    e.flatMap(p => Seq(p._1, p._2)).distinct.foreach(v =>
      assert(cons(v) > leak(v), s"node $v: leak=${leak(v)} cons=${cons(v)}"))
  }

  test("conserving form: hand-computed one-iteration fixture on the 2-chain") {
    // nodes {1,2,3}, edges 1→2, 2→3; r0 = 1/3 each, dm0 = 1/3 (node 3)
    // r1(v) = 0.05 + 0.85*(contrib + (1/3)/3)
    //   r1(1) = 0.05 + 0.85*(1/9)        ≈ 0.144444
    //   r1(2) = 0.05 + 0.85*(1/3 + 1/9)  ≈ 0.427778
    //   r1(3) = r1(2)
    val got = ranksConserve(Seq((1L, 2L), (2L, 3L)), 1)
    assert(math.abs(got(1L) - (0.05 + 0.85 * (1.0 / 9))) < 1e-6, s"got $got")
    assert(math.abs(got(2L) - (0.05 + 0.85 * (1.0 / 3 + 1.0 / 9))) < 1e-6, s"got $got")
    assert(math.abs(got(3L) - got(2L)) < 1e-9, s"got $got")
  }

  test("conserving form: no dangling nodes ⇒ identical to the leak form") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)) // every node has out-edges
    assert(ranksConserve(e, 5) == ranks(e, 5))
  }

  private def ranksWeighted(edges: Seq[(Long, Long, Long)], iters: Int = 5): Map[Long, Double] = {
    val df = edges.toDF("src", "dst", "w")
    Graph.pageRankWeighted(df, "src", "dst", "w", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("weighted form: uniform unit weights reproduce the unweighted recurrence exactly") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    assert(ranksWeighted(e.map(p => (p._1, p._2, 1L)), 5) == ranks(e, 5))
  }

  test("weighted form: hand-computed one-iteration fixture — the heavy edge pulls rank") {
    // 1 → 2 (w=3), 1 → 3 (w=1): W(1)=4, r0=1/3
    //   r1(2) = 0.05 + 0.85·(1/3·3/4) = 0.2625
    //   r1(3) = 0.05 + 0.85·(1/3·1/4) ≈ 0.120833
    val got = ranksWeighted(Seq((1L, 2L, 3L), (1L, 3L, 1L)), 1)
    assert(math.abs(got(2L) - 0.2625) < 1e-6, s"got $got")
    assert(math.abs(got(3L) - (0.05 + 0.85 / 12)) < 1e-6, s"got $got")
    assert(got(2L) > got(3L), "the heavier edge must pull more rank")
  }

  test("weighted form: parallel edges sum into multiplicity weights") {
    val viaDups = ranksWeighted(Seq((1L, 2L, 1L), (1L, 2L, 1L), (1L, 3L, 1L)), 3)
    val explicit = ranksWeighted(Seq((1L, 2L, 2L), (1L, 3L, 1L)), 3)
    assert(viaDups == explicit)
  }

  test("weighted form: negative weights and zero total out-weight are rejected loudly") {
    // a negative summed edge would flip contribution signs silently
    val neg = intercept[IllegalArgumentException] {
      ranksWeighted(Seq((1L, 2L, -1L), (1L, 3L, 2L)), 1)
    }
    assert(neg.getMessage.contains("w >= 0"), neg.getMessage)
    // an all-zero source would NULL the r·w/W division (silent dangling)
    val zero = intercept[IllegalArgumentException] {
      ranksWeighted(Seq((1L, 2L, 0L), (1L, 3L, 0L), (3L, 1L, 1L)), 1)
    }
    assert(zero.getMessage.contains("W(u) > 0"), zero.getMessage)
    // ...and cancelling parallel edges (net zero) are caught the same way
    intercept[IllegalArgumentException] {
      ranksWeighted(Seq((1L, 2L, 5L), (1L, 2L, -5L), (2L, 1L, 1L)), 1)
    }
  }

  private def communities(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] = {
    // symmetrize: LPA labels flow along edge direction
    val sym = (edges ++ edges.map(_.swap)).distinct.toDF("src", "dst")
    Graph.labelPropagation(sym, "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labelPropagation: two disjoint triangles converge to their min-id labels") {
    val got = communities(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), s"got $got")
  }

  test("labelPropagation: a node with no in-edges keeps its own label") {
    val got = Graph.labelPropagation(
        Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L), s"got $got")
  }

  private def kcore(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(_.swap)).distinct.toDF("src", "dst")
    Graph.kCoreBounded(sym, "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kCoreBounded: the pendant peels, the clique stays with its induced degrees") {
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = kcore(clique :+ (1L, 5L), k = 3, rounds = 2)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
  }

  test("kCoreBounded: a chain cascades to empty; the bounded budget stops mid-cascade") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(kcore(chain, k = 2, rounds = 3).isEmpty)
    // budget of 1: endpoints peeled, the middle keeps its sub-k survivors
    // with FINAL induced degrees (2 and 4 sit at degree 1 < k — present,
    // because the budget ended before their round)
    val oneRound = kcore(chain, k = 2, rounds = 1)
    assert(oneRound == Map(2L -> 1L, 3L -> 2L, 4L -> 1L), s"got $oneRound")
  }

  test("labelPropagation: majority wins over the min-label tie-break") {
    // node 5's neighbors: 1,2 (both relabeled to community 1 by round 2)
    // vs 9 — the 2-vote label beats the singleton even though 9 < ∞
    val got = communities(Seq((1L, 2L), (1L, 5L), (2L, 5L), (9L, 5L)), 4)
    assert(got(5L) == 1L, s"got $got")
  }

  test("rank order follows in-link weight: the doubly-linked node beats singles") {
    val r = ranks(Seq((1L, 9L), (2L, 9L), (3L, 8L), (9L, 3L), (8L, 1L)))
    assert(r(9L) == r.values.max, s"got $r")
  }

  test("personalized: mass concentrates on/near seeds; unreachable nodes score 0") {
    // 1 -> 2 -> 3, and an island 10 -> 11 unreachable from the seed
    val df = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val r = Graph.personalizedPageRank(df, "src", "dst", Seq(1L), iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L), s"got $r")
    assert(r(10L) == 0.0 && r(11L) == 0.0, s"got $r")
  }

  test("hits: the doubly-cited authority and the broader hub win; axes stay L1-normalized") {
    val df = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val r = Graph.hits(df, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    // bipartite separation: sources carry no authority, targets no hubness
    assert(r(1L)._2 == 0.0 && r(2L)._2 == 0.0 && r(10L)._1 == 0.0 && r(11L)._1 == 0.0)
    assert(r(10L)._2 > r(11L)._2, s"got $r") // 10 cited by both hubs
    assert(r(1L)._1 > r(2L)._1, s"got $r")   // 1 cites both authorities
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-5)
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("q122: two edge-sharing triangles on a hand graph, counted once each") {
    val d = java.nio.file.Files.createTempDirectory("graft-tri-sf").toFile.getAbsolutePath
    // o1{1,2,3} → triangle (1,2,3); o5{2,3,4} → triangle (2,3,4); chain 4-5
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 3L), (2L, 4L),
      (3L, 4L), (3L, 5L),
      (4L, 1L), (4L, 2L), // duplicate edge (1,2) must collapse
      (5L, 2L), (5L, 3L), (5L, 4L))
      .toDF("l_orderkey", "l_partkey")
    li.coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val got = GraphQueries.q122_triangles(spark, d).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == (2L, 5L, 6L),
      s"got $got")
  }

  test("pageRank at sf0.001 (q114 shape): one rank per node, teleport floor holds") {
    val pr = GraphQueries.q114_pagerank(spark, TestSession.sf)
    val rows = pr.collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val n = rows.length.toDouble
    val floor = 0.15 / n
    // pr is rounded to 6 dp on output, so allow a half-ulp of that rounding
    rows.foreach(r => assert(r.getDouble(1) >= floor - 5.1e-7))
    // suppliers (offset ids) absorb part mass: their mean rank must exceed parts'
    val (supp, parts) = rows.partition(_.getLong(0) >= GraphQueries.PR_SUPP_OFFSET)
    assert(supp.map(_.getDouble(1)).sum / supp.length >
           parts.map(_.getDouble(1)).sum / parts.length)
  }

  test("triangleCount: hub-skewed graph counted right under degree orientation") {
    // hub 1 fans to 2..6; {1,2,3}, {1,4,5}, and {1,2,4} all hang off the
    // hub (edges 2-3, 4-5, 2-4 close them); clique {7,8,9} sits apart.
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L), (4L, 5L), (2L, 4L),
      (7L, 8L), (7L, 9L), (8L, 9L)).toDF("x", "y")
    val n = Graph.triangleCount(und, "x", "y").collect()(0).getLong(0)
    assert(n == 4L)
  }

  test("triangleCountSampled: p=1 reproduces the exact count; the hash sample is deterministic") {
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L), (4L, 5L), (2L, 4L),
      (7L, 8L), (7L, 9L), (8L, 9L)).toDF("x", "y")
    val full = Graph.triangleCountSampled(und, "x", "y", 1, 1).collect()(0)
    assert(full.getLong(0) == 11L && full.getLong(1) == 4L && full.getDouble(2) == 4.0,
      s"p=1 keeps all 11 edges and all 4 triangles: $full")
    // deterministic hash sample: two runs agree row-for-row
    val a = Graph.triangleCountSampled(und, "x", "y", 3, 10).collect()(0)
    val b = Graph.triangleCountSampled(und, "x", "y", 3, 10).collect()(0)
    assert(a == b, s"hash sampling must be reproducible: $a vs $b")
    assert(a.getLong(0) < 11L, "a 3/10 sample should drop edges on this fixture")
  }

  private def hops(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int): Map[Long, Int] =
    Graph.shortestHops(edges.toDF("src", "dst"), "src", "dst", seeds, maxHops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("shortestHops: chain levels are exact, the hop bound cuts, unreachable nodes are absent") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 10L))
    assert(hops(chain, Seq(1L), 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
    // maxHops beyond the diameter: the empty frontier stops expansion early
    assert(hops(chain, Seq(1L), 100) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("shortestHops: multi-source takes the MIN level; directed edges don't run backwards") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    // seeds at both ends: node 3 is 2 hops from 1 but 4 never reaches back
    assert(hops(chain, Seq(1L, 4L), 3) ==
      Map(1L -> 0, 4L -> 0, 2L -> 1, 3L -> 2))
    // a diamond where two paths reach node 4 at the same level: dist stays 2
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(hops(diamond, Seq(1L), 5) == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("shortestHops: a seed absent from the graph still reports dist 0") {
    assert(hops(Seq((1L, 2L)), Seq(7L), 2) == Map(7L -> 0))
  }

  private def costs(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                    rounds: Int): Map[Long, Long] =
    Graph.minPlus(edges.toDF("src", "dst", "w"), "src", "dst", "w", seeds, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("minPlus: a longer-hop cheaper path beats the direct edge — exactly where BFS can't") {
    // 1→2 costs 5 direct; 1→3→2 costs 2. BFS distance to 2 is 1 hop; the
    // weighted answer needs the second round to improve an already-reached node.
    val g = Seq((1L, 2L, 5L), (1L, 3L, 1L), (3L, 2L, 1L))
    assert(costs(g, Seq(1L), 1) == Map(1L -> 0, 2L -> 5, 3L -> 1),
      "after 1 round only direct edges are relaxed")
    assert(costs(g, Seq(1L), 2) == Map(1L -> 0, 2L -> 2, 3L -> 1),
      "round 2 improves node 2 through the cheap detour")
    assert(costs(g, Seq(1L), 5) == Map(1L -> 0, 2L -> 2, 3L -> 1),
      "extra rounds past the fixpoint change nothing")
  }

  test("minPlus: multi-source takes the cheapest origin; zero-weight edges are fine") {
    val g = Seq((1L, 3L, 10L), (2L, 3L, 4L), (3L, 4L, 0L))
    assert(costs(g, Seq(1L, 2L), 2) == Map(1L -> 0, 2L -> 0, 3L -> 4, 4L -> 4))
  }

  test("triangleCount: adjacency-intersection closing == brute force on a dense pseudo-random graph") {
    // deterministic hash-sampled graph over 40 nodes, ~30% density — big
    // enough that the degree orientation, tie-breaks, and the per-edge
    // sorted-merge intersection all do real work; brute force is the spec
    val edges = for {
      x <- 1L to 40L; y <- (x + 1) to 40L
      if ((x * 2654435761L + y * 40503L) % 97) % 10 < 3
    } yield (x, y)
    val und = edges.toDF("x", "y")
    val got = Graph.triangleCount(und, "x", "y").collect()(0).getLong(0)
    val es = edges.toSet
    def adj(u: Long, v: Long) = es((u min v, u max v))
    val brute = (for {
      u <- 1L to 40L; v <- (u + 1) to 40L; w <- (v + 1) to 40L
      if adj(u, v) && adj(u, w) && adj(v, w)
    } yield 1).size
    assert(got == brute.toLong, s"got $got, brute-force says $brute")
  }

  test("triangleCount: empty and triangle-free edge sets return one zero row") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    assert(Graph.triangleCount(empty, "x", "y").collect()(0).getLong(0) == 0L)
    // a path graph: edges exist, adjacency joins fire, but nothing closes
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    assert(Graph.triangleCount(path, "x", "y").collect()(0).getLong(0) == 0L)
  }
}
