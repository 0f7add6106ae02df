package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.SetSim

/** Exactness of the prefix-filtered set-similarity join: recall 1.0 vs the
  * brute-force all-pairs join, including pairs AT the threshold boundary
  * (the spot where both a lossy prefix rule and FP threshold arithmetic
  * would first break).
  */
class SetSimSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Brute-force truth: all-pairs cross join + exact integer Jaccard. */
  private def bruteSets(sets0: DataFrame, setCol: String, tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] = {
    val sets = sets0.select(col("doc_id"), col(setCol).as("tk"))
      .withColumn("n", size(col("tk"))).filter(col("n") >= 1)
    val a = sets.select(col("doc_id").as("d1"), col("tk").as("tk1"), col("n").as("n1"))
    val b = sets.select(col("doc_id").as("d2"), col("tk").as("tk2"), col("n").as("n2"))
    a.crossJoin(b).filter(col("d1") < col("d2"))
      .withColumn("inter_cnt", size(array_intersect(col("tk1"), col("tk2"))).cast("long"))
      .withColumn("union_cnt", (col("n1") + col("n2")).cast("long") - col("inter_cnt"))
      .filter(col("inter_cnt") * tDen >= col("union_cnt") * tNum)
      .select(col("d1"), col("d2"), col("inter_cnt"), col("union_cnt"))
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  private def brute(df: DataFrame, tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] =
    bruteSets(SetSim.tokenSets(df, "doc_id", "text"), "tk", tNum, tDen)

  private def run(df: DataFrame, tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] =
    SetSim.jaccardSelfJoin(df, "doc_id", "text", tNum, tDen)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("boundary pairs: exactly-at-threshold kept, just-below dropped") {
    // J(1,2) = 3/5 exactly (inter {b c d}, union {a b c d e}): kept at 3/5.
    // J(3,4) = 2/4 = 1/2 < 3/5: dropped. J(5,6) = 2/3 > 3/5: kept.
    val df = Seq(
      (1L, "a b c d"), (2L, "b c d e"),
      (3L, "p q r"), (4L, "q r s"),
      (5L, "x y z"), (6L, "x y")).toDF("doc_id", "text")
    val got = run(df, 3, 5)
    assert(got == Set((1L, 2L, 3L, 5L), (5L, 6L, 2L, 3L)), s"got $got")
    assert(got == brute(df, 3, 5))
  }

  test("identical sets (J=1), duplicate tokens collapse to sets, empties drop") {
    val df = Seq(
      (1L, "a a a b"),        // set {a,b}
      (2L, "b a"),            // set {a,b} — J(1,2)=1
      (3L, "   "),            // empty set: matches nothing
      (4L, "a")).toDF("doc_id", "text") // {a}: J with {a,b} = 1/2 < 3/5
    val got = run(df, 3, 5)
    assert(got == Set((1L, 2L, 2L, 2L)), s"got $got")
    assert(got == brute(df, 3, 5))
  }

  test("prefix pruning loses nothing on the real corpus (recall 1.0 vs brute force)") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    for ((tNum, tDen) <- Seq((3, 5), (4, 5), (1, 2))) {
      val got = run(docs, tNum, tDen)
      val want = brute(docs, tNum, tDen)
      assert(got == want,
        s"t=$tNum/$tDen: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, s"fixture should yield pairs at $tNum/$tDen")
    }
  }

  test("shingle-hash set form (q125 shape): recall 1.0 vs brute force, planted near-dups surface") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val sets = docs.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions.shingleHashes(col("text"), 3)).as("hs"))
    val got = SetSim.jaccardSelfJoinSets(sets, "doc_id", "hs", 3, 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = bruteSets(sets, "hs", 3, 5)
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty, "the corpus plants >=0.8-Jaccard shingle pairs; 3/5 must catch them")
  }

  test("cross-corpus form (q128 shape): recall 1.0 vs brute force across the shard split") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val sets = docs.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions.shingleHashes(col("text"), 3)).as("hs"))
    val half = 25L // TestSession.sf corpus splits around its median id
    val l = sets.filter(col("doc_id") >= half)
    val r = sets.filter(col("doc_id") < half)
    val got = SetSim.jaccardJoinSets(l, r, "doc_id", "hs", 3, 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute truth: cross join of the two halves, exact integer Jaccard
    val a = l.withColumn("n", size(col("hs"))).filter(col("n") >= 1)
      .select(col("doc_id").as("d1"), col("hs").as("h1"), col("n").as("n1"))
    val b = r.withColumn("n", size(col("hs"))).filter(col("n") >= 1)
      .select(col("doc_id").as("d2"), col("hs").as("h2"), col("n").as("n2"))
    val want = a.crossJoin(b)
      .withColumn("inter_cnt", size(array_intersect(col("h1"), col("h2"))).cast("long"))
      .withColumn("union_cnt", (col("n1") + col("n2")).cast("long") - col("inter_cnt"))
      .filter(col("inter_cnt") * 5 >= col("union_cnt") * 3)
      .select(col("d1"), col("d2"), col("inter_cnt"), col("union_cnt"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("cross-corpus form: sides are NOT deduped against each other — same id can pair") {
    val l = Seq((1L, "a b c")).toDF("doc_id", "text")
    val r = Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text")
    val got = SetSim.jaccardJoinSets(
        SetSim.tokenSets(l, "doc_id", "text"),
        SetSim.tokenSets(r, "doc_id", "text"), "doc_id", "tk", 3, 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L, 3L)), s"got $got")
  }

  test("overlapSelfJoin: exactly-at-C kept, C-1 dropped, brute parity on the real corpus") {
    // sets engineered around C=3: (1,2) share exactly 3, (1,3) share 2,
    // (4,5) share 4; 6 is too small to ever reach C and must drop early
    val fix = Seq(
      (1L, Seq(10L, 11L, 12L, 13L)), (2L, Seq(10L, 11L, 12L, 99L)),
      (3L, Seq(10L, 11L, 98L, 97L)),
      (4L, Seq(50L, 51L, 52L, 53L)), (5L, Seq(50L, 51L, 52L, 53L, 54L)),
      (6L, Seq(10L, 11L))).toDF("doc_id", "hs")
    val got = SetSim.overlapSelfJoin(fix, "doc_id", "hs", 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L), (4L, 5L, 4L)), s"got $got")
    // real corpus: brute all-pairs intersect counts at the q135 threshold
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val sets = docs.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions.shingleHashes(col("text"), 3)).as("hs"))
    val c = 30
    val a = sets.select(col("doc_id").as("d1"), col("hs").as("h1"))
    val b = sets.select(col("doc_id").as("d2"), col("hs").as("h2"))
    val want = a.crossJoin(b).filter(col("d1") < col("d2"))
      .withColumn("overlap_cnt", size(array_intersect(col("h1"), col("h2"))).cast("long"))
      .filter(col("overlap_cnt") >= c)
      .select(col("d1"), col("d2"), col("overlap_cnt"))
      .as[(Long, Long, Long)].collect().toSet
    val real = SetSim.overlapSelfJoin(sets, "doc_id", "hs", c)
      .as[(Long, Long, Long)].collect().toSet
    assert(real == want,
      s"missing=${(want -- real).take(5)} extra=${(real -- want).take(5)}")
    assert(want.nonEmpty)
  }

  private def edBrute(df: DataFrame, k: Int): Set[(Long, Long, Long)] = {
    val a = df.select(col("doc_id").as("d1"), col("text").as("s1"))
    val b = df.select(col("doc_id").as("d2"), col("text").as("s2"))
    a.crossJoin(b).filter(col("d1") < col("d2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2")).cast("long"))
      .filter(col("dist") <= k)
      .select(col("d1"), col("d2"), col("dist"))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def edRun(df: DataFrame, k: Int, q: Int = 2): Set[(Long, Long, Long)] =
    SetSim.editDistanceSelfJoin(df, "doc_id", "text", k, q)
      .as[(Long, Long, Long)].collect().toSet

  test("editDistanceSelfJoin: recall 1.0 vs brute force on real part names") {
    val parts = Tables.load(spark, TestSession.sf, "part")
      .select(col("p_partkey").as("doc_id"), col("p_name").as("text"))
    for (k <- Seq(0, 1, 2)) {
      val got = edRun(parts, k)
      val want = edBrute(parts, k)
      assert(got == want,
        s"k=$k: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, s"part names must yield pairs at k=$k")
    }
  }

  test("editDistanceSelfJoin: short strings route densely, mixed lengths cross the boundary") {
    // shortLen for k=2,q=2 is 5: "bolt"/"bol" are gram-starved, the long
    // names carry grams — pairs must surface across the route boundary too
    val df = Seq(
      (1L, "bolt"), (2L, "bol"), (3L, "b"),
      (4L, "bolted"), (5L, "bolter"), (6L, "completely different")
    ).toDF("doc_id", "text")
    for (k <- Seq(1, 2); q <- Seq(1, 2, 3)) {
      val got = edRun(df, k, q)
      assert(got == edBrute(df, k), s"k=$k q=$q mismatch: $got")
    }
    assert(edRun(df, 2).contains((1L, 4L, 2L)),
      "short 'bolt' must pair with long 'bolted' across the route split")
  }

  test("editDistanceSelfJoin: q=1 and q=3 parity on real names (the q-sensitive arithmetic)") {
    val parts = Tables.load(spark, TestSession.sf, "part")
      .select(col("p_partkey").as("doc_id"), col("p_name").as("text"))
    val want = edBrute(parts, 2)
    assert(edRun(parts, 2, q = 1) == want, "q=1")
    assert(edRun(parts, 2, q = 3) == want, "q=3")
  }

  test("editDistanceSelfJoin: k=0 is an exact-duplicate finder") {
    val df = Seq((1L, "same name"), (2L, "same name"), (3L, "other")).toDF("doc_id", "text")
    assert(edRun(df, 0) == Set((1L, 2L, 0L)))
  }

  test("rejects degenerate thresholds") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](SetSim.jaccardSelfJoin(df, "doc_id", "text", 0, 5))
    intercept[IllegalArgumentException](SetSim.jaccardSelfJoin(df, "doc_id", "text", 5, 5))
  }

  test("editDistanceSelfJoin: adversarial short-string corpus degrades past the ceiling, output unchanged") {
    // every string gram-starved at k=2,q=2 (len <= 5) — the exact corpus
    // shape where the old unbounded broadcast would OOM at scale
    val df = Seq(
      (1L, "bolt"), (2L, "bol"), (3L, "bots"), (4L, "colt"),
      (5L, "cols"), (6L, "b"), (7L, "belt"), (8L, "melt")
    ).toDF("doc_id", "text")
    val want = edBrute(df, 2)
    assert(want.nonEmpty)
    // below the ceiling: broadcast route
    assert(edRun(df, 2) == want, "broadcast route")
    // ceiling of 1 < 8 shorts: degraded shuffle-replicate-NL route must
    // produce the identical pair set
    val degraded = SetSim.editDistanceSelfJoin(df, "doc_id", "text", 2, 2,
        shortsCeiling = 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(degraded == want, "degraded route")
  }

  /** Brute containment truth: cross join + |x∩y|·tDen ≥ |x|·tNum. */
  private def contBrute(sets: DataFrame, probeIds: Long => Boolean,
                        tNum: Int, tDen: Int): Set[(Long, Long, Long, Long)] = {
    val withN = sets.withColumn("n", size(col("tk"))).filter(col("n") >= 1)
    val l = withN.select(col("doc_id").as("d1"), col("tk").as("tk1"),
      col("n").cast("long").as("n1"))
    val r = withN.select(col("doc_id").as("d2"), col("tk").as("tk2"))
    l.crossJoin(r)
      .withColumn("inter_cnt",
        size(array_intersect(col("tk1"), col("tk2"))).cast("long"))
      .filter(col("inter_cnt") * tDen >= col("n1") * tNum)
      .select(col("d1"), col("d2"), col("inter_cnt"), col("n1"))
      .as[(Long, Long, Long, Long)].collect().toSet
      .filter(p => probeIds(p._1) && !probeIds(p._2))
  }

  test("containmentJoin: recall 1.0 vs brute force across the eval/corpus split (q137 shape)") {
    val sets = SetSim.tokenSets(
      Tables.load(spark, TestSession.sf, "documents")
        .select(col("doc_id"), col("text")), "doc_id", "text")
    for ((tn, td) <- Seq((1, 2), (4, 5))) {
      val got = SetSim.containmentJoin(
          sets.filter(col("doc_id") < 50), sets.filter(col("doc_id") >= 50),
          "doc_id", "tk", tn, td)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = contBrute(sets, _ < 50, tn, td)
      assert(got == want,
        s"t=$tn/$td: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, s"corpus must yield containment pairs at t=$tn/$td")
    }
  }

  test("containmentJoin: asymmetric coverage finds what symmetric Jaccard cannot") {
    // doc 1 is verbatim CONTAINED in doc 2 (jaccard 3/23 ≈ 0.13):
    // the leakage case a symmetric join misses at any useful threshold
    val extra = (1 to 20).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, "alpha beta gamma"),
      (2L, s"alpha beta gamma $extra")).toDF("doc_id", "text")
    val sets = SetSim.tokenSets(df, "doc_id", "text")
    val cont = SetSim.containmentJoin(
        sets.filter(col("doc_id") === 1), sets.filter(col("doc_id") === 2),
        "doc_id", "tk", 1, 1) // t = 1: full coverage
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(cont == Set((1L, 2L, 3L, 3L)))
    val jac = SetSim.jaccardJoinSets(
        sets.filter(col("doc_id") === 1), sets.filter(col("doc_id") === 2),
        "doc_id", "tk", 1, 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(jac.isEmpty, "jaccard 0.13 must not pass t=0.5 — that asymmetry is the point")
  }

  test("containmentJoin: exactly-at-threshold kept, one-element-short dropped") {
    // probe has 4 tokens; t=3/4 requires inter >= 3
    val df = Seq((1L, "a b c d"),
      (10L, "a b c x y"),  // inter 3 = exactly ⌈3/4·4⌉ — kept
      (11L, "a b x y z")   // inter 2 — dropped
    ).toDF("doc_id", "text")
    val sets = SetSim.tokenSets(df, "doc_id", "text")
    val got = SetSim.containmentJoin(
        sets.filter(col("doc_id") === 1), sets.filter(col("doc_id") >= 10),
        "doc_id", "tk", 3, 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 3L, 4L)))
  }

  test("idCol colliding with an internal working column is rejected loudly") {
    val setsN = Seq((1L, Seq("a", "b"))).toDF("n", "tk0")
    intercept[IllegalArgumentException](
      SetSim.jaccardSelfJoinSets(setsN, "n", "tk0", 1, 2))
    val setsTok = Seq((1L, Seq("a", "b"))).toDF("tok", "tk0")
    intercept[IllegalArgumentException](
      SetSim.overlapSelfJoin(setsTok, "tok", "tk0", 1))
    val strsDf = Seq((1L, "abc")).toDF("df", "text")
    intercept[IllegalArgumentException](
      SetSim.editDistanceSelfJoin(strsDf, "df", "text", 1))
  }
}
