package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.TextFunctions

/** Semantic pins for the sketch queries (q101–q102): the count-min
  * soundness invariant (estimate dominates exact) and the KMV sample's
  * exact bottom-k membership + estimator arithmetic — both on the real
  * sf0.001 corpus, so the pins hold against the same data the smoke runs.
  */
class SketchQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def run(q: String) = SparkEntry.queries(q)(spark, TestSession.sf)

  test("q101: count-min estimate dominates exact; top-20 matches the exact aggregate") {
    val rows = run("q101_countmin")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"CMS soundness broken for '$tok': est $est < exact $exact")
    }
    val expectTop = Tables.load(spark, TestSession.sf, "documents")
      .select(explode(TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("exact"))
      .orderBy($"exact".desc, $"tok".asc).limit(20)
      .as[(String, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._2).toMap == expectTop)
  }

  test("q102: sample is exactly the bottom-100 salted hashes; estimator arithmetic pinned") {
    val rows = run("q102_kmv_sample")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 100)
    val expect = Tables.load(spark, TestSession.sf, "documents")
      .select($"doc_id",
        TextFunctions.polyHash(concat(lit("sample|"), $"doc_id".cast("string"))).as("hk"))
      .orderBy($"hk".asc, $"doc_id".asc).limit(100)
      .as[(Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).sortBy(_._2).toSeq == expect.toSeq)
    val maxHk = expect.map(_._2).max
    val est = math.floor(99.0 * TextFunctions.HashMod.toDouble / maxHk).toLong
    assert(rows.forall(_._3 == est))
    // the estimator is in the right ballpark for a uniform hash (±50%
    // covers k=100's variance many sigmas over — this is a sanity rail,
    // the exact value is pinned above)
    val trueN = Tables.load(spark, TestSession.sf, "documents").count()
    assert(est > trueN / 2 && est < trueN * 2)
  }

  test("q145: bias-corrected HLL estimate lands within ~3 sigma of exact per source") {
    // m=256 -> standard error ~6.5%; the hash-range correction factor
    // (HashMod / 2^30, Sketch.hllEstimate) removes the systematic +7.4%
    // the truncated hash word adds — without it, estimates sat biased-high
    // by about the same magnitude as the noise band itself
    val rows = run("q145_hll")
      .select($"source", $"est", $"exact")
      .as[(String, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, est, exact) =>
      val rel = math.abs(est - exact) / exact.toDouble
      assert(rel < 0.20,
        f"HLL estimate for '$src' off by ${rel * 100}%.1f%% (est $est, exact $exact)")
    }
  }

  test("q154: groups at or under k are answered exactly; sampled rank error within the 1/sqrt(k) class") {
    import graft.operators.Sketch
    val docs = Tables.load(spark, TestSession.sf, "documents")
      .select($"source", $"doc_id",
        size(TextFunctions.tokens($"text")).cast("long").as("len"))
    // exact twin: k larger than every group means the sample IS the group
    val total = docs.count().toInt
    val exact = Sketch.sampledQuantiles(docs, Seq("source"), $"len", "doc_id",
      k = total + 1, qs = Seq(0.5, 0.9))
      .select($"source", $"q", $"value")
      .as[(String, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // the exact form must agree with a hand rank-selection per group
    val byGroup = docs.select($"source", $"len", $"doc_id")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (s, rs) =>
        s -> rs.sortBy(r => (r._2, r._3)).map(_._2).toIndexedSeq }
    for ((s, vals) <- byGroup; q <- Seq(0.5, 0.9)) {
      val want = vals(math.ceil(q * vals.size).toInt - 1)
      assert(exact((s, q)) == want, s"exact-path quantile off for ($s, $q)")
    }
    // sampled path: the reported value's TRUE rank in the full group
    // must sit near q — the 1/sqrt(k) sampling-error class, asserted at
    // a loose 4/sqrt(k) so the pin is about the mechanism, not luck
    val k = 64
    val sampled = Sketch.sampledQuantiles(docs, Seq("source"), $"len", "doc_id",
      k = k, qs = Seq(0.5, 0.9))
      .select($"source", $"q", $"value", $"sample_n")
      .as[(String, Double, Long, Long)].collect()
    assert(sampled.nonEmpty)
    val bound = 4.0 / math.sqrt(k)
    for ((s, q, v, n) <- sampled if byGroup(s).size > k) {
      assert(n == k, s"group $s must sample exactly k rows, got $n")
      val vals = byGroup(s)
      val trueRank = vals.count(_ <= v).toDouble / vals.size
      assert(math.abs(trueRank - q) <= bound,
        f"($s, $q): sampled value $v has true rank $trueRank%.3f, " +
          f"|err| > $bound%.3f")
    }
    // determinism: a second run is row-identical (no rand() anywhere)
    val again = Sketch.sampledQuantiles(docs, Seq("source"), $"len", "doc_id",
      k = k, qs = Seq(0.5, 0.9))
      .select($"source", $"q", $"value", $"sample_n")
      .as[(String, Double, Long, Long)].collect()
    assert(again.toSet == sampled.toSet)
  }

  test("q156: k >= n is the exact weighted quantile; sampled weighted rank stays near q; w <= 0 fails loud") {
    import graft.operators.Sketch
    val docs = Tables.load(spark, TestSession.sf, "documents")
      .select($"source", $"doc_id", $"n_chars",
        size(TextFunctions.tokens($"text")).cast("long").as("ntok"))
      .filter($"ntok" > 0)
    val byGroup = docs.select($"source", $"n_chars", $"ntok", $"doc_id")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (s, rs) =>
        s -> rs.sortBy(r => (r._2, r._4)).map(r => (r._2, r._3)).toIndexedSeq }
    // exact weighted quantile by hand: first value whose running weight
    // reaches q of the group's total
    def exactWq(vals: IndexedSeq[(Long, Long)], q: Double): Long = {
      val tot = vals.map(_._2).sum.toDouble
      var c = 0L
      vals.find { case (_, w) => c += w; c.toDouble >= q * tot }.get._1
    }
    val total = docs.count().toInt
    val exact = Sketch.weightedSampledQuantiles(docs, Seq("source"),
      $"n_chars", $"ntok", "doc_id", k = total + 1, qs = Seq(0.5, 0.9))
      .select($"source", $"q", $"value")
      .as[(String, Double, Long)].collect()
    for ((s, q, v) <- exact)
      assert(v == exactWq(byGroup(s), q), s"exact-path weighted quantile off for ($s, $q)")
    // sampled path: the reported value's TRUE weighted rank in the full
    // group sits near q (A-ES inclusion ∝ weight ⇒ the plain 1/sqrt(k)
    // class applies to the weighted CDF; loose 4/sqrt(k) pin)
    val k = 64
    val sampled = Sketch.weightedSampledQuantiles(docs, Seq("source"),
      $"n_chars", $"ntok", "doc_id", k = k, qs = Seq(0.5, 0.9))
      .select($"source", $"q", $"value")
      .as[(String, Double, Long)].collect()
    assert(sampled.nonEmpty)
    val bound = 4.0 / math.sqrt(k)
    for ((s, q, v) <- sampled if byGroup(s).size > k) {
      val vals = byGroup(s)
      val tot = vals.map(_._2).sum.toDouble
      val trueRank = vals.filter(_._1 <= v).map(_._2).sum.toDouble / tot
      assert(math.abs(trueRank - q) <= bound,
        f"($s, $q): value $v has true weighted rank $trueRank%.3f, |err| > $bound%.3f")
    }
    // the A-ES contract is enforced, not documented-only
    val withZero = docs.unionByName(
      Seq(("zz", 999999L, 10L, 0L)).toDF("source", "doc_id", "n_chars", "ntok"))
    intercept[IllegalArgumentException] {
      Sketch.weightedSampledQuantiles(withZero, Seq("source"),
        $"n_chars", $"ntok", "doc_id", k = 8, qs = Seq(0.5))
    }
  }

  test("A-ES uniform is id-mod-prime: ids past the wrap point and negative ids race on real keys") {
    import graft.operators.Sketch
    val P = 1000000007L
    def run(rows: Seq[(String, Long, Long, Long)], k: Int) =
      Sketch.weightedSampledQuantiles(rows.toDF("source", "doc_id", "len", "w"),
          Seq("source"), $"len", $"w", "doc_id", k = k, qs = Seq(0.5, 0.9))
        .select($"q", $"value", $"sample_w")
        .as[(Double, Long, Long)].collect().toSet
    // the uniform depends on the id only through floorMod(id, P): shifting
    // every id by the prime reproduces the identical sample and answers
    val base = (1L to 30L).map(i => ("s", i, i * 7 % 23 + 1, i % 4 + 1))
    assert(run(base.map { case (s, i, v, w) => (s, i + P, v, w) }, 8)
      == run(base, 8))
    // ids past ~3.47e9 (the old long-wrap point) and negative ids draw real
    // keys — the wrapped form NULL'd log(u) and NULLS FIRST admitted them
    // into every sample regardless of weight; now they compete like any id
    val wild = Seq(("s", 4000000000L, 5L, 1L), ("s", -17L, 9L, 2L),
      ("s", Long.MaxValue - 3, 2L, 1L), ("s", 1L, 7L, 3L))
    def key(id: Long, w: Long): Double = {
      val r = java.lang.Math.floorMod(id, P)
      val u = (java.lang.Math.floorMod(r * 2654435761L, P) + 1).toDouble / 1000000008d
      -math.log(u) / w
    }
    val expectW = wild.sortBy { case (_, i, _, w) => (key(i, w), i) }
      .take(2).map(_._4).sum
    val got = run(wild, 2)
    assert(got.nonEmpty && got.forall(_._3 == expectW),
      s"sample_w ${got.map(_._3)} != hand-raced $expectW")
  }

  test("checkWeights = false skips the eager scan but answers identically on valid weights") {
    import graft.operators.Sketch
    val rows = (1L to 25L).map(i => ("s", i, i * 3 % 11 + 1, i % 5 + 1))
    def run(check: Boolean) =
      Sketch.weightedSampledQuantiles(rows.toDF("source", "doc_id", "len", "w"),
          Seq("source"), $"len", $"w", "doc_id", k = 8, qs = Seq(0.5, 0.9),
          checkWeights = check)
        .select($"q", $"value", $"sample_w")
        .as[(Double, Long, Long)].collect().toSet
    assert(run(check = false) == run(check = true))
    // and the opt-out genuinely skips the contract: construction no longer
    // throws on a zero weight (the caller owns validation on this path)
    val withZero = rows :+ (("s", 999L, 5L, 0L))
    Sketch.weightedSampledQuantiles(
      withZero.toDF("source", "doc_id", "len", "w"),
      Seq("source"), $"len", $"w", "doc_id", k = 8, qs = Seq(0.5),
      checkWeights = false) // lazy plan, no eager job, no throw
  }

  test("q154 plan: the per-group sample cut compiles to WindowGroupLimit before the one exchange") {
    val plan = SparkEntry.queries("q154_sampled_quantiles")(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected a map-side WindowGroupLimit sample cut in:\n$plan")
  }
}
