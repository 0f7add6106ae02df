package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the analytics family on planted data: BM25 against
  * hand-evaluated weights, the cohort retention matrix on a hand-drawn
  * activity calendar, and PSI's three contracts (identical → 0, shifted →
  * positive, bins missing on one side → finite via the epsilon floor).
  * The DuckDB oracle hash-checks the same queries on the synthetic tables;
  * these prove the arithmetic on inputs small enough to check by hand.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** BM25 corpus: doc 1 has two 'spark' of 4 tokens; doc 2 one 'spark' of
    * 8; doc 3 matches nothing. PSI corpus rides along via n_chars/source:
    * src0 (ref) and src_same share the same n_chars multiset {100, 200};
    * src_shift sits in different bins {400, 500}; src_gap puts one doc in
    * a bin src0 never populates.
    */
  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-analytics-sf").toFile.getAbsolutePath
    val docs = Seq(
      (1L, "spark spark x y", "en", "src0", 100L),
      (2L, "spark a b c d e f g", "en", "src0", 200L),
      (3L, "q w e r", "en", "src_same", 100L),
      (4L, "t y u i", "en", "src_same", 200L),
      (5L, "m n b v", "en", "src_shift", 400L),
      (6L, "l k j h", "en", "src_shift", 500L),
      (7L, "z z z z", "en", "src_gap", 100L),
      (8L, "g g g g", "en", "src_gap", 1300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    // activity calendar: u1 active d0,d1,d3 (d0 twice — the distinct must
    // collapse it); u2 d0 only; u3 first seen d1, also d2
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-02-0${day + 1}%d 0$h:00:00")
    val events = Seq(
      (1L, ts(0, 1), 1L, "view", 1.0, "{}"),
      (2L, ts(0, 2), 1L, "view", 1.0, "{}"),
      (3L, ts(1, 1), 1L, "view", 1.0, "{}"),
      (4L, ts(3, 1), 1L, "view", 1.0, "{}"),
      (5L, ts(0, 1), 2L, "view", 1.0, "{}"),
      (6L, ts(1, 1), 3L, "view", 1.0, "{}"),
      (7L, ts(2, 1), 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def run(q: String) = SparkEntry.queries(q)(spark, dir)

  test("q110: BM25 weights match the hand-evaluated formula; no-term docs absent") {
    // N=8 docs, avgdl = (4+8+4·6)/8 = 4.5, df('spark')=2
    val N = 8.0; val avgdl = 4.5; val df = 2.0
    val idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val got = run("q110_bm25")
      .select($"doc_id", $"bm25", $"rank").as[(Long, Double, Long)].collect()
      .sortBy(_._3)
    assert(got.map(_._1).toSeq == Seq(1L, 2L), s"ranking wrong: ${got.toSeq}")
    assert(math.abs(got(0)._2 - w(2, 4)) < 1e-6 && math.abs(got(1)._2 - w(1, 8)) < 1e-6,
      s"weights: got ${got.toSeq}, want ${w(2, 4)} / ${w(1, 8)}")
  }

  test("q111: retention matrix matches the hand-drawn calendar") {
    val got = run("q111_retention")
      .select($"cohort", $"day_offset", $"users").as[(String, Long, Long)]
      .collect().toSet
    val want = Set(
      ("2024-02-01", 0L, 2L), // u1+u2 on their first day
      ("2024-02-01", 1L, 1L), // u1 back next day (double event counted once)
      ("2024-02-01", 3L, 1L), // u1 back on day 3
      ("2024-02-02", 0L, 1L), // u3's cohort
      ("2024-02-02", 1L, 1L)) // u3 back next day
    assert(got == want, s"got $got")
  }

  test("q121: support/confidence/lift match the hand calculation; singleton pairs drop") {
    val d = Files.createTempDirectory("graft-basket-sf").toFile.getAbsolutePath
    // o1{10,20} o2{10,20} o3{10,30} o4{20}: only (10,20) clears min-pair 2
    val li = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L),
      (4L, 20L))
      .toDF("l_orderkey", "l_partkey")
    li.coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val got = AnalyticsQueries.q121_basket_rules(spark, d).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("p1") == 10L && r.getAs[Long]("p2") == 20L)
    assert(r.getAs[Long]("pair_cnt") == 2L)
    assert(r.getAs[Double]("support") == 0.5)           // 2 of 4 orders
    assert(r.getAs[Double]("confidence") == 0.666667)   // 2 of 3 orders with 10
    assert(r.getAs[Double]("lift") == 0.888889)         // conf / (3/4)
    assert(r.getAs[Long]("rank") == 1L)
  }

  test("q120: order matters — a purchase before the first click never counts") {
    val d = Files.createTempDirectory("graft-funnel-sf").toFile.getAbsolutePath
    def ts(h: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")
    // u1 completes in order; u2 purchases BEFORE viewing (step 1 only);
    // u3 view+purchase but never clicks (step 1); u4 clicks without a view
    // (not in the funnel at all)
    val events = Seq(
      (1L, ts(1), 1L, "view", 1.0, "{}"),
      (2L, ts(2), 1L, "click", 1.0, "{}"),
      (3L, ts(3), 1L, "purchase", 1.0, "{}"),
      (4L, ts(1), 2L, "purchase", 1.0, "{}"),
      (5L, ts(2), 2L, "view", 1.0, "{}"),
      (6L, ts(1), 3L, "view", 1.0, "{}"),
      (7L, ts(2), 3L, "purchase", 1.0, "{}"),
      (8L, ts(1), 4L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.coalesce(1).write.parquet(s"$d/events.parquet")
    val got = AnalyticsQueries.q120_funnel(spark, d)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "view", 3L, 1.0),      // u1, u2, u3
      (2L, "click", 1L, 0.333333), // only u1 clicked after viewing
      (3L, "purchase", 1L, 0.333333)))
  }

  test("q112: identical dist → 0; shifted → positive; gap bin stays finite") {
    val got = run("q112_psi_drift")
      .select($"source", $"psi").as[(String, Double)].collect().toMap
    assert(got.keySet == Set("src_same", "src_shift", "src_gap"),
      "reference src0 must not score itself")
    assert(got("src_same") == 0.0, s"identical distribution: ${got("src_same")}")
    assert(got("src_shift") > 1.0, s"fully disjoint bins should spike: ${got("src_shift")}")
    assert(got("src_gap") > 0 && !got("src_gap").isInfinite && !got("src_gap").isNaN,
      s"epsilon floor must keep a one-sided bin finite: ${got("src_gap")}")
  }
}
