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
}
