package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RRF fusion (q116) and the interpolated bigram LM (q117): semantic pins
  * that the oracles can't express — fusion dominance of doubly-retrieved
  * docs, and the OOV-floor scoring of unseen transitions.
  */
class RetrievalFusionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("q116: fused list is top-10, ranks dense 1..10, rrf consistent with arms") {
    val got = AnalyticsQueries.q116_hybrid_rrf(spark, TestSession.sf).collect()
    assert(got.length == AnalyticsQueries.RRF_TOPN)
    assert(got.map(_.getAs[Long]("fused_rank")).sorted.toSeq == (1L to 10L))
    got.foreach { r =>
      val lex = Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Long])
      val sem = Option(r.getAs[Any]("sem_rank")).map(_.asInstanceOf[Long])
      assert(lex.nonEmpty || sem.nonEmpty)
      val expect = lex.map(v => 1.0 / (AnalyticsQueries.RRF_K + v)).getOrElse(0.0) +
        sem.map(v => 1.0 / (AnalyticsQueries.RRF_K + v)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6)
    }
  }

  test("q116: a doc retrieved by both arms outranks one retrieved by a single arm at worse rank") {
    val got = AnalyticsQueries.q116_hybrid_rrf(spark, TestSession.sf).collect()
    val both = got.filter(r => r.getAs[Any]("lex_rank") != null && r.getAs[Any]("sem_rank") != null)
    val single = got.filter(r => r.getAs[Any]("lex_rank") == null || r.getAs[Any]("sem_rank") == null)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getAs[Double]("rrf")).max >= single.map(_.getAs[Double]("rrf")).max)
  }

  test("bigramLl: seen transitions score by MLE×λ + unigram×μ; unseen hit the floor") {
    // corpus: "a b" ×3 (dominant bigram), "a c" once, "z q" once
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"), (5L, "z q"))
      .toDF("doc_id", "text")
    val got = TextQueries.bigramLl(docs, bigramCap = 2, unigramCap = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 5)
    // "a b": p_bi = 3/4, p_uni(b) = 3/10 -> p = .7*.75 + .3*.3
    val pAB = 0.7 * 0.75 + 0.3 * 0.3
    assert(math.abs(got(1L) - (-math.round(math.log(pAB) * 1e6) / 1e6)) < 2e-6)
    // "z q" bigram is outside the cap (cap=2 keeps (a,b) and (a,c)):
    // floor p_bi = 1/5 bigrams total, p_uni(q) = 1/10
    val pZQ = 0.7 * (1.0 / 5) + 0.3 * 0.1
    assert(math.abs(got(5L) - (-math.round(math.log(pZQ) * 1e6) / 1e6)) < 2e-6)
    // the common transition is less surprising than the floor one
    assert(got(1L) < got(5L))
  }

  test("bigramLl: single-token and empty docs drop out (no transitions)") {
    val docs = Seq((1L, "only"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val got = TextQueries.bigramLl(docs, 8, 8).collect().map(_.getLong(0)).toSet
    assert(got == Set(3L))
  }
}
