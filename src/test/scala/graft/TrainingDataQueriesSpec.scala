package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-3 training-data queries (q73–q77) on a
  * PLANTED corpus — the DuckDB oracle hash-checks them on the synthetic
  * tables, but only a constructed input proves the *semantics* (known LM
  * scores, known budget cut-offs, known duplicated spans, known PII).
  *
  * The planted tables are written as a miniature sf dir so the tests
  * exercise the exact registered query closures, parquet scan included.
  */
class TrainingDataQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Tiny corpus: doc 0 ≡ doc 2 (full dup), doc 1 shares one interior
    * trigram with both; docs 3-5 live in src1 with 300 tokens each for the
    * budget test. All quality-clean (no 'a'/'the', all tokens distinct
    * enough).
    */
  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-planted-sf").toFile.getAbsolutePath
    val block = (i: Int) => (1 to 300).map(j => s"w${i}_$j").mkString(" ")
    val docs = Seq(
      (0L, "alpha beta gamma delta eps", "en", "src0", 26L),
      (1L, "zeta beta gamma delta omega", "en", "src0", 27L),
      (2L, "alpha beta gamma delta eps", "en", "src0", 26L),
      (3L, block(3), "en", "src1", 0L),
      (4L, block(4), "en", "src1", 0L),
      (5L, block(5), "en", "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    // pairwise-orthogonal embeddings (8-dim basis): cosine 0 everywhere, so
    // the semantic stage must drop nothing even when buckets collide
    val emb = (0L to 5L).map { i =>
      (i, Array.tabulate(8)(j => if (j == i) 1f else 0f), 0)
    }.toDF("vec_id", "embedding", "label")
    emb.coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(q: String) = SparkEntry.queries(q)(spark, dir)

  test("q73: NLL is the exact unigram cross-entropy of the planted corpus") {
    // verify one doc end-to-end: doc 0 = [alpha beta gamma delta eps],
    // corpus tf: alpha 2, beta 3, gamma 3, delta 3, eps 2, zeta 1, omega 1
    // + 900 singleton w-tokens; total = 915.
    val rows = run("q73_unigram_ll")
      .select($"doc_id", $"n_tokens", $"nll")
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val got = rows(0L)
    val total = 915.0
    def ll(tf: Int) = BigDecimal(math.log(tf / total))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = -(ll(2) + ll(3) + ll(3) + ll(3) + ll(2)) / 5
    assert(got._1 == 5L)
    assert(math.abs(got._2 - expected.toDouble) < 2e-6,
      s"doc0 nll ${got._2} != expected $expected")
    // rare-token docs are more surprising: every src1 doc (singleton tokens)
    // must out-score every src0 doc (shared tokens)
    val src0Max = Seq(0L, 1L, 2L).map(rows(_)._2).max
    val src1Min = Seq(3L, 4L, 5L).map(rows(_)._2).min
    assert(src1Min > src0Max, "singleton-vocab docs must have higher NLL")
  }

  test("q74: budget cut-off takes the exact doc prefix per source") {
    // src1 → idx 1 → budget (1%4+1)*200 = 400 tokens; docs 3,4,5 have 300
    // tokens each: doc3 (offset 0) and doc4 (offset 300) are taken, doc5
    // (offset 600) is not → taken=2, taken_tokens=600.
    val r = run("q74_token_budget_mix")
      .select($"source", $"total", $"taken", $"taken_tokens", $"budget")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(r("src1") == ((3L, 2L, 600L, 400L)))
    // src0 → idx 0 → budget 200; 5-token docs never exhaust it
    assert(r("src0") == ((3L, 3L, 15L, 200L)))
  }

  test("q75: duplicated spans cover full-dup docs and the single shared trigram") {
    // docs 0/2 are identical (3 trigram positions, one run of 3); doc 1
    // shares only beta_gamma_delta (position 1, run of 1)
    val r = run("q75_dup_spans")
      .select($"doc_id", $"dup_pos", $"max_run")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(0L) == ((3L, 3L)))
    assert(r(2L) == ((3L, 3L)))
    assert(r(1L) == ((1L, 1L)))
    // src1 docs have globally unique tokens — no duplicated span rows at all
    assert(!r.contains(3L) && !r.contains(4L) && !r.contains(5L))
  }

  test("q76: planted PII is found and redacted to the exact expected bytes") {
    val r = run("q76_pii_redact").filter($"doc_id" === 1L)
      .select($"n_email", $"n_phone", $"n_ip", $"fp_redacted")
      .as[(Int, Int, Int, Long)].head()
    assert((r._1, r._2, r._3) == ((1, 1, 1)))
    // fingerprint must equal the hash of the hand-redacted string
    val expected = spark.range(1)
      .select(graft.functions.TextFunctions.polyHash(
        lit("zeta beta gamma delta omega contact <EMAIL> or <PHONE> from <IP>"))
        .as("fp")).as[Long].head()
    assert(r._4 == expected, "redacted text diverged from the expected rewrite")
  }

  test("q76: redaction leaves no raw PII behind on any document") {
    val leftover = run("q76_pii_redact")
      .agg(sum($"n_email" + $"n_phone" + $"n_ip").as("planted"))
      .as[Long].head()
    // every doc plants exactly one of each
    assert(leftover == 3L * run("q76_pii_redact").count())
  }

  test("q77: funnel counts the planted pipeline stage by stage") {
    // quality keeps all 6; exact dedup drops doc 2 (≡ doc 0); MinHash
    // near-dedup has no further ≥0.5-Jaccard pairs (doc0 vs doc1 share 1 of
    // 5 distinct trigrams); embeddings are orthogonal → no semantic drops.
    val r = run("q77_corpus_funnel")
      .select($"stage", $"docs").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(r("input") == 6L)
    assert(r("quality_pass") == 6L)
    assert(r("exact_deduped") == 5L)
    assert(r("near_deduped") == 5L)
    assert(r("cleaned") == 5L)
  }

  test("q73 plan broadcasts the language model (no shuffle on the corpus side)") {
    val plan = run("q73_unigram_ll").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the unigram LM must reach the corpus as a broadcast, not a shuffle join")
  }

  test("q91: DSIR scores match a plain-Scala replay; the target replica ranks top") {
    // replay the planted corpus (same texts as `dir`) through the hashed
    // bag-of-unigrams model in plain Scala — buckets, smoothing, 6dp
    // rounding and all — then compare every raw doc's score exactly
    val block = (i: Int) => (1 to 300).map(j => s"w${i}_$j").mkString(" ")
    val texts: Map[Long, Array[String]] = Map(
      0L -> "alpha beta gamma delta eps", 1L -> "zeta beta gamma delta omega",
      2L -> "alpha beta gamma delta eps", 3L -> block(3), 4L -> block(4),
      5L -> block(5)).map { case (k, v) => k -> v.split(" ") }
    def bucket(tok: String): Int =
      (tok.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L) % 64).toInt
    val (target, raw) = texts.partition(_._1 % 7 == 0)
    val tc = Array.fill(64)(0L); val rc = Array.fill(64)(0L)
    target.values.flatten.foreach(t => tc(bucket(t)) += 1)
    raw.values.flatten.foreach(t => rc(bucket(t)) += 1)
    val (tTot, rTot) = (tc.sum, rc.sum)
    def llr(b: Int): BigDecimal = BigDecimal(
      math.log((tc(b) + 1.0) / (tTot + 64)) - math.log((rc(b) + 1.0) / (rTot + 64)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = raw.map { case (id, toks) =>
      val s = toks.map(t => llr(bucket(t))).sum
      id -> ((toks.length.toLong, (s / toks.length).toDouble, if (s > 0) 1 else 0))
    }
    val got = run("q91_dsir_select")
      .select($"doc_id", $"n_tokens", $"avg_llr", $"kept")
      .as[(Long, Long, Double, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got.keySet == raw.keySet, "exactly the raw (non-target) docs are scored")
    expected.foreach { case (id, (n, avg, kept)) =>
      assert(got(id)._1 == n, s"doc $id n_tokens")
      assert(math.abs(got(id)._2 - avg) < 2e-6, s"doc $id avg_llr ${got(id)._2} != $avg")
      assert(got(id)._3 == kept, s"doc $id kept")
    }
    // doc 2 is byte-identical to the target slice (doc 0): it must be the
    // highest-scoring raw doc, and kept
    val top = got.maxBy(_._2._2)
    assert(top._1 == 2L && top._2._3 == 1, s"target replica must rank top, got $top")
  }
}
