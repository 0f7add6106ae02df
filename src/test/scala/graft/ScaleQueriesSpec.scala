package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.TextFunctions

/** Semantics of the scale-technique queries beyond the hash check: chunk
  * geometry (stride/overlap/coverage) and the domain cap's keep-the-best
  * contract.
  */
class ScaleQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("q78 chunks: stride geometry, full coverage, bounded size") {
    val nTok = Tables.Tpch(spark, TestSession.sf).documents
      .select($"doc_id", size(TextFunctions.tokens($"text")).as("n"))
      .as[(Long, Int)].collect().toMap
    val chunks = ScaleQueries.q78_chunk_overlap(spark, TestSession.sf)
      .select($"doc_id", $"chunk_id", $"chunk_start", $"n_chunk_tokens")
      .as[(Long, Long, Long, Int)].collect()
    assert(chunks.nonEmpty)
    chunks.foreach { case (doc, id, start, len) =>
      val n = nTok(doc)
      assert(start == id * 48, s"doc $doc: start $start != chunk_id*stride")
      assert(start < n, s"doc $doc: chunk starts past the last token")
      assert(len == math.min(64, n - start).toInt,
        s"doc $doc chunk $id: len $len != min(W, n-start)")
    }
    // per-doc chunk count = exactly the stride lattice over [0, n)
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val expected = (nTok(doc) - 1) / 48 + 1
      assert(cs.length == expected,
        s"doc $doc: ${cs.length} chunks, expected $expected")
      // consecutive full chunks overlap by W - S = 16 tokens
      assert(cs.map(_._2).sorted.toSeq == (0L until expected.toLong))
    }
  }

  test("q79 domain cap: at most 10 per source, and they are the best-quality rows") {
    val kept = ScaleQueries.q79_domain_cap(spark, TestSession.sf)
      .select($"source", $"doc_id", $"quality")
      .as[(String, Long, Double)].collect()
    val perSource = kept.groupBy(_._1)
    assert(perSource.values.forall(_.length <= 10))
    // every kept row beats (or ties, with smaller doc_id) every dropped row
    val toks = TextFunctions.tokens($"text")
    val n = size(toks).cast("double")
    val all = Tables.Tpch(spark, TestSession.sf).documents
      .select($"source", $"doc_id",
        round((size(array_distinct(toks)) / n) *
          (lit(1.0) - size(filter(toks, t => t.isin("a", "the"))) / n), 6)
          .as("q"))
      .as[(String, Long, Double)].collect()
    all.groupBy(_._1).foreach { case (src, rows) =>
      val expectedKeep = rows.sortBy(r => (-r._3, r._2)).take(10)
        .map(_._2).toSet
      val gotKeep = perSource.getOrElse(src, Array.empty).map(_._2).toSet
      assert(gotKeep == expectedKeep, s"source $src cap mismatch")
    }
  }
}
