package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.pipelines.CorpusPipeline

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("corpus pipeline composes: quality -> exact dedup -> near-dedup, stats add up") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val (cleaned, stats) = CorpusPipeline(docs)
    val st = stats.groupBy($"stage").agg(sum($"docs").as("n"))
      .as[(String, Long)].collect().toMap
    assert(st("input") == 500)
    assert(st("quality_pass") <= st("input"))
    assert(st("exact_deduped") <= st("quality_pass"))
    assert(st("cleaned") < st("exact_deduped")) // the 25 planted pairs lose one side
    assert(cleaned.count() == st("cleaned"))
    // near-dup removal keeps the smallest doc_id per duplicate CLUSTER —
    // the 25 planted pairs form cliques, so removals < pairs
    val removed = st("exact_deduped") - st("cleaned")
    assert(removed >= 10 && removed <= 25)
  }

  test("cleaned corpus has no remaining near-dup pairs above threshold") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val (cleaned, _) = CorpusPipeline(docs)
    val residual = graft.operators.Dedup.nearDupPairs(
      cleaned, "doc_id", "text", 3, 16, 4, 0.5)
    assert(residual.count() == 0)
  }
}
