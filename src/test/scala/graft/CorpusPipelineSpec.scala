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

  test("semantic stage: embedding near-dups removed after text near-dedup, stages monotone") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
    val (cleaned, stats) = CorpusPipeline(docs, embeddings = Some(emb))
    val st = stats.groupBy($"stage").agg(sum($"docs").as("n"))
      .as[(String, Long)].collect().toMap
    assert(st("cleaned") <= st("near_deduped"))
    assert(st("near_deduped") <= st("exact_deduped"))
    // survivors carry no residual same-bucket embedding pair >= threshold
    val survivorVecs = cleaned.select($"doc_id")
      .join(emb.withColumnRenamed("vec_id", "doc_id"), "doc_id")
    val residual = graft.operators.Similarity.lshNearDupPairs(
      survivorVecs, "doc_id", "embedding", 4, 64, 0.35)
    assert(residual.count() == 0)
    // and the semantic stage only ever REMOVES text-stage survivors
    val textOnly = CorpusPipeline(docs)._1.select($"doc_id").as[Long].collect().toSet
    val withSem = cleaned.select($"doc_id").as[Long].collect().toSet
    assert(withSem.subsetOf(textOnly))
  }
}
