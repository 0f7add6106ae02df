package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup

/** End-to-end training-corpus cleaning pipeline — the composition a 100 TB
  * pretraining-data job runs, built from the engine's oracle-verified ops:
  *
  *   1. quality filter   (per-row ratios, no shuffle)
  *   2. exact dedup      (one shuffle on 30/doc-bit fingerprint)
  *   3. near-dedup       (MinHash+LSH: shuffle O(bands) longs per doc;
  *                        survivors drop the higher doc_id of each pair)
  *   4. stats            (per-language keep/drop accounting)
  *
  * Order matters at scale: quality + exact dedup run FIRST because they
  * are the cheap mass-removers (and de-fang LSH's hot-bucket skew from
  * boilerplate duplicates); LSH then sees only survivors.
  *
  * Returns (cleaned corpus, per-stage stats).
  */
object CorpusPipeline {

  final case class Config(
      minQuality: Double = 0.35,
      shingleN: Int = 3,
      minhashK: Int = 16,
      lshBands: Int = 4,
      jaccardThreshold: Double = 0.5)

  def apply(docs: DataFrame, cfg: Config = Config()): (DataFrame, DataFrame) = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val quality = (size(array_distinct(toks)) / nTok) *
      (lit(1.0) - size(filter(toks, t => t.isin("a", "the"))) / nTok)

    val scored = docs.withColumn("quality", round(quality, 6))
    val qualityPass = scored.filter(col("quality") >= cfg.minQuality)

    val exactKept = Dedup.exactDedup(qualityPass, "doc_id", "text")
    val afterExact = qualityPass.join(exactKept, "doc_id")

    val nearPairs = Dedup.nearDupPairs(afterExact, "doc_id", "text",
      cfg.shingleN, cfg.minhashK, cfg.lshBands, cfg.jaccardThreshold)
    // resolve pair graph to components; keep one doc per duplicate cluster
    // (per-pair d2-dropping can orphan transitive members)
    val dropNear = Dedup.duplicateClusters(nearPairs)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"))
    val cleaned = afterExact.join(dropNear, Seq("doc_id"), "left_anti")

    val stats = docs.select(col("lang"), lit("input").as("stage"))
      .unionByName(qualityPass.select(col("lang"), lit("quality_pass").as("stage")))
      .unionByName(afterExact.select(col("lang"), lit("exact_deduped").as("stage")))
      .unionByName(cleaned.select(col("lang"), lit("cleaned").as("stage")))
      .groupBy(col("stage"), col("lang"))
      .agg(count(lit(1)).as("docs"))

    (cleaned, stats)
  }
}
