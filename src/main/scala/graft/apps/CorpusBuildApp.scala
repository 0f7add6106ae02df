package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Canary, Dedup}
import graft.pipelines.CorpusPipeline

/** Deployable end-to-end TRAINING-DATA BUILD — the whole corpus product
  * as ONE batch main, composing the stages the engine ships piecewise
  * (every stage is its own oracle-checked query):
  *
  *   1. decontamination: containment-graded vs an eval set (q137's form)
  *      and/or exact-substring canaries behind the measured count gate
  *      ([[graft.operators.Canary.contaminatedIds]], q155/q159);
  *   2. cleaning: quality filter → wide exact dedup → MinHash-LSH
  *      near-dup components → optional embedding-cosine components
  *      ([[CorpusPipeline.apply]], the q66 composition);
  *   3. leakage-free split: cluster-keyed train/val/test labels at the
  *      WIDER `--split-jaccard` relatedness radius
  *      ([[graft.operators.Dedup.clusterSafeSplit]], q157);
  *   4. packing: GPT-style zero-padding block packing of the TRAIN
  *      splits (q107's shard-windowed form).
  *
  * Outputs under `--out`: `docs/` (the cleaned corpus partitioned BY
  * SPLIT — val/test stay doc-level), `labels/` (doc_id, cluster, split),
  * `pack/` (the train splits' block manifest), `stats/` (the per-stage
  * funnel), plus the funnel printed for the operator.
  */
object CorpusBuildApp {

  val usage = "graft.apps.CorpusBuildApp --input <documents parquet> " +
    "--out <dir> [--embeddings <parquet>] [--strip-markup true] [--scrub-pii true] " +
    "[--eval <parquet> [--containment 1/2]] " +
    "[--canaries <text file> [--canary-ceiling 128] " +
    "[--canary-broadcast-chars 33554432]] " +
    "[--min-quality 0.35] [--jaccard 0.5] [--cos-threshold 0.35] " +
    "[--split-jaccard 0.3] [--buckets 10] [--train-splits 0-7] " +
    "[--block-size 256] [--pack-shards 8]"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark: SparkSession = AppEnv.session("graft-corpus-build", conf)
    val out = AppEnv.get(conf, "out", usage)
    val raw = spark.read.parquet(AppEnv.get(conf, "input", usage))

    // stage 0 (--strip-markup true, then --scrub-pii true): strip
    // HTML/markup and redact PII BEFORE any stage fingerprints the
    // text — clean after dedup and the same document with two different
    // emails (or two encodings of the same page) survives as two
    // "distinct" docs. The EVAL and CANARY sides below pass through the
    // SAME transforms in the SAME order: comparing cleaned train text
    // against raw probe text would silently miss any contamination
    // whose span contains markup or PII.
    val stripMarkup = conf.getOrElse("strip-markup", "false").toBoolean
    val scrubPii = conf.getOrElse("scrub-pii", "false").toBoolean
    def cleanCol(c: org.apache.spark.sql.Column) = {
      val m = if (stripMarkup) graft.operators.Markup.stripped(c) else c
      if (scrubPii) graft.operators.Scrub.scrubbed(m) else m
    }
    val docs0 =
      if (stripMarkup || scrubPii)
        raw.withColumn("text", cleanCol(col("text")))
      else raw
    // PII funnel: per-source counts of what the scrub pass found ("how
    // much PII did this source carry" — the compliance question). One
    // extra scan-local aggregation; counts measure the text the scrub
    // pass actually sees (markup-stripped when --strip-markup is on);
    // grouped by the corpus `source` column when present, the whole
    // corpus otherwise.
    if (scrubPii) {
      import graft.operators.Scrub
      val srcCol =
        if (raw.columns.contains("source")) col("source") else lit("all")
      val seen =
        if (stripMarkup) graft.operators.Markup.stripped(col("text")) else col("text")
      val piiBySource = raw
        .select(srcCol.as("source") +: Scrub.countColumns(seen): _*)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          Scrub.COUNT_COLS.map(c => sum(col(c)).as(c)): _*)
        .orderBy(col("source"))
      piiBySource.write.mode("overwrite").parquet(s"$out/pii_by_source")
      spark.read.parquet(s"$out/pii_by_source").orderBy(col("source"))
        .collect().foreach(r => println(s"[build] pii $r"))
    }

    // stage 1a: containment-graded eval decontamination
    val docs1 = conf.get("eval") match {
      case None => docs0
      case Some(evalPath) =>
        val Array(tn, td) = conf.getOrElse("containment", "1/2").split("/")
          .map(_.trim.toInt)
        val evalDocs0 = spark.read.parquet(evalPath)
        val evalDocs =
          if (stripMarkup || scrubPii)
            evalDocs0.withColumn("text", cleanCol(col("text")))
          else evalDocs0
        CorpusPipeline.decontaminateByContainment(
          docs0, evalDocs, "doc_id", "text", tn, td)
    }
    // stage 1b: exact-substring canaries through the measured gates
    // (q159's gram route engages above the count ceiling; q165's
    // shuffle-join route above the broadcast-chars ceiling)
    val docs = conf.get("canaries") match {
      case None => docs1
      case Some(path) =>
        import spark.implicits._
        val can = spark.read.textFile(path).map(_.trim)
          .filter((s: String) => s.nonEmpty)
          .map { p =>
            val m = if (stripMarkup) graft.operators.Markup.stripString(p) else p
            if (scrubPii) graft.operators.Scrub.scrubString(m) else m
          }
          .toDF("phrase")
        val hit = Canary.contaminatedIds(docs1, "doc_id", "text",
          can, "phrase",
          canaryCountCeiling = conf.getOrElse("canary-ceiling", "128").toLong,
          broadcastCharsCeiling =
            conf.getOrElse("canary-broadcast-chars", (32L << 20).toString).toLong)
        docs1.join(hit, Seq("doc_id"), "left_anti")
    }

    // stage 2: the cleaning pipeline + funnel
    val cfg = CorpusPipeline.Config(
      minQuality = conf.getOrElse("min-quality", "0.35").toDouble,
      jaccardThreshold = conf.getOrElse("jaccard", "0.5").toDouble,
      embedCosThreshold = conf.getOrElse("cos-threshold", "0.35").toDouble)
    val embeddings = conf.get("embeddings").map(spark.read.parquet(_))
    val (cleaned0, stats) = CorpusPipeline(docs, cfg, embeddings)
    val cleaned = cleaned0.cache()

    // stage 3: cluster-keyed split at the wider relatedness radius — the
    // band geometry follows the SPLIT threshold (lshBandsFor's S-curve
    // rule), not the dedup stage's: recall at 0.3 needs more bands than
    // candidates at 0.5
    val splitThreshold = conf.getOrElse("split-jaccard", "0.3").toDouble
    val labels = Dedup.clusterSafeSplit(cleaned, "doc_id", "text",
      n = cfg.shingleN, k = cfg.minhashK,
      bands = Dedup.lshBandsFor(cfg.minhashK, splitThreshold),
      threshold = splitThreshold,
      buckets = conf.getOrElse("buckets", "10").toInt)
    labels.write.mode("overwrite").parquet(s"$out/labels")
    val withSplit = cleaned
      .join(spark.read.parquet(s"$out/labels")
        .select(col("doc_id"), col("cluster"), col("split")), "doc_id")
    withSplit.write.mode("overwrite").partitionBy("split")
      .parquet(s"$out/docs")

    // stage 4: block-pack the TRAIN splits only (val/test stay doc-level)
    val Array(lo, hi) = conf.getOrElse("train-splits", "0-7").split("-")
      .map(_.trim.toLong)
    val train = spark.read.parquet(s"$out/docs")
      .filter(col("split").between(lo, hi))
    graft.CurationQueries.blockPack(train,
        shards = conf.getOrElse("pack-shards", "8").toInt,
        blockSize = conf.getOrElse("block-size", "256").toInt)
      .write.mode("overwrite").parquet(s"$out/pack")

    stats.write.mode("overwrite").parquet(s"$out/stats")
    stats.collect().foreach(r => println(s"[build] $r"))
    val perSplit = spark.read.parquet(s"$out/docs")
      .groupBy(col("split")).agg(count(lit(1)).as("docs")).orderBy(col("split"))
    perSplit.collect().foreach(r => println(s"[build] split $r"))
    cleaned.unpersist()
    ()
  }
}
