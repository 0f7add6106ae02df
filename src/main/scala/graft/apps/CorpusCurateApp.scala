package graft.apps

import org.apache.spark.sql.SparkSession

import graft.pipelines.CorpusPipeline

/** Deployable BATCH corpus-curation job — the recap half of the dedup
  * lambda whose streaming half is [[CorpusIngestApp]]: read a documents
  * parquet, run the full cleaning pipeline (quality → wide exact dedup →
  * MinHash-LSH components → optional embedding-cosine components), write
  * the survivors and the per-stage funnel. This is the q66/q77 composition
  * as an operable CLI job rather than a test fixture.
  */
object CorpusCurateApp {

  val usage = "graft.apps.CorpusCurateApp --input <documents parquet> " +
    "--out <dir> [--embeddings <parquet>] [--stats <dir>] " +
    "[--min-quality 0.35] [--jaccard 0.5] [--cos-threshold 0.35] " +
    "[--eval <parquet> [--containment 1/2]]"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark: SparkSession = AppEnv.session("graft-corpus-curate", conf)
    val docs0 = spark.read.parquet(AppEnv.get(conf, "input", usage))
    // --eval: containment-threshold decontamination BEFORE the pipeline —
    // drop training docs covering >= --containment (a rational num/den,
    // default 1/2) of any eval doc's shingle set
    // (CorpusPipeline.decontaminateByContainment; the graded form of the
    // any-overlap pass CorpusIngestApp applies in-stream)
    val docs = conf.get("eval") match {
      case None => docs0
      case Some(evalPath) =>
        val Array(tn, td) = conf.getOrElse("containment", "1/2").split("/")
          .map(_.trim.toInt)
        CorpusPipeline.decontaminateByContainment(
          docs0, spark.read.parquet(evalPath), "doc_id", "text", tn, td)
    }
    val embeddings = conf.get("embeddings").map(spark.read.parquet(_))
    val cfg = CorpusPipeline.Config(
      minQuality = conf.getOrElse("min-quality", "0.35").toDouble,
      jaccardThreshold = conf.getOrElse("jaccard", "0.5").toDouble,
      embedCosThreshold = conf.getOrElse("cos-threshold", "0.35").toDouble)
    val (cleaned, stats) = CorpusPipeline(docs, cfg, embeddings)
    cleaned.write.mode("overwrite").parquet(AppEnv.get(conf, "out", usage))
    conf.get("stats").foreach(stats.write.mode("overwrite").parquet(_))
    // operator-facing funnel: tiny by construction (stages × langs).
    // No spark.stop(): the session is shared/getOrCreate (app-harness
    // convention — the JVM exit closes a CLI run's session).
    stats.collect().foreach(r => println(s"[curate] $r"))
  }
}
