package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Deployable BATCH recap for the leakage-free train/val/test split — the
  * job that closes the incremental split's lambda loop
  * ([[graft.operators.Dedup.incrementalClusterSplit]]'s documented
  * contract): the streaming path adopts clusters with immutable history,
  * so a new doc BRIDGING two existing clusters leaves `bridged = 1` and
  * the merge is deferred; THIS job re-runs
  * [[graft.operators.Dedup.clusterSafeSplit]] over the full admitted
  * corpus and REWRITES the labels table, resolving every bridge to one
  * cluster and one split. Run it on the recap cadence (nightly/weekly),
  * exactly like [[CorpusCurateApp]] recaps the streaming near-dedup.
  *
  * The labels table it writes — (doc_id, cluster, split) — is the table
  * the NEXT incremental run reads (`incrementalClusterSplit(labels = …)`),
  * so the loop is: ingest adopts → recap rewrites → ingest adopts from
  * the rewrite.
  *
  * Scale shape is clusterSafeSplit's: LSH candidate edges (narrow keys,
  * text never shuffles) + the min-label component fixpoint over (id,
  * label) longs + a scan-local split hash; the rewrite is one overwrite
  * of |corpus| narrow rows.
  */
object SplitRecapApp {

  val usage = "graft.apps.SplitRecapApp --input <admitted documents parquet> " +
    "--labels <labels table dir to (re)write> [--buckets 10] " +
    "[--jaccard 0.3] [--shingle-n 3] [--minhash-k 16] " +
    "[--bands <lshBandsFor(minhash-k, jaccard)>] " +
    "[--id-col doc_id] [--text-col text]"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark: SparkSession = AppEnv.session("graft-split-recap", conf)
    val idCol = conf.getOrElse("id-col", "doc_id")
    val textCol = conf.getOrElse("text-col", "text")
    val docs = spark.read.parquet(AppEnv.get(conf, "input", usage))
    // defaults MATCH the incremental path's (CorpusIngestApp
    // --split-jaccard 0.3, band geometry from lshBandsFor): a recap at a
    // narrower radius or weaker recall than the path that feeds it would
    // REINTRODUCE the straddling pairs the rewrite exists to resolve
    val k = conf.getOrElse("minhash-k", "16").toInt
    val threshold = conf.getOrElse("jaccard", "0.3").toDouble
    val split = Dedup.clusterSafeSplit(docs, idCol, textCol,
      n = conf.getOrElse("shingle-n", "3").toInt,
      k = k,
      bands = conf.get("bands").map(_.toInt)
        .getOrElse(Dedup.lshBandsFor(k, threshold)),
      threshold = threshold,
      buckets = conf.getOrElse("buckets", "10").toInt)
    // bridged = 0 on every recap row: the rewrite RESOLVES bridges, and
    // the column keeps the labels table schema-uniform with the
    // incremental appends (CorpusPipeline.streamingNearDedup splitLabels)
    split.withColumn("bridged", lit(0L))
      .write.mode("overwrite")
      .parquet(AppEnv.get(conf, "labels", usage))
    // operator-facing recap summary: docs per split + how many clusters
    // merged relative to a singleton world (tiny by construction)
    val summary = spark.read.parquet(AppEnv.get(conf, "labels", usage))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("docs"),
        countDistinct(col("cluster")).as("clusters"))
      .orderBy(col("split"))
    summary.collect().foreach(r => println(s"[recap] $r"))
  }
}
