package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.CurationQueries

/** Deployable corpus-diagnostics job: one pass over a documents directory
  * produces the health bundle a data-curation team reads before (and
  * after) a cleaning run —
  *
  *   - `rule_funnel`: Gopher-style per-rule drop counts (how much each
  *     rule would remove, and the conjunction survivor count);
  *   - `mixture`: temperature-weighted (α = 0.5) per-source token mass
  *     and budget allocation;
  *   - `source_overlap`: shared-5-gram counts per source pair (which
  *     feeds mirror each other — the pairs a dedup pass should bucket
  *     together first);
  *   - `zipf`: frequency-spectrum slope/intercept (template spam or
  *     synthetic text bends the corpus off the Zipf regime).
  *
  * Every diagnostic is one of the oracle-checked query shapes
  * (q97/q99/q105/q108) run as a job: outputs land under `--out/<name>`
  * and the small tables also print, so the job is useful from a terminal
  * without a notebook. Each output is at most
  * O(#rules + #sources² + #distinct-frequencies) rows at any corpus
  * size — the corpus never leaves the aggregations.
  */
object CorpusReportApp {

  val usage = "graft.apps.CorpusReportApp --data <dir with documents.parquet> " +
    "--out <dir>"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark: SparkSession = AppEnv.session("graft-corpus-report", conf)
    val data = AppEnv.get(conf, "data", usage)
    val out = AppEnv.get(conf, "out", usage)

    val funnel = CurationQueries.q97_gopher_rules(spark, data)
      .agg(
        count(lit(1)).as("docs"),
        sum(lit(1) - col("r_count")).as("fail_count"),
        sum(lit(1) - col("r_mean_len")).as("fail_mean_len"),
        sum(lit(1) - col("r_stop")).as("fail_stop"),
        sum(lit(1) - col("r_uniq")).as("fail_uniq"),
        sum(col("pass")).as("pass"))
    val reports = Seq(
      "rule_funnel" -> funnel,
      "mixture" -> CurationQueries.q99_temperature_mix(spark, data),
      "source_overlap" -> CurationQueries.q105_source_overlap(spark, data),
      "zipf" -> CurationQueries.q108_zipf(spark, data))
    reports.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name")
      // all four are aggregate-sized by construction; echo for operators
      spark.read.parquet(s"$out/$name").collect()
        .foreach(r => println(s"[report:$name] $r"))
    }
  }
}
