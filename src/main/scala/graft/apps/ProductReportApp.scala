package graft.apps

import org.apache.spark.sql.SparkSession

import graft.AnalyticsQueries

/** Deployable product-analytics job: one pass over an events directory
  * produces the engagement bundle a product team reads daily —
  *
  *   - `funnel`: ordered view → click → purchase conversion (min-ts
  *     chaining, so out-of-order completions don't count);
  *   - `retention`: cohort × day-offset activity matrix;
  *
  * and, when a documents directory is also supplied, the corpus-facing
  * `psi_drift` distribution monitor (each source scored against the
  * reference snapshot).
  *
  * The streaming twin of this job's domain is the DWS window app family;
  * this is the batch recap that backfills dashboards. Every output is
  * aggregate-sized (steps / cohort-days / sources) — the event log never
  * leaves the aggregations.
  */
object ProductReportApp {

  val usage = "graft.apps.ProductReportApp --data <dir with events.parquet> " +
    "[--docs <dir with documents.parquet>] --out <dir>"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark: SparkSession = AppEnv.session("graft-product-report", conf)
    val data = AppEnv.get(conf, "data", usage)
    val out = AppEnv.get(conf, "out", usage)

    val reports = Seq(
      "funnel" -> AnalyticsQueries.q120_funnel(spark, data),
      "retention" -> AnalyticsQueries.q111_retention(spark, data)) ++
      conf.get("docs").map(d =>
        "psi_drift" -> AnalyticsQueries.q112_psi_drift(spark, d))
    reports.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name")
      spark.read.parquet(s"$out/$name").collect()
        .foreach(r => println(s"[report:$name] $r"))
    }
  }
}
