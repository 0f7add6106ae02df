package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Same-JVM alternating A/B probe for variant decisions (the house method
  * after sequential ScaleBench cells disagreed with themselves by 3–10×
  * across runs on this drifting host). Edit the variants, run, read the
  * medians. Scratch tool — not part of the driver contract.
  *
  * Current experiment (round 7): the canary-route gate
  * ([[graft.operators.Canary.contaminatedIds]]) — broadcast BNLJ
  * `contains` vs the char-gram prefilter, at an eval-sized (20) and a
  * large (2000) canary list over the sf0.1 documents. The gate's claim:
  * BNLJ work is |docs|·|canaries| contains() calls, the gram route's is
  * |docs|·len(text) rolling-hash ops + hash-set probes — independent of
  * the canary count — so the routes should cross between the two sizes.
  * (The previous experiment, SetSim shuffle_hash vs AQE + the build-side
  * skew stats, is in git history; its numbers live in BASELINE.md.)
  */
object ProbeAb {
  def main(args: Array[String]): Unit = {
    val iters = if (args.length > 0) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)

    val docs = Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()
    // a deterministic canary list of `n` 40-char spans drawn from the
    // corpus itself, so real hits exist at every size
    def canaryList(n: Long): DataFrame = docs
      .filter(pmod(col("doc_id"), lit(math.max(1L, nDocs / n))) === 0)
      .select(substring(col("text"), 21, 40).as("phrase"))
      .filter(length(col("phrase")) === 40)

    def route(n: Long, ceiling: Long): DataFrame =
      graft.operators.Canary.contaminatedIds(docs, "doc_id", "text",
        canaryList(n), "phrase", canaryCountCeiling = ceiling)

    val variants = Seq(
      "bnlj_20" -> (() => route(20, Long.MaxValue)),
      "gram_20" -> (() => route(20, 1)),
      "bnlj_2000" -> (() => route(2000, Long.MaxValue)),
      "gram_2000" -> (() => route(2000, 1)))

    // identical verdicts first (the gate must be a plan choice, never a
    // semantics change), then the alternating timing passes
    val hits20 = (route(20, Long.MaxValue).count(), route(20, 1).count())
    val hits2k = (route(2000, Long.MaxValue).count(), route(2000, 1).count())
    println(s"[ab] verdict parity: 20 -> $hits20, 2000 -> $hits2k")
    require(hits20._1 == hits20._2 && hits2k._1 == hits2k._2,
      "routes disagreed — the gate would be changing semantics")

    val times = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    route(20, Long.MaxValue).write.format("noop").mode("overwrite").save() // warm-up
    for (_ <- 1 to iters; (name, fn) <- variants) {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      times(name) :+= (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"[ab] $name%-12s median=${ts(ts.size / 2)}%.2f s " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
