package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Same-JVM alternating A/B probe for variant decisions (the house method
  * after sequential ScaleBench cells disagreed with themselves by 3–10×
  * across runs on this drifting host). Edit the variants, run, read the
  * medians. Scratch tool — not part of the driver contract.
  *
  * Current experiment (round 8): decompose q165's too-big-to-broadcast
  * canary route (`Canary.gramJoinIds`) into stages over
  * SPARK_GRAFT_SF_DIR — the 10× ScaleBench cell measured 16.5 s where
  * the broadcast twin (q159's route) runs 1.3 s on the same data, and
  * the 100× cell is FASTER (9 s), so something structural, not host
  * drift, is in the 10× plan. Stages: the bare gram scan, the gram
  * equi-join + candidate distinct, the per-doc candidate collapse, the
  * full route, and the broadcast form for contrast.
  * (The previous experiment, the canary-count BNLJ↔gram crossover, is in
  * git history; its numbers live in BASELINE.md round-7 notes.)
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
    val g = 40
    val pref = docs.filter(col("doc_id") < 20)
      .select(substring(col("text"), 11, g).as("__phrase"))
      .filter(length(col("__phrase")) === g).distinct()
      .select(graft.functions.TextFunctions.polyHash(
        substring(col("__phrase"), 1, g)).as("__ph"), col("__phrase"))
    val train = docs.filter(col("doc_id") >= 20)

    def grams = train.select(col("doc_id"),
      explode(call_function("char_gram_hashes", col("text"), lit(g))).as("__gh"))
    def cands = grams.join(pref, col("__gh") === col("__ph"))
      .select(col("doc_id"), col("__phrase")).distinct()
    def collapsed = cands.groupBy(col("doc_id"))
      .agg(collect_list(col("__phrase")).as("__cands"))
    def full = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") >= 20).select(col("doc_id"), col("text"))
      .join(collapsed, Seq("doc_id"))
      .filter(exists(col("__cands"), p => col("text").contains(p)))
      .select(col("doc_id")).distinct()
    def bcast = train.select(col("doc_id"), col("text"),
        explode(call_function("char_gram_hashes", col("text"), lit(g))).as("__gh"))
      .join(broadcast(pref), col("__gh") === col("__ph"))
      .filter(col("text").contains(col("__phrase")))
      .select(col("doc_id")).distinct()

    val canariesLong = docs.filter(col("doc_id") < 20)
      .select(substring(col("text"), 11, 40).as("phrase"))
      .filter(length(col("phrase")) === 40)
    val canariesShort = docs.filter(col("doc_id") < 3)
      .select(substring(col("text"), 11, 3).as("phrase"))
      .filter(length(col("phrase")) === 3)
    val canaries = canariesLong.unionByName(canariesShort).distinct()
    def opLong = graft.operators.Canary.contaminatedIds(train, "doc_id",
      "text", canariesLong.distinct(), "phrase", 1, 1)
    def opBoth = graft.operators.Canary.contaminatedIds(train, "doc_id",
      "text", canaries, "phrase", 1, 1)
    def opShortBnlj = train.select(col("doc_id"), col("text"))
      .join(broadcast(canariesShort.distinct().select(col("phrase").as("__phrase"))),
        col("text").contains(col("__phrase")), "left_semi")
      .select(col("doc_id")).distinct()
    def q165 = SparkEntry.queries("q165_canary_joined")(spark, sfDir)

    val variants = Seq(
      "op_long" -> (() => opLong),
      "op_short" -> (() => opShortBnlj),
      "op_both" -> (() => opBoth),
      "q165_full" -> (() => q165),
      "grams_scan" -> (() => grams),
      "gram_join" -> (() => cands),
      "cands_agg" -> (() => collapsed),
      "bcast_route" -> (() => bcast))

    val times = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    grams.write.format("noop").mode("overwrite").save() // warm-up
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
    println("==== op_both final (AQE) plan ====")
    val df = opBoth
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.split("\n").take(80).mkString("\n"))
    spark.stop()
  }
}
