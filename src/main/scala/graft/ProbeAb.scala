package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.{shingles, tokens}

/** Same-JVM alternating A/B probe for variant decisions (the house method
  * after sequential ScaleBench cells disagreed with themselves by 3–10×
  * across runs on this drifting host). Edit the variants, run, read the
  * medians. Scratch tool — not part of the driver contract.
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

    val li = Tables.load(spark, sfDir, "lineitem")
    // the GROWING graph (ScaleBench prQ geometry): order keys are
    // replica-shifted, so V and E scale with the directory
    def edges = li.select(col("l_orderkey").as("src"),
      (col("l_partkey") + 10000000L).as("dst"))

    // A: supersteps checkpointed (rank table materialized per iteration)
    def a(): DataFrame =
      graft.operators.Graph.pageRank(edges, "src", "dst", 5, 0.85, checkpointRanks = true)

    // B: pure plan over checkpointed bases (one job, AQE + exchange reuse)
    def b(): DataFrame =
      graft.operators.Graph.pageRank(edges, "src", "dst", 5, 0.85, checkpointRanks = false)

    val variants = Seq("a_ckpt_ranks" -> (() => a()), "b_pure_over_bases" -> (() => b()))
    val times = collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    a().write.format("noop").mode("overwrite").save() // warm-up
    for (_ <- 1 to iters; (name, fn) <- variants) {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      times(name) :+= (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"[ab] $name%-18s median=${ts(ts.size / 2)}%.2f s all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
