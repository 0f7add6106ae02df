package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Same-JVM alternating A/B probe for variant decisions (the house method
  * after sequential ScaleBench cells disagreed with themselves by 3–10×
  * across runs on this drifting host). Edit the variants, run, read the
  * medians. Scratch tool — not part of the driver contract.
  *
  * Current experiment: SetSim's candidate-join strategy (shuffle_hash
  * hints vs AQE) on q125's prefix join, plus the build-side skew stats
  * that justify the SetSim/Graph asymmetry — max prefix-bucket size and
  * max per-partition build rows vs the edge table that killed SHJ on the
  * 100× q114 graph.
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

    // A: current default — shuffle_hash-hinted candidate join
    def a(): DataFrame = {
      sys.props("graft.setsim.shuffleHash") = "true"
      SparkEntry.queries("q125_ppjoin")(spark, sfDir)
    }
    // B: strategy left to AQE (the Graph superstep decision)
    def b(): DataFrame = {
      sys.props("graft.setsim.shuffleHash") = "false"
      SparkEntry.queries("q125_ppjoin")(spark, sfDir)
    }

    val variants = Seq("a_shuffle_hash" -> (() => a()), "b_aqe" -> (() => b()))
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
    sys.props("graft.setsim.shuffleHash") = "true"

    // ——— build-side skew stats: q125's prefix table vs q114's edge table ———
    // q125 prefix table rebuilt here with the same arithmetic as
    // SetSim.prefixes (t = 3/5, 3-shingle hash sets)
    val docs = Tables.load(spark, sfDir, "documents")
    val sets = docs.select(col("doc_id"),
        array_distinct(graft.functions.TextFunctions.shingleHashes(
          col("text"), DedupQueries.SHINGLE_N)).as("tk"))
      .withColumn("n", size(col("tk"))).filter(col("n") >= 1)
    val dfreq = sets.select(explode(col("tk")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val prefLen = col("n") - floor((col("n") * 3 + 4) / 5).cast("int") + 1
    val pref = sets.select(col("doc_id"), col("n"), explode(col("tk")).as("tok"))
      .join(dfreq, "tok")
      .groupBy(col("doc_id"), col("n"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"))
      .select(col("doc_id"), posexplode(slice(col("ord"), lit(1), prefLen)))
      .select(col("doc_id"), col("col.tok").as("tok"))
    def skew(dfIn: DataFrame, key: String, label: String): Unit = {
      val buckets = dfIn.groupBy(col(key)).agg(count(lit(1)).as("c"))
      val parts = dfIn.groupBy(pmod(hash(col(key)), lit(32)).as("p"))
        .agg(count(lit(1)).as("c"))
      val Array(total, maxB) = buckets.agg(sum(col("c")), max(col("c")))
        .head().toSeq.map(_.toString.toLong).toArray
      val maxP = parts.agg(max(col("c"))).head().getLong(0)
      println(s"[skew] $label rows=$total maxBucket=$maxB maxPartition(32)=$maxP")
    }
    skew(pref, "tok", "q125_prefix_build")
    // the growing-graph ed table (ScaleBench q114 geometry — the one that
    // broke SHJ at 100×), keyed as the superstep join keys it
    val li = Tables.load(spark, sfDir, "lineitem")
    val e = li.select(col("l_orderkey").as("src"),
      (col("l_partkey") + 10000000L).as("dst")).distinct()
    skew(e, "src", "q114_edge_build")
    spark.stop()
  }
}
