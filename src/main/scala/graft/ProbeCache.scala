package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe for the codegen-cache eviction hypothesis (round-10):
  * Bench interleaves 142 queries round-robin, so by the time query X's
  * iteration 2 runs, ~141 other queries' generated classes have passed
  * through the 100-entry codegen cache — if X's classes were evicted,
  * every iteration re-pays janino compilation and the bench median
  * never reaches the warm runtime the A/B probes measure back-to-back.
  *
  * Run with -Dspark.sql.codegen.cache.maxEntries=<n> (static conf) to
  * compare: time(q re-run immediately) vs time(q re-run after D decoys).
  */
object ProbeCache {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[cache] codegen.cache.maxEntries=" +
      spark.conf.get("spark.sql.codegen.cache.maxEntries"))

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val targets = Seq("q125_ppjoin", "q122_triangles", "q135_overlap_join")
    val decoys = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(targets.contains).filter(n => !Set(
        "q32_top_pairs", "q66_corpus_survivors", "q77_corpus_funnel",
        "q94_canonical_dedup", "q171_image_dup_clusters").contains(n))
      .take(60)

    run("q1_agg") // session warm-up
    for (t <- targets) {
      val cold = run(t)
      val warm = run(t)
      decoys.foreach(run)
      val after = run(t)
      println(f"[cache] $t%-22s cold=$cold%.2f warm(back-to-back)=$warm%.2f warm(after-60-decoys)=$after%.2f")
    }
    spark.stop()
  }
}
