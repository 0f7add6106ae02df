package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM alternating A/B probe for variant decisions (the house method
  * after sequential ScaleBench cells disagreed with themselves by 3–10×
  * across runs on this drifting host). Edit the variants, run, read the
  * medians. Scratch tool — not part of the driver contract.
  *
  * Generic toggle form (round 9, optimization): SPARK_GRAFT_AB_PROP
  * names a boolean system property, SPARK_GRAFT_AB_QUERIES the
  * comma-separated queries; the probe alternates A (prop=false) and
  * B (prop=true) per query inside one JVM so host drift hits both
  * variants equally; medians decide.
  */
object ProbeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val toggle = sys.env.getOrElse("SPARK_GRAFT_AB_PROP", "graft.basket.materialize")
    val queries = sys.env.getOrElse("SPARK_GRAFT_AB_QUERIES", "q121_basket_rules")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    run("q1_agg") // session/codegen warm-up
    // one untimed pass of each query under BOTH variants so codegen
    // compilation (distinct per variant plan) is paid before timing
    for (v <- Seq("false", "true"); q <- queries) {
      System.setProperty(toggle, v); run(q)
    }

    val t = collection.mutable.Map[(String, String), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to passes; q <- queries; v <- Seq("false", "true")) {
      System.setProperty(toggle, v)
      t((q, v)) :+= run(q)
    }
    for (q <- queries) {
      def med(v: String) = { val s = t((q, v)).sorted; s(s.size / 2) }
      println(f"[ab] $q%-26s A($toggle=false)=${med("false")}%.2f s  B(true)=${med("true")}%.2f s")
    }
    spark.stop()
  }
}
