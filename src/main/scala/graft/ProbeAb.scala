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
      // AQE size-gated SMJ->SHJ conversion - the Bench session's
      // measured default (see Bench.scala)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // A toggle starting with "spark." is treated as a RUNTIME SQL conf
    // (set via spark.conf.set with SPARK_GRAFT_AB_VALUES "a|b"); anything
    // else is a graft.* boolean system property toggled false/true.
    val toggle = sys.env.getOrElse("SPARK_GRAFT_AB_PROP", "graft.basket.materialize")
    val values = sys.env.getOrElse("SPARK_GRAFT_AB_VALUES", "false|true")
      .split('|') match { case Array(a, b) => (a, b) }
    val queries = sys.env.getOrElse("SPARK_GRAFT_AB_QUERIES", "q121_basket_rules")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def set(v: String): Unit =
      if (toggle.startsWith("spark.")) spark.conf.set(toggle, v)
      else System.setProperty(toggle, v)

    run("q1_agg") // session/codegen warm-up
    // one untimed pass of each query under BOTH variants so codegen
    // compilation (distinct per variant plan) is paid before timing
    for (v <- Seq(values._1, values._2); q <- queries) { set(v); run(q) }

    // POSITION-BALANCED alternation (round-9 harness fix): with a fixed
    // (A, B) order per query, B always re-runs the query the JVM just
    // executed — warm JIT profiles and caches gave "B" a measured 20-30%
    // edge even when A and B were THE SAME VALUE (the no-op control:
    // q125 2.01 vs 1.42 s for two spellings of "0"). Swapping the order
    // every pass gives each variant an equal share of the warm slot.
    val t = collection.mutable.Map[(String, String), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (p <- 1 to passes; q <- queries;
         v <- if (p % 2 == 1) Seq(values._1, values._2)
              else Seq(values._2, values._1)) {
      set(v)
      t((q, v)) :+= run(q)
    }
    for (q <- queries) {
      def med(v: String) = { val s = t((q, v)).sorted; s(s.size / 2) }
      println(f"[ab] $q%-26s A($toggle=${values._1})=${med(values._1)}%.2f s  " +
        f"B(${values._2})=${med(values._2)}%.2f s")
    }
    spark.stop()
  }
}
