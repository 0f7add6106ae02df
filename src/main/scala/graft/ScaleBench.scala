package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.operators.Similarity

/** Scaling bench (round-2 verdict item 4): the sf0.1 bench is fixed-cost
  * dominated (every query 0.2–2 s), so a regression hiding a super-linear
  * term is invisible there. This main runs the most expensive queries at
  * sf0.1 AND a 10× directory (written by [[ScaleData]]) and reports the
  * per-query scaling ratio — a query growing much faster than 10× at 10×
  * data has a hidden super-linear term. Results recorded in BASELINE.md.
  *
  * The LSH ANN family is additionally run with scale-adjusted planes
  * (4 → 8 at 10×): with FIXED planes the bucket count is constant, so
  * average bucket occupancy — and the pair work per bucket, which is
  * quadratic in occupancy — grows with the corpus. Growing planes with
  * log2(n) keeps occupancy (and therefore per-candidate cost) constant;
  * both variants are measured so the table shows the fixed-plane blowup
  * AND that the documented scale path removes it.
  */
object ScaleBench {

  private val DIMS = 64

  /** Top-10 most expensive oracle-checked queries of the round-3 bench
    * (q66 excluded: a composed pipeline whose cost is driver-synchronous
    * fixpoint rounds, not per-row work — its components are in the set).
    */
  private val scaleSet = Seq(
    "q30_simhash_pairs", "q12_join_chain", "q1_agg", "q9_join_inner",
    "q28_lsh_neardup", "q10_join_left", "q49_minhash_estimate",
    "q11_join_dict", "q57_order_uu_window", "q34_json_extract")

  /** planes-scaled LSH variants: planesFor(sf0.1)=4 (the benched default),
    * planesFor(10×)=8 — +log2(10×) rounded up, keeping bucket occupancy
    * roughly constant.
    */
  private def scaledExtras(planes: Int): Map[String, (SparkSession, String) => DataFrame] = Map(
    s"q33_lsh_ann_p$planes" -> ((s: SparkSession, dir: String) =>
      Similarity.lshTopPairs(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", planes, DIMS, 50)),
    s"q64_embedding_neardup_p$planes" -> ((s: SparkSession, dir: String) =>
      Similarity.lshNearDupPairs(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", planes, DIMS, 0.35)))

  def main(args: Array[String]): Unit = {
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[scalebench] failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    def median(ts0: Seq[Double]): Double = {
      val ts = ts0.filter(_ >= 0).sorted
      if (ts.isEmpty) -1.0
      else if (ts.size % 2 == 1) ts(ts.size / 2)
      else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2
    }
    def r2(x: Double) = math.rint(x * 100) / 100

    run(SparkEntry.queries("q1_agg"), sf01) // warm-up

    val rows =
      scaleSet.map { n => (n, SparkEntry.queries(n), SparkEntry.queries(n)) } ++
      Seq(("q33_lsh_ann_fixedp", scaledExtras(4)("q33_lsh_ann_p4"), scaledExtras(4)("q33_lsh_ann_p4")),
          ("q33_lsh_ann_scaledp", scaledExtras(4)("q33_lsh_ann_p4"), scaledExtras(8)("q33_lsh_ann_p8")),
          ("q64_neardup_fixedp", scaledExtras(4)("q64_embedding_neardup_p4"), scaledExtras(4)("q64_embedding_neardup_p4")),
          ("q64_neardup_scaledp", scaledExtras(4)("q64_embedding_neardup_p4"), scaledExtras(8)("q64_embedding_neardup_p8")))

    // round-robin the iterations (iter 1 of every measurement, then iter 2,
    // …) so slow phases of a shared host hit all measurements evenly
    // instead of wrecking whichever query they landed on — this sandbox
    // demonstrably drifts by 10×+ for minutes at a time
    val samples = Array.fill(rows.size, 2)(Vector.empty[Double])
    for (_ <- 1 to iters; ((name, fnSmall, fnBig), qi) <- rows.zipWithIndex) {
      samples(qi)(0) :+= run(fnSmall, sf01)
      samples(qi)(1) :+= run(fnBig, sf1)
    }
    val out = rows.zipWithIndex.map { case ((name, _, _), qi) =>
      val t01 = median(samples(qi)(0))
      val t1 = median(samples(qi)(1))
      val ratio = if (t01 > 0 && t1 > 0) r2(t1 / t01) else -1.0
      System.err.println(f"[scalebench] $name%-22s sf0.1=${t01}%.2fs 10x=${t1}%.2fs ratio=$ratio%.2f")
      s""""$name":{"t01":${r2(t01)},"t1":${r2(t1)},"ratio":$ratio}"""
    }
    println(s"""{"metric":"scale_ratio","iters":$iters,"factor":10,""" +
      s""""queries":{${out.mkString(",")}},"sf01":"$sf01","sf1":"$sf1"}""")
    spark.stop()
  }
}
