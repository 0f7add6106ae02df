package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage profiler for q135_overlap_join (SetSim.overlapSelfJoin):
  * times each pipeline stage cumulatively under the bench session config
  * so the residual cost after round-9/10 work can be attributed. Not part
  * of the driver contract.
  */
object ProbeOvj {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mode = sys.props.getOrElse("graft.probe.mode", "overlap")
    val C = DedupQueries.OVJ_C
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ovj] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    def sets0 = graft.core.Tables.Tpch(spark, sfDir).documents.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions.shingleHashes(
        col("text"), DedupQueries.SHINGLE_N)).as("hs"))

    val (fullName, minN) =
      if (mode == "jaccard") ("q125_ppjoin", 1) else ("q135_overlap_join", C)
    // jaccard 3/5: prefix n - ceil(3n/5) + 1; overlap C: prefix n - C + l
    def prefLen: Column =
      if (mode == "jaccard")
        col("n") - floor((col("n") * 3 + 4) / 5).cast("int") + 1
      else col("n") - C + 2

    // warmup
    noop(SparkEntry.queries(fullName)(spark, sfDir))

    for (i <- 1 to iters) {
      println(s"-- iter $i")
      var sets: DataFrame = null
      time("1 prepare+checkpoint") {
        sets = sets0.select(col("doc_id"), col("hs").as("tk"))
          .withColumn("n", size(col("tk"))).filter(col("n") >= minN)
          .localCheckpoint()
      }
      val dfreq = sets.select(explode(col("tk")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      time("2 dfreq agg") { noop(dfreq) }
      val pref = sets.select(col("doc_id"), col("n"), explode(col("tk")).as("tok"))
        .join(dfreq, "tok")
        .groupBy(col("doc_id"), col("n"))
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"))
        .select(col("doc_id"), col("n"),
          posexplode(slice(col("ord"), lit(1), prefLen)))
        .select(col("doc_id"), col("n"), (col("pos") + 1).as("pos"),
          col("col.tok").as("tok"))
      time("3 +orderedPrefix") { noop(pref) }
      val joined0 = pref.alias("a").hint("shuffle_hash")
        .join(pref.alias("b"), col("a.tok") === col("b.tok"))
        .filter(col("a.doc_id") < col("b.doc_id"))
      val joined = (if (mode == "jaccard")
          joined0.filter(greatest(col("a.n"), col("b.n")) * 3 <=
            least(col("a.n"), col("b.n")) * 5)
        else joined0)
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.n").as("n1"), col("b.n").as("n2"),
          col("a.pos").as("p1"), col("b.pos").as("p2"))
      time("4 +prefix self-join") { noop(joined) }
      val candAgg = joined
        .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
        .agg(min(col("p1")).as("p1"), min(col("p2")).as("p2"),
          count(lit(1)).as("k"))
      val cand = (if (mode == "jaccard")
          candAgg.filter((lit(1) + least(col("n1") - col("p1"),
            col("n2") - col("p2"))) * 8 >= (col("n1") + col("n2")) * 3)
        else candAgg.filter(col("k") >= 2 &&
          lit(1) + least(col("n1") - col("p1"), col("n2") - col("p2")) >= C))
        .select(col("d1"), col("d2"))
      time("5 +cand agg") { noop(cand) }
      time(s"6 full $fullName") {
        noop(SparkEntry.queries(fullName)(spark, sfDir))
      }
      println(s"[ovj] rows: joined=${joined.count()} cand=${cand.count()} " +
        s"sets=${sets.count()} pref=${pref.count()}")
    }
    spark.stop()
  }
}
