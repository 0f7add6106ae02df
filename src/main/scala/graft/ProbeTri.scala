package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-profile for the co-purchase graph family (round-10):
  * times each sub-pipeline of q122 separately so the optimization targets
  * the stage that actually dominates. Not part of the driver contract.
  */
object ProbeTri {
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
    graft.plans.GraftFunctions.register(spark)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[tri] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    def op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    def pairs = {
      val d = op
      d.alias("a").hint("shuffle_hash").join(d.alias("b"), col("a.o") === col("b.o"))
    }
    def canon = pairs.filter(col("a.p") < col("b.p"))
      .select(col("a.p").as("x"), col("b.p").as("y")).distinct()

    noop(SparkEntry.queries("q1_agg")(spark, sfDir)) // warm-up
    for (i <- 1 to 3) {
      time(s"op_distinct#$i") { noop(op) }
      time(s"pairs_raw#$i") { noop(pairs) }
      time(s"edges_canonical#$i") { noop(canon) }
      time(s"edges_ckpt#$i") { canon.localCheckpoint().count() }
      time(s"q122_full#$i") { noop(SparkEntry.queries("q122_triangles")(spark, sfDir)) }
      time(s"q130_full#$i") { noop(SparkEntry.queries("q130_triangle_sample")(spark, sfDir)) }
    }
    println("[tri] rows: op=" + op.count() + " pairs=" + pairs.count() +
      " canon=" + canon.count())

    // Per-task skew measurement (round-10: is the q122 close join skewed
    // enough to want salting? guide §2): capture task durations per stage
    // for one warm q122 run and report the spread of every stage with
    // enough tasks for skew to mean anything.
    val taskTimes = scala.collection.concurrent.TrieMap[
      Int, scala.collection.mutable.ArrayBuffer[Long]]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          taskTimes.getOrElseUpdate(t.stageId,
            scala.collection.mutable.ArrayBuffer[Long]()) +=
            t.taskInfo.duration
      })
    noop(SparkEntry.queries("q122_triangles")(spark, sfDir))
    Thread.sleep(500) // listener bus drain
    for ((st, ds0) <- taskTimes.toSeq.sortBy(_._1) if ds0.size >= 8) {
      val ds = ds0.sorted
      val med = ds(ds.size / 2).max(1L)
      println(f"[tri-skew] stage=$st%-5d tasks=${ds.size}%-4d " +
        f"med=${med}ms max=${ds.last}ms max/med=${ds.last.toDouble / med}%.2f")
    }
    spark.stop()
  }
}
