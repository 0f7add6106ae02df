package graft
import org.apache.spark.sql.SparkSession
object CountShuffles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE size-gated SMJ->SHJ conversion - the Bench session's
      // measured default (see Bench.scala)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    for (q <- args) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val n = "Exchange (hash|range)partitioning".r.findAllIn(p).size
      println(s"$q -> $n")
    }
    spark.stop()
  }
}
