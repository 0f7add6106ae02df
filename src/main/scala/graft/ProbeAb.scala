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

    // A: the current q117 form (struct bigrams via transform(sequence))
    def a(): DataFrame = TextQueries.bigramLl(docs, 32, 16)

    // B: model pass only, struct keys — isolates the (w1,w2) aggregate
    def b(): DataFrame = {
      val tk = tokens(col("text"))
      docs.filter(size(tk) >= 2)
        .select(explode(transform(sequence(lit(0), size(tk) - 2), i =>
          struct(element_at(tk, i + 1).as("w1"), element_at(tk, i + 2).as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bcnt"))
    }

    // C: model pass only, single joined-string keys via zip_with shingles
    def c(): DataFrame = {
      val tk = tokens(col("text"))
      docs.filter(size(tk) >= 2)
        .select(explode(shingles(tk, 2)).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("bcnt"))
    }

    // D: scoring-pass skeleton only — explode + two broadcast probes +
    // doc re-agg with a dummy model (isolates the second pass)
    def d(): DataFrame = {
      val tk = tokens(col("text"))
      docs.filter(size(tk) >= 2)
        .select(col("doc_id"), explode(shingles(tk, 2)).as("bg"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    }

    val variants = Seq("a_full" -> (() => a()), "b_model_struct" -> (() => b()),
      "c_model_string" -> (() => c()), "d_score_skeleton" -> (() => d()))
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
