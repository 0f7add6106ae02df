package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Same-JVM alternating A/B probe for variant decisions (the house method
  * after sequential ScaleBench cells disagreed with themselves by 3–10×
  * across runs on this drifting host). Edit the variants, run, read the
  * medians. Scratch tool — not part of the driver contract.
  *
  * Current experiment (round 8): calibrate the ANN index drift gate
  * ([[graft.operators.AnnIndex.driftScore]], occupancy PSI) — what does
  * append NOISE score vs a REAL distribution shift, at sf0.1 geometry?
  * Appends measured: a 10% corpus resample (no drift), a 1%-sized
  * single-point batch (mild skew), a corpus-sized single-point batch
  * (the coarse quantizer no longer tessellates the data). Numbers go to
  * BASELINE.md; the 0.2 default threshold must separate the classes.
  * (The previous experiment, the q165 shuffle-gram route's build-side
  * pathology, is in git history; its numbers live in BASELINE.md.)
  */
object ProbeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    import graft.operators.{AnnIndex, Ivf, Pq}

    val emb = Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    val k = Ivf.kFor(n, 64)
    val dir = java.nio.file.Files.createTempDirectory("probe-drift").toString
    val coarse = Ivf.train(emb, "vec_id", "embedding", k, 64, iters = 2)
    val pq = Pq.train(emb, "vec_id", "embedding", 8, 8, 16, iters = 2)
    AnnIndex.write(emb, "vec_id", "embedding", coarse, 64, pq, 8, dir)
    println(f"[drift] n=$n k=$k built: psi=${AnnIndex.driftScore(spark, dir)}%.6f")

    val resample = emb.sample(withReplacement = false, 0.1, seed = 7)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    AnnIndex.append(resample, "vec_id", "embedding", dir)
    println(f"[drift] +10%% resample (no drift): psi=${AnnIndex.driftScore(spark, dir)}%.6f")

    val one = emb.filter(col("vec_id") === 3).select(col("embedding")).head()
      .getAs[scala.collection.Seq[Float]](0)
    val mild = spark.range(600000L, 600000L + n / 100)
      .select(col("id").as("vec_id"), typedLit(one.toArray).as("embedding"))
    AnnIndex.append(mild, "vec_id", "embedding", dir)
    println(f"[drift] +1%% single-point (mild skew): psi=${AnnIndex.driftScore(spark, dir)}%.6f")

    val drifted = spark.range(700000L, 700000L + n)
      .select(col("id").as("vec_id"), typedLit(one.toArray).as("embedding"))
    AnnIndex.append(drifted, "vec_id", "embedding", dir)
    println(f"[drift] +100%% single-point (real shift): psi=${AnnIndex.driftScore(spark, dir)}%.6f")
    // reap the scratch index (2× corpus-sized coded rows) — the round-7
    // tmp-reaping discipline
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    spark.stop()
  }
}
