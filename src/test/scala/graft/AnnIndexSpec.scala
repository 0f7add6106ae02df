package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Similarity

/** Scale pattern for similarity search: persist the corpus PARTITIONED BY
  * its LSH bucket. A query then computes its own bucket and reads only that
  * partition — partition pruning turns an ANN probe into a scan of
  * 1/2^planes of the data (at 100 TB: the difference between touching
  * ~6 TB and touching everything). The in-memory `lshTopPairs` op uses the
  * same bucketing, so recall characteristics are identical.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("LSH-partitioned index: probe reads one partition (pruned scan), top-k matches in-bucket brute force") {
    val dir = java.nio.file.Files.createTempDirectory("ann-index").toString
    val emb = Tables.load(spark, TestSession.sf, "embeddings")
      .withColumn("v", Similarity.asDouble($"embedding"))
      .withColumn("bucket", Similarity.lshBucket($"v", 4, 64))
    emb.select($"vec_id", $"embedding", $"bucket")
      .write.partitionBy("bucket").mode("overwrite").parquet(dir)

    // probe: vec_id 7 — its bucket from the same deterministic planes
    val probe = emb.filter($"vec_id" === 7)
      .select($"v", $"bucket").head()
    val qv = probe.getAs[scala.collection.Seq[Double]](0).toSeq
    val bucket = probe.getLong(1)

    val index = spark.read.parquet(dir)
    val probed = index.filter($"bucket" === bucket && $"vec_id" =!= 7)
    // partition pruning visible in the scan
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains(s"bucket#") || scan.contains("PartitionFilters"))
    assert(scan.contains("PartitionFilters: [isnotnull(bucket"),
      s"expected pruned partition filter in:\n$scan")

    val qvCol = lit(qv.toArray)
    val got = probed
      .select($"vec_id",
        round(Similarity.dot(Similarity.asDouble($"embedding"), qvCol) /
          (Similarity.norm(Similarity.asDouble($"embedding")) * lit(math.sqrt(qv.map(x => x * x).sum))), 6).as("cos"))
      .orderBy($"cos".desc, $"vec_id".asc).limit(3)
      .as[(Long, Double)].collect().map(_._1).toSeq

    // same result as in-memory within-bucket brute force
    val expected = emb.filter($"bucket" === bucket && $"vec_id" =!= 7)
      .select($"vec_id",
        round(Similarity.dot($"v", qvCol) /
          (Similarity.norm($"v") * lit(math.sqrt(qv.map(x => x * x).sum))), 6).as("cos"))
      .orderBy($"cos".desc, $"vec_id".asc).limit(3)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(got == expected && got.nonEmpty)
  }
}
