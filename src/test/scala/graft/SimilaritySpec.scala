package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  lazy val emb = Tables.load(spark, TestSession.sf, "embeddings")

  test("knn returns exactly k neighbors per query, self excluded, ranks 1..k") {
    val got = Similarity.knn(emb, emb.filter($"vec_id" < 5), "vec_id", "embedding", 3)
    val perQuery = got.groupBy($"query_id").agg(count(lit(1)).as("n"),
      max($"rank").as("maxr")).collect()
    assert(perQuery.length == 5)
    assert(perQuery.forall(r => r.getLong(1) == 3 && r.getInt(2) == 3))
    assert(got.filter($"query_id" === $"neighbor_id").count() == 0)
  }

  test("cosine of a vector with itself is 1") {
    val one = emb.limit(1)
      .select(Similarity.cosine(
        Similarity.asDouble($"embedding"), Similarity.asDouble($"embedding")).as("c"))
      .as[Double].head()
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("lshTopPairs is a subset of brute-force pairs with nonzero recall") {
    val brute = Similarity.topPairs(emb, "vec_id", "embedding", 50)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopPairs(emb, "vec_id", "embedding", 4, 64, 50)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val allPairsScored = Similarity.topPairs(emb, "vec_id", "embedding", Int.MaxValue)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(ann.subsetOf(allPairsScored))
    val recall = (ann intersect brute).size.toDouble / brute.size
    info(f"ANN recall@50 vs brute force: $recall%.2f")
    assert(recall > 0.05) // random unit vectors: 4-plane LSH keeps ~1/8 of pairs
  }

  test("prototypes: keeps the k most-central members per cluster, drops outliers") {
    // planted 2-dim model: centroids on the axes; per cluster one exact
    // prototype, one mid vector, and one that loses the top-2 cut
    val cents = Array(1.0, 0.0, 0.0, 1.0)
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)),  // c0, cos 1.0            -> rank 1
      (2L, Seq(0.8, 0.2)),  // c0, cos 0.970143       -> cut
      (3L, Seq(0.5, 0.1)),  // c0, cos 0.980581       -> rank 2
      (4L, Seq(0.0, 1.0)),  // c1, cos 1.0            -> rank 1
      (5L, Seq(0.2, 0.9)),  // c1, cos 0.976187       -> rank 2
      (6L, Seq(-0.9, 0.5))) // c1 (nearest by L2), cos 0.485643 — the outlier
      .toDF("vec_id", "embedding")
    val got = Similarity.prototypes(vecs, "vec_id", "embedding", cents, 2, 2)
      .select($"vec_id", $"centroid", $"cos_c", $"rank")
      .as[(Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(1L, 3L, 4L, 5L),
      s"top-2 per cluster must survive, got ${got.keySet}")
    assert(got(1L) == ((0L, 1.0, 1L)) && got(4L) == ((1L, 1.0, 1L)))
    assert(got(3L)._1 == 0L && got(3L)._3 == 2L && math.abs(got(3L)._2 - 0.980581) < 1e-6)
    assert(got(5L)._1 == 1L && got(5L)._3 == 2L && math.abs(got(5L)._2 - 0.976187) < 1e-6)
  }

  test("lshNearDupPairs: threshold edges feed duplicateClusters (dedup composition)") {
    val emb = graft.core.Tables.load(spark, TestSession.sf, "embeddings")
    val pairs = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 4, 64, 0.35)
    val rows = pairs.select($"d1", $"d2", $"cos").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 0.35))
    assert(rows.forall(r => r._1 < r._2)) // canonical orientation, no dupes
    // keep-one-per-component: clusters over the edge set
    val labels = graft.operators.Dedup.duplicateClusters(pairs.select($"d1", $"d2"))
      .as[(Long, Long)].collect().toMap
    val vertices = rows.flatMap(r => Seq(r._1, r._2)).toSet
    assert(labels.keySet == vertices)
    // every edge's endpoints share a cluster label
    assert(rows.forall(r => labels(r._1) == labels(r._2)))
  }

  test("lshNearDupPairsBanded: bands=1 equals the single-band form; more bands only add recall") {
    val emb = graft.core.Tables.load(spark, TestSession.sf, "embeddings")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val single = pairSet(
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 4, 64, 0.35))
    // bands=1: band 0's sub-bucket is exactly lsh_bucket(v, 4)'s bits
    val banded1 = pairSet(
      Similarity.lshNearDupPairsBanded(emb, "vec_id", "embedding", 4, 1, 64, 0.35))
    assert(banded1 == single, "bands=1 must reproduce the single-band pair set")
    // OR-amplification is monotone: band 0 alone already yields `single`
    val banded4 = Similarity.lshNearDupPairsBanded(
      emb, "vec_id", "embedding", 4, 4, 64, 0.35)
    val b4 = pairSet(banded4)
    assert(single.subsetOf(b4), "adding bands must never lose a pair")
    assert(b4.size > single.size, "the fixture must demonstrate recall gain")
    // reported once per pair despite multi-band collisions
    val all = banded4.select($"d1", $"d2").as[(Long, Long)].collect()
    assert(all.length == all.toSet.size, "pairs must be reported once")
    // every reported pair is above threshold
    assert(banded4.filter($"cos" < 0.35).isEmpty)
    // bands past one long's 62 sign bits chunk across lsh_bucket_from
    // calls: with planes=8 the first 7 bands fill chunk 0, so a 13-band
    // run must contain the 7-band run — the chunk seam loses nothing
    val b7 = pairSet(Similarity.lshNearDupPairsBanded(
      emb, "vec_id", "embedding", 8, 7, 64, 0.35))
    val b13 = pairSet(Similarity.lshNearDupPairsBanded(
      emb, "vec_id", "embedding", 8, 13, 64, 0.35))
    assert(b7.subsetOf(b13), "bands crossing the chunk boundary must only add pairs")
  }

  test("lshNearDupPairsBandedSalted == lshNearDupPairsBanded at every ceiling") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"d1", $"d2", $"cos").as[(Long, Long, Double)].collect().toSet
    val plain = rows(Similarity.lshNearDupPairsBanded(
      emb, "vec_id", "embedding", 4, 4, 64, 0.35))
    assert(plain.nonEmpty)
    for (ceiling <- Seq(1, 16, 1 << 20)) {
      val salted = rows(Similarity.lshNearDupPairsBandedSalted(
        emb, "vec_id", "embedding", 4, 4, 64, 0.35, ceiling))
      assert(salted == plain, s"ceiling=$ceiling diverged: " +
        s"${salted.diff(plain)} / ${plain.diff(salted)}")
    }
    // the capped-buckets route (ns clamped below ⌈cnt/threshold⌉) stays exact
    val capped = rows(Similarity.lshNearDupPairsBandedSalted(
      emb, "vec_id", "embedding", 4, 4, 64, 0.35, 1, maxSaltBuckets = 2))
    assert(capped == plain)
  }

  test("lshTopPairsSalted == lshTopPairs at every ceiling (exactly-once cells under a limit)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"d1", $"d2", $"cos").as[(Long, Long, Double)].collect().toSeq
    val plain = rows(Similarity.lshTopPairs(emb, "vec_id", "embedding", 4, 64, 50))
    assert(plain.size == 50)
    // a limit is ORDER-sensitive: duplicates or a lost pair would change
    // the admitted set, so compare the full sequence, not a set
    for (ceiling <- Seq(1, 16, 1 << 20)) {
      val salted = rows(Similarity.lshTopPairsSalted(
        emb, "vec_id", "embedding", 4, 64, 50, ceiling))
      assert(salted == plain, s"ceiling=$ceiling diverged")
    }
    val capped = rows(Similarity.lshTopPairsSalted(
      emb, "vec_id", "embedding", 4, 64, 50, 1, maxSaltBuckets = 2))
    assert(capped == plain)
  }

  test("the LSH auto gates take the plain plan under task-sized ceilings") {
    val cool1 = Similarity.lshTopPairsAuto(
      emb, "vec_id", "embedding", 4, 64, 50, bucketRowsCeiling = 1L << 20)
    assert(!cool1.queryExecution.analyzed.toString.contains("__salt"))
    val cool2 = Similarity.lshNearDupPairsBandedAuto(
      emb, "vec_id", "embedding", 4, 4, 64, 0.35, bucketRowsCeiling = 1L << 20)
    assert(!cool2.queryExecution.analyzed.toString.contains("__salt"))
  }

  test("the LSH auto gates on an EMPTY frame: occupancy max coalesces to 0, cool path, no NPE") {
    val empty = Seq.empty[(Long, Array[Double])].toDF("vec_id", "v")
    assert(Similarity.lshTopPairsAuto(
      empty, "vec_id", "v", 4, 8, 5).count() == 0)
    assert(Similarity.lshNearDupPairsBandedAuto(
      empty, "vec_id", "v", 3, 2, 8, 0.8).count() == 0)
    val cents = Array.tabulate(16)(i => (i % 8 + 1).toDouble)
    assert(Similarity.semanticDedupAuto(
      empty, "vec_id", "v", cents, 8, 0.8).count() == 0)
  }

  test("q153 runs the salted cell plan and reproduces q33's rows exactly") {
    val plain = SparkEntry.queries("q33_lsh_ann")(spark, TestSession.sf)
    val salted = SparkEntry.queries("q153_lsh_ann_salted")(spark, TestSession.sf)
    assert(!plain.queryExecution.analyzed.toString.contains("__salt"))
    assert(salted.queryExecution.analyzed.toString.contains("__salt"),
      "q153 must route through the salted cells at the spec SF")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"d1", $"d2", $"cos").as[(Long, Long, Double)].collect().toSeq
    assert(rows(salted) == rows(plain))
  }

  test("q152 runs the salted cell plan and reproduces q147's rows exactly") {
    val plain = SparkEntry.queries("q147_banded_neardup")(spark, TestSession.sf)
    val salted = SparkEntry.queries("q152_banded_salted")(spark, TestSession.sf)
    assert(!plain.queryExecution.analyzed.toString.contains("__salt"))
    assert(salted.queryExecution.analyzed.toString.contains("__salt"),
      "q152 must route through the salted cells at the spec SF")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"d1", $"d2", $"cos").as[(Long, Long, Double)].collect().toSet
    val (p, sTed) = (rows(plain), rows(salted))
    assert(sTed == p, s"salted pair set diverged: ${sTed.diff(p)} / ${p.diff(sTed)}")
  }

  test("q151 runs the salted cell plan and reproduces q87's rows exactly") {
    // the oracle equality alone can't tell which path ran — pin that the
    // harness ceiling (1) engages the salted cells at the spec SF while
    // q87's plain form stays salt-free, and that their outputs agree
    val plain = SparkEntry.queries("q87_semantic_dedup")(spark, TestSession.sf)
    val salted = SparkEntry.queries("q151_semdedup_salted")(spark, TestSession.sf)
    assert(!plain.queryExecution.analyzed.toString.contains("__salt"))
    assert(salted.queryExecution.analyzed.toString.contains("__salt"),
      "q151 must route through the salted cells at the spec SF")
    val p = plain.select($"vec_id", $"centroid").as[(Long, Long)].collect().toSet
    val sTed = salted.select($"vec_id", $"centroid").as[(Long, Long)].collect().toSet
    assert(sTed == p, s"salted admitted set diverged: ${sTed.diff(p)} / ${p.diff(sTed)}")
  }
}
