package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Hot-band skew in LSH pair generation: a boilerplate-heavy corpus piles
  * 10%+ of docs into single band buckets; the plain self-join then does
  * that bucket's O(m²) pair work in ONE task. The salted two-stage path
  * must produce the IDENTICAL pair set with per-task work bounded by the
  * bucket threshold.
  */
class LshSkewSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val K = 16
  private val BANDS = 4
  private val HOT = 8 // test-scale threshold: buckets of >=8 docs get salted

  // 80 near-identical boilerplate docs: a long shared base with ONE
  // trailing token varying, so only the last few 3-shingles differ and
  // most docs share whole band keys (hot buckets); plus 340 distinct docs
  private lazy val docs = {
    val base = "terms of service agreement please read these conditions " +
      "carefully before using the platform your continued access " +
      "constitutes acceptance of all provisions herein including any " +
      "future amendments the operator may publish from time to time " +
      "liability is limited to the maximum extent permitted by law"
    val boiler = (0 until 80).map(i => (i.toLong, s"$base clause $i"))
    val rest = (80 until 420).map { i =>
      (i.toLong, s"document number $i body ${i * 7 % 13} ${i * 31 % 97} ${i * 17 % 53} unique tail ${i * i}")
    }
    (boiler ++ rest).toDF("doc_id", "text")
  }

  private lazy val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, K)

  // the same (band, bk) keying the operator uses, rebuilt via the public
  // expression surface, for occupancy measurements
  private lazy val keyed = {
    val r = K / BANDS
    val bandStructs = array((0 until BANDS).map { b =>
      struct(lit(b).as("band"), TextFunctions.bandKey(col("sig"), b, r).as("bk"))
    }: _*)
    sigs.select(col("doc_id"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
  }

  test("fixture is genuinely skewed: one band bucket holds 10%+ of the corpus") {
    val maxBucket = keyed.groupBy($"band", $"bk").count()
      .agg(max($"count")).as[Long].head()
    assert(maxBucket >= 42, s"fixture lost its hot bucket: max occupancy $maxBucket")
  }

  test("salted pair generation: identical output to the plain self-join") {
    val plain = Dedup.lshCandidatePairs(sigs, "doc_id", K, BANDS)
      .as[(Long, Long)].collect().toSet
    val salted = Dedup.lshCandidatePairsSalted(sigs, "doc_id", K, BANDS, HOT)
      .as[(Long, Long)].collect().toSet
    assert(plain.nonEmpty)
    assert(salted == plain,
      s"salted path diverged: missing=${(plain -- salted).take(5)} extra=${(salted -- plain).take(5)}")
  }

  test("nearDupPairs with a hot-bucket threshold matches the plain pipeline") {
    val plain = Dedup.nearDupPairs(docs, "doc_id", "text", 3, K, BANDS, 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val salted = Dedup.nearDupPairs(docs, "doc_id", "text", 3, K, BANDS, 0.5,
      hotBucketThreshold = Some(HOT))
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(plain.nonEmpty && salted == plain)
  }

  test("per-task pair work is bounded: no cell exceeds threshold^2 while the plain path concentrates the bucket") {
    val counts = keyed.groupBy($"band", $"bk").count().cache()
    // plain path: the hot bucket's full m(m-1)/2 pairs land in one task
    val plainWorst = counts
      .select((($"count" * ($"count" - 1)) / 2).cast("long").as("w"))
      .agg(max($"w")).as[Long].head()

    // salted path: per-(bucket, cell) work from the salt-group sizes, using
    // the operator's own salt rule (S = ceil(cnt/HOT), salt = hash(id) % S)
    val saltGroups = keyed.join(counts.filter($"count" >= HOT), Seq("band", "bk"))
      .withColumn("ns", ceil($"count" / lit(HOT.toDouble)).cast("int"))
      .withColumn("salt", pmod(xxhash64($"doc_id"), $"ns").cast("int"))
      .groupBy($"band", $"bk", $"ns", $"salt").count()
      .as[(Int, Long, Int, Int, Long)].collect()
      .groupBy(t => (t._1, t._2))
    val saltedWorst = saltGroups.values.flatMap { groups =>
      val bySalt = groups.map(t => t._4 -> t._5).toMap
      val ns = groups.head._3
      for { i <- 0 until ns; j <- i until ns } yield {
        val ci = bySalt.getOrElse(i, 0L); val cj = bySalt.getOrElse(j, 0L)
        if (i == j) ci * (ci - 1) / 2 else ci * cj
      }
    }.max
    counts.unpersist()

    info(s"plain worst-task pair work: $plainWorst; salted worst cell: $saltedWorst")
    assert(plainWorst >= 42L * 41 / 2, "hot bucket missing from the plain path")
    // each cell crosses <= ~HOT docs per side (skew in the salt hash gets
    // slack of 4x); the essential claim: bounded by the THRESHOLD, not m
    assert(saltedWorst <= 4L * HOT * HOT,
      s"salted cell exceeds threshold-bounded work: $saltedWorst")
    assert(saltedWorst * 8 <= plainWorst,
      "salting did not materially spread the hot bucket")
  }

  test("cold-bucket corpora pay only the count pass: outputs equal on an unskewed corpus") {
    val uniform = (0 until 200).map { i =>
      (i.toLong, s"totally unique document $i with words ${i * 3} ${i * 5} ${i * 7} ${i * 11} ${i * 13}")
    }.toDF("doc_id", "text")
    val s = Dedup.minhashSignatures(uniform, "doc_id", "text", 3, K)
    val plain = Dedup.lshCandidatePairs(s, "doc_id", K, BANDS)
      .as[(Long, Long)].collect().toSet
    val salted = Dedup.lshCandidatePairsSalted(s, "doc_id", K, BANDS, HOT)
      .as[(Long, Long)].collect().toSet
    assert(salted == plain)
  }
}
