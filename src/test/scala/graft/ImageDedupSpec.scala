package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal}

/** Image perceptual-hash dedup on REAL rasters: dHash invariance under
  * 2×/3× nearest-neighbor re-encodes (the claim q170's oracle proves
  * cross-engine) and under monotone brightness shifts, a planted
  * 1-bit near-duplicate, format gating (undecodable records emit no
  * hash), end-to-end pair discovery over a duplicate family, and the
  * banded Hamming join's exactness against a brute-force replay.
  */
class ImageDedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def pgm(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] =
    s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++
      Array.tabulate(w * h)(k => (px(k / w, k % w) & 0xff).toByte)

  private def ppm(w: Int, h: Int, px: (Int, Int, Int) => Int): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
      Array.tabulate(w * h * 3)(k => (px(k / 3 / w, k / 3 % w, k % 3) & 0xff).toByte)

  private def mediaDF(rows: Seq[(Long, Array[Byte], String)]): DataFrame =
    rows.map { case (id, p, f) => (id, p, (f, 0, 0, p.length.toLong)) }
      .toDF("doc_id", "payload", "meta")
      .select($"doc_id", $"payload",
        struct($"meta._1".as("format"), $"meta._2".as("width"),
          $"meta._3".as("height"), $"meta._4".as("nBytes")).as("meta"))

  private def hashesOf(media: DataFrame): Map[Long, Long] =
    Multimodal.perceptualHashes(spark, media)
      .as[(Long, Long)].collect().toMap

  // deterministic 18x16 test card, values <= 200 so +20 stays monotone
  private val baseA = pgm(18, 16, (r, c) => (r * 13 + c * 7) % 195)

  test("dHash is exactly invariant under integer NN upscales (the resize-dup case)") {
    val base = mediaDF(Seq((1L, baseA, Multimodal.PgmFormat)))
    val twins =
      Multimodal.upscaledTwins(spark, base, factor = 2, idOffset = 10L).toDF()
        .unionByName(
          Multimodal.upscaledTwins(spark, base, factor = 3, idOffset = 20L).toDF())
    val h = hashesOf(base.unionByName(twins))
    assert(h.keySet == Set(1L, 11L, 21L))
    assert(h(11L) == h(1L), "2x NN re-encode must hash identically")
    assert(h(21L) == h(1L), "3x NN re-encode must hash identically")
  }

  test("dHash is invariant under a monotone brightness shift") {
    val bright = pgm(18, 16, (r, c) => (r * 13 + c * 7) % 195 + 20)
    val h = hashesOf(mediaDF(Seq(
      (1L, baseA, Multimodal.PgmFormat),
      (2L, bright, Multimodal.PgmFormat))))
    assert(h(2L) == h(1L), "gradient comparisons ignore +20 on every pixel")
  }

  test("a single changed sample flips exactly its bit (planted 1-bit near-dup)") {
    // sample (i=0, j=0) reads pixel (0,0); base has s(0,0)=0 < s(0,1);
    // raising pixel (0,0) to 255 flips ONLY bit 0
    val near = pgm(18, 16, (r, c) => if (r == 0 && c == 0) 255 else (r * 13 + c * 7) % 195)
    val h = hashesOf(mediaDF(Seq(
      (1L, baseA, Multimodal.PgmFormat),
      (2L, near, Multimodal.PgmFormat))))
    assert(java.lang.Long.bitCount(h(1L) ^ h(2L)) == 1,
      s"expected Hamming 1, got ${java.lang.Long.bitCount(h(1L) ^ h(2L))}")
  }

  test("declared-format gate: undecodable and non-raster records emit no hash") {
    val color = ppm(9, 8, (r, c, ch) => r * 20 + c * 9 + ch)
    val h = hashesOf(mediaDF(Seq(
      (1L, baseA, Multimodal.PgmFormat),
      (2L, color, Multimodal.PpmFormat),
      (3L, baseA, Multimodal.PpmFormat),       // wrong magic for declared fmt
      (4L, baseA.take(40), Multimodal.PgmFormat), // truncated raster
      (5L, "just text".getBytes("US-ASCII"), "fake/rgb8"))))
    assert(h.keySet == Set(1L, 2L), s"only true decodes hash: ${h.keySet}")
  }

  test("imageNearDupPairs finds exactly the duplicate family, never the unrelated image") {
    val bright = pgm(18, 16, (r, c) => (r * 13 + c * 7) % 195 + 20)
    val near = pgm(18, 16, (r, c) => if (r == 0 && c == 0) 255 else (r * 13 + c * 7) % 195)
    val other = pgm(18, 16, (r, c) => ((r * 31 + c * 17) * 7 + 11) % 251)
    val base = mediaDF(Seq((1L, baseA, Multimodal.PgmFormat)))
    val media = mediaDF(Seq(
      (1L, baseA, Multimodal.PgmFormat),
      (12L, bright, Multimodal.PgmFormat),
      (13L, near, Multimodal.PgmFormat),
      (2L, other, Multimodal.PgmFormat)))
      .unionByName(Multimodal.upscaledTwins(spark, base, 2, 10L).toDF())
    val pairs = Multimodal.imageNearDupPairs(spark, media, maxHamming = 7)
      .as[(Long, Long, Int)].collect().toSet
    val fam = Set(1L, 11L, 12L, 13L)
    val expected = for {
      a <- fam; b <- fam if a < b
    } yield (a, b, if (a == 13L || b == 13L) 1 else 0)
    assert(pairs == expected, s"got $pairs")
  }

  test("duplicate family resolves to one cluster with the min-id canonical keeper (q171's rule)") {
    val bright = pgm(18, 16, (r, c) => (r * 13 + c * 7) % 195 + 20)
    val other = pgm(18, 16, (r, c) => ((r * 31 + c * 17) * 7 + 11) % 251)
    val base = mediaDF(Seq((5L, baseA, Multimodal.PgmFormat)))
    val media = mediaDF(Seq(
      (5L, baseA, Multimodal.PgmFormat),
      (12L, bright, Multimodal.PgmFormat),
      (2L, other, Multimodal.PgmFormat)))
      .unionByName(Multimodal.upscaledTwins(spark, base, 2, 10L).toDF())
    val pairs = Multimodal.imageNearDupPairs(spark, media, maxHamming = 3)
      .select($"d1", $"d2")
    val got = Dedup.duplicateClustersStar(pairs)
      .withColumn("keep", ($"doc_id" === $"cluster").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    // family {5, 12, 15} clusters under min id 5, which is the keeper;
    // unrelated 2 never enters the component machinery
    assert(got == Set((5L, 5L, 1L), (12L, 5L, 0L), (15L, 5L, 0L)), s"got $got")
  }

  test("banded Hamming join equals the brute-force pair set (no dupes, no misses)") {
    // 40 pseudo-random small images via an LCG; some land within 7 bits
    var seed = 12345L
    def next(): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; ((seed >>> 33) & 0xff).toInt }
    val imgs = (0 until 40).map { id =>
      (id.toLong, pgm(12, 10, (_, _) => next()), Multimodal.PgmFormat)
    }
    val media = mediaDF(imgs)
    val h = hashesOf(media)
    val brute = (for {
      a <- h.keys; b <- h.keys if a < b
      d = java.lang.Long.bitCount(h(a) ^ h(b)) if d <= 7
    } yield (a, b, d)).toSet
    val banded = Dedup.hammingPairs(
        Multimodal.perceptualHashes(spark, media), "doc_id", "dhash", 64, 7)
      .as[(Long, Long, Int)].collect()
    assert(banded.length == banded.toSet.size, "first-matching-block dedup must emit each pair once")
    assert(banded.toSet == brute, s"banded=${banded.toSet} brute=$brute")
  }
}
