package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("toMedia produces binary payload + typed metadata struct") {
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val m = Multimodal.toMedia(docs, "doc_id", "text")
    val row = m.select($"payload", $"meta.nBytes", $"meta.width").head()
    assert(new String(row.getAs[Array[Byte]](0), "UTF-8") == "hello world")
    assert(row.getLong(1) == 11L)
    assert(row.getInt(2) >= 16)
  }

  test("extractFeatures checksum equals the expression-side poly hash") {
    val docs = Tables.load(spark, TestSession.sf, "documents").limit(50)
    val viaMap = Multimodal.extractFeatures(spark,
      Multimodal.toMedia(docs, "doc_id", "text"))
      .toDF().select($"doc_id", $"checksum")
    val viaExpr = docs.select($"doc_id",
      graft.functions.TextFunctions.polyHash($"text").as("expected"))
    val joined = viaMap.join(viaExpr, "doc_id")
    assert(joined.filter($"checksum" =!= $"expected").count() == 0)
    assert(joined.count() == 50)
  }

  test("embedding stub: 4 floats in [0,1], deterministic") {
    val docs = Seq((1L, "abc"), (2L, "abc")).toDF("doc_id", "text")
    val fs = Multimodal.extractFeatures(spark,
      Multimodal.toMedia(docs, "doc_id", "text")).collect()
    assert(fs.forall(_.embedding.length == 4))
    assert(fs.forall(_.embedding.forall(v => v >= 0f && v <= 1f)))
    assert(fs(0).embedding.toSeq == fs(1).embedding.toSeq)
  }

  test("resizeMeta: aspect-preserving fit, never upscaling") {
    def media(w: Int, h: Int) = Seq((1L, Array[Byte](1), (w, h)))
      .toDF("doc_id", "payload", "wh")
      .select($"doc_id", $"payload",
        struct(lit("fake").as("format"), $"wh._1".as("width"),
          $"wh._2".as("height"), lit(1L).as("nBytes")).as("meta"))
    def out(w: Int, h: Int) = Multimodal.resizeMeta(media(w, h), 256, 256)
      .select($"out_width", $"out_height").as[(Int, Int)].head()
    assert(out(1024, 512) == ((256, 128)))  // landscape: width binds
    assert(out(512, 1024) == ((128, 256)))  // portrait: height binds
    assert(out(100, 50) == ((100, 50)))     // already fits: no upscale
  }

  test("sampleFrames: strided frame slices with exact byte offsets") {
    val payload = (0 until 40).map(_.toByte).toArray // 5 frames of 8 bytes
    val media = Seq((7L, payload)).toDF("doc_id", "payload")
      .select($"doc_id", $"payload",
        struct(lit("fake").as("format"), lit(1).as("width"), lit(1).as("height"),
          lit(payload.length.toLong).as("nBytes")).as("meta"))
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 2)
      .orderBy($"frame_idx").collect()
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 2L, 4L)) // every 2nd of 5
    val f2 = frames(1).getAs[Array[Byte]](2)
    assert(f2.toSeq == (16 until 24).map(_.toByte).toSeq) // frame 2 = bytes 16..23
  }

  test("decodePpm: a real P6 decodes to true dims + channel means; malformed payloads fall back to the stub") {
    import graft.operators.Multimodal
    // hand-built 2x1 P6 with a comment: pixels (255,0,0) and (0,255,0)
    def ppm(header: String, raster: Seq[Int]): Array[Byte] =
      header.getBytes("US-ASCII") ++ raster.map(_.toByte).toArray
    val good = ppm("P6\n# a comment\n2 1\n255\n",
      Seq(255, 0, 0, 0, 255, 0))
    val media = Seq(
      (1L, good),
      (2L, ppm("P6\n2 1\n255\n", Seq(255, 0))), // truncated raster
      (3L, ppm("P6\n2 1\n65535\n", Seq.fill(12)(0))), // 16-bit maxval unsupported
      (4L, "P3\n2 1\n255\n255 0 0 0 255 0".getBytes("US-ASCII").toSeq.toArray), // ASCII PPM is not P6
      (5L, "plain text payload, the stub seam".getBytes("US-ASCII")),
      // declared fake/rgb8: even a VALID P6 payload must not decode —
      // dispatch is by declared format, never content sniffing (the q35
      // oracle contract over arbitrary text payloads)
      (6L, good))
      .map { case (id, p) =>
        (id, p, (if (id <= 4) Multimodal.PpmFormat else "fake/rgb8",
          99, 77, p.length.toLong)) }
      .toDF("doc_id", "payload", "meta")
      .select($"doc_id", $"payload",
        struct($"meta._1".as("format"), $"meta._2".as("width"),
          $"meta._3".as("height"), $"meta._4".as("nBytes")).as("meta"))
    val got = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.doc_id -> f).toMap
    // the real decode: true 2x1 dims, channel means (0.5, 0.5, 0.0),
    // luminance head = their average
    assert(got(1L).width == 2 && got(1L).height == 1)
    assert(got(1L).embedding.toSeq
      == Seq(0.5f, 0.5f, 0.0f, (0.5f + 0.5f + 0.0f) / 3))
    // every malformed shape — and a valid P6 under a NON-ppm declared
    // format — keeps the stub contract: meta dims + 4 floats
    for (id <- Seq(2L, 3L, 4L, 5L, 6L)) {
      assert(got(id).width == 99 && got(id).height == 77, s"doc $id")
      assert(got(id).embedding.length == 4 &&
        got(id).embedding.forall(v => v >= 0f && v <= 1f), s"doc $id")
    }
  }

  test("decodePgm: binary P5 decodes one grayscale channel; the magic gates P5 vs P6 under the declared format") {
    import graft.operators.Multimodal
    def pnm(header: String, raster: Seq[Int]): Array[Byte] =
      header.getBytes("US-ASCII") ++ raster.map(_.toByte).toArray
    // 2x2 P5, mean = (0 + 64 + 128 + 192) / 4 / 255
    val goodPgm = pnm("P5\n2 2\n255\n", Seq(0, 64, 128, 192))
    val goodPpm = pnm("P6\n2 1\n255\n", Seq(255, 0, 0, 0, 255, 0))
    val media = Seq(
      (1L, goodPgm, Multimodal.PgmFormat),
      // a P6 payload DECLARED pgm must not decode (wrong magic): stub
      (2L, goodPpm, Multimodal.PgmFormat),
      // and a P5 payload declared ppm falls back too
      (3L, goodPgm, Multimodal.PpmFormat))
      .map { case (id, p, f) => (id, p, (f, 99, 77, p.length.toLong)) }
      .toDF("doc_id", "payload", "meta")
      .select($"doc_id", $"payload",
        struct($"meta._1".as("format"), $"meta._2".as("width"),
          $"meta._3".as("height"), $"meta._4".as("nBytes")).as("meta"))
    val got = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.doc_id -> f).toMap
    val m = ((0 + 64 + 128 + 192) / 4.0 / 255.0).toFloat
    assert(got(1L).width == 2 && got(1L).height == 2)
    assert(got(1L).embedding.toSeq == Seq(m, m, m, m))
    for (id <- Seq(2L, 3L))
      assert(got(id).width == 99 && got(id).height == 77,
        s"doc $id must fall back to the stub on a magic/format mismatch")
  }
}
