package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multimodal column handling for a training-data pipeline.
  *
  * Images/audio/video travel as opaque `binary` columns plus a typed
  * metadata struct; per-record decode + feature extraction runs as a
  * batched `mapPartitions` over a typed Dataset (the JVM analogue of an
  * Arrow-batched Pandas UDF: one iterator per partition, records processed
  * in fixed-size batches the way a codec/model server wants them).
  *
  * The decode step itself is a STUB — this container ships no image/audio
  * codecs — but it is deterministic and the Spark-side plumbing (schema,
  * encoders, partitioning, batch shape) is real and oracle-verified: the
  * fake features are arithmetic over the payload bytes, which the DuckDB
  * oracle reproduces over the source text (ASCII: bytes == codepoints).
  *
  * Scale notes: payloads never shuffle (all ops per-partition); feature
  * extraction is CPU-bound map work that AQE/dynamic allocation scales
  * linearly; real pipelines put the binary in its own column family /
  * parquet column so predicate-only scans skip the bytes entirely.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                           width: Int, height: Int, embedding: Array[Float])

  /** Synthesize a media table from `documents`: the text bytes stand in for
    * an encoded image payload; width/height derive from the portable hash
    * so every engine can recompute them.
    */
  def toMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextFunctions.polyHash(col(textCol))
    df.select(
      col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("fake/rgb8").as("format"),
        (pmod(fp, lit(1024L)) + 16L).cast("int").as("width"),
        (pmod(fp, lit(768L)) + 16L).cast("int").as("height"),
        length(col(textCol)).cast("long").as("nBytes")).as("meta"))
  }

  /** A REAL decoder for the one raster format that needs no codec
    * library: binary PPM (P6 — "P6\n<w> <h>\n<maxval>\n" + w·h RGB byte
    * triples; Netpbm's spec allows '#' comments and any whitespace
    * between header tokens). Returns (width, height, per-channel mean in
    * [0, 1]) or None when the payload is not a well-formed P6 — the
    * caller falls back to the stub seam, which is the contract for
    * formats this container has no codec for (JPEG/PNG/audio). Pure byte
    * arithmetic, so it runs inside the same batched mapPartitions as any
    * codec would.
    */
  /** Header parse shared by the mean-decode and the perceptual hash:
    * validates magic/dims/maxval/raster length and returns
    * (width, height, maxval, raster offset) without touching the pixel
    * bytes.
    */
  private[operators] def parsePnmHeader(p: Array[Byte], magic: Char,
                                        channels: Int): Option[(Int, Int, Int, Int)] = {
    var i = 0
    def skipWs(): Boolean = {
      var progress = true
      while (progress) {
        progress = false
        while (i < p.length && (p(i) == ' ' || p(i) == '\n' || p(i) == '\r' || p(i) == '\t')) {
          i += 1; progress = true
        }
        if (i < p.length && p(i) == '#') { // comment to end-of-line
          while (i < p.length && p(i) != '\n') i += 1
          progress = true
        }
      }
      i < p.length
    }
    def int(): Option[Int] = {
      if (!skipWs() || p(i) < '0' || p(i) > '9') return None
      var v = 0L
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0')
        if (v > Int.MaxValue) return None
        i += 1
      }
      Some(v.toInt)
    }
    if (p.length < 2 || p(0) != 'P' || p(1) != magic) return None
    i = 2
    for {
      w <- int(); h <- int(); maxv <- int()
      if w > 0 && h > 0 && maxv > 0 && maxv < 256
      // exactly ONE whitespace byte separates the header from the raster
      if i < p.length && (p(i) == '\n' || p(i) == ' ' || p(i) == '\r' || p(i) == '\t')
      pixels = w.toLong * h
      if pixels <= Int.MaxValue / channels
      if p.length - (i + 1) >= pixels * channels
    } yield (w, h, maxv, i + 1)
  }

  private[operators] def decodePnm(p: Array[Byte], magic: Char,
                                   channels: Int): Option[(Int, Int, Array[Float])] =
    parsePnmHeader(p, magic, channels).map { case (w, h, maxv, off) =>
      val pixels = w.toLong * h
      val sums = Array.fill(channels)(0L)
      var j = 0
      val n = (pixels * channels).toInt
      while (j < n) {
        sums(j % channels) += p(off + j) & 0xff
        j += 1
      }
      (w, h, Array.tabulate(channels)(c => (sums(c).toDouble / pixels / maxv).toFloat))
    }

  /** Binary P6 PPM: 3 interleaved RGB channels. */
  private[operators] def decodePpm(p: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decodePnm(p, '6', 3)

  /** Binary P5 PGM: one grayscale channel — the same Netpbm byte
    * arithmetic as [[decodePpm]] with a different magic and stride.
    */
  private[operators] def decodePgm(p: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decodePnm(p, '5', 1)

  /** STUB decode: a real implementation would hand `payload` to an image
    * codec and a vision encoder. Here: deterministic arithmetic over the
    * bytes (poly-hash checksum + 4 pseudo-embedding floats) so the
    * pipeline is testable end-to-end without codecs.
    */
  private[operators] def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var h = 0L
    var i = 0
    while (i < payload.length) {
      h = (h * 31 + (payload(i) & 0xff)) % TextFunctions.HashMod
      i += 1
    }
    val emb = Array.tabulate(4)(j => ((h >> (j * 8)) & 0xff).toFloat / 255f)
    (h, emb)
  }

  /** Batched per-partition feature extraction. `batchSize` mirrors the
    * batch dimension a codec/model server expects; records inside a batch
    * are processed together (here trivially, in production via one
    * vectorized call). Records whose metadata DECLARES binary PPM
    * (`meta.format == "image/ppm"`) get the REAL decode ([[decodePpm]]:
    * true raster dimensions, per-channel means as the embedding head);
    * every other format — and a declared PPM that fails to parse —
    * falls back to the stub seam and the metadata dimensions. The
    * format gate matters beyond tidiness: decode is dispatched by what
    * the record CLAIMS to be, never by content sniffing, so a text
    * payload that happens to look like a P6 header (the q35 corpus is
    * arbitrary text) can never silently switch feature semantics.
    */
  val PpmFormat = "image/ppm"
  val PgmFormat = "image/pgm"

  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (checksum, stubEmb) = decodeStub(r.payload)
          val real = r.meta.format match {
            case PpmFormat => decodePpm(r.payload)
            case PgmFormat => decodePgm(r.payload)
            case _ => None
          }
          real match {
            case Some((w, h, means)) =>
              // uniform 4-float embedding head: RGB means + their average
              // for P6; the grayscale mean replicated for P5
              val emb =
                if (means.length == 3)
                  means :+ ((means(0) + means(1) + means(2)) / 3)
                else Array.fill(4)(means(0))
              MediaFeatures(r.doc_id, r.payload.length.toLong, checksum,
                w, h, emb)
            case None =>
              MediaFeatures(r.doc_id, r.payload.length.toLong, checksum,
                r.meta.width, r.meta.height, stubEmb)
          }
        }
      }
    }
  }

  /** 64-bit dHash (difference hash) of a decoded Netpbm raster — the
    * perceptual fingerprint for image-level near-dup dedup. A 9×8 grid
    * of point samples at the normalized positions
    * (row i → pixel floor(i·h/8), col j → pixel floor(j·w/9)); bit
    * (i·8+j) is set iff luma(i,j) > luma(i,j+1), luma = the channel sum
    * (integer — no division, no rounding, replayable by any engine).
    *
    * Why THESE choices:
    *  - gradient comparisons (dHash) need no mean, so the whole hash is
    *    integer arithmetic — unlike aHash, whose global-mean threshold
    *    drags in a division;
    *  - point sampling at floor-normalized positions is EXACTLY
    *    invariant under integer-factor nearest-neighbor resize:
    *    the resized sample floor(floor(j·kw/9)/k) = floor(j·w/9) by the
    *    floor-division composition identity — a re-encoded 2× upscale
    *    hashes IDENTICALLY (spec-pinned, and q170's oracle proves it
    *    cross-engine by replaying twins at base geometry);
    *  - comparisons are invariant under any monotone brightness remap
    *    (the classic dHash robustness), so re-exposure lands within a
    *    small Hamming radius.
    * Area-averaging would resist noise better but ties the hash to a
    * box-filter's rounding; the deterministic point grid is the
    * oracle-replayable choice and the standard dHash formulation.
    */
  private[operators] def dhash(p: Array[Byte], magic: Char,
                               channels: Int): Option[Long] =
    parsePnmHeader(p, magic, channels).map { case (w, h, _, off) =>
      def luma(r: Int, c: Int): Int = {
        val pr = r * h / 8
        val pc = c * w / 9
        val base = off + (pr * w + pc) * channels
        var s = 0
        var k = 0
        while (k < channels) { s += p(base + k) & 0xff; k += 1 }
        s
      }
      var hash = 0L
      var i = 0
      while (i < 8) {
        var j = 0
        while (j < 8) {
          if (luma(i, j) > luma(i, j + 1)) hash |= 1L << (i * 8 + j)
          j += 1
        }
        i += 1
      }
      hash
    }

  /** Nearest-neighbor integer-factor upscale of a Netpbm raster,
    * re-encoded with a canonical single-newline header — the "same
    * image, different encoding" generator for specs and the q170
    * fixture twins. Pixel (r, c) of the output is source
    * (r / factor, c / factor).
    */
  private[operators] def upscaleNn(p: Array[Byte], magic: Char,
                                   channels: Int, factor: Int): Option[Array[Byte]] = {
    require(factor >= 1, "upscale factor must be >= 1")
    parsePnmHeader(p, magic, channels).map { case (w, h, maxv, off) =>
      val (ow, oh) = (w * factor, h * factor)
      require(ow.toLong * oh * channels <= Int.MaxValue - 64,
        s"upscaled raster ${ow}x$oh exceeds a JVM array")
      val header = s"P$magic\n$ow $oh\n$maxv\n".getBytes("US-ASCII")
      val outBytes = new Array[Byte](header.length + ow * oh * channels)
      System.arraycopy(header, 0, outBytes, 0, header.length)
      var r = 0
      while (r < oh) {
        var c = 0
        while (c < ow) {
          val srcBase = off + ((r / factor) * w + (c / factor)) * channels
          val dstBase = header.length + (r * ow + c) * channels
          var k = 0
          while (k < channels) {
            outBytes(dstBase + k) = p(srcBase + k); k += 1
          }
          c += 1
        }
        r += 1
      }
      outBytes
    }
  }

  /** (doc_id, dhash) for every record whose DECLARED format decodes
    * (the [[extractFeatures]] dispatch gate: never content sniffing);
    * undecodable or non-raster records emit NO row — a hash computed
    * off stub bytes would manufacture fake near-dups. Scan-local
    * per-partition decode, payload never shuffles.
    */
  def perceptualHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val h = r.meta.format match {
          case PpmFormat => dhash(r.payload, '6', 3)
          case PgmFormat => dhash(r.payload, '5', 1)
          case _ => None
        }
        h.map(v => (r.doc_id, v))
      }
    }.toDF("doc_id", "dhash")
  }

  /** The NN-upscaled re-encoding of every decodable raster record, with
    * ids shifted by `idOffset` — the "same image, new encoding"
    * generator (fixture twins for q170, resize cases in specs). Records
    * whose declared format does not decode emit no twin.
    */
  def upscaledTwins(spark: SparkSession, media: DataFrame,
                    factor: Int, idOffset: Long): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      val up = r.meta.format match {
        case PpmFormat => upscaleNn(r.payload, '6', 3, factor)
        case PgmFormat => upscaleNn(r.payload, '5', 1, factor)
        case _ => None
      }
      up.map(bytes => MediaRecord(r.doc_id + idOffset, bytes,
        MediaMeta(r.meta.format, r.meta.width * factor,
          r.meta.height * factor, bytes.length.toLong)))
    }
  }

  /** Image-level near-dup pairs: [[perceptualHashes]] into the
    * pigeonhole-banded Hamming self-join ([[Dedup.hammingPairs]] — the
    * q29/q30 machinery on the new hash). maxHamming 3 splits the 64-bit
    * hash into 4 exact-match blocks of 16 bits — the standard dHash
    * near-dup radius, and the radius IS the scale dial: block width
    * sets the band-key space (2^16 here), so the candidate rate on
    * effectively-random hashes is n²·4/2^16. A wider radius shrinks the
    * blocks — maxHamming 7 means 8-bit blocks, only 256 bucket values,
    * and the candidate set degrades to n²/2⁵ (measured at 510k images:
    * 139 s / 63× on the second ScaleBench decade at maxHamming 7;
    * 2.9 s / 2.4× at 3). Scale shape: payload decodes scan-locally to ONE long per
    * image; only (block, value, id, hash) tuples shuffle — never pixels.
    */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs(perceptualHashes(spark, media),
      "doc_id", "dhash", bits = 64, maxHamming = maxHamming)

  /** Resize plan: aspect-preserving fit into a (maxW, maxH) box, never
    * upscaling. The dimension math is the real operator (it drives batch
    * grouping and output storage sizing); the pixel resample itself is the
    * same stubbed codec seam as [[decodeStub]]. Pure per-row projection —
    * no shuffle, payload untouched.
    */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("meta.width"),
      lit(maxH.toDouble) / col("meta.height"),
      lit(1.0))
    media
      .withColumn("out_width", floor(col("meta.width") * scale).cast("int"))
      .withColumn("out_height", floor(col("meta.height") * scale).cast("int"))
  }

  /** Frame sampling for video-like payloads: treat the payload as
    * `frameBytes`-sized frames and keep every `stride`-th one, exploding to
    * one row per kept frame with its byte slice. The slice is real
    * (`substring` over binary); decoding the slice is the codec stub's job.
    * Row explosion is bounded by nBytes/frameBytes/stride; payload bytes
    * are sliced per-partition, never shuffled whole per frame.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val nFrames = greatest(floor(col("meta.nBytes") / frameBytes), lit(1L))
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0L), nFrames - 1, lit(stride.toLong))))
      .withColumn("frame",
        substring(col("payload"), (col("frame_idx") * frameBytes + 1).cast("int"), lit(frameBytes)))
      .select(col("doc_id"), col("frame_idx"), col("frame"))
  }
}
