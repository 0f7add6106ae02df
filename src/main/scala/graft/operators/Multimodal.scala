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
    * vectorized call).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (checksum, emb) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.payload.length.toLong, checksum,
            r.meta.width, r.meta.height, emb)
        }
      }
    }
  }

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
