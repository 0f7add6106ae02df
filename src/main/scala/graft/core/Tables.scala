package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the canonical test tables (TESTDATA.md).
  *
  * Every operator in the engine takes `DataFrame => DataFrame`; these are
  * the only places that know where data lives. At cluster scale the same
  * names would resolve through a catalog (Delta/Hive) instead of paths —
  * keep the indirection here so pipelines stay storage-agnostic.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet-read plus one normalization: driver testdata generations have
    * flipped temporal columns between tz-adjusted and naive encodings, and
    * naive reads surface as TIMESTAMP_NTZ — a type the queries (written
    * and oracle-validated against TimestampType) can't cast numerically.
    * Sessions run in UTC, so NTZ → LTZ preserves every wall-clock value
    * and the DuckDB oracle (naive-as-UTC) agreement.
    */
  /** Per-JVM schema cache: every `load` call otherwise pays a synchronous
    * driver-side footer read for schema inference, and a bench run loads
    * tables ~1000 times (142 queries × 3 iters × 2-4 tables). The cache
    * is METADATA only — file paths and schemas, never rows — so every
    * action still computes from the parquet inputs; the test dirs are
    * immutable for a process lifetime by the driver contract.
    * `-Dgraft.tables.schemaCache=false` restores per-call inference.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val path = s"$sfDir/$table.parquet"
    val raw =
      if (sys.props.get("graft.tables.schemaCache").forall(_.toBoolean)) {
        val schema = schemaCache.computeIfAbsent(path,
          p => spark.read.parquet(p).schema)
        spark.read.schema(schema).parquet(path)
      } else spark.read.parquet(path)
    val norm = raw.schema.collect { case f if f.dataType == TimestampNTZType => f.name } match {
      case Seq() => raw
      case ntz   => ntz.foldLeft(raw)((df, c) => df.withColumn(c, col(c).cast(TimestampType)))
    }
    norm
  }

  /** Unsplittable-input guard (optimization guide §2.5: "one huge
    * unsplittable file … repartition immediately after the read"). The
    * driver testdata ships each table as ONE single-row-group parquet
    * file, so a scan is a single task no matter the core count — and
    * Catalyst pipelines the scan-adjacent projection work into that one
    * task, serializing the expensive part of a scan-shaped query. When
    * the scan has materially fewer input files than the session has
    * cores, a round-robin repartition to `defaultParallelism` moves the
    * per-row work onto every core for the cost of one narrow exchange of
    * the (column-pruned) rows. Scale-adaptive by construction: a
    * production table with enough splits never triggers the guard, and
    * the target is the session's parallelism, not a constant.
    *
    * PER CALL SITE, not blanket (round-9 A/B, measured; the shipped
    * numbers below are from the POSITION-BALANCED harness): it pays only
    * where the per-row work downstream of the scan is heavy AND the
    * plan references the fanned scan once or twice — positional shingle
    * hashing wins (q75 1.02→0.95 s, q88 1.43→1.38 s, q105 0.90→0.86 s),
    * while light-compute or many-reference plans LOSE the exchange cost
    * (q1 1.12→1.22 s, q109 1.69→2.11 s, q87 0.68→1.07 s — and those
    * losses were measured under a harness BIASED toward the new
    * variant, so they are conservative). `-Dgraft.scan.fanout=false` restores raw scan
    * parallelism everywhere.
    */
  def fanOut(spark: SparkSession, df: DataFrame): DataFrame = {
    if (!sys.props.get("graft.scan.fanout").forall(_.toBoolean)) return df
    val par = spark.sparkContext.defaultParallelism
    if (df.inputFiles.length * 2 <= par) df.repartition(par) else df
  }

  /** events.parquet's `ts` physical type has varied across driver testdata
    * generations — TIMESTAMP(NANOS) (unrepresentable in Spark's micros
    * TimestampType; read as raw long and truncated) and naive
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ, which rejects the
    * numeric casts and tz arithmetic the queries use). Normalize both to
    * TimestampType here: sessions run in UTC, so NTZ → LTZ preserves the
    * wall-clock value and keeps window/epoch arithmetic identical to the
    * DuckDB oracle, which treats the naive timestamps as UTC.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(col("ts") / 1000 cast LongType))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _        => raw
    }
  }

  /** Convenience bundle: all tables of one scale factor. */
  final case class Tpch(spark: SparkSession, sfDir: String) {
    def region: DataFrame     = load(spark, sfDir, "region")
    def nation: DataFrame     = load(spark, sfDir, "nation")
    def customer: DataFrame   = load(spark, sfDir, "customer")
    def supplier: DataFrame   = load(spark, sfDir, "supplier")
    def part: DataFrame       = load(spark, sfDir, "part")
    def orders: DataFrame     = load(spark, sfDir, "orders")
    def lineitem: DataFrame   = load(spark, sfDir, "lineitem")
    def events: DataFrame     = loadEvents(spark, sfDir)
    def documents: DataFrame  = load(spark, sfDir, "documents")
    def embeddings: DataFrame = load(spark, sfDir, "embeddings")
  }
}
