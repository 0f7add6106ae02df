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
  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$table.parquet")
    raw.schema.collect { case f if f.dataType == TimestampNTZType => f.name } match {
      case Seq() => raw
      case ntz   => ntz.foldLeft(raw)((df, c) => df.withColumn(c, col(c).cast(TimestampType)))
    }
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
