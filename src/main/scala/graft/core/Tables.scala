package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's TimestampType
    * (micros) cannot represent; read nanos as raw long and truncate to a
    * micros timestamp. Truncation (not rounding) keeps whole-second
    * bucketing identical to engines that read the nanos natively.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(col("ts") / 1000 cast LongType))
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
