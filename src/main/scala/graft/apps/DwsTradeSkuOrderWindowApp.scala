package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipelines.{OrderPreProcess, TradeSkuOrderWindow}
import graft.pipelines.TradeSkuOrderWindow.DimHop

/** Deployable twin of the reference's most complex DWS job
  * (…/app/dws/DwsTradeTrademarkCategoryUserSpuOrderWindow.java): streams
  * the wide order-detail table → dedup by detail id → six chained
  * broadcast dim hops (sku → spu → trademark, category3 → category2 →
  * category1 — the reference's six async Redis-cached Phoenix lookups) →
  * 10 s windows per (trademark, category tree, spu, user) → parquet.
  *
  * Dim tables are batch-read once per run (`AppEnv.readTable`); on an
  * interval trigger each micro-batch re-broadcasts the snapshot — the
  * Spark analogue of the reference's cache-with-invalidation.
  *
  * Expected dim schemas (reference DIM tables): sku(id, spu_id, tm_id,
  * category3_id), spu(id, spu_name), trademark(id, tm_name),
  * c3(id, name, category2_id), c2(id, name, category1_id), c1(id, name).
  */
object DwsTradeSkuOrderWindowApp {

  val usage = "graft.apps.DwsTradeSkuOrderWindowApp --input <dwd-dir> " +
    "--sku <table> --spu <table> --trademark <table> --c3 <table> " +
    "--c2 <table> --c1 <table> --out <dir> --checkpoint <dir> " +
    "[--window '10 seconds'] [--delay '5 seconds'] " +
    "[--trigger available-now|'<interval>']"

  /** The six-hop chain shared with the spec harness. */
  def hops(sku: DataFrame, spu: DataFrame, trademark: DataFrame,
           c3: DataFrame, c2: DataFrame, c1: DataFrame): Seq[DimHop] = Seq(
    DimHop(sku.select(col("id").as("sku_dim_id"), col("spu_id"),
      col("tm_id"), col("category3_id")),
      "sku_id", "sku_dim_id", Seq("spu_id", "tm_id", "category3_id")),
    DimHop(spu.select(col("id").as("spu_dim_id"), col("spu_name")),
      "spu_id", "spu_dim_id", Seq("spu_name")),
    DimHop(trademark.select(col("id").as("tm_dim_id"), col("tm_name")),
      "tm_id", "tm_dim_id", Seq("tm_name")),
    DimHop(c3.select(col("id").as("c3_dim_id"),
      col("name").as("category3_name"), col("category2_id")),
      "category3_id", "c3_dim_id", Seq("category3_name", "category2_id")),
    DimHop(c2.select(col("id").as("c2_dim_id"),
      col("name").as("category2_name"), col("category1_id")),
      "category2_id", "c2_dim_id", Seq("category2_name", "category1_id")),
    DimHop(c1.select(col("id").as("c1_dim_id"),
      col("name").as("category1_name")),
      "category1_id", "c1_dim_id", Seq("category1_name")))

  /** Source-agnostic body: wide-detail stream (with an `eventTime`
    * watermark) + six dims → windowed trademark/category/spu/user summary.
    */
  def run(spark: SparkSession, wideDetail: DataFrame, dimHops: Seq[DimHop],
          outDir: String, checkpointDir: String, windowLen: String,
          trigger: Trigger): Seq[StreamingQuery] =
    Seq(TradeSkuOrderWindow.windowed(wideDetail, dimHops,
        groupCols = Seq("tm_id", "tm_name", "category1_id", "category1_name",
          "category2_id", "category2_name", "category3_id", "category3_name",
          "spu_id", "spu_name", "user_id"),
        sums = Map("split_total_amount" -> "order_amount"),
        countName = "order_detail_ct", windowLen = windowLen)
      .writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start())

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-dws-sku-order", conf)
    val inDir = AppEnv.get(conf, "input", usage)
    val delay = conf.getOrElse("delay", OrderPreProcess.WatermarkDelay)
    val reader = conf.get("max-files-per-trigger")
      .map(n => spark.readStream.option("maxFilesPerTrigger", n))
      .getOrElse(spark.readStream)
    val wide = reader
      .schema(spark.read.parquet(inDir).schema)
      .parquet(inDir)
      .withWatermark("eventTime", delay)
    def dim(key: String) = AppEnv.readTable(spark, AppEnv.get(conf, key, usage))
    val queries = run(spark, wide,
      hops(dim("sku"), dim("spu"), dim("trademark"),
        dim("c3"), dim("c2"), dim("c1")),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      conf.getOrElse("window", "10 seconds"), AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
