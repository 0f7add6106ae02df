package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scale-up generator for the scaling bench (round-2 verdict item 4):
  * writes a `factor`× copy of a source scale-factor directory by unioning
  * shifted replicas, so per-query scaling ratios (BASELINE.md) can be
  * measured beyond the fixed-cost-dominated sf0.1.
  *
  *   ScaleData <srcDir> <dstDir> [factor=10]
  *
  * Replica construction preserves each query's *per-entity* statistics so
  * a ratio measures the PLAN, not a changed data distribution:
  *  - fact tables (orders, lineitem, events) shift their keys per replica
  *    (foreign keys shift together: lineitem.l_orderkey follows
  *    orders.o_orderkey); dimension tables are copied once — scaling facts
  *    against fixed dims is the realistic growth shape and keeps broadcast
  *    sides broadcastable;
  *  - events shift user_id too, so per-user session/window state stays
  *    constant-size while row volume grows;
  *  - documents suffix every token with a replica tag: replica texts are
  *    shingle-disjoint, so dedup finds the same planted pairs per replica
  *    instead of a quadratic cross-replica clique blowup;
  *  - embeddings circular-shift each vector by the replica index:
  *    norm-preserving and decorrelating, so no artificial cos≈1 pairs.
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, src, dst, factor)
    spark.stop()
  }

  def write(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def save(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // dimensions: copied once (facts scale against fixed dims)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      save(Tables.load(spark, src, t), t)
    }

    def replicate(df: DataFrame, build: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => build(df, i)).reduce(_ unionByName _)

    def shift(df: DataFrame, keyCols: Seq[String]): (DataFrame, Int) => DataFrame = {
      val spans = keyCols.map(k =>
        k -> (df.agg(max(col(k))).head().getLong(0) + 1L)).toMap
      (d, i) => keyCols.foldLeft(d)((acc, k) =>
        acc.withColumn(k, col(k) + lit(i * spans(k))))
    }

    val orders = Tables.load(spark, src, "orders")
    // one span scan serves both orders and the lineitem FK shift
    val oSpan = orders.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
    save(replicate(orders,
      (d, i) => d.withColumn("o_orderkey", col("o_orderkey") + lit(i * oSpan))),
      "orders")

    val lineitem = Tables.load(spark, src, "lineitem")
    save(replicate(lineitem,
      (d, i) => d.withColumn("l_orderkey", col("l_orderkey") + lit(i * oSpan))),
      "lineitem")

    val events = Tables.loadEvents(spark, src)
    save(replicate(events, shift(events, Seq("event_id", "user_id"))), "events")

    val docs = Tables.load(spark, src, "documents")
    val dSpan = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    save(replicate(docs, (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * dSpan))
        .withColumn("text",
          if (i == 0) col("text")
          else array_join(transform(split(col("text"), " "),
            t => concat(t, lit(s"_r$i"))), " "))), "documents")

    val emb = Tables.load(spark, src, "embeddings")
    val vSpan = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    // circular shift by (replica mod dims); once the shifts wrap (factor >
    // dims), negate per wrap cycle — still norm-preserving, and cycle
    // twins land at cos = −1 instead of an artificial +1 near-dup
    save(replicate(emb, (d, i) => {
      val shift = i % dims
      val sign = if ((i / dims) % 2 == 1) -1f else 1f
      val rotated =
        if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, dims - shift),
          slice(col("embedding"), 1, shift))
      d.withColumn("vec_id", col("vec_id") + lit(i * vSpan))
        .withColumn("embedding",
          if (sign == 1f) rotated
          else transform(rotated, x => x * lit(sign)))
    }), "embeddings")
  }
}
