package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The 5-way behavior-log splitter (SURVEY.md §2.4 X1).
  *
  * Reference: …/app/dwd/log/BaseLogApp.java:186-258 routes one parsed log
  * event into {err, start, page} streams and fans out the `displays[]` /
  * `actions[]` arrays (one output row per element, re-packed with
  * `common`/`page`/`ts` context — the reference reads `display` where logs
  * carry `displays`, a registered defect we do not copy, SURVEY.md §8).
  *
  * Spark shape: ONE parse of the source, five filtered projections off the
  * same DataFrame — Catalyst reuses the scan per branch and prunes the JSON
  * struct per output, so each branch parses only the fields it emits.
  * Array fan-out is `explode`, which is per-row (no shuffle).
  */
object LogSplit {

  val commonType: StructType = StructType(Seq(
    StructField("ar", StringType), StructField("ba", StringType),
    StructField("ch", StringType), StructField("is_new", StringType),
    StructField("md", StringType), StructField("mid", StringType),
    StructField("os", StringType), StructField("uid", StringType),
    StructField("vc", StringType)))

  val pageType: StructType = StructType(Seq(
    StructField("during_time", LongType), StructField("item", StringType),
    StructField("item_type", StringType), StructField("last_page_id", StringType),
    StructField("page_id", StringType), StructField("source_type", StringType)))

  private val displayType = StructType(Seq(
    StructField("display_type", StringType), StructField("item", StringType),
    StructField("item_type", StringType), StructField("order", LongType),
    StructField("pos_id", LongType)))

  private val actionType = StructType(Seq(
    StructField("action_id", StringType), StructField("item", StringType),
    StructField("item_type", StringType), StructField("ts", LongType)))

  /** Full log-event schema (documented …/app/dwd/log/BaseLogApp.java:153-183). */
  val schema: StructType = StructType(Seq(
    StructField("common", commonType),
    StructField("page", pageType),
    StructField("start", StructType(Seq(
      StructField("entry", StringType), StructField("loading_time", LongType),
      StructField("open_ad_id", LongType), StructField("open_ad_ms", LongType),
      StructField("open_ad_skip_ms", LongType)))),
    StructField("err", StructType(Seq(
      StructField("error_code", StringType), StructField("msg", StringType)))),
    StructField("displays", ArrayType(displayType)),
    StructField("actions", ArrayType(actionType)),
    StructField("ts", LongType)))

  /** Parse raw JSON log lines; corrupt rows → dirty branch (P2). */
  def parse(raw: DataFrame, jsonCol: String): (DataFrame, DataFrame) = {
    val parsed = raw.withColumn("log", from_json(col(jsonCol), schema))
    val clean = parsed.filter(col("log").isNotNull && col("log.ts").isNotNull)
      .select(col("log.*"))
    val dirty = parsed.filter(col("log").isNull || col("log.ts").isNull)
      .select(col(jsonCol).as("raw"))
    (clean, dirty)
  }

  /** The five routed outputs, keyed like the reference's DWD topics. */
  def split(logs: DataFrame): Map[String, DataFrame] = Map(
    "err" -> logs.filter(col("err").isNotNull)
      .select(col("common"), col("err"), col("ts")),
    "start" -> logs.filter(col("start").isNotNull)
      .select(col("common"), col("start"), col("ts")),
    "page" -> logs.filter(col("page").isNotNull && col("start").isNull)
      .select(col("common"), col("page"), col("ts")),
    "display" -> logs.filter(col("displays").isNotNull)
      .select(col("common"), col("page"), col("ts"),
        explode(col("displays")).as("display")),
    "action" -> logs.filter(col("actions").isNotNull)
      .select(col("common"), col("page"), col("ts"),
        explode(col("actions")).as("action")))
}
