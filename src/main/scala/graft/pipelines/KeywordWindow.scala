package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{LogSplit, Relational}

/** The keyword pipeline (SURVEY.md §7.2 step 2 — the minimum end-to-end
  * slice): …/app/dws/DwsTrafficSourceKeywordPageViewWindow.java.
  * page stream → search filter (`last_page_id='search' and
  * item_type='keyword'`, :86-92) → tokenize+explode (the IK UDTF becomes a
  * pluggable tokenizer column — default whitespace split, :96-102) →
  * 10 s tumbling count per keyword (:105-113).
  *
  * One shuffle (window+keyword groupBy); tokenize/explode are per-row.
  */
object KeywordWindow {

  def apply(logs: DataFrame, windowLen: String = "10 seconds",
            delay: String = "5 seconds",
            tokenizer: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
              c => split(c, " ")): DataFrame =
    fromPages(LogSplit.split(logs)("page"), windowLen, delay, tokenizer)

  /** The same pipeline over an already-routed page branch — what a
    * downstream job consuming BaseLogApp's page output runs (the
    * reference's keyword app likewise consumes the routed page TOPIC, not
    * raw logs).
    */
  def fromPages(pages: DataFrame, windowLen: String = "10 seconds",
                delay: String = "5 seconds",
                tokenizer: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                  c => split(c, " ")): DataFrame =
    pages
      .filter(col("page.last_page_id") === "search" &&
        col("page.item_type") === "keyword" && col("page.item").isNotNull)
      .select(timestamp_millis(col("ts")).as("eventTime"),
        explode(tokenizer(col("page.item"))).as("keyword"))
      .filter(col("keyword") =!= "")
      .withWatermark("eventTime", delay)
      .groupBy(window(col("eventTime"), windowLen), col("keyword"))
      .agg(count(lit(1)).as("keyword_count"))
      .select(col("window.start").as("stt"), col("window.end").as("edt"),
        col("keyword"), col("keyword_count"))

  /** Per-window top-k keywords (the dashboard cut downstream systems take
    * from the reference's keyword table). Batch: rank directly. Streaming:
    * ranking over a streaming aggregate is disallowed, but in append mode
    * ALL of a window's rows finalize in the same micro-batch — so apply
    * this inside `foreachBatch` and each batch ranks only complete
    * windows (KeywordTopKSpec drives exactly that wiring).
    */
  def topKeywords(counts: DataFrame, k: Int): DataFrame =
    Relational.topKPerGroup(counts, Seq("stt"),
      Seq(col("keyword_count").desc, col("keyword").asc), k)
}
