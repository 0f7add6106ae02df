package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The CDC envelope family (SURVEY.md §1.1, §2.3 P1-P8).
  *
  * The reference consumes a Maxwell CDC stream of its MySQL `gmall` DB:
  * every record is `{database, table, type: insert/update/delete/
  * bootstrap-*, data: map, old: map, ts}` (schema declared at
  * …/app/dwd/db/DwdTradeOrderPreProcess.java:57-65, filtered at
  * …/app/dim/DimSinkApp.java:67-82). Facts are per-table extractions of
  * `data['col']`; change detection reads `old`.
  *
  * All operators are plain `DataFrame => DataFrame` so they run unchanged
  * over a batch table or a `readStream` Kafka value column. Per-row only —
  * no shuffles; at 100 TB the envelope parse + table filter should sit
  * directly on the source scan so column pruning reaches the JSON parser
  * (Spark prunes `from_json` fields it doesn't need).
  */
object CdcEnvelope {

  /** One StructType for every ODS record (maps stay string-string like the
    * reference; facts cast at point of use).
    */
  val schema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("old", MapType(StringType, StringType)),
    StructField("ts", LongType)))

  /** P1+P2: parse a JSON-string column; route unparseable records to a
    * dirty branch instead of dropping them (reference side-output:
    * …/app/dwd/log/BaseLogApp.java:70-88). Returns (clean, dirty).
    * `from_json` yields null on corrupt input — the null test is the split.
    */
  def parse(df: DataFrame, jsonCol: String): (DataFrame, DataFrame) = {
    val parsed = df.withColumn("env", from_json(col(jsonCol), schema))
    val clean = parsed.filter(col("env").isNotNull && col("env.table").isNotNull)
      .select(col("env.*"))
    val dirty = parsed.filter(col("env").isNull || col("env.table").isNull)
      .select(col(jsonCol).as("raw"))
    (clean, dirty)
  }

  /** P3: drop Maxwell snapshot markers, require payload
    * (…/app/dim/DimSinkApp.java:67-82). `bootstrap-insert` is kept and
    * normalized to `insert` like the reference does.
    */
  def etlFilter(env: DataFrame): DataFrame =
    env.filter(!col("type").isin("bootstrap-start", "bootstrap-complete")
        && col("data").isNotNull)
      .withColumn("type",
        when(col("type") === "bootstrap-insert", "insert").otherwise(col("type")))

  /** P4: per-table fact extraction — `select data['c1'] as c1 … where
    * table = 't' and type in (…)` (every dwd/db app, e.g.
    * …/app/dwd/db/DwdTradeOrderPreProcess.java:68-86).
    */
  def factExtract(env: DataFrame, table: String, types: Seq[String],
                  cols: Seq[String]): DataFrame =
    env.filter(col("table") === table && col("type").isin(types: _*))
      .select(col("ts") +: cols.map(c => col("data")(c).as(c)): _*)

  /** P7: changed-column predicate — the column appears in `old` (so it
    * changed) and its new value equals `to`
    * (…/app/dwd/db/DwdTradeCancelDetail.java:110-112).
    */
  def changedTo(column: String, to: String): Column =
    col("old")(column).isNotNull && col("data")(column) === to

  /** P6: insert/update delta — full value on insert, difference against
    * `old` on update (cart-add delta, …/app/dwd/db/DwdTradeCartAdd.java:84-93).
    */
  def upsertDelta(column: String): Column =
    when(col("type") === "insert", col("data")(column).cast("double"))
      .otherwise(col("data")(column).cast("double")
        - coalesce(col("old")(column).cast("double"), lit(0d)))

  /** P13: config-driven column pruning — keep only `keep` keys of `data`
    * (…/app/func/MyBroadcastFunction.java:75-78). `keepCol` is a
    * per-row array column so the keep-list can come from a joined config
    * table, not a compile-time constant.
    */
  def pruneData(env: DataFrame, keepCol: Column): DataFrame =
    env.withColumn("data",
      map_filter(col("data"), (k, _) => array_contains(keepCol, k)))
}
