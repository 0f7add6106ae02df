package graft.pipelines

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** User-centric DWS windows built on per-key login-date state.
  *
  * - UserLoginWindow (…/app/dws/DwsUserUserLoginWindow.java:126-181):
  *   per uid, a login counts as unique-user (uu) when the last login date
  *   differs from today, and as BACK-flow when the gap exceeds 7 days
  *   (:150-166). Window-sums the two flags.
  *
  * - CartAddUuWindow: the reference app is UNFINISHED (ends after keyBy,
  *   …/app/dws/DwsTradeCartAddUuWindow.java:88-92) — this implements the
  *   intent documented in its javadoc (:22-37): per-user daily-distinct
  *   cart-add flag, then windowed unique-user counts.
  */
object UserWindows {

  case class Login(uid: String, ts: java.sql.Timestamp)

  /** Emit (uid, ts, uu, back) flags from per-uid state.
    *
    * DELIBERATELY NoTimeout — the one flagger whose state cannot evict on
    * the daily horizon: `back` means "returned after >7 idle days", so the
    * last-login date must survive exactly the idle periods an end-of-day
    * eviction would forget; an evicted key returning after 8 days would
    * read as first-ever (back=0) instead of back-flow (back=1). The
    * reference keeps this ValueState unbounded for the same reason
    * (…/app/dws/DwsUserUserLoginWindow.java:126-181). State is one date
    * string per user — the production bound is the periodic
    * compact-to-dim-table + restart-re-prime pattern used for the
    * first-ever flags (see DwsWindows.firstOfDayFlags), not a TTL.
    */
  def loginFlags(spark: SparkSession, logins: Dataset[Login],
                 zone: java.time.ZoneId = java.time.ZoneOffset.UTC)
      : DataFrame = {
    import spark.implicits._
    logins.groupByKey(_.uid)
      .flatMapGroupsWithState[String, (String, java.sql.Timestamp, Int, Int)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid, events, state: GroupState[String]) =>
          var lastDate = state.getOption.getOrElse("")
          val out = events.toSeq.sortBy(_.ts.getTime).map { e =>
            val d = java.time.Instant.ofEpochMilli(e.ts.getTime)
              .atZone(zone).toLocalDate
            val uu = if (lastDate.isEmpty || lastDate != d.toString) 1 else 0
            val back =
              if (lastDate.nonEmpty &&
                java.time.temporal.ChronoUnit.DAYS.between(
                  java.time.LocalDate.parse(lastDate), d) > 7) 1
              else 0
            if (uu == 1) lastDate = d.toString
            (uid, e.ts, uu, back)
          }
          state.update(lastDate)
          out.iterator
      }
      .toDF("uid", "ts", "uu", "back")
  }

  /** Windowed uu/back counts. */
  def loginWindow(spark: SparkSession, logins: Dataset[Login],
                  windowLen: String = "10 seconds", delay: String = "5 seconds"): DataFrame = {
    val flags = loginFlags(spark, logins)
    flags.withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen))
      .agg(sum(col("uu")).as("uu_ct"), sum(col("back")).as("back_ct"))
      .select(col("window.start").as("stt"), col("window.end").as("edt"),
        col("uu_ct"), col("back_ct"))
  }

  /** Cart-add unique users per window (the unfinished app's intent). */
  def cartAddUuWindow(spark: SparkSession, cartAdds: Dataset[Login],
                      windowLen: String = "10 seconds",
                      delay: String = "5 seconds"): DataFrame = {
    val flags = loginFlags(spark, cartAdds) // same daily-distinct state shape
    flags.filter(col("uu") === 1)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("cart_add_uu_ct"))
      .select(col("window.start").as("stt"), col("window.end").as("edt"),
        col("cart_add_uu_ct"))
  }
}
