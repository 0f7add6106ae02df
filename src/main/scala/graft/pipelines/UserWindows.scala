package graft.pipelines

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamOps

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
    * State is one last-login date per user, BOUNDED by `retention`: a
    * user idle longer is evicted via `EventTimeTimeout` (the
    * `repairIsNew` discipline — the reference keeps this ValueState
    * unbounded, …/app/dws/DwsUserUserLoginWindow.java:126-181). The
    * `back` flag means "returned after > 7 idle days", so the last-login
    * date must survive exactly the idle periods an end-of-day eviction
    * would forget — hence retention ≫ the 7-day back-flow horizon
    * (enforced: retention > 7 days), and the accepted trade past it: an
    * evicted user returning after `retention` reads as first-ever
    * (uu=1, back=0) instead of back-flow, UNLESS re-primed from the
    * `lastSeen` (uid, lastLoginDate) bootstrap table — the periodic
    * compact-state-to-dim-table pattern `firstOfDayFlags`/`repairIsNew`
    * already use. With a bootstrap refreshed at least every `retention`,
    * back-flow is exact for every user the compaction has seen, and
    * state is O(users active within retention) + O(bootstrap rows)
    * instead of O(users ever).
    *
    * Batch inputs run the same function per key with no
    * watermark/timeout (the twin the spec compares against).
    */
  def loginFlags(spark: SparkSession, logins: Dataset[Login],
                 zone: java.time.ZoneId = java.time.ZoneOffset.UTC,
                 retention: java.time.Duration = java.time.Duration.ofDays(30),
                 lastSeen: Option[Dataset[(String, String)]] = None,
                 delay: String = "10 seconds")
      : DataFrame = {
    import spark.implicits._
    require(retention.toDays > 7,
      s"loginFlags: retention must exceed the 7-day back-flow horizon " +
        s"(evicting sooner would misread every back-flow as first-ever), " +
        s"got ${retention.toDays} days")
    val func = (uid: String, events: Iterator[Login], state: GroupState[String]) =>
      if (state.hasTimedOut) {
        state.remove() // idle > retention; lastSeen bootstrap re-primes
        Iterator.empty
      } else {
        val evs = events.toSeq
        if (evs.isEmpty) {
          // initial-state-only invocation (bootstrap key, no data yet):
          // schedule NO timeout — lastLoginDate + retention can already be
          // a past timestamp that would evict the priming immediately;
          // bootstrap entries persist until the user produces data
          // (bootstrap-table-size bound, the firstOfDayFlags convention)
          Iterator.empty
        } else {
          var lastDate = state.getOption.getOrElse("")
          var lastMs = 0L
          val out = evs.sortBy(_.ts.getTime).map { e =>
            lastMs = math.max(lastMs, e.ts.getTime)
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
          StreamOps.setEvictionAt(state, lastMs + retention.toMillis)
          out.iterator
        }
      }
    val grouped = StreamOps.withEventTime(logins, "ts", delay).groupByKey(_.uid)
    val flagged = lastSeen match {
      case Some(ls) =>
        grouped.flatMapGroupsWithState[String, (String, java.sql.Timestamp, Int, Int)](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout(),
          ls.groupByKey(_._1).mapValues(_._2))(func)
      case None =>
        grouped.flatMapGroupsWithState[String, (String, java.sql.Timestamp, Int, Int)](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(func)
    }
    flagged.toDF("uid", "ts", "uu", "back")
  }

  /** Windowed uu/back counts. */
  def loginWindow(spark: SparkSession, logins: Dataset[Login],
                  windowLen: String = "10 seconds", delay: String = "5 seconds"): DataFrame = {
    DwsWindows.allowFlagWindowChain(spark)
    val flags = loginFlags(spark, logins, delay = delay)
    StreamOps.withEventTime(flags, "ts", delay)
      .groupBy(window(col("ts"), windowLen))
      .agg(sum(col("uu")).as("uu_ct"), sum(col("back")).as("back_ct"))
      .select(col("window.start").as("stt"), col("window.end").as("edt"),
        col("uu_ct"), col("back_ct"))
  }

  /** Cart-add unique users per window (the unfinished app's intent). */
  def cartAddUuWindow(spark: SparkSession, cartAdds: Dataset[Login],
                      windowLen: String = "10 seconds",
                      delay: String = "5 seconds"): DataFrame = {
    DwsWindows.allowFlagWindowChain(spark)
    val flags = loginFlags(spark, cartAdds, delay = delay) // same daily-distinct state shape
    StreamOps.withEventTime(flags.filter(col("uu") === 1), "ts", delay)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("cart_add_uu_ct"))
      .select(col("window.start").as("stt"), col("window.end").as("edt"),
        col("cart_add_uu_ct"))
  }
}
