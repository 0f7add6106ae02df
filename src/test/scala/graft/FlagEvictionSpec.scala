package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.date_format
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.DwsWindows
import graft.pipelines.DwsWindows.Payment
import graft.streaming.StreamOps
import graft.streaming.StreamOps.PageView

/** Bounded keyed state for the flag operators (round-2 verdict item 2):
  * the daily-distinct / first-of-day flaggers evict per-key state via
  * `EventTimeTimeout` at end-of-day(lastDate) — the reference's 1-day UV
  * TTL (…/app/dwd/log/DwdTrafficUniqueVisitorDetail.java:94-99) — and the
  * is_new repairer after a retention of idleness.
  *
  * What these pin:
  *  - eviction is INVISIBLE to the daily `uu` flag: a key returning after
  *    eviction flags uu=1, exactly what un-evicted state would conclude
  *    (new date != lastDate), and the late-row filter that EventTimeTimeout
  *    switches on guarantees no event for the evicted date can arrive and
  *    be mis-flagged against fresh state;
  *  - the first-ever `nu` flag loses history on eviction BY DESIGN
  *    (documented O(active keys) trade): a returning key re-flags nu=1
  *    unless re-primed from a `firstSeen` bootstrap table (the
  *    compact-state-to-dim-table restart pattern), which this spec also
  *    exercises;
  *  - cross-batch late-day arrivals (verdict item 5): a day-D event
  *    arriving within watermark after day D+1 was processed rewinds the
  *    single last-date state to D, so the NEXT D+1 event re-flags uu=1 —
  *    the same double-count the reference's single ValueState<lastDt>
  *    produces. The batch twins (q57-q59) order by (day, id) globally and
  *    do not share it; this is the documented streaming delta.
  */
class FlagEvictionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)
  private val day = 86400L

  test("dailyDistinctFlags: idle key evicted after end-of-day; late event for the evicted date is filtered, return day flags uu=1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PageView]
    val q = StreamOps.dailyDistinctFlags(spark, in.toDS())
      .toDF("mid", "day", "is_first")
      .writeStream.format("memory").queryName("evict_uv").outputMode("append").start()
    try {
      in.addData(PageView("m1", None, ts(100)))            // day 1: uu=1
      q.processAllAvailable()
      in.addData(PageView("z", None, ts(day + 3600)))      // watermark past m1's end-of-day
      q.processAllAvailable()
      in.addData(PageView("z", None, ts(day + 3610)))      // nudge: m1's timeout fires
      q.processAllAvailable()
      // late day-1 event: far behind the watermark -> dropped BEFORE the
      // operator; with the evicted (empty) state it would otherwise be
      // mis-flagged as a first visit
      in.addData(PageView("m1", Some("home"), ts(3600)))
      q.processAllAvailable()
      in.addData(PageView("m1", None, ts(2 * day + 100)))  // day 3: fresh key -> uu=1
      q.processAllAvailable()
      val m1 = spark.table("evict_uv").filter($"mid" === "m1")
        .select($"day", $"is_first").as[(String, Boolean)].collect().toSeq
      assert(m1.sortBy(_._1) == Seq(("1970-01-01", true), ("1970-01-03", true)),
        s"late evicted-date event must be filtered and the return day re-flagged; got $m1")
    } finally q.stop()
  }

  test("firstOfDayFlags: eviction re-flags nu=1 on return (documented loss), uu stays exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Payment]
    val q = DwsWindows.firstOfDayFlags[Payment](
      in.toDS().withWatermark("ts", "10 seconds"), _.userId, _.ts)
      .select($"_1.userId".as("uid"), $"_2".as("uu"), $"_3".as("nu"))
      .writeStream.format("memory").queryName("evict_flags").outputMode("append").start()
    try {
      in.addData(Payment("p1", "u1", ts(100)))             // first ever: uu=1 nu=1
      q.processAllAvailable()
      in.addData(Payment("pz", "z", ts(day + 3600)))       // advance watermark
      q.processAllAvailable()
      in.addData(Payment("pz2", "z", ts(day + 3610)))      // nudge: u1 evicted
      q.processAllAvailable()
      in.addData(Payment("p2", "u1", ts(2 * day + 100)))   // returns: uu=1, nu re-flags 1
      q.processAllAvailable()
      val u1 = spark.table("evict_flags").filter($"uid" === "u1")
        .select($"uu", $"nu").as[(Int, Int)].collect().toSeq
      assert(u1 == Seq((1, 1), (1, 1)),
        s"evicted first-ever history re-flags nu without a bootstrap; got $u1")
    } finally q.stop()
  }

  test("firstOfDayFlags: firstSeen bootstrap suppresses nu (and uu on the same date) for compacted keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bootstrap = Seq(("u1", "1970-01-01")).toDS()
    val in = MemoryStream[Payment]
    val q = DwsWindows.firstOfDayFlags[Payment](
      in.toDS().withWatermark("ts", "10 seconds"), _.userId, _.ts,
      firstSeen = Some(bootstrap))
      .select($"_1.userId".as("uid"), $"_2".as("uu"), $"_3".as("nu"))
      .writeStream.format("memory").queryName("boot_flags").outputMode("append").start()
    try {
      in.addData(Payment("p0", "u1", ts(200)),             // same date as bootstrap: uu=0 nu=0
        Payment("p1", "u2", ts(300)))                      // unknown key: uu=1 nu=1
      q.processAllAvailable()
      in.addData(Payment("p2", "u1", ts(2 * day + 100)))   // later date: uu=1, nu stays 0
      q.processAllAvailable()
      val rows = spark.table("boot_flags")
        .select($"uid", $"uu", $"nu").as[(String, Int, Int)].collect().toSet
      assert(rows == Set(("u1", 0, 0), ("u2", 1, 1), ("u1", 1, 0)),
        s"bootstrapped key must not re-flag first-ever; got $rows")
    } finally q.stop()
  }

  test("firstOfDayFlags: bootstrap key with NO data in early batches survives watermark advances (no past-dated eviction)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // u1 is primed from the compacted table but produces nothing while
    // other traffic advances the watermark far past end-of-day of its
    // bootstrap date — the priming must NOT be evicted (Spark invokes the
    // state function for initial-state keys with an empty event iterator;
    // scheduling end-of-day(bootstrapDate) there would be a past-dated
    // timeout that fires on the first watermark advance)
    val bootstrap = Seq(("u1", "1970-01-01")).toDS()
    val in = MemoryStream[Payment]
    val q = DwsWindows.firstOfDayFlags[Payment](
      in.toDS().withWatermark("ts", "10 seconds"), _.userId, _.ts,
      firstSeen = Some(bootstrap))
      .select($"_1.userId".as("uid"), $"_2".as("uu"), $"_3".as("nu"))
      .writeStream.format("memory").queryName("boot_idle").outputMode("append").start()
    try {
      in.addData(Payment("pz", "z", ts(3 * day)))        // watermark way past day 1
      q.processAllAvailable()
      in.addData(Payment("pz2", "z", ts(3 * day + 10)))  // nudge (would fire the bad timeout)
      q.processAllAvailable()
      in.addData(Payment("p1", "u1", ts(4 * day)))       // u1 finally appears
      q.processAllAvailable()
      val u1 = spark.table("boot_idle").filter($"uid" === "u1")
        .select($"uu", $"nu").as[(Int, Int)].collect().toSeq
      assert(u1 == Seq((1, 0)),
        s"idle bootstrap key must keep its first-ever priming (nu=0); got $u1")
    } finally q.stop()
  }

  test("repairIsNew: retention eviction re-confirms a stale is_new=1 (documented trade); restart bootstrap repairs it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // run 1, no bootstrap: first visit confirmed new; after the device
    // idles past retention its state evicts, so a later stale claim is
    // re-confirmed — the documented O(active keys) trade
    val in = MemoryStream[(String, String, Timestamp)]
    val q = StreamOps.repairIsNew(spark, in.toDS(),
      retention = java.time.Duration.ofDays(1))
      .toDF("mid", "is_new", "ts")
      .writeStream.format("memory").queryName("isnew_evict").outputMode("append").start()
    try {
      in.addData(("d1", "1", ts(100)))        // first visit day 1: confirmed new
      q.processAllAvailable()
      in.addData(("z", "0", ts(3 * day)))     // watermark far past d1 + 1-day retention
      q.processAllAvailable()
      in.addData(("z", "0", ts(3 * day + 10))) // nudge: d1 evicted
      q.processAllAvailable()
      in.addData(("d1", "1", ts(4 * day)))    // stale claim after eviction
      q.processAllAvailable()
      val got = spark.table("isnew_evict").filter($"mid" === "d1")
        .select($"is_new", date_format($"ts", "yyyy-MM-dd"))
        .as[(String, String)].collect().toSeq
      assert(got == Seq(("1", "1970-01-01"), ("1", "1970-01-05")),
        s"evicted first-visit history re-confirms the stale claim; got $got")
    } finally q.stop()

    // run 2 models the RESTART path: a fresh query primed from the
    // compacted (mid, firstDate) table sees the same stale claim and
    // repairs it to 0, exactly as un-evicted state would
    val in2 = MemoryStream[(String, String, Timestamp)]
    val q2 = StreamOps.repairIsNew(spark, in2.toDS(),
      retention = java.time.Duration.ofDays(1),
      firstSeen = Some(Seq(("d1", "1970-01-01")).toDS()))
      .toDF("mid", "is_new", "ts")
      .writeStream.format("memory").queryName("isnew_boot").outputMode("append").start()
    try {
      in2.addData(("d1", "1", ts(4 * day)))
      q2.processAllAvailable()
      val got = spark.table("isnew_boot")
        .select($"is_new").as[String].collect().toSeq
      assert(got == Seq("0"),
        s"bootstrap-primed restart must repair the stale claim; got $got")
    } finally q2.stop()
  }

  test("loginFlags: idle-past-retention eviction, back-flow re-primed via lastSeen bootstrap, batch twin agrees") {
    import spark.implicits._
    import graft.pipelines.UserWindows
    import graft.pipelines.UserWindows.Login
    implicit val sqlCtx = spark.sqlContext
    val retention = java.time.Duration.ofDays(10)

    // run 1, no bootstrap: first login flags (uu=1, back=0); after the
    // user idles past retention the state evicts, so the day-20 return
    // reads first-ever (uu=1, back=0) instead of back-flow — the
    // documented O(active users) trade
    val in = MemoryStream[Login]
    val q = UserWindows.loginFlags(spark, in.toDS(), retention = retention)
      .writeStream.format("memory").queryName("login_evict")
      .outputMode("append").start()
    try {
      in.addData(Login("u1", ts(100)))            // day 1: uu=1 back=0
      q.processAllAvailable()
      in.addData(Login("z", ts(15 * day)))        // watermark past day1+10d
      q.processAllAvailable()
      in.addData(Login("z", ts(15 * day + 10)))   // nudge: u1 evicted
      q.processAllAvailable()
      in.addData(Login("u1", ts(20 * day)))       // 20-day gap after eviction
      q.processAllAvailable()
      val got = spark.table("login_evict").filter($"uid" === "u1")
        .select($"uu", $"back").as[(Int, Int)].collect().toSeq
      assert(got == Seq((1, 0), (1, 0)),
        s"evicted history must read the return as first-ever without a bootstrap; got $got")
    } finally q.stop()

    // run 2 models the RESTART path: primed from the compacted
    // (uid, lastLoginDate) table, the same day-20 return correctly
    // flags back-flow — exactly what un-evicted state would conclude
    val in2 = MemoryStream[Login]
    val q2 = UserWindows.loginFlags(spark, in2.toDS(), retention = retention,
        lastSeen = Some(Seq(("u1", "1970-01-01")).toDS()))
      .writeStream.format("memory").queryName("login_boot")
      .outputMode("append").start()
    try {
      in2.addData(Login("u1", ts(20 * day)))
      q2.processAllAvailable()
      val got = spark.table("login_boot")
        .select($"uu", $"back").as[(Int, Int)].collect().toSeq
      assert(got == Seq((1, 1)),
        s"bootstrap-primed return after >7 idle days must flag back-flow; got $got")
    } finally q2.stop()

    // batch twin on the full history agrees with the bootstrap-primed
    // streaming conclusion for the return login
    val batch = UserWindows.loginFlags(spark,
        Seq(Login("u1", ts(100)), Login("u1", ts(20 * day))).toDS(),
        retention = retention)
      .select($"uu", $"back").as[(Int, Int)].collect().toSeq
    assert(batch == Seq((1, 0), (1, 1)), s"batch twin; got $batch")

    // retention at or under the back-flow horizon is a contract error
    intercept[IllegalArgumentException] {
      UserWindows.loginFlags(spark, Seq(Login("u1", ts(100))).toDS(),
        retention = java.time.Duration.ofDays(7))
    }
  }

  test("cross-batch late-day arrival rewinds last-date state: next new-day event double-flags uu (reference ValueState semantics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PageView]
    // 3-day delay keeps the day-1 event inside the watermark when it
    // arrives after day 2 was processed
    val q = StreamOps.dailyDistinctFlags(spark, in.toDS(), delay = "3 days")
      .toDF("mid", "day", "is_first")
      .writeStream.format("memory").queryName("late_day").outputMode("append").start()
    try {
      in.addData(PageView("m1", None, ts(day + 100)))       // day 2: uu=1, state=day2
      q.processAllAvailable()
      in.addData(PageView("m1", Some("p"), ts(3600)))       // LATE day-1, within watermark:
      q.processAllAvailable()                               //   day1 != day2 -> uu=1, state rewinds to day1
      in.addData(PageView("m1", Some("p"), ts(day + 200)))  // day 2 again: != day1 -> uu=1 AGAIN
      q.processAllAvailable()
      val m1 = spark.table("late_day").filter($"mid" === "m1" && $"is_first")
        .select($"day").as[String].collect().toSeq
      assert(m1 == Seq("1970-01-02", "1970-01-01", "1970-01-02"),
        s"single last-date state double-flags the post-rewind day (delta vs batch twins q57-q59); got $m1")
    } finally q.stop()
  }
}
