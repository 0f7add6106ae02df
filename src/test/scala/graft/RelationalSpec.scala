package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(s)
    // Orderly shutdown (round-10: the driver's round-9 `sbt test` run
    // died with "Task … rejected from ThreadPoolExecutor[Terminated]" —
    // a job still in flight when JVM exit began stopping the executor
    // pool). Spark registers its shutdown chain with Hadoop's manager at
    // priority 40; this hook runs FIRST (priority 100), drains active
    // jobs (bounded), cancels stragglers, and stops the context
    // ourselves, so Spark's own hooks find it already closed instead of
    // racing a live stage.
    org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      new Runnable {
        def run(): Unit = try {
          val sc = s.sparkContext
          if (!sc.isStopped) {
            val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
            while (sc.statusTracker.getActiveJobIds().nonEmpty &&
                   System.nanoTime() < deadline) Thread.sleep(50)
            sc.cancelAllJobs()
            s.stop()
          }
        } catch { case _: Throwable => () }
      }, 100)
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("latestByKey keeps exactly one row per key, the max-order one") {
    val df = Seq(
      ("a", 1L, "x"), ("a", 3L, "y"), ("a", 2L, "z"),
      ("b", 9L, "p")).toDF("k", "seq", "v")
    val got = Relational.latestByKey(df, Seq("k"), Seq(col("seq")))
      .orderBy("k").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("a", 3L, "y"), ("b", 9L, "p")))
  }

  test("asOfJoin: greatest rightTs <= leftTs per key; equal ts visible; no-prior null") {
    val left = Seq(("u1", 100L, "p1"), ("u1", 205L, "p2"), ("u2", 50L, "p3"))
      .toDF("k", "lts", "pid")
    val right = Seq(("u1", 100L, "v100"), ("u1", 200L, "v200"), ("u1", 300L, "v300"))
      .toDF("k", "rts", "vid")
    val got = Relational.asOfJoin(left, right, Seq("k"), "lts", "rts", Seq("vid"))
      .select($"pid", $"vid").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got == Set(
      ("p1", Some("v100")), // equal ts -> visible
      ("p2", Some("v200")), // greatest <= 205
      ("p3", None)))        // u2 has no right rows
  }

  test("asOfJoin: NULL carried value stays NULL — not back-filled from an older row") {
    // the as-of row at rts=200 has vid NULL; per-column LOCF would leak
    // v100 from rts=100 into it, mixing two right rows in one output row
    val left = Seq(("u1", 205L, "p2")).toDF("k", "lts", "pid")
    val right = Seq(
      ("u1", 100L, Some("v100"), Some(1L)),
      ("u1", 200L, None, Some(2L)))
      .toDF("k", "rts", "vid", "seq")
    val got = Relational.asOfJoin(left, right, Seq("k"), "lts", "rts", Seq("vid", "seq"))
      .select($"pid", $"vid", $"seq").collect().head
    assert(got.getString(0) == "p2")
    assert(got.isNullAt(1), "vid must be NULL from the rts=200 row, not v100 from rts=100")
    assert(got.getLong(2) == 2L)
  }

  test("topKPerGroup returns k rows per group in rank order") {
    val df = Seq(("g", 5), ("g", 3), ("g", 9), ("g", 1), ("h", 2)).toDF("g", "x")
    val got = Relational.topKPerGroup(df, Seq("g"), Seq(col("x").desc), 2)
      .orderBy("g", "rank").collect()
    assert(got.map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq(("g", 9, 1), ("g", 5, 2), ("h", 2, 1)))
  }

  test("sessionize splits on gaps > gapSeconds") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(plusSec: Long) = new java.sql.Timestamp(base.getTime + plusSec * 1000)
    val df = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(100)),          // session 1
      (1L, 3L, ts(4000)),                          // session 2 (gap > 1800)
      (2L, 4L, ts(0))).toDF("user_id", "event_id", "ts")
    val got = Relational.sessionize(df, "user_id", "ts", "event_id", 1800)
      .select("user_id", "event_id", "session_id")
      .orderBy("user_id", "event_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("temporalJoin: containing version wins; gaps, pre-history, unknown keys, open versions") {
    import spark.implicits._
    val dim = Seq(
      ("a", 10L, Some(20L), "s1", 1L),
      ("a", 20L, Some(30L), "s2", 2L), // closed — then a GAP until 40
      ("a", 40L, None, "s3", 3L))      // open
      .toDF("k", "valid_from", "valid_to", "attr", "version")
    val facts = Seq(
      ("a", 1L, 15L),  // inside v1
      ("a", 2L, 20L),  // boundary: valid_from inclusive -> v2
      ("a", 3L, 35L),  // in the gap -> NULL payload
      ("a", 4L, 5L),   // before any history -> NULL
      ("a", 5L, 100L), // open version
      ("b", 6L, 50L))  // unknown key -> NULL
      .toDF("k", "fid", "fts")
    val got = Relational.temporalJoin(facts, dim, Seq("k"), "fts",
        "valid_from", "valid_to", Seq("attr", "version"))
      .select($"fid", $"attr", $"version")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(got == Set(
      (1L, Some("s1"), Some(1L)),
      (2L, Some("s2"), Some(2L)),
      (3L, None, None),
      (4L, None, None),
      (5L, Some("s3"), Some(3L)),
      (6L, None, None)), s"got $got")
  }

  test("bandedIntervalJoin equals the naive range join on the events fixture") {
    import spark.implicits._
    val ev = graft.core.Tables.load(spark, TestSession.sf, "events")
    val l = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("lid"), col("ts").as("lts"))
    val r = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("rid"), col("ts").as("rts"))
    for ((lo, up) <- Seq((0L, 30000000L), (-5000000L, 5000000L), (1L, 1L))) {
      val got = Relational.bandedIntervalJoin(l, r, "lts", "rts", lo, up)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val lag = unix_micros(col("rts")) - unix_micros(col("lts"))
      val want = l.crossJoin(r)
        .filter(lag >= lo && lag <= up)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      assert(got == want, s"[$lo,$up]: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("bandedIntervalJoin: boundary lags are microsecond-exact; plan has no cartesian") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000) // whole-ms fixtures
    val l = Seq((1L, t(1000000))).toDF("lid", "lts")
    val r = Seq(
      (10L, t(1000000 + 60000000)),  // lag exactly upper — kept
      (11L, t(1000000 + 60001000)),  // 1 ms past — dropped
      (12L, t(1000000)),             // lag 0 = lower — kept
      (13L, t(0))                    // negative lag — dropped
    ).toDF("rid", "rts")
    val j = Relational.bandedIntervalJoin(l, r, "lts", "rts", 0L, 60000000L)
    assert(j.select($"rid").as[Long].collect().toSet == Set(10L, 12L))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "the banding must keep the range join an equi-join:\n" + plan.take(800))
  }

  test("bandedIntervalJoinAuto: bursty hot band engages the salted fallback with identical output") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000) // whole-ms fixtures
    // band width = 1 s; one band carries a 500-row burst on each side
    // (the rate × width blowout the prose fallback described), the rest
    // is sparse — ceiling 100 forces salting of the hotter side
    val lo = 0L; val up = 1000000L
    val burstL = (0 until 500).map(i => (i.toLong, t(5000000L + i * 1000)))
    val sparseL = (0 until 20).map(i => (1000L + i, t(20000000L + i * 3000000L)))
    val burstR = (0 until 500).map(i => (i.toLong, t(5200000L + i * 1000)))
    val sparseR = (0 until 20).map(i => (2000L + i, t(21000000L + i * 3000000L)))
    val l = (burstL ++ sparseL).toDF("lid", "lts")
    val r = (burstR ++ sparseR).toDF("rid", "rts")
    val auto = Relational.bandedIntervalJoinAuto(l, r, "lts", "rts", lo, up,
      bandRowsCeiling = 100, maxSaltBuckets = 8)
    // fallback actually engaged: the salted plan joins on (band, salt)
    val plan = auto.queryExecution.analyzed.toString
    assert(plan.contains("__salt"),
      "hot-band fixture must route through the salted fallback:\n" + plan.take(600))
    val got = auto.select($"lid", $"rid").as[(Long, Long)].collect()
    val gotSet = got.toSet
    assert(got.length == gotSet.size, "salting must not duplicate pairs")
    val want = Relational.bandedIntervalJoin(l, r, "lts", "rts", lo, up)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(gotSet == want,
      s"missing=${(want -- gotSet).take(5)} extra=${(gotSet -- want).take(5)}")
    // cool inputs take the plain plan (no salt columns anywhere)
    val cool = Relational.bandedIntervalJoinAuto(
      sparseL.toDF("lid", "lts"), sparseR.toDF("rid", "rts"),
      "lts", "rts", lo, up, bandRowsCeiling = 100)
    assert(!cool.queryExecution.analyzed.toString.contains("__salt"))
  }

  test("q150 actually engages the salted fallback on the events fixture (not a plain-path alias of q140)") {
    // the oracle equality alone can't tell which path ran — pin that the
    // harness ceiling (8) really is below this data's band occupancy, so
    // the driver's q150 row exercises the salted plan
    val df = SparkEntry.queries("q150_banded_salted")(spark, TestSession.sf)
    assert(df.queryExecution.analyzed.toString.contains("__salt"),
      "q150 must route through the salted fallback at the spec SF")
  }

  test("transitions emits (prev,next) pairs skipping first event per key") {
    val df = Seq((1, 1L, "a"), (1, 2L, "b"), (1, 3L, "b"), (2, 4L, "c"))
      .toDF("k", "seq", "st")
    val got = Relational.transitions(df, "k", "seq", "st")
      .select("k", "prev_state", "st").orderBy("k", "st").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1, "a", "b"), (1, "b", "b")))
  }

  test("all registered queries run at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSession.sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("broadcast hints survive into the physical plan for the dict join") {
    val plan = Queries.q11_join_dict(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
