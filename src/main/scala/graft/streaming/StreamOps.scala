package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators re-expressing the reference's keyed-state semantics
  * on Structured Streaming (SURVEY.md §2.6 A5, §2.7 D1, §2.9 T1-T6).
  *
  * Each op works identically under `readStream` (micro-batch, keyed state
  * in the state store, watermark-driven timeouts) and is spec-tested with
  * `MemoryStream`. Batch analogues of the same semantics live in
  * `operators.Relational` and are oracle-verified; these are the
  * incremental forms.
  *
  * Scale notes: every stateful op shuffles once on its key; state size is
  * O(active keys) with watermark/timeout-driven eviction — the reference's
  * unbounded-join-state defect (SURVEY.md §7.4-2) is deliberately not
  * reproduced.
  */
// Serializable: the stateful-op closures call helpers on this (stateless)
// module, and depending on the exact call shape the compiled lambda can
// capture the module instance — which then rides along in the serialized
// task closure.
object StreamOps extends Serializable {

  /** A page-view event for the jump (bounce) detector and UV flagger.
    * `lastPageId == None` marks a session entry (reference predicate,
    * …/app/dwd/log/DwdTrafficUserJumpDetail.java:107-118).
    */
  case class PageView(mid: String, lastPageId: Option[String], ts: java.sql.Timestamp)

  /** Watermarked 10 s tumbling aggregation (A1/A2/T1/T2): the canonical
    * DWS shape — `withWatermark` bounds state; late rows beyond the delay
    * are dropped (reference allowedLateness ≈ a larger delay).
    */
  def tumblingCounts(events: DataFrame, tsCol: String, delay: String,
                     windowLen: String, keys: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen) +: keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("stt") +: col("window.end").as("edt")
        +: keys.map(col) :+ col("cnt"): _*)

  /** A2/A4 generalization: watermarked tumbling window summing the given
    * measure columns (outName per measure) plus a `pv_ct` row count —
    * the multi-measure DWS bean shape (stt/edt window bounds + sums).
    */
  def tumblingSums(events: DataFrame, tsCol: String, delay: String,
                   windowLen: String, keys: Seq[String],
                   sums: Map[String, String]): DataFrame = {
    val aggs = sums.toSeq.map { case (in, out) => sum(col(in)).as(out) } :+
      count(lit(1)).as("pv_ct")
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("stt") +: col("window.end").as("edt")
        +: keys.map(col) ++: (sums.values.toSeq :+ "pv_ct").map(col): _*)
  }

  /** D1 dedup, any-row-suffices form: first row per key wins within the
    * watermark horizon (`dropDuplicates` keyed state, evicted by
    * watermark). The exact latest-row-wins form is `latestByKeyStream`.
    */
  def dedupAnyRow(events: DataFrame, tsCol: String, delay: String,
                  keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Epoch millis of the first instant AFTER `isoDate` in `zone` — the
    * eviction point for daily-flag state: once the watermark passes it, any
    * event dated `isoDate` is dropped as late before reaching the operator,
    * so forgetting the key is semantically free (re-emits the flag on the
    * NEXT date, which is what a fresh key does anyway).
    */
  private[graft] def endOfDayMs(isoDate: String, zone: java.time.ZoneId): Long =
    java.time.LocalDate.parse(isoDate).plusDays(1).atStartOfDay(zone)
      .toInstant.toEpochMilli

  /** ISO day bucket of an epoch-millis instant under an explicit zone —
    * the one day-bucketing rule every daily-state operator in this file
    * shares (the reference hardcodes GMT+8, …/utils/DateFormatUtil.java:19;
    * the zone parameter is SURVEY.md §7.4-6's fix).
    */
  private[graft] def localDay(tsMs: Long, zone: java.time.ZoneId): String =
    java.time.Instant.ofEpochMilli(tsMs).atZone(zone).toLocalDate.toString

  /** Set an eviction timeout of at least `atMs`, clamped above the current
    * watermark: in a multi-stateful-op chain, upstream operators (dedup
    * flushes, window finalizations) legitimately emit rows whose event time
    * is behind the already-advanced global watermark, so end-of-day of such
    * a row's date can be in the "past" — Spark rejects a timeout ≤ the
    * watermark. Clamping to watermark+1 only ever DELAYS eviction (to the
    * next micro-batch), never mis-flags. In batch runs there is no
    * watermark (and no timeout firing); the raw timestamp is recorded as a
    * no-op.
    */
  private[graft] def setEvictionAt(state: GroupState[_], atMs: Long): Unit = {
    val wm = try state.getCurrentWatermarkMs() catch {
      case _: UnsupportedOperationException => Long.MinValue // batch: no watermark
    }
    state.setTimeoutTimestamp(math.max(atMs, wm + 1))
  }

  /** A5: per-key daily-distinct flagger. Emits every row with `isFirst`
    * set when the key's last-seen date differs — downstream windowed sums
    * of the 0/1 flag compute UV/new-user counts exactly like the
    * reference's ValueState<lastVisitDate> pattern
    * (…/app/dwd/log/DwdTrafficUniqueVisitorDetail.java:86-116).
    *
    * State: one date string per ACTIVE key — `EventTimeTimeout` evicts at
    * end-of-day(lastDate), the reference's own 1-day TTL
    * (…/app/dwd/log/DwdTrafficUniqueVisitorDetail.java:94-99). Eviction is
    * exact, not approximate: `EventTimeTimeout` also switches on the
    * operator's late-row filter, so an event dated `lastDate` can never
    * arrive after the state for `lastDate` is gone, and a post-eviction
    * event is on a new date by construction — uu=1 either way. State is
    * O(keys active today), not O(keys ever).
    */
  def dailyDistinctFlags(spark: SparkSession, views: Dataset[PageView],
                         zone: java.time.ZoneId = java.time.ZoneOffset.UTC,
                         delay: String = "10 seconds")
      : Dataset[(String, String, Boolean)] = {
    import spark.implicits._
    withEventTime(views, "ts", delay).groupByKey(_.mid)
      .flatMapGroupsWithState[String, (String, String, Boolean)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (mid, events, state: GroupState[String]) =>
          if (state.hasTimedOut) {
            state.remove() // idle ≥ 1 day: next event is on a new date
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer[(String, String, Boolean)]()
            var lastDate = state.getOption.getOrElse("")
            events.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val d = localDay(e.ts.getTime, zone)
              out += ((mid, d, d != lastDate))
              if (d != lastDate) lastDate = d
            }
            state.update(lastDate)
            setEvictionAt(state, endOfDayMs(lastDate, zone))
            out.iterator
          }
      }
  }

  /** Declare the watermark unless the column already carries one (inputs
    * routed through another streaming stage keep their source-leaf tag, and
    * re-declaring above a stateful op is rejected) or the run is batch.
    */
  private[graft] def withEventTime[T](ds: Dataset[T], tsCol: String,
                                      delay: String): Dataset[T] =
    if (!ds.isStreaming) ds
    else if (ds.schema(tsCol).metadata.contains("spark.watermarkDelayMs")) ds
    else ds.withWatermark(tsCol, delay)

  /** D1 exact form: latest-row-wins per key, flushed when the event-time
    * watermark passes firstSeen + `flushDelayMs` (the reference uses a 5 s
    * processing-time timer, …/app/dws/DwsTradeOrderWindow.java:122-164;
    * event-time makes it deterministic and replayable).
    * Rows: (key, orderTs, payload); highest (orderTs, payload) wins — the
    * payload is the tie-breaker, making the ordering total so replays and
    * differing batch arrival orders keep the same row (the batch twin
    * `latestByKey` documents the same totality requirement).
    */
  def latestByKeyStream(spark: SparkSession,
                        rows: Dataset[(String, Long, String)],
                        wmCol: String, delay: String,
                        flushDelayMs: Long): Dataset[(String, Long, String)] = {
    import spark.implicits._
    rows.toDF("key", "ord", "payload")
      .withColumn("eventTime", timestamp_millis(col("ord")))
      .withWatermark("eventTime", delay)
      .as[(String, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String, Long), (String, Long, String)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, events, state: GroupState[(Long, String, Long)]) =>
          if (state.hasTimedOut) {
            val (ord, payload, _) = state.get
            state.remove()
            Iterator.single((key, ord, payload))
          } else {
            val best0 = state.getOption
            val evs = events.toSeq
            val bestNew = evs.maxBy(e => (e._2, e._3))
            val best = best0 match {
              case Some((o, p, flushAt)) =>
                if (Ordering[(Long, String)].gt((bestNew._2, bestNew._3), (o, p)))
                  (bestNew._2, bestNew._3, flushAt)
                else (o, p, flushAt)
              case None =>
                (bestNew._2, bestNew._3, evs.map(_._2).min + flushDelayMs)
            }
            state.update(best)
            // flushAt is PERSISTED from the key's first batch; by the time
            // new data arrives the watermark may already have passed it
            // (the timeout fires on the NEXT batch, not before the data
            // path) — an unclamped set would throw and kill the query.
            setEvictionAt(state, best._3)
            Iterator.empty
          }
      }
  }

  /** A5 variant — is_new repair (…/app/dwd/log/BaseLogApp.java:112-149):
    * devices claiming `is_new=1` are corrected to "0" when keyed state
    * proves an earlier visit date; devices first seen with `is_new=0` get
    * state primed to "yesterday" so later days stay 0. Emits every event
    * with the repaired flag.
    *
    * State (one first-visit date per device) is bounded by `retention`:
    * a device idle longer is evicted via `EventTimeTimeout`, after which a
    * stale `is_new=1` claim would be re-confirmed — the accepted trade for
    * O(devices active within retention) instead of O(devices ever) state.
    * `firstSeen` re-primes evicted devices from a (mid, firstDate)
    * bootstrap dim table (the periodic state-compaction pattern); with it,
    * correctness holds for every device the compaction has seen.
    */
  def repairIsNew(spark: SparkSession,
                  views: Dataset[(String, String, java.sql.Timestamp)],
                  zone: java.time.ZoneId = java.time.ZoneOffset.UTC,
                  retention: java.time.Duration = java.time.Duration.ofDays(30),
                  firstSeen: Option[Dataset[(String, String)]] = None,
                  delay: String = "10 seconds")
      : Dataset[(String, String, java.sql.Timestamp)] = {
    import spark.implicits._
    def day(ts: java.sql.Timestamp) =
      java.time.LocalDate.parse(localDay(ts.getTime, zone))
    val func = (mid: String, events: Iterator[(String, String, java.sql.Timestamp)],
                state: GroupState[String]) =>
      if (state.hasTimedOut) {
        state.remove() // idle > retention; firstSeen bootstrap re-primes
        Iterator.empty
      } else if (events.isEmpty) {
        // initial-state-only invocation (bootstrap key, no data yet):
        // schedule NO timeout — epoch+retention would be a past timestamp
        // and evict the priming immediately; bootstrap entries persist
        // until the device produces data (bootstrap-table-size bound)
        Iterator.empty
      } else {
        var firstDate = state.getOption.getOrElse("")
        var lastMs = 0L
        val out = events.toSeq.sortBy(_._3.getTime).map { case (m, isNew, ts) =>
          lastMs = math.max(lastMs, ts.getTime)
          val d = day(ts).toString
          val repaired =
            if (isNew == "1") {
              if (firstDate.isEmpty) { firstDate = d; "1" }
              else if (firstDate == d) "1"
              else "0" // seen on an earlier date: not actually new
            } else {
              if (firstDate.isEmpty) firstDate = day(ts).minusDays(1).toString
              "0"
            }
          (m, repaired, ts)
        }
        state.update(firstDate)
        setEvictionAt(state, lastMs + retention.toMillis)
        out.iterator
      }
    val grouped = withEventTime(views, "_3", delay).groupByKey(_._1)
    firstSeen match {
      case Some(fs) =>
        grouped.flatMapGroupsWithState[String, (String, String, java.sql.Timestamp)](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout(),
          fs.groupByKey(_._1).mapValues(_._2))(func)
      case None =>
        grouped.flatMapGroupsWithState[String, (String, String, java.sql.Timestamp)](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(func)
    }
  }

  /** Streaming per-key daily admission cap — the incremental twin of the
    * per-domain cap (q79 / `CorpusPipeline.packageStage`). A stream cannot
    * rank rows it has not seen, so the streaming semantics are first-k
    * ADMITTED per (key, event-time day) in arrival order; the periodic
    * batch recap (q79's quality-ranked WindowGroupLimit) refines the pick
    * — the standard lambda split, same as the dedup stages.
    *
    * Rows: (key, id, ts). Emits admitted rows only. State is a per-date
    * count map per active key — ALL dates still inside the watermark
    * horizon, not just the latest: a within-watermark late event for
    * yesterday must see yesterday's count (a single (date, count) pair
    * would reset on every boundary-crossing event and over-admit). Dates
    * whose end-of-day the watermark has passed can receive no more events
    * and are pruned each invocation; the whole key evicts at
    * end-of-day(max date) via `EventTimeTimeout`. State is O(keys active
    * today × days spanned by the watermark delay), and eviction is
    * semantically free: a post-eviction event is on a new date by
    * construction, which starts a fresh count anyway.
    */
  def admissionCap(spark: SparkSession,
                   rows: Dataset[(String, Long, java.sql.Timestamp)], k: Int,
                   zone: java.time.ZoneId = java.time.ZoneOffset.UTC,
                   delay: String = "10 seconds")
      : Dataset[(String, Long, java.sql.Timestamp)] = {
    import spark.implicits._
    require(k >= 1, s"admission cap must be >= 1, got $k")
    withEventTime(rows, "_3", delay).groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Int], (String, Long, java.sql.Timestamp)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, events, state: GroupState[Map[String, Int]]) =>
          if (state.hasTimedOut) {
            state.remove() // idle ≥ 1 day: next event starts a fresh count
            Iterator.empty
          } else {
            val wm = try state.getCurrentWatermarkMs() catch {
              case _: UnsupportedOperationException => Long.MinValue
            }
            var counts = state.getOption.getOrElse(Map.empty[String, Int])
              .filter { case (d, _) => endOfDayMs(d, zone) > wm } // closed days
            val out = scala.collection.mutable.ArrayBuffer[(String, Long, java.sql.Timestamp)]()
            events.toSeq.sortBy(e => (e._3.getTime, e._2)).foreach { e =>
              val d = localDay(e._3.getTime, zone)
              val c = counts.getOrElse(d, 0)
              if (c < k) { out += e; counts = counts.updated(d, c + 1) }
            }
            state.update(counts)
            setEvictionAt(state, endOfDayMs(counts.keys.max, zone))
            out.iterator
          }
      }
  }

  /** Streaming continuation of cross-document block packing
    * (CurationQueries.blockPack / q107): each shard keeps ONE long of
    * state — its cumulative packed length (tokens + EOS of everything
    * packed so far) — and every micro-batch appends its docs at the
    * persisted cursor. Emits q107's row shape (doc_id, shard, n_tok,
    * off, blk_first, blk_last); offsets are gapless per shard ACROSS
    * batches, so a one-batch stream reproduces the batch pack exactly
    * and later batches extend shards without repacking — the batch form
    * re-sorts the whole corpus, this is the append-only form a
    * continuous admission stream feeds.
    *
    * In-batch order is q107's (h, doc_id); cross-batch order is arrival
    * order — the streaming analogue of the dedup stages'
    * first-arrival-wins (the periodic batch recap re-packs globally when
    * byte-identical layout matters). State is O(#shards) longs — the
    * smallest keyed state in the engine; NoTimeout, because the cursor
    * IS the pack layout's tail position and must survive idle gaps.
    */
  def streamingBlockPack(spark: SparkSession, docs: DataFrame,
                         shards: Int, blockSize: Int,
                         idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions.{polyHash, tokens}
    require(shards >= 1 && blockSize >= 1,
      s"need shards >= 1 and blockSize >= 1, got $shards/$blockSize")
    docs.select(
        col(idCol).cast("long").as("doc_id"),
        polyHash(concat(lit("s42|"), col(idCol).cast("string"))).as("h"),
        size(tokens(col(textCol))).cast("long").as("n_tok"))
      .withColumn("shard", pmod(col("h"), lit(shards)))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._4)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard, events, state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = events.toSeq.sortBy(e => (e._2, e._1)).map { e =>
            val o = off
            off += e._3 + 1
            (e._1, shard, e._3, o, o / blockSize, (o + e._3) / blockSize)
          }
          state.update(off)
          out.iterator
      }
      .toDF("doc_id", "shard", "n_tok", "off", "blk_first", "blk_last")
  }

  /** T6 CEP jump-out (bounce) detection. Pattern over each mid's
    * event-time-ordered page views: a session-entry view (lastPageId null)
    * is a bounce if the NEXT view is also a session entry, or if no view
    * arrives within `gapMs`. Match and timeout both emit — the reference
    * unions the CEP match stream with the timeout side-output
    * (…/app/dwd/log/DwdTrafficUserJumpDetail.java:104-155); here one
    * state machine emits both cases.
    *
    * COMPOSITION constraint (measured, TimeoutClampSpec round 6): feed
    * this from SOURCE-watermarked inputs, not from the output of a
    * flush-style stateful op (latestByKeyStream etc.). Such upstream
    * flushes only emit AFTER the global watermark passed their horizon,
    * so every flushed row arrives behind this op's own late filter and
    * is silently dropped — Spark's global-watermark correctness check
    * flags exactly this topology. The BaseLog family splits the raw
    * source and watermarks each branch independently, which is the
    * supported shape.
    */
  def jumpDetect(spark: SparkSession, views: Dataset[PageView],
                 delay: String, gapMs: Long): Dataset[PageView] = {
    import spark.implicits._
    views
      .withWatermark("ts", delay)
      .groupByKey(_.mid)
      .flatMapGroupsWithState[PageView, PageView](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (mid, events, state: GroupState[PageView]) =>
          if (state.hasTimedOut) {
            val buffered = state.get
            state.remove()
            Iterator.single(buffered)
          } else {
            val out = scala.collection.mutable.ArrayBuffer[PageView]()
            var buffered = state.getOption
            events.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val isEntry = e.lastPageId.isEmpty
              buffered match {
                case Some(b) =>
                  if (e.ts.getTime - b.ts.getTime > gapMs) out += b // late flush
                  else if (isEntry) out += b                        // entry→entry: bounce
                  buffered = if (isEntry) Some(e) else None
                case None =>
                  buffered = if (isEntry) Some(e) else None
              }
            }
            buffered match {
              case Some(b) =>
                state.update(b)
                // clamped like every other timeout site: Spark filters late
                // rows against the PREVIOUS batch's watermark but validates
                // timeouts against the CURRENT one (late-events vs eviction
                // split), so an entry arriving in the batch right after a
                // large watermark jump passes the filter while ts + gap sits
                // behind the eviction watermark — a raw set threw "timeout
                // cannot be earlier than watermark" and killed the query
                // (TimeoutClampSpec's jumpDetect case reproduces it)
                setEvictionAt(state, b.ts.getTime + gapMs)
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
      }
  }

  /** Keyed state for [[funnelStream]]: buffered events inside the reorder
    * horizon, the step index reached so far, and the completion time of
    * the last reached step.
    */
  case class FunnelState(buf: List[(Long, String)], step: Int, lastT: Long,
                         flushAt: Long)

  /** Incremental ordered-funnel tracking — the streaming twin of the q120
    * batch funnel: per user, advance through `steps` IN ORDER (each step
    * strictly after the previous one's completion) and emit
    * (key, step_index_1based, step_name, ord) the moment a step is
    * reached. A dashboard consumes the emissions as they happen instead
    * of waiting for the nightly recap.
    *
    * Same out-of-order discipline as [[scd2Stream]]: events buffer in
    * state until the watermark passes them, then apply in `ord` order —
    * so a click that ARRIVES after the purchase but HAPPENED before it
    * still advances the funnel correctly. State per key = O(horizon
    * events) + two scalars; a key whose funnel completes drops its state
    * immediately (nothing further can emit), others evict at the
    * `flushDelayMs` quiet-period timeout.
    *
    * Semantics note (matches q120's min-ts chaining): only the FIRST
    * qualifying completion of each step advances — later repeats of an
    * earlier step are ignored.
    */
  def funnelStream(spark: SparkSession,
                   rows: Dataset[(String, Long, String)],
                   steps: Seq[String], delay: String, flushDelayMs: Long)
      : Dataset[(String, Int, String, Long)] = {
    import spark.implicits._
    require(steps.nonEmpty, "funnelStream: steps must be non-empty")

    def advance(key: String, st: FunnelState, matured: Seq[(Long, String)])
        : (FunnelState, List[(String, Int, String, Long)]) =
      matured.sortBy(_._1).foldLeft((st, List.empty[(String, Int, String, Long)])) {
        case ((s, out), (ord, typ)) =>
          if (s.step < steps.length && typ == steps(s.step) &&
              (s.step == 0 || ord > s.lastT)) {
            val reached = s.step + 1
            (s.copy(step = reached, lastT = ord),
              out :+ ((key, reached, typ, ord)))
          } else (s, out)
      }

    rows.toDF("key", "ord", "typ")
      .withColumn("eventTime", timestamp_millis(col("ord")))
      .withWatermark("eventTime", delay)
      .as[(String, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, (String, Int, String, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, events, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val (_, out) = advance(key, st.copy(buf = Nil), st.buf)
            state.remove()
            out.iterator
          } else {
            val st0 = state.getOption.getOrElse(
              FunnelState(Nil, 0, Long.MinValue, Long.MinValue))
            val incoming = events.map(e => (e._2, e._3)).toList
            val flushAt =
              if (st0.flushAt != Long.MinValue) st0.flushAt
              else incoming.map(_._1).min + flushDelayMs
            val wm = state.getCurrentWatermarkMs()
            val (matured, pending) = (st0.buf ++ incoming).partition(_._1 <= wm)
            val (st1, out) = advance(key, st0.copy(buf = pending), matured)
            if (st1.step == steps.length && st1.buf.isEmpty) state.remove()
            else {
              state.update(st1.copy(flushAt = flushAt))
              // clamped: flushAt persists across batches and can be behind
              // an already-advanced watermark when new data arrives first
              setEvictionAt(state, flushAt)
            }
            out.iterator
          }
      }
  }

  /** Keyed state for [[scd2Stream]]: events still inside the reorder
    * horizon, the open version, and the next version number.
    */
  case class Scd2State(buf: List[(Long, String)],
                       open: Option[(Long, String)],
                       version: Long, flushAt: Long)

  /** Incremental SCD Type-2 — the streaming form of
    * [[graft.operators.Relational.scd2]]: a CDC change stream becomes
    * versioned validity intervals AS THE VERSIONS CLOSE, instead of a
    * nightly batch rebuild.
    *
    * Out-of-order safety: events buffer in state until the watermark
    * passes them, then apply in `ord` order — so a late-but-inside-the-
    * horizon change lands in the right interval (the batch operator gets
    * this for free from its sort; a naive apply-on-arrival stream form
    * would mis-chain). State per key = O(events inside the watermark
    * horizon) + the open version; matured events leave on every
    * invocation. Closed versions emit incrementally (is_current=0); the
    * still-open version emits once at the `flushDelayMs` quiet-period
    * timeout with valid_to=None, is_current=1 — [[latestByKeyStream]]'s
    * flush convention.
    *
    * Emits (key, attr, valid_from, valid_to, version, is_current).
    */
  def scd2Stream(spark: SparkSession,
                 rows: Dataset[(String, Long, String)],
                 delay: String, flushDelayMs: Long)
      : Dataset[(String, String, Long, Option[Long], Long, Int)] = {
    import spark.implicits._

    // apply matured (ord, attr) changes in order; returns closed emissions
    def advance(key: String, st: Scd2State, matured: Seq[(Long, String)])
        : (Scd2State, List[(String, String, Long, Option[Long], Long, Int)]) =
      matured.sortBy(_._1).foldLeft((st, List.empty[(String, String, Long, Option[Long], Long, Int)])) {
        case ((s, out), (ord, attr)) =>
          s.open match {
            case None =>
              (s.copy(open = Some((ord, attr))), out)
            case Some((_, a)) if a == attr => (s, out) // consecutive dup folds
            case Some((from, a)) =>
              val closed = (key, a, from, Some(ord), s.version, 0)
              (s.copy(open = Some((ord, attr)), version = s.version + 1),
                out :+ closed)
          }
      }

    rows.toDF("key", "ord", "attr")
      .withColumn("eventTime", timestamp_millis(col("ord")))
      .withWatermark("eventTime", delay)
      .as[(String, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Scd2State, (String, String, Long, Option[Long], Long, Int)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, events, state: GroupState[Scd2State]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val (fin, closed) = advance(key, st.copy(buf = Nil), st.buf)
            state.remove()
            val open = fin.open.map { case (from, a) =>
              (key, a, from, Option.empty[Long], fin.version, 1)
            }
            (closed ++ open).iterator
          } else {
            val st0 = state.getOption.getOrElse {
              Scd2State(Nil, None, 1L, Long.MinValue)
            }
            val incoming = events.map(e => (e._2, e._3)).toList
            val flushAt =
              if (st0.flushAt != Long.MinValue) st0.flushAt
              else incoming.map(_._1).min + flushDelayMs
            val wm = state.getCurrentWatermarkMs()
            val (matured, pending) =
              (st0.buf ++ incoming).partition(_._1 <= wm)
            val (st1, closed) = advance(key, st0.copy(buf = pending), matured)
            state.update(st1.copy(flushAt = flushAt))
            // clamped: same persisted-flushAt hazard as funnelStream
            setEvictionAt(state, flushAt)
            closed.iterator
          }
      }
  }
}
