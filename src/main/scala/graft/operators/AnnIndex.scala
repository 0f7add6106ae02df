package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index lifecycle (the IVFADC layout of Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
  * coarse inverted lists + per-list PQ codes, here as centroid-partitioned
  * parquet) — the missing piece between "trains
  * and queries in-session" (q61/q113/q149) and a real serving pipeline,
  * which builds the index ONCE, probes it tomorrow, and appends new
  * vectors without retraining:
  *
  *  - `<dir>/model`: the two model arrays as plain parquet rows
  *    (kind, dim_param, vals) — "coarse" carries (dims, k·dims centroid
  *    doubles), "pq" carries (subDims, m·k·subDims codebook doubles).
  *    Parquet doubles round-trip EXACTLY, so a probe from the loaded
  *    model is bit-identical to one from the in-memory training (q160
  *    puts that claim under the driver's hash gate).
  *  - `<dir>/coded`: the coded corpus (idCol, codes) partitioned BY
  *    CENTROID — the posting-list layout: a probe of `nprobe` lists can
  *    prune its scan to those partitions, and per-row storage is the m
  *    PQ codes, not the dims·4-byte vector.
  *
  * Append composes [[Ivf.assign]] + [[Pq.assignCodes]] with the LOADED
  * models (assignment is a scan-local plan-literal pass, so appends never
  * shuffle or retrain) and writes new posting-list files alongside the
  * old — the standard incremental-index shape; periodic retraining when
  * the data distribution drifts is a full `write` again.
  *
  * Removal is tombstones, not rewrites: `<dir>/deletes` holds pending id
  * rows ([[deleteIds]] — the takedown path), probes anti-join the
  * pending set (request-sized, broadcast), and the next compact/rebuild
  * folds them into storage and clears the table — so a
  * right-to-be-forgotten request is effective at the NEXT PROBE and
  * durable at the next maintenance pass, never a full rebuild of its
  * own.
  */
object AnnIndex {

  /** Train-side artifacts written once (overwrite). `corpus` must carry
    * idCol + vecCol; models come from [[Ivf.train]] / [[Pq.train]] (or
    * their cached/sampled forms).
    */
  def write(corpus: DataFrame, idCol: String, vecCol: String,
            coarse: Array[Double], dims: Int,
            pq: Array[Double], subDims: Int, dir: String,
            leaseTakeoverMs: Long = 24L * 3600 * 1000): Unit = {
    require(dims >= 1 && subDims >= 1 && dims % subDims == 0,
      s"AnnIndex.write: dims=$dims must be a positive multiple of subDims=$subDims")
    require(coarse.length % dims == 0 && coarse.nonEmpty,
      s"AnnIndex.write: coarse length ${coarse.length} not a multiple of dims=$dims")
    val spark = corpus.sparkSession
    import spark.implicits._
    // a rebuild is a maintenance writer like compact: it must not
    // overwrite `coded` while a compact is mid-swap (or vice versa), so
    // it holds the same lease — released only while WE still own it (a
    // rebuild outliving the takeover window must not delete the lease a
    // taker-over now holds).
    val fs = fsOf(spark, dir)
    val lease = leasePath(dir)
    val token = acquireLease(fs, lease, leaseTakeoverMs, "write")
    val hb = startHeartbeat(fs, lease, token, leaseTakeoverMs)
    try {
      // a rebuild HONORS pending tombstones: a takedown filed against
      // the old index must not resurrect when the caller rebuilds from
      // an uncurated corpus (fold here, clear after the model lands)
      val del = deletesPath(dir)
      val source =
        if (fs.exists(del))
          corpus.join(
            broadcast(spark.read.parquet(del.toString).select(col("id").as("__del_id"))),
            col(idCol) === col("__del_id"), "left_anti")
        else corpus
      // drop the OLD model before touching coded: a crash mid-rebuild
      // then leaves an index that REFUSES to load (no model row — the
      // loadModel fail-loud), never one that silently decodes new codes
      // with old codebooks; the fix for either state is re-running the
      // build (mode-overwrite semantics)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/model"), true)
      codedFrame(source, idCol, vecCol, coarse, dims, pq, subDims)
        .write.mode("overwrite").partitionBy("centroid")
        .parquet(s"$dir/coded")
      // snapshot what THIS rebuild wrote, before any other scan runs:
      // the commit gate below re-lists against it
      val snapshot = dataFiles(fs, new org.apache.hadoop.fs.Path(s"$dir/coded"))
      // the TRAIN-TIME posting-list occupancy rides along in the model dir
      // (k doubles — model-sized): the reference distribution the drift
      // gate scores later appends against ([[driftScore]]); counted from
      // the written lists, so it is exactly what a probe would see
      val k = coarse.length / dims
      val hist = assignmentHistogram(spark, s"$dir/coded", k)
      // commit gates, before the model lands: a racing maintenance op
      // that took the lease over mid-rebuild aborts US here; and the
      // coded dir must hold ONLY this rebuild's output — an append whose
      // lease check passed just before we acquired writes rows coded
      // with the OLD codebooks, which the new model would silently
      // mis-decode (and pollute the train-time histogram). Aborting here
      // leaves the fail-loud no-model state; re-run the build.
      verifyLease(fs, lease, token, "write")
      val now = dataFiles(fs, new org.apache.hadoop.fs.Path(s"$dir/coded"))
      require(now == snapshot,
        s"AnnIndex.write: the coded dir changed during the rebuild " +
          s"(${(now -- snapshot).size} new / ${(snapshot -- now).size} " +
          s"gone files) — a concurrent append landed rows coded with the " +
          s"old codebooks; aborting before the model lands (the index " +
          s"refuses to load until the build is re-run)")
      Seq(("coarse", dims, coarse.toSeq), ("pq", subDims, pq.toSeq),
          ("hist", k, hist.toSeq))
        .toDF("kind", "dim_param", "vals")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
      // folded tombstones are served: clear them (idempotent — a crash
      // before this leaves no-op tombstones the next compact reaps)
      if (fs.exists(del)) fs.delete(del, true)
      ()
    } finally {
      stopHeartbeat(hb)
      releaseLeaseIfOurs(fs, lease, token)
    }
  }

  /** Re-stamp the lease's mtime every takeoverMs/4 while the owning op
    * computes, so a takeover means "the owner is DEAD", not "the owner
    * is slow": a corpus-sized compact/rebuild outliving the takeover
    * window on a slow store keeps its lease fresh for as long as the
    * process lives, while a crashed op stops beating and ages into
    * takeover exactly as before. `setTimes` touches metadata only — a
    * concurrent [[leaseToken]] read never sees a half-written file the
    * way a content rewrite could expose. Each beat re-verifies the
    * token first and stops silently on loss (the owner's own
    * [[verifyLease]] commit gate is the authoritative abort).
    */
  private def startHeartbeat(fs: org.apache.hadoop.fs.FileSystem,
                             lease: org.apache.hadoop.fs.Path,
                             token: String, takeoverMs: Long): Thread = {
    val period = math.max(takeoverMs / 4, 25L)
    val t = new Thread(() => {
      try {
        var ours = true
        while (ours) {
          Thread.sleep(period)
          ours =
            (try leaseToken(fs, lease) == token
             catch { case _: Exception => false }) &&
            (try { fs.setTimes(lease, System.currentTimeMillis(), -1); true }
             catch { case _: Exception => false })
        }
      } catch { case _: InterruptedException => () }
    }, s"ann-index-lease-heartbeat-${lease.hashCode}")
    t.setDaemon(true)
    t.start()
    t
  }

  private def stopHeartbeat(t: Thread): Unit = {
    t.interrupt()
    t.join(2000)
  }

  /** Delete the lease iff it still carries OUR token — never a lease
    * another maintenance op now owns.
    */
  private def releaseLeaseIfOurs(fs: org.apache.hadoop.fs.FileSystem,
                                 lease: org.apache.hadoop.fs.Path,
                                 token: String): Unit =
    if (fs.exists(lease) &&
        (try leaseToken(fs, lease) == token catch { case _: Exception => false })) {
      fs.delete(lease, false); ()
    }

  /** Per-centroid row counts of the written posting lists, as a dense
    * k-cell array (bounded: k doubles — the same model-sized driver
    * state as training).
    */
  private def assignmentHistogram(spark: SparkSession, codedDir: String,
                                  k: Int): Array[Double] = {
    val counts = spark.read.parquet(codedDir)
      .groupBy(col("centroid")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    Array.tabulate(k)(i => counts.getOrElse(i, 0L).toDouble)
  }

  /** Drift of the CURRENT posting-list occupancy against the train-time
    * histogram, as the population stability index (the q112 monitoring
    * arithmetic over centroid-assignment cells): PSI = Σ (q−p)·ln(q/p)
    * with the conventional 1e-6 floor on empty cells. The index contract
    * says "periodic retraining when the distribution drifts" — this is
    * the measurement that makes the retrain decision executable rather
    * than prose: appends drawn from the trained distribution land in
    * lists proportionally (PSI ≈ append noise), a shifted embedding
    * distribution piles into few lists (PSI jumps, and probe quality
    * degrades for exactly the same reason — the coarse quantizer no
    * longer tessellates the data). Conventional read: < 0.1 stable,
    * 0.1–0.2 moderate, > 0.2 retrain (`AnnIndexApp --mode stats`
    * surfaces it with the 0.2 default threshold).
    *
    * Cost: one (centroid → count) aggregate over the coded scan — k
    * cells after map-side partials; run it on the compact/stats cadence.
    * Fails loudly on an index written before histograms existed —
    * rebuild (`write`) to stamp one.
    */
  def driftScore(spark: SparkSession, dir: String): Double =
    driftStats(spark, dir)._3

  /** (rows, non-empty lists, drift PSI) from ONE coded aggregate — the
    * current occupancy histogram already carries all three, so the
    * stats/monitoring path ([[graft.apps.AnnIndexApp]] `--mode stats`)
    * never scans the index more than once. Counts reflect STORED rows:
    * tombstoned ids still count until the next compact folds them (the
    * drift signal cares about what the lists physically hold).
    */
  def driftStats(spark: SparkSession, dir: String): (Long, Long, Double) = {
    val rows = spark.read.parquet(s"$dir/model")
      .select(col("kind"), col("dim_param"), col("vals")).collect()
    val hist = rows.find(_.getString(0) == "hist").getOrElse(sys.error(
      s"AnnIndex.driftScore: no 'hist' row in $dir/model — the index " +
        s"predates drift tracking; rebuild with AnnIndex.write to stamp " +
        s"the train-time histogram"))
    val train = hist.getSeq[Double](2).toArray
    val cur = assignmentHistogram(spark, s"$dir/coded", train.length)
    (cur.sum.toLong, cur.count(_ > 0).toLong, psi(train, cur))
  }

  /** PSI between two same-length count histograms (reference, current). */
  private[graft] def psi(ref: Array[Double], cur: Array[Double]): Double = {
    require(ref.length == cur.length && ref.nonEmpty,
      s"AnnIndex.psi: histogram shapes differ (${ref.length} vs ${cur.length})")
    val (rs, cs) = (ref.sum, cur.sum)
    require(rs > 0 && cs > 0, "AnnIndex.psi: empty histogram")
    val eps = 1e-6
    ref.indices.iterator.map { i =>
      val p = math.max(ref(i) / rs, eps)
      val q = math.max(cur(i) / cs, eps)
      (q - p) * math.log(q / p)
    }.sum
  }

  /** Assign new vectors with the PERSISTED models and append their rows
    * to the posting lists — no retrain, no shuffle (both assignments are
    * plan-literal scan passes; partitioned append writes new files into
    * the touched lists' directories only).
    */
  def append(newVecs: DataFrame, idCol: String, vecCol: String,
             dir: String): Unit =
    appendWith(newVecs, idCol, vecCol,
      loadModel(newVecs.sparkSession, dir), dir)

  /** [[append]] with an ALREADY-LOADED model — the streaming appender's
    * form (load once, append every micro-batch; the model is immutable
    * between rebuilds by contract).
    *
    * Refuses while a compact holds the lease ([[compactCoded]]): an
    * append landing in the swap window writes into the directory the
    * compactor is about to move aside and delete — those rows would be
    * silently lost. The check makes the documented "appends pause for
    * the swap window" contract executable: a misconfigured concurrent
    * appender fails loudly instead of losing data, and the foreachBatch
    * retry re-runs the batch after the lease clears (at-least-once, the
    * sink's existing discipline).
    */
  def appendWith(newVecs: DataFrame, idCol: String, vecCol: String,
                 model: (Array[Double], Int, Array[Double], Int),
                 dir: String): Unit = {
    val (coarse, dims, pq, subDims) = model
    val spark = newVecs.sparkSession
    val fs = fsOf(spark, dir)
    require(!fs.exists(leasePath(dir)),
      s"AnnIndex.appendWith: a compact holds ${leasePath(dir)} — appends " +
        s"during the swap window are lost; retry after the compact " +
        s"completes (a crashed compact's stale lease is taken over by the " +
        s"next compactCoded run)")
    codedFrame(newVecs, idCol, vecCol, coarse, dims, pq, subDims)
      .write.mode("append").partitionBy("centroid")
      .parquet(s"$dir/coded")
    // post-commit re-check: a maintenance op that acquired the lease
    // WHILE this append was committing may have snapshotted/overwritten
    // coded without our rows (a rebuild would even code them with the
    // old model). Failing loudly here makes the foreachBatch retry
    // re-run the batch after the lease clears — at-least-once, and the
    // possible duplicate is exactly what compact's key dedup reaps. The
    // maintenance side holds the mirror gate (file-set re-listing), so
    // the check-then-act residual needs BOTH gates to miss.
    require(!fs.exists(leasePath(dir)),
      s"AnnIndex.appendWith: a maintenance op acquired ${leasePath(dir)} " +
        s"while this append was committing — its snapshot may not include " +
        s"these rows; retry the batch after the lease clears (duplicates " +
        s"are reaped by compact's key dedup)")
  }

  private def codedFrame(vecs: DataFrame, idCol: String, vecCol: String,
                         coarse: Array[Double], dims: Int,
                         pq: Array[Double], subDims: Int): DataFrame =
    Pq.assignCodes(Ivf.assign(vecs, vecCol, coarse, dims),
        vecCol, pq, subDims)
      .select(col(idCol), col("codes"), col("centroid"))

  /** The persisted models, collected (bounded: O(k·dims + m·k·subDims)
    * doubles — model-sized driver state by design, same as training).
    */
  def loadModel(spark: SparkSession, dir: String): (Array[Double], Int, Array[Double], Int) = {
    val rows = spark.read.parquet(s"$dir/model")
      .select(col("kind"), col("dim_param"), col("vals")).collect()
    def part(kind: String) = rows.find(_.getString(0) == kind)
      .getOrElse(sys.error(s"AnnIndex.loadModel: no '$kind' row in $dir/model"))
    val c = part("coarse")
    val p = part("pq")
    (c.getSeq[Double](2).toArray, c.getInt(1),
      p.getSeq[Double](2).toArray, p.getInt(1))
  }

  /** The coded corpus as written (centroid comes back as the partition
    * column).
    */
  def loadCoded(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/coded")

  private def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The maintenance lease marker — present exactly while a compact or
    * rebuild owns the index directory (see [[compactCoded]]'s
    * single-writer contract).
    */
  def leasePath(dir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$dir/compact.lease")

  /** The tombstone table: id rows pending removal from the index. */
  def deletesPath(dir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$dir/deletes")

  /** File tombstones for `ids` — the takedown / right-to-be-forgotten
    * path, without which every removal is a full rebuild. A tombstone
    * takes effect at the NEXT probe (the probe paths anti-join the
    * pending set — bounded by contract: tombstones are request-sized,
    * reaped at every compact/rebuild) and is folded into storage by the
    * next [[compactCoded]] or [[write]], which then clears the table.
    *
    * Same coordination discipline as [[appendWith]]: refuses while a
    * maintenance op holds the lease (a tombstone filed during the swap
    * window could be cleared WITHOUT being folded — a silently
    * resurrected vector, the one failure a takedown path must not
    * have), and re-checks after the write commits so a late-landing
    * delete fails loudly and the caller re-files (duplicate tombstone
    * rows are harmless — the anti-joins and the fold are idempotent).
    */
  def deleteIds(ids: DataFrame, idCol: String, dir: String): Unit = {
    val spark = ids.sparkSession
    val fs = fsOf(spark, dir)
    def refuse(when: String): Unit =
      require(!fs.exists(leasePath(dir)),
        s"AnnIndex.deleteIds: a maintenance op holds ${leasePath(dir)} " +
          s"$when — a tombstone filed during the swap window could be " +
          s"cleared without being folded; retry after it completes " +
          s"(re-filed tombstones are idempotent)")
    refuse("")
    ids.select(col(idCol).as("id"))
      .write.mode("append").parquet(deletesPath(dir).toString)
    refuse("(acquired while this delete was committing)")
  }

  /** `coded` minus the pending tombstones — the serving-path filter.
    * The tombstone side broadcasts (request-sized by contract); absent
    * table = identity, so an index that never deletes keeps its exact
    * q160 plan.
    */
  private def withoutDeleted(spark: SparkSession, dir: String,
                             coded: DataFrame): DataFrame = {
    val del = deletesPath(dir)
    if (!fsOf(spark, dir).exists(del)) coded
    else {
      val idCol = coded.columns.filterNot(Set("codes", "centroid")).head
      coded.join(
        broadcast(spark.read.parquet(del.toString).select(col("id").as("__del_id"))),
        col(idCol) === col("__del_id"), "left_anti")
    }
  }

  /** Acquire the maintenance lease with a unique owner token (returned
    * for [[verifyLease]] re-checks). A FRESH foreign lease refuses; a
    * stale one (store mtime older than `takeoverMs`) is taken over.
    * delete-then-create is not atomic on any store (and local
    * `create(overwrite=false)` is itself check-then-create), so
    * ownership is VERIFIED by reading the token back — two racers both
    * "acquiring" resolve to the single one whose token survived; the
    * loser fails here instead of proceeding.
    */
  private def acquireLease(fs: org.apache.hadoop.fs.FileSystem,
                           lease: org.apache.hadoop.fs.Path,
                           takeoverMs: Long, op: String): String = {
    if (fs.exists(lease)) {
      val age = System.currentTimeMillis() - fs.getFileStatus(lease).getModificationTime
      require(age > takeoverMs,
        s"AnnIndex.$op: $lease is held and only ${age}ms old (takeover " +
          s"at ${takeoverMs}ms) — another maintenance op is in flight; " +
          s"exactly one compact/rebuild may run at a time")
      // a crashed op's stale lease: take it over (recreate re-stamps
      // ownership and the mtime clock)
      fs.delete(lease, false)
    }
    val token = s"op=$op pid=${ProcessHandle.current().pid()} " +
      s"nonce=${java.util.UUID.randomUUID()}"
    val out =
      try fs.create(lease, /* overwrite = */ false)
      catch { case e: java.io.IOException =>
        throw new IllegalArgumentException(
          s"AnnIndex.$op: lost the lease-acquisition race on $lease", e)
      }
    try out.writeBytes(token + "\n") finally out.close()
    verifyLease(fs, lease, token, op)
    token
  }

  /** Require the lease still carries OUR token — the load-bearing check
    * runs immediately before the irreversible swap, so a racing
    * taker-over aborts this op while everything is still reversible.
    */
  private def leaseToken(fs: org.apache.hadoop.fs.FileSystem,
                         lease: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(lease)
    try new java.io.BufferedReader(new java.io.InputStreamReader(in)).readLine()
    finally in.close()
  }

  private def verifyLease(fs: org.apache.hadoop.fs.FileSystem,
                          lease: org.apache.hadoop.fs.Path,
                          token: String, op: String): Unit = {
    val read = leaseToken(fs, lease)
    require(read == token,
      s"AnnIndex.$op: lease ownership lost — $lease now carries " +
        s"'$read', not ours; another maintenance op took over")
  }

  /** The path-safe nonce of a lease token (the UUID after "nonce=") —
    * the compact staging-dir suffix.
    */
  private def tokenNonce(token: String): String =
    token.substring(token.indexOf("nonce=") + "nonce=".length).trim

  /** Staging leftovers that are not OURS — dead racers' tmp dirs
    * (including the legacy unsuffixed `coded_compact` name), reaped at
    * the start of every owned compact.
    */
  private def foreignTmps(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                          own: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val d = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.map(_.getPath)
      // name comparison, not Path equality: listings come back
      // scheme-qualified while `own` is as-constructed
      .filter(p => p.getName.startsWith("coded_compact") && p.getName != own.getName)
  }

  /** The data files of a posting-list directory (name, length) — the
    * pre-swap concurrent-append detector's snapshot unit.
    */
  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): Set[(String, Long)] =
    if (!fs.exists(p)) Set.empty
    else {
      val it = fs.listFiles(p, /* recursive = */ true)
      val b = Set.newBuilder[(String, Long)]
      while (it.hasNext) {
        val s = it.next()
        val n = s.getPath.getName
        if (!n.startsWith("_") && !n.startsWith("."))
          b += ((s.getPath.toString, s.getLen))
      }
      b.result()
    }

  /** Compact the posting lists: drop duplicate ids (keep the
    * lexicographically-first codes row — they are identical under one
    * model anyway), fold pending tombstones, and rewrite the partitioned
    * layout, clearing the tombstone table once its rows are folded.
    * Holds the lease with a HEARTBEAT (mtime re-stamp every
    * `leaseTakeoverMs`/4), so a corpus-sized rewrite outliving the
    * takeover window is not mistaken for a crashed owner. The streaming
    * appender is foreachBatch + parquet append, i.e. AT-LEAST-ONCE: a
    * replayed micro-batch re-appends its rows, and a probe would then
    * report the same neighbor at two ranks — this is the K1 sink
    * convention (at-least-once + key dedup) applied to the index, run on
    * the TableMaintainApp cadence. Returns (rows before, rows after).
    *
    * All directory manipulation goes through the Hadoop `FileSystem`
    * resolved from the path's scheme (the `Merge.applyChangesOrCreate` /
    * `Layout.compact` pattern), so the maintenance path runs on the same
    * stores write/append/probe already do — `hdfs://` renames are atomic
    * namespace ops; object stores without atomic rename need the
    * single-writer contract below anyway (and pay a copy per rename,
    * which is why compacts are a cadence job, not a hot-path one).
    *
    * SINGLE-WRITER maintenance contract, ENFORCED by a lease: compact
    * (and [[write]]'s rebuild) acquires `<dir>/compact.lease` with a
    * verified owner token, [[appendWith]] refuses while it is present,
    * and a second maintenance op refuses while a FRESH lease is held —
    * so the documented "appends/probes pause for the swap window"
    * cannot be violated silently. Failure handling is phase-aware:
    *
    *  - a failure while `coded` is a complete copy (compute / tmp-write)
    *    RELEASES the lease — appends are safe to resume;
    *  - a failure that leaves `coded` moved aside (the swap window, or
    *    a failed rollback of a previous swap) KEEPS the lease held —
    *    releasing it would let a retrying appender recreate a fresh
    *    `coded` and a later compact delete `coded_old`, the only
    *    complete copy; the next compact takes over the stale lease
    *    (age > `leaseTakeoverMs` by store mtime) and rolls back.
    *
    * Two pre-swap gates run while everything is still reversible: the
    * live file set must equal the snapshot this compact READ (an append
    * that passed its lease check before acquisition but committed files
    * mid-compact aborts the compact instead of losing rows — the
    * check-then-write residual shrinks from the whole compact to the
    * instants between this listing and the rename), and the lease must
    * still carry OUR token (a concurrent taker-over wins; we abort). A
    * reader-side auto-heal was considered and rejected because a
    * concurrent reader rolling `coded_old` back RACES the compactor's
    * own rename (it can abort a healthy compact, or crash spuriously
    * when the swap lands between its check and its rename).
    */
  def compactCoded(spark: SparkSession, dir: String,
                   leaseTakeoverMs: Long = 24L * 3600 * 1000): (Long, Long) = {
    val fs = fsOf(spark, dir)
    val lease = leasePath(dir)
    val token = acquireLease(fs, lease, leaseTakeoverMs, "compactCoded")
    val hb = startHeartbeat(fs, lease, token, leaseTakeoverMs)
    val live = new org.apache.hadoop.fs.Path(s"$dir/coded")
    val old = new org.apache.hadoop.fs.Path(s"$dir/coded_old")
    // the staging dir is token-unique: two racers that both believed
    // they acquired (the delete-then-create takeover interleaving) can
    // never share a tmp, so the loser's writes cannot clobber the
    // winner's validated output between its verifyLease and its rename
    val tmp = new org.apache.hadoop.fs.Path(
      s"$dir/coded_compact.${tokenNonce(token)}")
    val del = deletesPath(dir)
    // the heartbeat stops on EVERY exit — including the keep-lease
    // failure paths, where the un-beaten lease aging into takeover is
    // exactly what lets the next compact recover
    try {
    val counts =
      try {
        // reap FOREIGN staging leftovers while we own the lease: a dead
        // racer's tmp is garbage (its owner either lost verifyLease or
        // crashed); one re-created mid-delete by a still-running loser
        // is re-reaped by the next owned compact
        foreignTmps(fs, dir, tmp).foreach(p => fs.delete(p, true))
        // roll back a PREVIOUS compact's interrupted swap FIRST — if
        // this fails, the conditional release below sees live missing
        // and keeps the lease (the catastrophic case the phase-aware
        // contract exists for)
        if (!fs.exists(live) && fs.exists(old))
          require(fs.rename(old, live),
            s"AnnIndex.compactCoded: found an interrupted swap but could " +
              s"not roll $old back to $live")
        val snapshot = dataFiles(fs, live)
        val delSnapshot = dataFiles(fs, del)
        val coded = loadCoded(spark, dir)
        val idCol = coded.columns.filterNot(Set("codes", "centroid")).head
        val before = coded.count()
        // fold pending tombstones into the rewrite (deleteIds refuses
        // while we hold the lease, and the pre-swap re-listing below
        // catches one whose check passed just before acquisition)
        val folded =
          if (fs.exists(del))
            coded.join(
              broadcast(spark.read.parquet(del.toString)
                .select(col("id").as("__del_id"))),
              col(idCol) === col("__del_id"), "left_anti")
          else coded
        val deduped = folded
          .groupBy(col(idCol))
          .agg(min(struct(col("codes"), col("centroid"))).as("__r"))
          .select(col(idCol), col("__r.codes").as("codes"),
            col("__r.centroid").as("centroid"))
          .cache() // fully materialize BEFORE overwriting the source files
        val after = deduped.count()
        deduped.write.mode("overwrite").partitionBy("centroid").parquet(tmp.toString)
        deduped.unpersist()
        // pre-swap gates, still fully reversible: no concurrent append
        // or delete landed since the read, and the lease is still ours
        val now = dataFiles(fs, live)
        require(now == snapshot,
          s"AnnIndex.compactCoded: the live lists changed during the " +
            s"compact (${(now -- snapshot).size} new / " +
            s"${(snapshot -- now).size} gone files) — an append slipped " +
            s"into the window; aborting without the swap, re-run compact")
        require(dataFiles(fs, del) == delSnapshot,
          s"AnnIndex.compactCoded: the tombstone table changed during " +
            s"the compact — a delete slipped into the window and would be " +
            s"cleared unfolded; aborting without the swap, re-run compact")
        verifyLease(fs, lease, token, "compactCoded")
        (before, after)
      } catch { case e: Throwable =>
        // keep the lease ONLY in the true moved-aside state (live
        // missing while old holds the only complete copy — a failed
        // rollback): releasing there would let a retrying appender
        // recreate a fresh `coded` and a later compact delete the copy.
        // Every other failure leaves nothing to protect, so reap the
        // (possibly corpus-sized, fully-written) tmp and release — but
        // only while WE still own the lease: a lost-ownership abort must
        // touch neither the winner's lease nor the tmp it may be writing
        val movedAside = !fs.exists(live) && fs.exists(old)
        val ours = fs.exists(lease) &&
          (try leaseToken(fs, lease) == token catch { case _: Exception => false })
        if (!movedAside && ours) {
          fs.delete(tmp, true)
          fs.delete(lease, false)
        }
        throw e
      }
    // crash-safe swap order: the live lists are never the only copy —
    // the replacement is fully written, move the old AT MOST ONE rename
    // away, move the new in, only then delete. A crash at any point
    // leaves a complete copy at coded, coded_old, or coded_compact.
    // Lease handling stays phase-aware through the swap: a failure while
    // live is still intact (the move-aside itself — rename is atomic, a
    // false return means nothing moved) reaps tmp and releases; a
    // failure INSIDE the moved-aside window keeps the lease held so
    // appends stay blocked until the next compact's takeover rolls back;
    // post-swap cleanup failures release (live is complete again — the
    // leftover old is reaped by the next compact's own delete).
    try {
      fs.delete(old, true) // a leftover from an interrupted previous compact
      require(fs.rename(live, old),
        s"AnnIndex.compactCoded: could not move $live aside")
    } catch { case e: Throwable =>
      // re-check rather than assume: a FALSE rename moved nothing, but
      // an exception thrown mid-call is indeterminate on a non-atomic
      // store — reap/release only when live is verifiably still intact
      if (fs.exists(live)) {
        fs.delete(tmp, true)
        releaseLeaseIfOurs(fs, lease, token)
      }
      throw e
    }
    // the moved-aside window: failures here KEEP the lease
    require(fs.rename(tmp, live),
      s"AnnIndex.compactCoded: could not move $tmp into place " +
        s"(previous lists preserved at $old)")
    try fs.delete(old, true)
    catch { case e: Throwable =>
      releaseLeaseIfOurs(fs, lease, token)
      throw e
    }
    // folded tombstones are in the live lists now: clear the table (a
    // failure here is benign — leftover tombstones anti-join to nothing
    // and the next compact clears them — but release before rethrowing)
    try { if (fs.exists(del)) fs.delete(del, true) }
    catch { case e: Throwable =>
      releaseLeaseIfOurs(fs, lease, token)
      throw e
    }
    fs.delete(lease, false)
    counts
    } finally stopHeartbeat(hb)
  }

  /** Probe the persisted index: IVF-PQ top-k from the loaded artifacts
    * only ([[Pq.ivfPqTopK]] — coarse probe prunes to nprobe posting
    * lists, ADC ranks their members from codes). `queries` carries
    * full-precision vectors (idCol, vecCol).
    */
  def probe(spark: SparkSession, dir: String, queries: DataFrame,
            idCol: String, vecCol: String,
            nprobe: Int, kNeighbors: Int): DataFrame = {
    val (coarse, dims, pq, _) = loadModel(spark, dir)
    Pq.ivfPqTopK(spark,
      withoutDeleted(spark, dir, loadCoded(spark, dir)),
      queries, idCol, vecCol, coarse, dims, pq, nprobe, kNeighbors)
  }

  /** [[probe]] with the scan PRUNED to the probed posting lists — the
    * serving-path point of the centroid-partitioned layout: the probed
    * centroid set is computed driver-side first (bounded by contract:
    * queries are a query SET, nprobe × |queries| ints — the same class
    * of bounded eagerness as the occupancy gates), and the coded scan
    * gets a LITERAL `centroid IN (…)` partition filter, so an index of
    * any size reads only the probed lists' files. Identical output to
    * [[probe]] (the join already kept only probed lists; the filter
    * removes the SCAN of everything else — spec-pinned, with the
    * PartitionFilters entry asserted in the plan).
    */
  def probePruned(spark: SparkSession, dir: String, queries: DataFrame,
                  idCol: String, vecCol: String,
                  nprobe: Int, kNeighbors: Int): DataFrame = {
    val (coarse, dims, pq, _) = loadModel(spark, dir)
    // the SAME probe plan ivfPqTopK will join on (Ivf.probes — one
    // definition), reduced to its distinct centroid set driver-side
    val probed = Ivf.probes(spark, queries, idCol, vecCol, coarse, dims, nprobe)
      .select(col("centroid")).distinct()
      .collect().map(_.getInt(0)).sorted
    require(probed.nonEmpty || queries.isEmpty,
      "AnnIndex.probePruned: no probed lists for a non-empty query set")
    val coded = withoutDeleted(spark, dir, loadCoded(spark, dir)
      .filter(col("centroid").isin(probed.map(Integer.valueOf).toSeq: _*)))
    Pq.ivfPqTopK(spark, coded, queries, idCol, vecCol,
      coarse, dims, pq, nprobe, kNeighbors)
  }
}
