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
  */
object AnnIndex {

  /** Train-side artifacts written once (overwrite). `corpus` must carry
    * idCol + vecCol; models come from [[Ivf.train]] / [[Pq.train]] (or
    * their cached/sampled forms).
    */
  def write(corpus: DataFrame, idCol: String, vecCol: String,
            coarse: Array[Double], dims: Int,
            pq: Array[Double], subDims: Int, dir: String): Unit = {
    require(dims >= 1 && subDims >= 1 && dims % subDims == 0,
      s"AnnIndex.write: dims=$dims must be a positive multiple of subDims=$subDims")
    require(coarse.length % dims == 0 && coarse.nonEmpty,
      s"AnnIndex.write: coarse length ${coarse.length} not a multiple of dims=$dims")
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq(("coarse", dims, coarse.toSeq), ("pq", subDims, pq.toSeq))
      .toDF("kind", "dim_param", "vals")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
    codedFrame(corpus, idCol, vecCol, coarse, dims, pq, subDims)
      .write.mode("overwrite").partitionBy("centroid")
      .parquet(s"$dir/coded")
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
    */
  def appendWith(newVecs: DataFrame, idCol: String, vecCol: String,
                 model: (Array[Double], Int, Array[Double], Int),
                 dir: String): Unit = {
    val (coarse, dims, pq, subDims) = model
    codedFrame(newVecs, idCol, vecCol, coarse, dims, pq, subDims)
      .write.mode("append").partitionBy("centroid")
      .parquet(s"$dir/coded")
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

  /** Compact the posting lists: drop duplicate ids (keep the
    * lexicographically-first codes row — they are identical under one
    * model anyway) and rewrite the partitioned layout. The streaming
    * appender is foreachBatch + parquet append, i.e. AT-LEAST-ONCE: a
    * replayed micro-batch re-appends its rows, and a probe would then
    * report the same neighbor at two ranks — this is the K1 sink
    * convention (at-least-once + key dedup) applied to the index, run on
    * the TableMaintainApp cadence. Returns (rows before, rows after).
    *
    * SINGLE-WRITER maintenance contract (the same one every copy-on-write
    * table op in this repo carries): exactly one compact runs at a time,
    * and appends/probes pause for the swap window — a reader-side
    * auto-heal was considered and rejected because a concurrent reader
    * rolling `coded_old` back RACES the compactor's own rename (it can
    * abort a healthy compact, or crash spuriously when the swap lands
    * between its check and its rename). Recovery from a crash inside the
    * window is therefore HERE, at the start of the next compact — which
    * is also the only party that can know the swap is not in flight.
    */
  def compactCoded(spark: SparkSession, dir: String): (Long, Long) = {
    locally { // roll back a PREVIOUS compact's interrupted swap
      val live = new java.io.File(s"$dir/coded")
      val prev = new java.io.File(s"$dir/coded_old")
      if (!live.exists && prev.exists)
        require(prev.renameTo(live),
          s"AnnIndex.compactCoded: found an interrupted swap but could " +
            s"not roll $prev back to $live")
    }
    val coded = loadCoded(spark, dir)
    val cols = coded.columns
    val idCol = cols.filterNot(Set("codes", "centroid")).head
    val before = coded.count()
    val deduped = coded
      .groupBy(col(idCol))
      .agg(min(struct(col("codes"), col("centroid"))).as("__r"))
      .select(col(idCol), col("__r.codes").as("codes"),
        col("__r.centroid").as("centroid"))
      .cache() // fully materialize BEFORE overwriting the source files
    val after = deduped.count()
    // crash-safe swap order: the live lists are never the only copy —
    // write the replacement fully, move the old AT MOST ONE rename away,
    // move the new in, only then delete. A crash at any point leaves a
    // complete copy at coded, coded_old, or coded_compact.
    val tmp = s"$dir/coded_compact"
    deduped.write.mode("overwrite").partitionBy("centroid").parquet(tmp)
    deduped.unpersist()
    val live = new java.io.File(s"$dir/coded")
    val old = new java.io.File(s"$dir/coded_old")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(old) // a leftover from an interrupted previous compact
    require(live.renameTo(old),
      s"AnnIndex.compactCoded: could not move $live aside")
    require(new java.io.File(tmp).renameTo(live),
      s"AnnIndex.compactCoded: could not move $tmp into place " +
        s"(previous lists preserved at $old)")
    rm(old)
    (before, after)
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
    Pq.ivfPqTopK(spark, loadCoded(spark, dir), queries, idCol, vecCol,
      coarse, dims, pq, nprobe, kNeighbors)
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
    val coded = loadCoded(spark, dir)
      .filter(col("centroid").isin(probed.map(Integer.valueOf).toSeq: _*))
    Pq.ivfPqTopK(spark, coded, queries, idCol, vecCol,
      coarse, dims, pq, nprobe, kNeighbors)
  }
}
