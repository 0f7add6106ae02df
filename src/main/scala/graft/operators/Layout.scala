package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) storage layout for multi-dimensional data
  * skipping (SURVEY §2 "Optimize for scale" — no reference counterpart;
  * the technique is the standard lakehouse clustering layout).
  *
  * Why it matters at 100 TB: partitioning/sorting by ONE column prunes
  * queries on that column only. Interleaving the bits of two (or more)
  * columns into a single z-value makes ranges of z correspond to
  * axis-aligned boxes in (x, y) space, so a single partition column prunes
  * 2-D box predicates: both `WHERE x BETWEEN …` and `WHERE y BETWEEN …`
  * skip most files.
  *
  * Correctness contract: pruning is a SUPERSET pre-filter. For any box
  * [x0,x1]×[y0,y1], every point inside has z between z(x0,y0) and
  * z(x1,y1) — z is monotone in each coordinate with the other fixed, so
  * z(x,y) ≥ z(x0,y) ≥ z(x0,y0) and symmetrically for the max. The exact
  * per-row predicate is re-applied after pruning, so results equal the
  * unpruned filter exactly (ZOrderSpec). The corner-range bound is loose
  * (BIGMIN/LITMAX jumping would tighten it); looseness costs only extra
  * partitions read, never wrong answers.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of x (even positions)
    * and y (odd positions). Inputs must be non-negative and < 2^bits —
    * map real columns into that range first (e.g. `pmod(col, 1 << bits)`
    * or quantile bucketing). Pure bit arithmetic: codegen'd, no UDF, and
    * reproducible in any engine (q81's oracle recomputes it in SQL).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = zValueN(Seq(x, y), bits)

  /** N-dimensional Morton interleave: bit i of dimension j lands at
    * position i·k + j (k = dims) — the 2-D [[zValue]] generalized to the
    * multi-column layouts a 100 TB table actually clusters on
    * (date × tenant × region). Same arithmetic contract: pure bit
    * shifts/adds on longs, replayable verbatim in any engine's SQL, and
    * the same range caveat — only the low `bits` bits of each coordinate
    * participate, so map values into [0, 2^bits) first ([[zOrderWrite]]'s
    * rangeChecked is the enforced form). k·bits ≤ 62 keeps the z-value a
    * non-negative long.
    */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    require(dims.size >= 2, s"zValueN: need >= 2 dimensions, got ${dims.size}")
    require(bits >= 1 && dims.size * bits <= 62,
      s"zValueN: need bits >= 1 and dims*bits <= 62, got ${dims.size} * $bits")
    val k = dims.size
    val longs = dims.map(_.cast("long"))
    (for (i <- 0 until bits; (d, j) <- longs.zipWithIndex)
      yield shiftleft(shiftright(d, i).bitwiseAND(1L), i * k + j))
      .reduce(_ + _)
  }

  /** Write `df` z-clustered: directory-partitioned on the top `prefixBits`
    * of the z-value (so partition pruning is driven by z-range predicates)
    * and sorted by full z within partitions (so parquet row-group min/max
    * stats stay tight for the finer bits).
    *
    * `prefixBits` controls partition count (2^prefixBits directories max);
    * keep it small enough that each partition holds many files at the
    * target scale — at 100 TB with prefixBits=8, 256 partitions of ~400 GB,
    * each further skippable by row-group stats.
    */
  /** Fail the write on any value outside [0, 2^bits) — zValue reads only
    * the low `bits` bits, so an out-of-range value would be bucketed by
    * its masked low bits while boxQuery's range math uses the raw bounds:
    * the partition filter would silently prune MATCHING rows. NULLs fail
    * too (a null coordinate has no place on the curve; the `<` comparisons
    * alone would pass it through to a null bucket). A write-time error is
    * the honest contract; map columns into range first.
    */
  private def rangeChecked(c: Column, bits: Int, name: String): Column = {
    val v = c.cast("long")
    when(v.isNull || v < 0L || v >= (1L << bits),
      raise_error(concat(
        lit(s"zOrderWrite: $name out of [0, ${1L << bits}): "),
        coalesce(v.cast("string"), lit("NULL")))))
      .otherwise(v)
  }

  def zOrderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  prefixBits: Int, path: String): Unit = {
    require(prefixBits >= 1 && prefixBits <= 2 * bits,
      s"prefixBits must be in [1, ${2 * bits}], got $prefixBits")
    df.withColumn("__z", zValue(
        rangeChecked(col(xCol), bits, xCol),
        rangeChecked(col(yCol), bits, yCol), bits))
      .withColumn("z_bucket", shiftright(col("__z"), 2 * bits - prefixBits))
      .repartition(col("z_bucket"))
      .sortWithinPartitions(col("z_bucket"), col("__z"))
      .drop("__z")
      .write.partitionBy("z_bucket").mode("overwrite").parquet(path)
  }

  /** Box query over a z-ordered layout: z-range predicate on the partition
    * column (prunes directories — `PartitionFilters` in the scan, proven in
    * ZOrderSpec) plus the exact per-row box predicate (removes the
    * curve-range false positives).
    */
  def boxQuery(spark: SparkSession, path: String, xCol: String, yCol: String,
               bits: Int, prefixBits: Int,
               x0: Long, x1: Long, y0: Long, y1: Long): DataFrame = {
    require(Seq(x0, x1, y0, y1).forall(v => v >= 0 && v < (1L << bits)),
      s"box bounds must lie in [0, ${1L << bits}) — the layout's coordinate " +
        s"space (zOrderWrite enforces the same range on the data)")
    val s = 2 * bits - prefixBits
    val zMin = interleave(x0, y0, bits) >> s
    val zMax = interleave(x1, y1, bits) >> s
    spark.read.parquet(path)
      .filter(col("z_bucket") >= zMin && col("z_bucket") <= zMax)
      .filter(col(xCol) >= x0 && col(xCol) <= x1 &&
        col(yCol) >= y0 && col(yCol) <= y1)
  }

  /** Driver-side twin of [[zValue]] for computing literal range bounds. */
  def interleave(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  /** Equi-depth quantile mapping of an arbitrarily-distributed numeric
    * column into the curve's [0, 2^bits) coordinate space — the missing
    * step that makes [[zOrderWrite]] usable on real columns (raw prices,
    * timestamps, skewed counts) instead of pre-normalized ones, AND the
    * property z-ordering actually wants: equi-depth buckets put ~equal
    * row mass behind every curve coordinate, so partitions stay balanced
    * under any skew.
    *
    * Returns the interior split points (≤ 2^bits − 1 of them; heavy ties
    * collapse duplicates, harmlessly yielding fewer distinct buckets)
    * from one `approxQuantile` pass — O(2^bits) driver state. Keep the
    * splits: box-query bounds must be mapped through the SAME splits
    * ([[bucketOf]]), the exact analogue of probing an IVF index with the
    * centroids it was built with.
    */
  def quantileSplits(df: DataFrame, colName: String, bits: Int,
                     relErr: Double = 0.001): Array[Double] = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    df.stat.approxQuantile(colName, probs, relErr).distinct.sorted
  }

  /** Column form: bucket index of `c` under `splits` — the count of
    * splits ≤ value (so bucket i holds splits(i−1) ≤ v < splits(i)).
    * Codegen'd filter over a literal array. A NULL coordinate maps to −1
    * (a NULL predicate would otherwise FILTER to the empty array and
    * silently land in bucket 0), which [[zOrderWrite]]'s range check then
    * rejects loudly — same write-time NULL contract as the raw path.
    */
  def bucketCol(c: Column, splits: Array[Double]): Column =
    when(c.isNull, lit(-1)).otherwise(size(filter(lit(splits), s => s <= c)))

  /** Driver-side twin of [[bucketCol]] for mapping query bounds. */
  def bucketOf(v: Double, splits: Array[Double]): Long =
    splits.count(_ <= v)

  /** Persist / load the quantile split arrays next to the data (a
    * `_zsplits` sidecar, underscore-prefixed so the parquet reader
    * ignores it) — without them a z-clustered table cannot be box-queried
    * (bounds must map through the SAME splits), so a deployed writer
    * ([[graft.apps.TableMaintainApp]]) must not let them die with its
    * JVM. Stored as one JSON object via the Hadoop FS API, so it lands on
    * whatever filesystem holds the table.
    */
  def writeZSplits(spark: SparkSession, path: String,
                   sx: Array[Double], sy: Array[Double],
                   bits: Int, prefixBits: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_zsplits/splits.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = s"""{"bits":$bits,"prefixBits":$prefixBits,""" +
      s""""sx":[${sx.mkString(",")}],"sy":[${sy.mkString(",")}]}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** (sx, sy, bits, prefixBits) from the `_zsplits` sidecar. */
  def readZSplits(spark: SparkSession, path: String): (Array[Double], Array[Double], Int, Int) = {
    val row = spark.read.json(s"$path/_zsplits/splits.json")
      .select(col("sx"), col("sy"), col("bits"), col("prefixBits"))
      .collect()(0)
    (row.getSeq[Double](0).toArray, row.getSeq[Double](1).toArray,
      row.getLong(2).toInt, row.getLong(3).toInt)
  }

  /** [[zOrderWrite]] over quantile-bucketed coordinates: computes splits
    * for both columns, writes the bucketized layout, persists them as the
    * `_zsplits` sidecar, and returns the two split arrays for
    * [[boxQueryQuantile]].
    */
  def zOrderWriteQuantile(df: DataFrame, xCol: String, yCol: String,
                          bits: Int, prefixBits: Int, path: String,
                          relErr: Double = 0.001): (Array[Double], Array[Double]) = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    // one pass for both columns' sketches (the multi-column overload),
    // then the write itself — two scans total, not three
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val Array(sxRaw, syRaw) =
      df.stat.approxQuantile(Array(xCol, yCol), probs, relErr)
    val sx = sxRaw.distinct.sorted
    val sy = syRaw.distinct.sorted
    val mapped = df
      .withColumn("__qx", bucketCol(col(xCol), sx))
      .withColumn("__qy", bucketCol(col(yCol), sy))
    zOrderWrite(mapped, "__qx", "__qy", bits, prefixBits, path)
    writeZSplits(df.sparkSession, path, sx, sy, bits, prefixBits)
    (sx, sy)
  }

  /** Box query over a quantile-bucketed z layout: raw-value bounds map
    * through the stored splits to bucket ranges (a raw bound inside a
    * bucket widens to the whole bucket — superset pruning, exact after
    * the raw per-row predicate re-applies, same contract as [[boxQuery]]).
    */
  def boxQueryQuantile(spark: SparkSession, path: String,
                       xCol: String, yCol: String,
                       bits: Int, prefixBits: Int,
                       sx: Array[Double], sy: Array[Double],
                       x0: Double, x1: Double,
                       y0: Double, y1: Double): DataFrame =
    boxQuery(spark, path, "__qx", "__qy", bits, prefixBits,
        bucketOf(x0, sx), bucketOf(x1, sx), bucketOf(y0, sy), bucketOf(y1, sy))
      .filter(col(xCol) >= x0 && col(xCol) <= x1 &&
        col(yCol) >= y0 && col(yCol) <= y1)
      .drop("__qx", "__qy")

  /** Per-file column-stats manifest — FILE-level data skipping, the rung
    * below directory-partition pruning (what Delta/Iceberg keep in their
    * metadata logs, here as a `_stats` JSON sidecar the parquet reader
    * ignores): after any write, one scan groups rows by
    * `input_file_name()` and records min/max per requested column. A
    * range read then opens ONLY the files whose [min, max] overlaps the
    * predicate — within a partition directory of hundreds of files, a
    * sorted or clustered layout makes most files skippable without any
    * directory structure.
    *
    * Stats rows are O(files × cols) — the manifest is a table-metadata
    * artifact, tiny by construction. Files whose stats are NULL (all-null
    * column) are kept conservatively; skipping is a superset pre-filter,
    * the exact predicate re-applies on read ([[statsPrunedRead]]).
    */
  def writeStats(spark: SparkSession, path: String,
                 statCols: Seq[String]): Unit = {
    require(statCols.nonEmpty, "writeStats: need at least one column")
    val df = spark.read.parquet(path)
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").json(s"$path/_stats")
  }

  /** Range read over a stats-manifested table: keep files whose [min, max]
    * for `colName` overlaps [lo, hi] (NULL stats keep the file), read only
    * those, re-apply the exact predicate. Driver state is the O(files)
    * kept-file list — the same bound every manifest-based reader carries.
    * Returns (pruned DataFrame, files read, files total).
    */
  def statsPrunedRead(spark: SparkSession, path: String, colName: String,
                      lo: Double, hi: Double): (DataFrame, Int, Int) = {
    val stats = spark.read.json(s"$path/_stats")
    val total = stats.count().toInt
    val exact = col(colName) >= lo && col(colName) <= hi
    // Conservative fallback, not a crash: a manifest written for other
    // columns — or one whose stats are all-NULL (the JSON writer omits
    // null fields entirely, so the column doesn't even exist in the
    // inferred schema) — keeps EVERY file; the exact predicate still
    // applies.
    if (!stats.columns.contains(s"min_$colName") ||
        !stats.columns.contains(s"max_$colName"))
      return (spark.read.parquet(path).filter(exact), total, total)
    val kept = stats.filter(!(
        coalesce(col(s"max_$colName") < lo, lit(false)) ||
        coalesce(col(s"min_$colName") > hi, lit(false))))
      .select(col("file")).collect().map(_.getString(0))
    val pruned =
      if (kept.isEmpty) spark.read.parquet(path).filter(lit(false))
      // basePath keeps partition discovery on: an explicit leaf-file list
      // would otherwise DROP directory-partition columns and the two
      // branches of this function would disagree on schema
      else spark.read.option("basePath", path).parquet(kept.toIndexedSeq: _*)
    (pruned.filter(exact), kept.length, total)
  }

  /** Small-file compaction — the table-maintenance pass every long-running
    * ingest needs: streaming sinks and incremental appends leave thousands
    * of KB-sized part files, and at 100 TB the resulting task-per-file
    * scheduling + footer-read overhead dominates scans. Rewrites `inDir`
    * into `outDir` with file count sized from the ACTUAL input bytes
    * (ceil(bytes / targetBytes)), so output files land near the parquet
    * sweet spot regardless of how fragmented the input was.
    *
    * Content-preserving, order-agnostic: rows are only re-bucketed
    * (round-robin repartition — even output sizes with no shuffle key to
    * skew). Callers that also want clustering compose [[zOrderWrite]]
    * instead. Returns (input file count, output file count).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val fs = new org.apache.hadoop.fs.Path(inDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(inDir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    // A directory-PARTITIONED table has no top-level data files; silently
    // proceeding would compute totalBytes = 0 → parts = 1 and funnel the
    // whole table through one task into one file, destroying the layout.
    require(files.nonEmpty,
      s"compact: no top-level .parquet files under $inDir — partitioned " +
        "tables must be compacted per partition directory (or re-clustered " +
        "via zOrderWrite), not flattened")
    val totalBytes = files.map(_.getLen).sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    (files.length, parts)
  }
}
