package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE (upsert) into a directory-partitioned parquet table —
  * the lakehouse maintenance primitive (Delta/Iceberg MERGE INTO) re-expressed
  * on plain parquet: rows in `updates` REPLACE base rows with the same key
  * and are INSERTED when the key is new, and only the partitions that
  * actually contain updated keys are rewritten.
  *
  * Why partition-pruned rewrite is the whole point at 100 TB: a daily
  * upsert touches a handful of recent date partitions; rewriting the full
  * table for it is a 100 TB write, rewriting affected partitions is a
  * ~100 GB write. The read side prunes the same way (`PartitionFilters` on
  * the partition column — MergeSpec proves untouched partitions' files are
  * byte-identical and never relisted by the rewrite).
  *
  * Contract:
  *  - `updates` must carry the table's full schema including `partCol`,
  *    and a key's partition value must be STABLE (partition by an
  *    immutable, key-derived column — the standard date/tenant layout).
  *    The rewrite prunes to the partitions named by the updates, so a row
  *    whose update changes `partCol` would leave its old copy stranded in
  *    a partition the merge never reads; detecting that requires the
  *    full-table key scan this operator exists to avoid, so the contract
  *    forbids it instead (MergeSpec pins the stable-partition semantics);
  *  - duplicate keys WITHIN `updates` are rejected loudly — "replace with
  *    which row?" has no deterministic answer, and last-write-wins needs
  *    an ordering column the caller should apply upstream
  *    ([[Relational]]'s latest-row dedup) before merging;
  *  - driver state is O(affected partitions + a count) — the affected
  *    partition list is collected to build the pruning predicate, the
  *    standard dynamic-partition-overwrite shape.
  *
  * The write uses dynamic partition overwrite, so ONLY partitions present
  * in the merged output are replaced; Spark never lists or touches the
  * others. Atomicity is per-partition-directory (the parquet committer's
  * contract) — same as any non-transactional lakehouse write; layering a
  * manifest/commit log on top is a metadata concern deliberately out of
  * scope here.
  */
object Merge {

  /** Number of partitions an update set may touch before we refuse to
    * collect the partition list to the driver. Far above any sane daily
    * upsert (a year of dates is 365); hitting it means the update set is
    * effectively a full-table rewrite — do that explicitly instead.
    */
  val MaxAffectedPartitions = 100000

  /** Merge `updates` into the parquet table at `path` (partitioned by
    * `partCol`), rewriting only affected partitions. Returns the number of
    * partitions rewritten.
    */
  def into(spark: SparkSession, path: String, updates: DataFrame,
           keyCol: String, partCol: String): Int = {
    val dupKeys = updates.groupBy(col(keyCol)).count().filter(col("count") > 1)
    require(dupKeys.isEmpty,
      s"updates carry duplicate keys (e.g. ${dupKeys.select(keyCol).take(3).mkString(", ")}) — " +
        "resolve to one row per key upstream (latest-row dedup) before merging")

    val affected = updates.select(col(partCol)).distinct()
      .limit(MaxAffectedPartitions + 1).collect().map(_.get(0))
    require(affected.length <= MaxAffectedPartitions,
      s"update set touches > $MaxAffectedPartitions partitions — a full rewrite in disguise; " +
        "write the table directly instead of merging")

    val base = spark.read.parquet(path)
    // Align update columns to the base schema (order included) so the
    // union below is positional-safe.
    val cols = base.columns
    require(cols.toSet == updates.columns.toSet,
      s"updates schema ${updates.columns.sorted.mkString(",")} must match " +
        s"base ${cols.sorted.mkString(",")}")
    val upd = updates.select(cols.map(col): _*)

    // Survivors of the affected partitions: base rows there whose key is
    // NOT updated. The partition filter prunes the scan to affected
    // directories; the anti-join removes replaced keys.
    val survivors = base
      .filter(col(partCol).isInCollection(affected))
      .join(upd.select(col(keyCol)), Seq(keyCol), "left_anti")
      .select(cols.map(col): _*)

    // Dynamic overwrite: only partitions present in (survivors ∪ updates)
    // — exactly the affected set — are replaced on disk.
    //
    // localCheckpoint materializes the merged rows BEFORE the write both
    // to satisfy Spark's self-overwrite guard ("Cannot overwrite a path
    // that is also being read from" — the write target appears in the
    // read lineage) and for basic sanity: the affected partitions are
    // computed in full before any of their files are replaced. Executor
    // storage holds only the affected partitions' rows — the same bound
    // as the rewrite itself. On executor loss mid-write the job fails and
    // the merge is re-run from the (per-directory-atomic) base — the
    // non-transactional parquet contract documented above.
    val merged = survivors.unionAll(upd).localCheckpoint(true)
    merged
      .write
      .partitionBy(partCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)
    merged.unpersist()
    affected.length
  }

  /** [[into]] that bootstraps the table when `path` has no data yet —
    * the first micro-batch of a continuous upsert ([[graft.sinks.Sinks]]
    * mergeSink) has nothing to merge against. The duplicate-key contract
    * applies to the bootstrap write too: the created table must start
    * one-row-per-key or every later merge inherits the ambiguity.
    */
  def intoOrCreate(spark: SparkSession, path: String, updates: DataFrame,
                   keyCol: String, partCol: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(p) &&
      fs.listStatus(p).exists(!_.getPath.getName.startsWith("_"))
    if (exists) into(spark, path, updates, keyCol, partCol)
    else {
      val dupKeys = updates.groupBy(col(keyCol)).count().filter(col("count") > 1)
      require(dupKeys.isEmpty,
        "bootstrap write carries duplicate keys — resolve upstream first")
      updates.write.partitionBy(partCol).mode("overwrite").parquet(path)
      updates.select(col(partCol)).distinct().count().toInt
    }
  }
}
