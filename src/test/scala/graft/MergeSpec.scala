package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge
import graft.sinks.Sinks

/** Copy-on-write MERGE: upsert semantics, and the partition-pruned rewrite
  * contract — untouched partitions' FILES stay byte-identical (same names,
  * sizes, mtimes), which is what makes a daily upsert affordable at 100 TB.
  */
class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** (name, size, mtime) of every data file under a partition dir. */
  private def fileSig(dir: Path): Set[(String, Long, Long)] =
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => (p.getFileName.toString, Files.size(p),
        Files.getLastModifiedTime(p).toMillis))
      .toSet

  private def freshTable(name: String): String = {
    val root = Files.createTempDirectory(s"graft-merge-$name").toString
    Seq(
      (1L, "a", 10.0), (2L, "a", 20.0),
      (3L, "b", 30.0), (4L, "b", 40.0),
      (5L, "c", 50.0))
      .toDF("id", "part", "v")
      .write.partitionBy("part").mode("overwrite").parquet(root)
    root
  }

  test("upsert: replaces matched keys, inserts new ones, counts rewritten partitions") {
    val root = freshTable("upsert")
    val updates = Seq((3L, "b", 99.0), (6L, "b", 60.0)).toDF("id", "part", "v")
    val n = Merge.into(spark, root, updates, "id", "part")
    assert(n == 1, "only partition b is affected")
    val got = spark.read.parquet(root)
      .select($"id", $"part", $"v").as[(Long, String, Double)].collect().toSet
    assert(got == Set(
      (1L, "a", 10.0), (2L, "a", 20.0),
      (3L, "b", 99.0), (4L, "b", 40.0), (6L, "b", 60.0),
      (5L, "c", 50.0)))
  }

  test("untouched partitions are not rewritten: files byte-identical by name/size/mtime") {
    val root = freshTable("pruned")
    val aBefore = fileSig(Paths.get(root, "part=a"))
    val cBefore = fileSig(Paths.get(root, "part=c"))
    val bBefore = fileSig(Paths.get(root, "part=b"))
    Merge.into(spark, root,
      Seq((4L, "b", 44.0)).toDF("id", "part", "v"), "id", "part")
    assert(fileSig(Paths.get(root, "part=a")) == aBefore, "partition a must be untouched")
    assert(fileSig(Paths.get(root, "part=c")) == cBefore, "partition c must be untouched")
    assert(fileSig(Paths.get(root, "part=b")) != bBefore, "partition b must be rewritten")
  }

  test("duplicate keys in the update set are rejected") {
    val root = freshTable("dup")
    val dup = Seq((3L, "b", 1.0), (3L, "b", 2.0)).toDF("id", "part", "v")
    val e = intercept[IllegalArgumentException](
      Merge.into(spark, root, dup, "id", "part"))
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("schema mismatch is rejected loudly") {
    val root = freshTable("schema")
    val bad = Seq((3L, "b")).toDF("id", "part")
    val e = intercept[IllegalArgumentException](
      Merge.into(spark, root, bad, "id", "part"))
    assert(e.getMessage.contains("must cover"))
  }

  test("stable-partition contract: updates in one partition never touch keys elsewhere") {
    // Key 5 lives in partition c; an update naming key 5 with part=b would
    // violate the stable-partition contract. The operator's semantics under
    // the CONTRACT: it rewrites only b, so c's copy of key 5 survives —
    // pinned here so the documented behavior is the tested behavior.
    val root = freshTable("moved")
    Merge.into(spark, root,
      Seq((5L, "b", 5.5)).toDF("id", "part", "v"), "id", "part")
    val got = spark.read.parquet(root)
      .filter($"id" === 5L)
      .select($"part", $"v").as[(String, Double)].collect().toSet
    assert(got == Set(("b", 5.5), ("c", 50.0)),
      "out-of-contract partition move leaves the old copy — the documented tradeoff")
  }

  test("deletes: key removed, absent-key delete is a no-op, upsert+delete of one key rejected") {
    val root = freshTable("delete")
    import org.apache.spark.sql.functions.{col, lit}
    // delete key 3 (exists, partition b) and key 99 (absent): only 3 goes
    val updates = Seq((3L, "b", 0.0, "d"), (99L, "b", 0.0, "d"), (6L, "b", 60.0, "u"))
      .toDF("id", "part", "v", "op")
    Merge.into(spark, root, updates, "id", "part", deleteWhen = Some(col("op") === "d"))
    val got = spark.read.parquet(root)
      .select($"id", $"part", $"v").as[(Long, String, Double)].collect().toSet
    assert(got == Set(
      (1L, "a", 10.0), (2L, "a", 20.0),
      (4L, "b", 40.0), (6L, "b", 60.0),
      (5L, "c", 50.0)), s"got $got")
    // the op-marker column never reaches the table schema
    assert(spark.read.parquet(root).columns.toSet == Set("id", "part", "v"))
    // one key as both upsert and delete is ambiguous — rejected
    val both = Seq((4L, "b", 44.0, "u"), (4L, "b", 0.0, "d")).toDF("id", "part", "v", "op")
    val e = intercept[IllegalArgumentException](
      Merge.into(spark, root, both, "id", "part", Some(col("op") === "d")))
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("deleting every row of a partition clears its directory (dynamic overwrite can't)") {
    val root = freshTable("clearpart")
    import org.apache.spark.sql.functions.col
    val dels = Seq((5L, "c", 0.0, "d")).toDF("id", "part", "v", "op")
    Merge.into(spark, root, dels, "id", "part", Some(col("op") === "d"))
    assert(!Files.exists(Paths.get(root, "part=c")),
      "an all-deleted partition's stale directory must be removed")
    val got = spark.read.parquet(root)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("a NULL deleteWhen row upserts instead of silently vanishing") {
    val root = freshTable("nullop")
    // key 3's op marker is NULL (e.g. a source that only stamps deletes):
    // filter(c)/filter(!c) would drop it from BOTH legs of the merge
    val updates = Seq((3L, "b", 99.0, null.asInstanceOf[String]),
      (5L, "c", 0.0, "d")).toDF("id", "part", "v", "op")
    Merge.into(spark, root, updates, "id", "part", Some(col("op") === "d"))
    val got = spark.read.parquet(root)
      .select($"id", $"part", $"v").as[(Long, String, Double)].collect().toSet
    assert(got == Set(
      (1L, "a", 10.0), (2L, "a", 20.0),
      (3L, "b", 99.0), (4L, "b", 40.0)), s"got $got")
  }

  test("emptied-partition cleanup works for non-string partition types (date)") {
    val root = Files.createTempDirectory("graft-merge-date").toString
    val d1 = java.sql.Date.valueOf("2024-01-15")
    val d2 = java.sql.Date.valueOf("2024-01-16")
    Seq((1L, d1, 10.0), (2L, d1, 20.0), (3L, d2, 30.0))
      .toDF("id", "day", "v")
      .write.partitionBy("day").mode("overwrite").parquet(root)
    // delete every row of 2024-01-16: its directory must be derived from
    // the on-disk layout and removed, not left stale by a re-rendered name
    val dels = Seq((3L, d2, 0.0, "d")).toDF("id", "day", "v", "op")
    Merge.into(spark, root, dels, "id", "day", Some(col("op") === "d"))
    assert(!Files.exists(Paths.get(root, "day=2024-01-16")),
      "the all-deleted date partition's directory must be removed")
    val got = spark.read.parquet(root).select($"id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("mergeSink: continuous upsert bootstraps, resolves within-batch dups, upserts across batches") {
    val root = Files.createTempDirectory("graft-merge-stream").toString + "/table"
    val ckpt = Files.createTempDirectory("graft-merge-ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Double, Long)]
    // batch 1 (bootstrap): keys 1,2 — key 1 written twice in the batch,
    // the later seq wins before the table is ever created
    in.addData((1L, "a", 1.0, 1L), (1L, "a", 1.5, 2L), (2L, "b", 2.0, 1L))
    val df = in.toDF().toDF("id", "part", "v", "seq")
    val q1 = Sinks.mergeSink(df, root, "id", "part",
      Seq(col("seq")), ckpt, Trigger.AvailableNow())
    assert(q1.awaitTermination(60000))
    // batch 2: update key 1, insert key 3 (same checkpoint — the stream resumes)
    in.addData((1L, "a", 9.0, 3L), (3L, "a", 3.0, 1L))
    val q2 = Sinks.mergeSink(df, root, "id", "part",
      Seq(col("seq")), ckpt, Trigger.AvailableNow())
    assert(q2.awaitTermination(60000))
    val got = spark.read.parquet(root)
      .select($"id", $"part", $"v").as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 9.0), (2L, "b", 2.0), (3L, "a", 3.0)), s"got $got")
  }

  test("mergeSink: CDC ops — within-batch upsert-then-delete nets to delete; markers stay transient") {
    val root = Files.createTempDirectory("graft-merge-cdc").toString + "/table"
    val ckpt = Files.createTempDirectory("graft-merge-cdc-ckpt").toString
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Double, String, Long)]
    // batch 1: insert keys 1,2 (bootstrap — marker/seq must not land in the schema)
    in.addData((1L, "a", 1.0, "u", 1L), (2L, "b", 2.0, "u", 1L))
    val df = in.toDF().toDF("id", "part", "v", "op", "seq")
    def sink() = Sinks.mergeSink(df, root, "id", "part", Seq(col("seq")), ckpt,
      Trigger.AvailableNow(), deleteWhen = Some(col("op") === "d"),
      transientCols = Seq("op", "seq"))
    assert(sink().awaitTermination(60000))
    assert(spark.read.parquet(root).columns.toSet == Set("id", "part", "v"))
    // batch 2: key 1 updated then deleted within the batch (seq orders it —
    // the delete is last and wins); key 3 inserted
    in.addData((1L, "a", 8.0, "u", 2L), (1L, "a", 0.0, "d", 3L), (3L, "c", 3.0, "u", 1L))
    assert(sink().awaitTermination(60000))
    val got = spark.read.parquet(root)
      .select($"id", $"part", $"v").as[(Long, String, Double)].collect().toSet
    assert(got == Set((2L, "b", 2.0), (3L, "c", 3.0)), s"got $got")
  }
}
