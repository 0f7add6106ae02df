package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Layout

/** Z-order layout: the box query over the clustered layout must (a) return
  * exactly the rows a plain filter returns, and (b) prune partitions — the
  * scan's PartitionFilters must carry the z_bucket range so most
  * directories are never read. (b) is the 100 TB point: one layout serves
  * range predicates on BOTH columns.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val bits = 8
  private val prefixBits = 8

  test("box query on the z-ordered layout: exact results + partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val cust = Tables.load(spark, TestSession.sf, "customer")
      .withColumn("zx", pmod($"c_custkey", lit(256L)))
      .withColumn("zy", pmod($"c_nationkey".cast("long"), lit(256L)))
    Layout.zOrderWrite(cust, "zx", "zy", bits, prefixBits, dir)

    // a box in the "low corner" of both dimensions: z-range covers a small
    // prefix of the curve, so most z_buckets fall outside it
    val (x0, x1, y0, y1) = (0L, 31L, 0L, 7L)
    val got = Layout.boxQuery(spark, dir, "zx", "zy", bits, prefixBits,
      x0, x1, y0, y1)

    // (a) exactness: same c_custkey set as the direct filter
    val expected = cust
      .filter($"zx" >= x0 && $"zx" <= x1 && $"zy" >= y0 && $"zy" <= y1)
      .select($"c_custkey").as[Long].collect().sorted.toSeq
    val gotKeys = got.select($"c_custkey").as[Long].collect().sorted.toSeq
    assert(gotKeys == expected && gotKeys.nonEmpty)

    // (b) pruning: z_bucket appears as a partition filter in the scan …
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("z_bucket"),
      s"expected z_bucket partition filter in:\n$plan")
    // … and the pruned scan reads strictly fewer partitions than exist
    val allBuckets = spark.read.parquet(dir)
      .select($"z_bucket").distinct().count()
    val zMax = Layout.interleave(x1, y1, bits) >> (2 * bits - prefixBits)
    assert(zMax + 1 < allBuckets,
      s"box z-range [0, $zMax] must cover fewer than all $allBuckets buckets")
  }

  test("quantile-bucketed z layout: skewed raw columns, exact box results, balanced buckets") {
    val dir = java.nio.file.Files.createTempDirectory("zorder-q").toString
    // heavily skewed raw coordinates: quadratic growth and a hot cluster
    // near zero — the shapes a raw pmod layout would pile into few buckets
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("price", ($"id" * $"id").cast("double"))
      .withColumn("qty", when(pmod($"id", lit(10)) < 8, $"id" % 7)
        .otherwise($"id").cast("double"))
    val (sx, sy) = Layout.zOrderWriteQuantile(df, "price", "qty", 6, 6, dir)
    // exactness vs the raw filter, bounds chosen inside the data range
    val (x0, x1, y0, y1) = (100.0, 2.5e6, 0.0, 5.0)
    val got = Layout.boxQueryQuantile(spark, dir, "price", "qty", 6, 6,
        sx, sy, x0, x1, y0, y1)
      .select($"id").as[Long].collect().sorted.toSeq
    val expected = df.filter($"price" >= x0 && $"price" <= x1 &&
        $"qty" >= y0 && $"qty" <= y1)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(got == expected && got.nonEmpty)
    // equi-depth promise: no single x-bucket holds a gross share of rows
    // (price is strictly monotone in id, so buckets should be near-even)
    val counts = df.select(Layout.bucketCol($"price", sx).as("b"))
      .groupBy($"b").count().select($"count").as[Long].collect()
    assert(counts.max < 4000 / 8,
      s"equi-depth buckets must spread skewed mass, got max=${counts.max}")
  }

  test("file-level stats skipping: range read opens only overlapping files, results exact") {
    val dir = java.nio.file.Files.createTempDirectory("stats-skip").toString
    // range-partitioned write: each of the 8 files covers a disjoint v range
    spark.range(0, 10000).toDF("id").withColumn("v", $"id".cast("double"))
      .repartitionByRange(8, $"v")
      .write.mode("overwrite").parquet(dir)
    Layout.writeStats(spark, dir, Seq("v"))
    val (got, kept, total) = Layout.statsPrunedRead(spark, dir, "v", 100.0, 300.0)
    assert(total == 8 && kept < total,
      s"narrow range must skip files: kept=$kept of $total")
    val ids = got.select($"id").as[Long].collect().sorted.toSeq
    assert(ids == (100L to 300L), s"exactness: got ${ids.take(5)}...")
    // a range overlapping nothing reads zero files and returns empty
    val (none, k2, _) = Layout.statsPrunedRead(spark, dir, "v", 1e9, 2e9)
    assert(k2 == 0 && none.isEmpty)
  }

  test("statsPrunedRead falls back to a full conservative read when the manifest lacks the column") {
    val dir = java.nio.file.Files.createTempDirectory("stats-fallback").toString
    spark.range(0, 100).toDF("id").withColumn("v", $"id".cast("double"))
      .write.mode("overwrite").parquet(dir)
    Layout.writeStats(spark, dir, Seq("id")) // stats for id, NOT v
    val (got, kept, total) = Layout.statsPrunedRead(spark, dir, "v", 10.0, 20.0)
    assert(kept == total, "unknown column must keep every file, not crash")
    assert(got.count() == 11)
  }

  test("zsplits sidecar round-trips and drives a correct box query in a fresh reader") {
    val dir = java.nio.file.Files.createTempDirectory("zsplits").toString
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("price", ($"id" * 3).cast("double"))
      .withColumn("qty", ($"id" % 50).cast("double"))
    Layout.zOrderWriteQuantile(df, "price", "qty", 5, 5, dir)
    // a later process knows only the path: splits come from the sidecar
    val (sx, sy, bits, prefix) = Layout.readZSplits(spark, dir)
    assert(bits == 5 && prefix == 5 && sx.nonEmpty && sy.nonEmpty)
    val got = Layout.boxQueryQuantile(spark, dir, "price", "qty", bits, prefix,
        sx, sy, 300.0, 900.0, 0.0, 10.0)
      .select($"id").as[Long].collect().sorted.toSeq
    val expected = df.filter($"price" >= 300.0 && $"price" <= 900.0 &&
        $"qty" >= 0.0 && $"qty" <= 10.0)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("compact refuses a partitioned table instead of flattening it to one file") {
    val dir = java.nio.file.Files.createTempDirectory("compact-part").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "part")
      .write.partitionBy("part").mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException](
      Layout.compact(spark, dir, dir + "-out", 1000000))
    assert(e.getMessage.contains("no top-level"))
  }

  test("quantile layout rejects NULL coordinates at write time, like the raw path") {
    val dir = java.nio.file.Files.createTempDirectory("zorder-null").toString
    val df = Seq((1L, Some(10.0), 1.0), (2L, None, 2.0))
      .toDF("id", "price", "qty")
      .select($"id", $"price".cast("double"), $"qty")
    val e = intercept[Exception](
      Layout.zOrderWriteQuantile(df, "price", "qty", 4, 4, dir))
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("out of ["),
      s"NULL must hit the range check's loud failure, got: ${rootMsg(e)}")
  }

  test("zValue column matches the driver-side interleave on every row") {
    val rows = Tables.load(spark, TestSession.sf, "customer")
      .select(
        pmod($"c_custkey", lit(256L)).as("x"),
        pmod($"c_nationkey".cast("long"), lit(256L)).as("y"))
      .withColumn("zv", Layout.zValue($"x", $"y", bits))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (x, y, zv) =>
      assert(zv == Layout.interleave(x, y, bits), s"mismatch at ($x, $y)")
    }
    assert(rows.nonEmpty)
  }

  test("zValueN: hand-computed interleaves; 2-D form is the N-D special case") {
    import org.apache.spark.sql.functions.lit
    def zN(vals: Long*)(bits: Int): Long =
      spark.range(1).select(
        Layout.zValueN(vals.map(lit), bits).as("z")).head().getLong(0)
    // 3-D, 2 bits: x=1(01) y=2(10) z=3(11):
    //   i=0 -> x:pos0=1, y:pos1=0, z:pos2=4; i=1 -> x:0, y:pos4=16, z:pos5=32
    assert(zN(1L, 2L, 3L)(2) == 53L)
    // 2-D: x=5(101) y=3(011) -> 1+2 + 8 + 16 = 27
    assert(zN(5L, 3L)(3) == 27L)
    // the 2-D entry point IS zValueN(Seq(x, y)) — same value on real data
    val rows = Tables.load(spark, TestSession.sf, "customer")
      .select(
        pmod($"c_custkey", lit(64L)).as("x"),
        pmod($"c_nationkey".cast("long"), lit(64L)).as("y"))
      .withColumn("a", Layout.zValue($"x", $"y", 6))
      .withColumn("b", Layout.zValueN(Seq($"x", $"y"), 6))
      .filter($"a" =!= $"b").count()
    assert(rows == 0L)
    // degenerate shapes rejected
    intercept[IllegalArgumentException](Layout.zValueN(Seq(lit(1L)), 4))
    intercept[IllegalArgumentException](
      Layout.zValueN(Seq(lit(1L), lit(2L), lit(3L)), 21)) // 63 bits > 62
  }

  test("out-of-range coordinates fail the write instead of mis-bucketing") {
    val dir = java.nio.file.Files.createTempDirectory("zorder-bad").toString
    val bad = Seq((300L, 5L)).toDF("zx", "zy") // 300 >= 2^8
    val e = intercept[Exception] {
      Layout.zOrderWrite(bad, "zx", "zy", bits, prefixBits, dir)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("out of [0, 256)")),
      s"expected the range error, got: $e")
    // and boxQuery rejects out-of-range bounds driver-side
    intercept[IllegalArgumentException] {
      Layout.boxQuery(spark, dir, "zx", "zy", bits, prefixBits, 0, 300, 0, 5)
    }
    // NULL coordinates fail the write too (no place on the curve)
    val withNull = Seq((Some(1L), 5L), (None, 6L)).toDF("zx", "zy")
    val ne = intercept[Exception] {
      Layout.zOrderWrite(withNull, "zx", "zy", bits, prefixBits, dir)
    }
    assert(messages(ne).exists(m => m.contains("out of [0, 256)") && m.contains("NULL")),
      s"expected the NULL range error, got: $ne")
  }

  test("z-range superset property: every box point's z lies in the corner range") {
    val (x0, x1, y0, y1) = (13L, 57L, 3L, 19L)
    for (x <- x0 to x1; y <- y0 to y1) {
      val z = Layout.interleave(x, y, bits)
      assert(z >= Layout.interleave(x0, y0, bits) &&
        z <= Layout.interleave(x1, y1, bits),
        s"z($x,$y)=$z escapes the corner range")
    }
  }

  test("compact: fragmented input collapses to byte-sized file count, content intact") {
    val in = java.nio.file.Files.createTempDirectory("compact-in").toString
    val out = java.nio.file.Files.createTempDirectory("compact-out").toString
    val df = spark.range(0, 2000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.mode("overwrite").parquet(in) // 40 tiny files
    val bytes = new java.io.File(in).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    val (inFiles, outFiles) = Layout.compact(spark, in, out, targetBytes = bytes / 4)
    assert(inFiles == 40)
    assert(outFiles <= 5 && outFiles >= 4, s"expected ~ceil(bytes/target)=4, got $outFiles")
    val written = new java.io.File(out).listFiles
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(written == outFiles)
    // content equality, order-agnostic
    val a = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq == b.toSeq)
  }
}
