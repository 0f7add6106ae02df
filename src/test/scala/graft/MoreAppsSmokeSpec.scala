package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.apps.{DimLakehouseApp, DwdFactApp, DwdOrderApp,
  DwdTrafficUniqueVisitorApp, DwdTrafficUserJumpApp,
  DwsTradeCartAddUuWindowApp, DwsTradeOrderWindowApp, DwsTradeRefundWindowApp,
  DwsTradeSkuOrderWindowApp, DwsTrafficHomeDetailPageViewWindowApp,
  DwsUserLoginWindowApp}

/** End-to-end smoke of the round-4 app mains (see AppsSmokeSpec for the
  * conventions: real `main(Array[String])` calls, file sources, mtime-
  * ordered fixture files, watermark-food batches for stateful chains).
  */
class MoreAppsSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val mtimeSeq = new java.util.concurrent.atomic.AtomicLong(
    System.currentTimeMillis() - 3600L * 1000)

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit = {
    val p = Files.write(Path.of(dir, name), String.join("\n", lines: _*).getBytes)
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(mtimeSeq.addAndGet(1000)))
  }

  private def env(table: String, tpe: String, ts: Long, data: (String, String)*) = {
    val d = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"database":"gmall","table":"$table","type":"$tpe","data":{$d},"ts":$ts}"""
  }

  private def envUpd(table: String, ts: Long, data: Seq[(String, String)],
                     old: Seq[(String, String)]) = {
    val d = data.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    val o = old.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"database":"gmall","table":"$table","type":"update","data":{$d},"old":{$o},"ts":$ts}"""
  }

  private def page(mid: String, uid: String, pageId: String, lastPage: String,
                   ts: Long) = {
    val lp = if (lastPage == null) "null" else s""""$lastPage""""
    s"""{"common":{"ar":"110000","ba":"b","ch":"web","is_new":"1","md":"m","mid":"$mid","os":"o","uid":"$uid","vc":"v1"},""" +
      s""""page":{"during_time":1000,"last_page_id":$lp,"page_id":"$pageId"},"ts":$ts}"""
  }

  test("DwdFactApp main --fact all: every dwd/db job off one scan, dict decode, dirty branch") {
    val in = tmp("factapp-in"); val out = tmp("factapp-out"); val cp = tmp("factapp-cp")
    val side = tmp("factapp-side")
    writeLines(in, "cdc.jsonl", Seq(
      env("cart_info", "insert", 100, "id" -> "c1", "user_id" -> "u1",
        "sku_id" -> "s1", "sku_num" -> "2", "source_type" -> "2401"),
      // sku_num grew 2->3: counts as a cart add with delta 1
      envUpd("cart_info", 101,
        Seq("id" -> "c1", "user_id" -> "u1", "sku_id" -> "s1", "sku_num" -> "3"),
        Seq("sku_num" -> "2")),
      // sku_num shrank: not a cart add
      envUpd("cart_info", 102,
        Seq("id" -> "c1", "user_id" -> "u1", "sku_id" -> "s1", "sku_num" -> "1"),
        Seq("sku_num" -> "3")),
      env("order_refund_info", "insert", 103, "id" -> "r1", "user_id" -> "u1",
        "order_id" -> "o1", "sku_id" -> "s1", "refund_type" -> "1501",
        "refund_num" -> "1", "refund_amount" -> "10.50"),
      env("user_info", "insert", 104, "id" -> "u9",
        "create_time" -> "2022-06-01 10:00:00"),
      env("comment_info", "insert", 105, "id" -> "cm1", "user_id" -> "u1",
        "sku_id" -> "s1", "appraise" -> "1201", "comment_txt" -> "nice"),
      envUpd("payment_info", 106,
        Seq("id" -> "p1", "order_id" -> "o1", "user_id" -> "u1",
          "payment_type" -> "1101", "callback_time" -> "t",
          "payment_status" -> "1602"),
        Seq("payment_status" -> "1601")),
      "not a cdc line"))
    val dict = s"$side/dict.csv"
    Files.write(Path.of(dict), "dic_code,dic_name\n1201,good".getBytes)

    DwdFactApp.main(Array(
      "--fact", "all", "--source", "file", "--input", in, "--dict", dict,
      "--out", out, "--checkpoint", cp))
    spark.sparkContext.setLogLevel("ERROR")

    val cartAdd = spark.read.parquet(s"$out/cart_add")
    assert(cartAdd.count() == 2) // insert + grown update; shrink filtered
    assert(cartAdd.agg(org.apache.spark.sql.functions.sum($"delta"))
      .as[Double].head() == 3.0) // 2 (insert) + 1 (grew 2->3)
    assert(spark.read.parquet(s"$out/order_refund").count() == 1)
    val reg = spark.read.parquet(s"$out/user_register")
    assert(reg.count() == 1 &&
      reg.select($"date_id").as[String].head() == "2022-06-01")
    val cm = spark.read.parquet(s"$out/comment_info")
    assert(cm.select($"appraise_name").as[String].head() == "good")
    assert(spark.read.parquet(s"$out/payment_info").count() == 1)
    assert(spark.read.parquet(s"$out/dirty").count() == 1)
  }

  test("DwdTrafficUniqueVisitorApp + DwdTrafficUserJumpApp: UV filter and CEP bounce from the same logs") {
    val in = tmp("uvjump-in"); val uvOut = tmp("uvjump-uv"); val jOut = tmp("uvjump-j")
    val cp1 = tmp("uvjump-c1"); val cp2 = tmp("uvjump-c2")
    writeLines(in, "00_logs.jsonl", Seq(
      page("m1", "u1", "home", null, 1000),      // m1 day-1 entry -> UV
      page("m1", "u1", "cart", "home", 2000),    // in-session -> not UV, clears bounce
      page("m1", "u1", "home", null, 5000),      // same day -> no UV; dangling entry
      page("m2", "u2", "home", null, 3000)))     // m2 entry -> UV; dangling entry
    // later one-file batch pushes the watermark past both jump timeouts
    writeLines(in, "01_food.jsonl", Seq(
      page("mf", "uf", "home", null, 10000000L)))

    DwdTrafficUniqueVisitorApp.main(Array(
      "--source", "file", "--input", in, "--out", uvOut, "--checkpoint", cp1,
      "--max-files-per-trigger", "1"))
    DwdTrafficUserJumpApp.main(Array(
      "--source", "file", "--input", in, "--out", jOut, "--checkpoint", cp2,
      "--gap-seconds", "10", "--max-files-per-trigger", "1"))
    spark.sparkContext.setLogLevel("ERROR")

    val uv = spark.read.parquet(uvOut).select($"mid").as[String].collect().sorted
    assert(uv.toSeq == Seq("m1", "m2", "mf")) // one per mid per day

    val bounces = spark.read.parquet(jOut)
      .select($"mid", $"ts".cast("long")).as[(String, Long)].collect().toSet
    // m1's 5000 entry and m2's 3000 entry time out with no follow-up view;
    // m1's 1000 entry was followed in-session so it is NOT a bounce
    assert(bounces == Set(("m1", 5L), ("m2", 3L)), s"got $bounces")
  }

  test("DwsTradeCartAddUuWindowApp + DwsTradeRefundWindowApp: CDC facts to windowed summaries") {
    val cartIn = tmp("cartuu-in"); val cartOut = tmp("cartuu-out"); val cp1 = tmp("cartuu-cp")
    writeLines(cartIn, "00_cart.jsonl", Seq(
      env("cart_info", "insert", 100, "id" -> "c1", "user_id" -> "u1",
        "sku_id" -> "s1", "sku_num" -> "1", "source_type" -> "2401"),
      env("cart_info", "insert", 105, "id" -> "c2", "user_id" -> "u1",
        "sku_id" -> "s2", "sku_num" -> "1", "source_type" -> "2401"), // same day dup user
      env("cart_info", "insert", 103, "id" -> "c3", "user_id" -> "u2",
        "sku_id" -> "s1", "sku_num" -> "1", "source_type" -> "2401")))
    writeLines(cartIn, "01_food.jsonl", Seq(
      env("cart_info", "insert", 1000000000L, "id" -> "cf", "user_id" -> "uf",
        "sku_id" -> "s1", "sku_num" -> "1", "source_type" -> "2401")))
    DwsTradeCartAddUuWindowApp.main(Array(
      "--source", "file", "--input", cartIn, "--out", cartOut,
      "--checkpoint", cp1, "--max-files-per-trigger", "1"))
    spark.sparkContext.setLogLevel("ERROR")
    val cart = spark.read.parquet(cartOut)
      .select($"stt".cast("long"), $"cart_add_uu_ct").as[(Long, Long)].collect().toSet
    assert(cart.contains((100L, 2L)), s"got $cart") // u1 + u2, u1's second add not uu

    val refIn = tmp("refund-in"); val refOut = tmp("refund-out"); val cp2 = tmp("refund-cp")
    val side = tmp("refund-side")
    writeLines(refIn, "00_ref.jsonl", Seq(
      env("order_refund_info", "insert", 100, "id" -> "r1", "user_id" -> "u1",
        "order_id" -> "o1", "sku_id" -> "s1", "refund_type" -> "1501",
        "refund_num" -> "1", "refund_amount" -> "10.50"),
      env("order_refund_info", "insert", 103, "id" -> "r2", "user_id" -> "u1",
        "order_id" -> "o2", "sku_id" -> "s1", "refund_type" -> "1501",
        "refund_num" -> "1", "refund_amount" -> "2.00"),
      // replayed duplicate of r1 -> deduped
      env("order_refund_info", "insert", 104, "id" -> "r1", "user_id" -> "u1",
        "order_id" -> "o1", "sku_id" -> "s1", "refund_type" -> "1501",
        "refund_num" -> "1", "refund_amount" -> "10.50")))
    writeLines(refIn, "01_food.jsonl", Seq(
      env("order_refund_info", "insert", 1000000000L, "id" -> "rf",
        "user_id" -> "uf", "order_id" -> "of", "sku_id" -> "s1",
        "refund_type" -> "1501", "refund_num" -> "1", "refund_amount" -> "1.00")))
    def dim(name: String, header: String, rows: String*): String = {
      val p = s"$side/$name.csv"
      Files.write(Path.of(p), (header +: rows).mkString("\n").getBytes)
      p
    }
    DwsTradeRefundWindowApp.main(Array(
      "--source", "file", "--input", refIn,
      "--sku", dim("sku", "id,tm_id,category3_id", "s1,t1,c33"),
      "--trademark", dim("tm", "id,tm_name", "t1,Acme"),
      "--c3", dim("c3", "id,name,category2_id", "c33,phones,c22"),
      "--c2", dim("c2", "id,name,category1_id", "c22,electronics,c11"),
      "--c1", dim("c1", "id,name", "c11,tech"),
      "--out", refOut, "--checkpoint", cp2, "--max-files-per-trigger", "1"))
    spark.sparkContext.setLogLevel("ERROR")
    val ref = spark.read.parquet(refOut)
      .select($"stt".cast("long"), $"tm_name", $"category1_name", $"user_id",
        $"refund_ct", $"refund_amount_sum".cast("double"))
      .as[(Long, String, String, String, Long, Double)].collect().toSet
    assert(ref.contains((100L, "Acme", "tech", "u1", 2L, 12.50)), s"got $ref")
  }

  test("DwsUserLoginWindowApp + DwsTrafficHomeDetailPageViewWindowApp: log-side windows") {
    val in = tmp("loginpv-in"); val loginOut = tmp("loginpv-login")
    val hdOut = tmp("loginpv-hd"); val cp1 = tmp("loginpv-c1"); val cp2 = tmp("loginpv-c2")
    val day9 = 9L * 24 * 3600 * 1000
    writeLines(in, "00_logs.jsonl", Seq(
      page("m1", "u1", "home", null, 1000),        // u1 login (uu), home uv
      page("m1", "u1", "good_detail", "home", 2000), // in-session: not a login; detail uv
      page("m2", "u2", "home", null, 3000),        // u2 login (uu), home uv for m2
      page("m1", "u1", "home", "cart", 4000)))     // in-session home view: pv only
    writeLines(in, "01_back.jsonl", Seq(
      page("m1", "u1", "home", null, day9)))       // u1 returns after >7 days: back=1
    writeLines(in, "02_food.jsonl", Seq(
      page("mf", "uf", "home", null, day9 + 100000000L)))

    DwsUserLoginWindowApp.main(Array(
      "--source", "file", "--input", in, "--out", loginOut,
      "--checkpoint", cp1, "--max-files-per-trigger", "1"))
    DwsTrafficHomeDetailPageViewWindowApp.main(Array(
      "--source", "file", "--input", in, "--out", hdOut,
      "--checkpoint", cp2, "--max-files-per-trigger", "1"))
    spark.sparkContext.setLogLevel("ERROR")

    val login = spark.read.parquet(loginOut)
      .select($"stt".cast("long"), $"uu_ct", $"back_ct")
      .as[(Long, Long, Long)].collect().toSet
    assert(login.contains((0L, 2L, 0L)), s"got $login")       // u1 + u2 day 1
    assert(login.contains((day9 / 1000, 1L, 1L)), s"got $login") // u1 back-flow

    val hd = spark.read.parquet(hdOut)
      .select($"stt".cast("long"), $"home_uv_ct", $"good_detail_uv_ct")
      .as[(Long, Long, Long)].collect().toSet
    // day-1 window [0,10s): home uv m1+m2 (m1's second home view is same-day),
    // detail uv m1
    assert(hd.contains((0L, 2L, 1L)), s"got $hd")
  }

  test("DWD->DWS chain: DwdOrderApp feeds DwsTradeOrderWindowApp and DwsTradeSkuOrderWindowApp") {
    val in = tmp("ordchain-in"); val dwdOut = tmp("ordchain-dwd")
    val ordOut = tmp("ordchain-ord"); val skuOut = tmp("ordchain-sku")
    val cp1 = tmp("ordchain-c1"); val cp2 = tmp("ordchain-c2")
    val cp3 = tmp("ordchain-c3"); val side = tmp("ordchain-side")

    writeLines(in, "00_orders.jsonl", Seq(
      env("order_info", "insert", 100, "id" -> "o1", "user_id" -> "u1",
        "province_id" -> "p1", "order_status" -> "1001"),
      env("order_info", "insert", 101, "id" -> "o2", "user_id" -> "u2",
        "province_id" -> "p1", "order_status" -> "1001"),
      env("order_detail", "insert", 101, "id" -> "d1", "order_id" -> "o1",
        "sku_id" -> "s1", "sku_name" -> "w", "sku_num" -> "2",
        "order_price" -> "10.00", "source_type" -> "2401", "create_time" -> "t"),
      env("order_detail", "insert", 102, "id" -> "d2", "order_id" -> "o1",
        "sku_id" -> "s2", "sku_name" -> "w", "sku_num" -> "1",
        "order_price" -> "5.00", "source_type" -> "2401", "create_time" -> "t"),
      env("order_detail", "insert", 103, "id" -> "d3", "order_id" -> "o2",
        "sku_id" -> "s1", "sku_name" -> "w", "sku_num" -> "1",
        "order_price" -> "3.50", "source_type" -> "2401", "create_time" -> "t"),
      env("order_info", "insert", 114, "id" -> "o3", "user_id" -> "u3",
        "province_id" -> "p2", "order_status" -> "1001"),
      env("order_detail", "insert", 115, "id" -> "d4", "order_id" -> "o3",
        "sku_id" -> "s1", "sku_name" -> "w", "sku_num" -> "1",
        "order_price" -> "1.00", "source_type" -> "2401", "create_time" -> "t")))
    for (i <- 1 to 6) {
      val t = 500000L + i
      writeLines(in, f"$i%02d_food.jsonl", Seq(
        env("order_info", "insert", t, "id" -> s"o$i", "user_id" -> "u",
          "province_id" -> "p1", "order_status" -> "1001"),
        env("order_detail", "insert", t, "id" -> s"dn$i", "order_id" -> s"o$i",
          "sku_id" -> "s", "sku_name" -> "z", "sku_num" -> "1",
          "order_price" -> "1.00", "source_type" -> "2401", "create_time" -> "t"),
        env("order_detail_activity", "insert", t, "order_detail_id" -> s"dn$i",
          "activity_id" -> "a", "activity_rule_id" -> "r"),
        env("order_detail_coupon", "insert", t, "order_detail_id" -> s"dn$i",
          "coupon_id" -> "c")))
    }
    val dict = s"$side/dict.csv"
    Files.write(Path.of(dict), "dic_code,dic_name\n2401,user order".getBytes)

    DwdOrderApp.main(Array(
      "--source", "file", "--input", in, "--dict", dict,
      "--out", dwdOut, "--checkpoint", cp1, "--max-files-per-trigger", "1"))
    spark.sparkContext.setLogLevel("ERROR")

    // no --max-files-per-trigger here: the DWD job's outer-join rows land
    // in LATER batch files than the food rows that flushed them, so a
    // one-file-per-batch replay would advance the watermark past the
    // business rows before they arrive and the flagger would drop them as
    // late. One batch reads everything at watermark 0; the AvailableNow
    // flush batch then closes the windows.
    DwsTradeOrderWindowApp.main(Array(
      "--input", dwdOut, "--out", ordOut, "--checkpoint", cp2))
    spark.sparkContext.setLogLevel("ERROR")
    val ord = spark.read.parquet(ordOut)
      .select($"stt".cast("long"), $"order_unique_user_ct", $"order_new_user_ct",
        $"order_origin_total_amount".cast("double"))
      .as[(Long, Long, Long, Double)].collect().toSet
    // [100,110): u1 (d1,d2) + u2 (d3), both first-ever; 20 + 5 + 3.5
    assert(ord.contains((100L, 2L, 2L, 28.50)), s"got $ord")
    assert(ord.contains((110L, 1L, 1L, 1.00)), s"got $ord")

    def dim(name: String, header: String, rows: String*): String = {
      val p = s"$side/$name.csv"
      Files.write(Path.of(p), (header +: rows).mkString("\n").getBytes)
      p
    }
    DwsTradeSkuOrderWindowApp.main(Array(
      "--input", dwdOut,
      "--sku", dim("sku", "id,spu_id,tm_id,category3_id", "s1,sp1,t1,c33", "s2,sp2,t2,c34"),
      "--spu", dim("spu", "id,spu_name", "sp1,widget", "sp2,gadget"),
      "--trademark", dim("tm", "id,tm_name", "t1,Acme", "t2,Globex"),
      "--c3", dim("c3", "id,name,category2_id", "c33,phones,c22", "c34,laptops,c22"),
      "--c2", dim("c2", "id,name,category1_id", "c22,electronics,c11"),
      "--c1", dim("c1", "id,name", "c11,tech"),
      "--out", skuOut, "--checkpoint", cp3))
    spark.sparkContext.setLogLevel("ERROR")
    val sku = spark.read.parquet(skuOut)
      .select($"stt".cast("long"), $"tm_name", $"spu_name", $"user_id",
        $"order_detail_ct", $"order_amount".cast("double"))
      .as[(Long, String, String, String, Long, Double)].collect().toSet
    // d1: s1/u1 20.0, d3: s1/u2 3.5 (both Acme/widget); d2: s2/u1 Globex/gadget 5.0
    assert(sku.contains((100L, "Acme", "widget", "u1", 1L, 20.0)), s"got $sku")
    assert(sku.contains((100L, "Acme", "widget", "u2", 1L, 3.5)), s"got $sku")
    assert(sku.contains((100L, "Globex", "gadget", "u1", 1L, 5.0)), s"got $sku")
  }

  test("DimLakehouseApp main: CDC upserts+deletes maintain a resolved parquet dim table") {
    val in = tmp("dimlake-in"); val out = tmp("dimlake-out") + "/user_dim"
    val cp = tmp("dimlake-cp")
    def runApp(): Unit = DimLakehouseApp.main(Array(
      "--source", "file", "--input", in,
      "--table", "user_info", "--pk", "id", "--columns", "id,name,tier",
      "--buckets", "4", "--out", out, "--checkpoint", cp,
      "--trigger", "available-now"))
    // batch 1 (bootstrap): two inserts, an update, and a delete — resolved
    // within the batch before the table exists
    writeLines(in, "b1.jsonl", Seq(
      env("user_info", "insert", 100, "id" -> "u1", "name" -> "ann", "tier" -> "gold"),
      env("user_info", "insert", 100, "id" -> "u2", "name" -> "bob", "tier" -> "base"),
      env("user_info", "update", 101, "id" -> "u1", "name" -> "anne", "tier" -> "gold"),
      env("user_info", "delete", 102, "id" -> "u2", "name" -> "bob", "tier" -> "base"),
      env("other_table", "insert", 103, "id" -> "x1"))) // filtered out
    runApp()
    spark.sparkContext.setLogLevel("ERROR")
    val after1 = spark.read.parquet(out)
      .select($"id", $"name", $"tier").as[(String, String, String)].collect().toSet
    assert(after1 == Set(("u1", "anne", "gold")), s"got $after1")
    // the op marker is transient; ts and the hash bucket are table columns
    assert(spark.read.parquet(out).columns.toSet == Set("ts", "id", "name", "tier", "bucket"))
    // batch 2 (merge): update u1, insert-then-delete u3 nets to nothing
    writeLines(in, "b2.jsonl", Seq(
      env("user_info", "update", 200, "id" -> "u1", "name" -> "anne", "tier" -> "plat"),
      env("user_info", "insert", 201, "id" -> "u3", "name" -> "cal", "tier" -> "base"),
      env("user_info", "delete", 202, "id" -> "u3", "name" -> "cal", "tier" -> "base")))
    runApp()
    val after2 = spark.read.parquet(out)
      .select($"id", $"name", $"tier").as[(String, String, String)].collect().toSet
    assert(after2 == Set(("u1", "anne", "plat")), s"got $after2")
  }

  test("TableMaintainApp main: compaction + stats manifest, and the z-order variant") {
    import org.apache.spark.sql.functions.col
    val in = tmp("maintain-in"); val outC = tmp("maintain-outc") + "/t"
    val outZ = tmp("maintain-outz") + "/t"
    // fragmented ingest shape: 20 tiny files
    spark.range(0, 4000).toDF("id")
      .withColumn("v", col("id").cast("double"))
      .withColumn("w", (col("id") % 97).cast("double"))
      .repartition(20).write.mode("overwrite").parquet(in)
    graft.apps.TableMaintainApp.main(Array(
      "--in", in, "--out", outC, "--target-bytes", "10000000",
      "--stats", "v,w"))
    spark.sparkContext.setLogLevel("ERROR")
    val nOut = new java.io.File(outC).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nOut < 20, s"compaction must shrink the file count, got $nOut")
    val (pruned, kept, total) = graft.operators.Layout
      .statsPrunedRead(spark, outC, "v", 10.0, 20.0)
    assert(kept <= total && pruned.count() == 11)
    // z-order branch: clustered rewrite + stats over the clustered output
    graft.apps.TableMaintainApp.main(Array(
      "--in", in, "--out", outZ, "--zorder", "v,w",
      "--zbits", "5", "--zprefix", "5", "--stats", "v"))
    spark.sparkContext.setLogLevel("ERROR")
    assert(new java.io.File(outZ).listFiles().exists(_.getName.startsWith("z_bucket=")),
      "z-order branch must write bucket directories")
    assert(new java.io.File(outZ, "_stats").exists, "stats manifest must exist")
  }

  test("CorpusBuildApp main: decontaminate -> clean -> split -> pack, one job, one output tree") {
    import org.apache.spark.sql.functions.col
    val base = tmp("corpus-build")
    val out = s"$base/out"
    def edit(b: String, repl: (Int, String)*): String = {
      val w = b.split(' '); repl.foreach { case (i, s) => w(i) = s }; w.mkString(" ")
    }
    val b23 = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey"
    val canary = "THE-PLANTED-CANARY-SPAN-FOR-THE-BUILD-JOB"
    Seq(
      (1L, b23, "en", "src_a", 0L),
      // J = 0.4 vs doc 1: survives the 0.5 dedup, clusters at the 0.3 split
      (2L, edit(b23, 4 -> "xx", 10 -> "yy", 16 -> "zz"), "en", "src_a", 0L),
      (3L, b23, "en", "src_a", 0L), // exact dup -> dropped
      (4L, b23 + " appended", "en", "src_a", 0L), // J ~0.95 near-dup -> dropped
      (5L, "a a a a a a a a", "en", "src_a", 0L), // quality reject
      (6L, s"good prose but contains $canary verbatim inside", "en", "src_a", 0L),
      // doc 7 ships WRAPPED in markup: --strip-markup must peel it back
      // to the plain prose BEFORE scrub/fingerprinting (the wrap strips
      // to exactly the inner text, so dedup semantics are unchanged)
      (7L, "<html><body><!-- hdr --><p>completely different prose about " +
        "volcanic geology and rare <b>minerals</b> mail curator@example.org " +
        "for samples</p><script>track();</script></body></html>", "en", "src_b", 0L),
      (8L, "another standalone text on deep sea hydrothermal vents and fauna", "en", "src_b", 0L),
      // a contaminated doc whose canary span CONTAINS PII: the canary
      // list carries the raw phrase, the corpus is scrubbed first —
      // decontamination must still fire (both sides pass the same scrub)
      (9L, "please reach admin@leak.example.com for the SECRET benchmark items today", "en", "src_b", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$base/docs")
    val canaryFile = new java.io.File(tmp("build-canaries"), "c.txt")
    java.nio.file.Files.write(canaryFile.toPath,
      (s"$canary\nANOTHER-UNHIT-CANARY-PHRASE\n" +
        "reach admin@leak.example.com for the SECRET benchmark\n").getBytes)
    graft.apps.CorpusBuildApp.main(Array(
      "--input", s"$base/docs", "--out", out,
      "--strip-markup", "true", "--scrub-pii", "true",
      "--canaries", canaryFile.getAbsolutePath,
      "--split-jaccard", "0.3", "--buckets", "10", "--train-splits", "0-7"))
    spark.sparkContext.setLogLevel("ERROR")
    val kept = spark.read.parquet(s"$out/docs")
      .select($"doc_id", $"split").as[(Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(kept.keySet == Set(1L, 2L, 7L, 8L),
      s"canary 6, dup 3, near-dup 4, low-quality 5, PII-canary 9 must " +
        s"drop; got ${kept.keySet}")
    // --scrub-pii ran as stage 0: the planted email is redacted in the
    // OUTPUT corpus (scrub-before-fingerprint, so dedup saw scrubbed text)
    val d7 = spark.read.parquet(s"$out/docs")
      .filter($"doc_id" === 7L).select($"text").as[String].head()
    assert(d7.contains("<EMAIL>") && !d7.contains("curator@"),
      s"doc 7 must ship scrubbed: $d7")
    // --strip-markup ran BEFORE scrub: the wrap, the inline tag, and the
    // script content are all gone from the shipped text
    assert(d7 == "completely different prose about volcanic geology and " +
      "rare minerals mail <EMAIL> for samples",
      s"doc 7 must ship markup-stripped then scrubbed: $d7")
    // the PII funnel landed per-source: src_b carried both planted emails
    val pii = spark.read.parquet(s"$out/pii_by_source")
      .select($"source", $"docs", $"n_email")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(pii("src_b") == (("src_b", 3L, 2L)),
      s"src_b funnel row must count its 2 emails over 3 docs: $pii")
    assert(pii("src_a")._3 == 0L, s"src_a carries no PII: $pii")
    // the split is leakage-free at the WIDER radius: 1 and 2 are related
    // (J = 0.4) though not dedup-duplicates — same cluster, same split
    val labels = spark.read.parquet(s"$out/labels")
      .select($"doc_id", $"cluster", $"split")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(labels(1L)._2 == labels(2L)._2,
      s"docs 1/2 must share a split cluster: $labels")
    assert(kept(1L) == kept(2L), "same cluster -> same split bucket")
    // the pack covers exactly the train-split docs, gaplessly per shard
    val packed = spark.read.parquet(s"$out/pack")
      .select($"doc_id").as[Long].collect().toSet
    val trainIds = kept.filter(_._2 <= 7).keySet
    assert(packed == trainIds, s"pack must cover the train splits: $packed vs $trainIds")
    assert(new java.io.File(s"$out/stats").exists)
  }

  test("SplitRecapApp main: an incremental bridge resolves to one cluster and one split after recap") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    val base = tmp("split-recap")
    val admitted = s"$base/admitted"
    val labelsDir = s"$base/labels"
    // C = t01..t30; A = its first 22 tokens, B = its last 22:
    // J(A,C) = J(B,C) = 20/28 ≈ 0.714 >= 0.5 (both near-dup C), while
    // J(A,B) = 12/28 ≈ 0.43 < 0.5 — C BRIDGES two clusters that are not
    // near-dups of each other
    def toks(from: Int, to: Int) = (from to to).map(i => f"t$i%02d").mkString(" ")
    val aDoc = (1L, toks(1, 22))
    val bDoc = (2L, toks(9, 30))
    val cDoc = (200L, toks(1, 30))
    val recapArgs = Array("--input", admitted, "--labels", labelsDir,
      "--buckets", "10", "--jaccard", "0.5", "--bands", "8")
    // phase 1: admitted corpus is {A, B, singletons}; recap labels them
    Seq(aDoc, bDoc, (3L, "wholly unrelated text about other things entirely"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(admitted)
    graft.apps.SplitRecapApp.main(recapArgs)
    val labels0 = spark.read.parquet(labelsDir)
    val l0 = labels0.select($"doc_id", $"cluster", $"split")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(l0(1L)._2 != l0(2L)._2, "A and B must start in different clusters")
    // phase 2: C arrives incrementally — adopts the min cluster, flags the bridge
    val index = spark.read.parquet(admitted)
    val inc = Dedup.incrementalClusterSplit(
        Seq(cDoc).toDF("doc_id", "text"),
        Dedup.minhashSignatures(index, "doc_id", "text", 3, 16),
        labels0.select($"doc_id", $"cluster"),
        "doc_id", "text", n = 3, k = 16, bands = 8, threshold = 0.5,
        buckets = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(inc.toSeq == Seq((200L, math.min(l0(1L)._2, l0(2L)._2),
      inc.head._3, 1L)), s"C must adopt the min cluster and flag bridged=1: ${inc.toSeq}")
    // phase 3: the recap over {A, B, C} rewrites the labels — ONE cluster,
    // ONE split for all three; the unrelated singleton keeps itself
    spark.createDataFrame(Seq(cDoc)).toDF("doc_id", "text")
      .write.mode("append").parquet(admitted)
    graft.apps.SplitRecapApp.main(recapArgs)
    val l1 = spark.read.parquet(labelsDir)
      .select($"doc_id", $"cluster", $"split")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(l1(1L)._2 == l1(2L)._2 && l1(2L)._2 == l1(200L)._2,
      s"recap must merge the bridge into one cluster: $l1")
    assert(l1(1L)._3 == l1(2L)._3 && l1(2L)._3 == l1(200L)._3,
      "one cluster means one split")
    assert(l1(3L)._2 == 3L, "the unrelated singleton stays self-labeled")
  }
}
