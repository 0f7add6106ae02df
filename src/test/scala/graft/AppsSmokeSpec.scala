package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.apps.{BaseLogApp, CorpusCurateApp, CorpusIngestApp, CorpusReportApp, DimApp,
  DwdOrderApp, DwsTradePaymentSucWindowApp, DwsTradeProvinceOrderWindowApp,
  DwsUserRegisterWindowApp, KeywordWindowApp, TrafficPageViewWindowApp}
import graft.sinks.Sinks

/** End-to-end smoke of the deployable app mains (`graft.apps.*`): each app
  * is invoked through its REAL `main(Array[String])` — CLI config, file
  * source, parquet sinks, checkpoint dirs — exactly as
  * `scripts/run.sh graft.apps.<App> …` would run it. The DWD→DWS pair runs
  * as a chain: the DWS job streams the directory the DWD job wrote.
  */
class AppsSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // FileStreamSource orders files by MODIFICATION TIME; fixture files land
  // within the same millisecond, so without distinct mtimes the watermark
  // "food" files can be read before the business rows, late-dropping them.
  // Strictly increasing mtimes make write order the replay order.
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

  test("BaseLogApp main: file source -> five routed branches + dirty, via CLI args") {
    val in = tmp("applog-in"); val out = tmp("applog-out"); val cp = tmp("applog-cp")
    val common = """"common":{"ar":"110000","mid":"m1","uid":"u1","is_new":"1"}"""
    writeLines(in, "logs.jsonl", Seq(
      s"""{$common,"page":{"page_id":"home","during_time":5000},"displays":[{"item":"i1","item_type":"sku_id","order":1,"pos_id":2},{"item":"i2","item_type":"sku_id","order":2,"pos_id":3}],"ts":1000}""",
      s"""{$common,"page":{"page_id":"cart","during_time":100},"actions":[{"action_id":"fav","item":"i1","item_type":"sku_id","ts":1500}],"ts":1400}""",
      s"""{$common,"start":{"entry":"icon","loading_time":1200,"open_ad_id":1,"open_ad_ms":100,"open_ad_skip_ms":0},"ts":2000}""",
      s"""{$common,"err":{"error_code":"500","msg":"boom"},"page":{"page_id":"home","during_time":1},"ts":3000}""",
      "this is not json"))

    BaseLogApp.main(Array(
      "--source", "file", "--input", in, "--out", out, "--checkpoint", cp))
    spark.sparkContext.setLogLevel("ERROR")

    assert(spark.read.parquet(s"$out/page").count() == 3)  // 2 pages + err row's page
    assert(spark.read.parquet(s"$out/display").count() == 2) // exploded
    assert(spark.read.parquet(s"$out/action").count() == 1)
    assert(spark.read.parquet(s"$out/start").count() == 1)
    assert(spark.read.parquet(s"$out/err").count() == 1)
    assert(spark.read.parquet(s"$out/dirty").as[String].head() == "this is not json")
    // page branch excludes start-ups even when they carry a page payload
    assert(spark.read.parquet(s"$out/page")
      .filter($"page.page_id" === "home").count() == 2)
  }

  test("DimApp main: config-routed dim store + upsert read-back, via CLI args") {
    val in = tmp("appdim-in"); val out = tmp("appdim-out"); val cp = tmp("appdim-cp")
    val cfgDir = tmp("appdim-cfg")
    writeLines(in, "cdc.jsonl", Seq(
      env("user_info", "insert", 100, "id" -> "1", "name" -> "n1", "extra" -> "x"),
      env("user_info", "bootstrap-insert", 101, "id" -> "2", "name" -> "n2"),
      env("base_trademark", "insert", 102, "id" -> "7", "tm_name" -> "brand"),
      env("order_info", "insert", 103, "id" -> "9"), // not in config -> dropped
      """{"database":"gmall","table":"user_info","type":"update","data":{"id":"1","name":"n1b"},"old":{"name":"n1"},"ts":104}""",
      "garbage line",
      """{"database":"gmall","table":"user_info","type":"bootstrap-start","ts":105}"""))
    val cfg = cfgDir + "/table_process.csv"
    Files.write(Path.of(cfg), Seq(
      "source_table,sink_table,sink_columns",
      """user_info,dim_user_info,"id,name"""",
      """base_trademark,dim_base_trademark,"id,tm_name"""").mkString("\n").getBytes)

    DimApp.main(Array(
      "--source", "file", "--input", in, "--config", cfg,
      "--out", out, "--checkpoint", cp))
    spark.sparkContext.setLogLevel("ERROR")

    val dims = spark.read.parquet(s"$out/dims")
    // routed: 3 user_info (insert + bootstrap-insert + update), 1 trademark;
    // order_info (unconfigured) and bootstrap-start (no data) dropped
    assert(dims.filter($"sink_table" === "dim_user_info").count() == 3)
    assert(dims.filter($"sink_table" === "dim_base_trademark").count() == 1)
    assert(dims.count() == 4)
    // pruning: the unconfigured 'extra' column is gone from data
    assert(dims.filter($"sink_table" === "dim_user_info")
      .select(map_keys($"data")).as[Seq[String]].collect()
      .forall(ks => ks.toSet.subsetOf(Set("id", "name"))))
    // read-side upsert by pk: the update wins for pk=1
    val view = Sinks.upsertView(
      dims.filter($"sink_table" === "dim_user_info"), Seq("pk"), "ts", "type")
    assert(view.count() == 2)
    assert(view.filter($"pk" === "1").select($"data"("name"))
      .as[String].head() == "n1b")
    // dirty side output captured the unparseable line
    assert(spark.read.parquet(s"$out/dirty").as[String].head() == "garbage line")
  }

  test("DWD->DWS chain: DwdOrderApp output directory streams into DwsTradeProvinceOrderWindowApp") {
    val in = tmp("appchain-in"); val dwdOut = tmp("appchain-dwd")
    val dwsOut = tmp("appchain-dws")
    val cp1 = tmp("appchain-cp1"); val cp2 = tmp("appchain-cp2")
    val side = tmp("appchain-side")

    // business rows: two orders in province p1, one in p2, window [100,110)
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
      // replayed duplicate of d1 -> DWS dedups it
      env("order_detail", "insert", 103, "id" -> "d1", "order_id" -> "o1",
        "sku_id" -> "s1", "sku_name" -> "w", "sku_num" -> "2",
        "order_price" -> "10.00", "source_type" -> "2401", "create_time" -> "t"),
      env("order_info", "insert", 114, "id" -> "o3", "user_id" -> "u3",
        "province_id" -> "p2", "order_status" -> "1001"),
      env("order_detail", "insert", 115, "id" -> "d4", "order_id" -> "o3",
        "sku_id" -> "s1", "sku_name" -> "w", "sku_num" -> "1",
        "order_price" -> "1.00", "source_type" -> "2401", "create_time" -> "t")))
    // watermark food: the global watermark is min() across all four
    // envelope leaves and crosses one stateful op per micro-batch, so
    // several one-file batches (maxFilesPerTrigger=1) nudge it through
    // the 3-join chain — the file-source replay of the topic feed.
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
    Files.write(Path.of(dict),
      "dic_code,dic_name\n2401,user order".getBytes)
    val provinces = s"$side/provinces.csv"
    Files.write(Path.of(provinces),
      "id,name\np1,Beijing\np2,Shanghai".getBytes)

    DwdOrderApp.main(Array(
      "--source", "file", "--input", in, "--dict", dict,
      "--out", dwdOut, "--checkpoint", cp1, "--max-files-per-trigger", "1"))
    spark.sparkContext.setLogLevel("ERROR")

    val wide = spark.read.parquet(dwdOut)
    assert(wide.filter($"id".isin("d1", "d2", "d3", "d4")).count() >= 4)
    assert(wide.filter($"id" === "d1").head().getAs[String]("source_type_name")
      == "user order")

    DwsTradeProvinceOrderWindowApp.main(Array(
      "--input", dwdOut, "--provinces", provinces,
      "--out", dwsOut, "--checkpoint", cp2))
    spark.sparkContext.setLogLevel("ERROR")

    val summary = spark.read.parquet(dwsOut)
      .select($"stt".cast("long"), $"province_name", $"order_ct", $"detail_ct",
        $"amount_sum".cast("double"))
      .as[(Long, String, Long, Long, Double)].collect().toSet
    // d1 deduped: p1 = d1(20.00) + d2(5.00) + d3(3.50), two orders
    assert(summary.contains((100L, "Beijing", 2L, 3L, 28.50)))
    assert(summary.contains((110L, "Shanghai", 1L, 1L, 1.00)))
  }

  test("log-side chain: BaseLogApp page dir feeds KeywordWindowApp; TrafficPageViewWindowApp from raw logs") {
    val in = tmp("applogchain-in"); val blOut = tmp("applogchain-bl")
    val kwOut = tmp("applogchain-kw"); val pvOut = tmp("applogchain-pv")
    val cp1 = tmp("applogchain-c1"); val cp2 = tmp("applogchain-c2")
    val cp3 = tmp("applogchain-c3")

    def page(mid: String, pageId: String, lastPage: String, itemType: String,
             item: String, ts: Long) = {
      val lp = if (lastPage == null) "null" else s""""$lastPage""""
      val it = if (item == null) "null" else s""""$item""""
      val itp = if (itemType == null) "null" else s""""$itemType""""
      s"""{"common":{"ar":"110000","ba":"b","ch":"web","is_new":"1","md":"m","mid":"$mid","os":"o","uid":"u1","vc":"v1"},""" +
        s""""page":{"during_time":1000,"item":$it,"item_type":$itp,"last_page_id":$lp,"page_id":"$pageId"},"ts":$ts}"""
    }
    writeLines(in, "00_logs.jsonl", Seq(
      page("m1", "good_list", "search", "keyword", "spark engine", 1000),
      page("m2", "good_list", "search", "keyword", "spark", 2000),
      page("m1", "home", null, null, null, 1500)))
    // watermark food: search pages (they must pass the keyword filter to
    // advance KeywordWindowApp's watermark) in later one-file batches
    for (i <- 1 to 2)
      writeLines(in, f"$i%02d_food.jsonl", Seq(
        page("mf", "good_list", "search", "keyword", "zzz", 2000000000L + i)))

    BaseLogApp.main(Array(
      "--source", "file", "--input", in, "--out", blOut, "--checkpoint", cp1,
      "--max-files-per-trigger", "1"))
    KeywordWindowApp.main(Array(
      "--input", s"$blOut/page", "--out", kwOut, "--checkpoint", cp2))
    TrafficPageViewWindowApp.main(Array(
      "--source", "file", "--input", in, "--out", pvOut, "--checkpoint", cp3,
      "--max-files-per-trigger", "1"))
    spark.sparkContext.setLogLevel("ERROR")

    // keyword counts for the closed [0,10s) window: "spark engine"+"spark"
    val kw = spark.read.parquet(kwOut)
      .select($"stt".cast("long"), $"keyword", $"keyword_count")
      .as[(Long, String, Long)].collect().toSet
    assert(kw.contains((0L, "spark", 2L)) && kw.contains((0L, "engine", 1L)),
      s"keyword window missing expected counts: $kw")

    // traffic measures for the same window, one dim group (v1, web, …):
    // uv = first-of-day mids m1+m2, sv = the null-last-page home view,
    // pv = all three page views, dur = 3 x 1000
    val pv = spark.read.parquet(pvOut)
      .select($"stt".cast("long"), $"vc", $"ch", $"uv_ct", $"sv_ct",
        $"dur_sum", $"pv_ct")
      .as[(Long, String, String, Long, Long, Long, Long)].collect().toSet
    assert(pv.contains((0L, "v1", "web", 2L, 1L, 3000L, 3L)),
      s"traffic window missing expected measures: $pv")
  }

  test("CorpusIngestApp main: quality -> exact dedup -> incremental near-dedup, from CLI over files") {
    val in = tmp("appcorpus-in"); val out = tmp("appcorpus-out")
    val idx = tmp("appcorpus-idx"); val cp = tmp("appcorpus-cp")
    def doc(id: Long, text: String, ts: Long) =
      s"""{"doc_id":$id,"text":"$text","ts":$ts}"""
    val base = "anchor bridge canyon delta engine furnace glacier hammer " +
      "ingot journey keystone ladder mortar needle oxide piston quarry " +
      "rudder spindle turbine valve winch zephyr"
    // batch 1: keeper, its exact dup, a quality reject, a near-dup pair head
    writeLines(in, "00_docs.jsonl", Seq(
      doc(1, base, 10),
      doc(2, base, 11),                       // exact dup of 1 -> dropped at ingest
      doc(3, "a a a a a a a a", 12),          // quality reject
      doc(4, "completely different prose about volcanic geology and rare minerals mail geo@rocks.io", 13),
      "not json at all"))
    // batch 2: near-dup of 1 (append-one-word, jacc ~0.95) + a fresh doc
    // + a doc repeating an eval 5-gram -> dropped by in-stream decont
    writeLines(in, "01_docs.jsonl", Seq(
      doc(5, base + " appended", 20),         // near-dup of 1 -> dropped vs index
      doc(6, "another standalone text on deep sea hydrothermal vents and fauna", 21),
      doc(7, "intro words then held out benchmark sequence five exactly closing", 22),
      // verbatim canary hit -> dropped by --canaries BEFORE any stage;
      // a tokenization-blurred variant (extra space) survives the
      // exact-substring check
      doc(8, "leading text SECRET-CANARY-0042-ALPHA trailing text", 23),
      doc(9, "leading text SECRET-CANARY-0042 ALPHA trailing text", 24)))
    val evalDir = tmp("appcorpus-eval")
    Seq("held out benchmark sequence five").toDF("text")
      .coalesce(1).write.mode("overwrite").parquet(evalDir)
    val canaryFile = new java.io.File(tmp("appcorpus-canaries"), "c.txt")
    java.nio.file.Files.write(canaryFile.toPath,
      "SECRET-CANARY-0042-ALPHA\n".getBytes)

    val progressDir = tmp("appcorpus-progress")
    val labelsDir = s"${tmp("appcorpus-labels")}/labels"
    CorpusIngestApp.main(Array(
      "--source", "file", "--input", in, "--index", idx, "--out", out,
      "--checkpoint", cp, "--eval", evalDir, "--max-files-per-trigger", "1",
      "--canaries", canaryFile.getAbsolutePath,
      "--scrub-pii", "true",
      "--split-labels", labelsDir,
      "--progress", progressDir))
    spark.sparkContext.setLogLevel("ERROR")

    val admitted = spark.read.parquet(out).select($"doc_id")
      .as[Long].collect().toSet
    assert(admitted == Set(1L, 4L, 6L, 9L),
      s"expected exact dup 2, low-quality 3, near-dup 5, contaminated 7, " +
        s"canary 8 dropped (blurred 9 admitted); got $admitted")
    // --scrub-pii ran as stage 0 of the stream: the planted email ships
    // redacted in the admitted output
    val d4 = spark.read.parquet(out).filter($"doc_id" === 4L)
      .select($"text").as[String].head()
    assert(d4.contains("<EMAIL>") && !d4.contains("geo@rocks.io"),
      s"doc 4 must ship scrubbed: $d4")
    // the signature index holds every doc the near-dedup stage SAW (ingest
    // survivors, admitted or not); decont drops docs 7/8 BEFORE ingest, so
    // they never reach the index
    assert(spark.read.parquet(idx).select($"doc_id").as[Long].collect().toSet
      == Set(1L, 4L, 5L, 6L, 9L))
    // --split-labels assigned every ADMITTED doc a (cluster, split) row
    val labelRows = spark.read.parquet(labelsDir)
      .select($"doc_id", $"cluster", $"split")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(labelRows.keySet == admitted,
      s"one split label per admitted doc; got ${labelRows.keySet}")
    assert(labelRows.values.forall(r => r._3 >= 0 && r._3 < 10))
    // --progress wrote one StreamingQueryProgress JSON line per trigger
    val progressFiles = new java.io.File(progressDir).listFiles()
    assert(progressFiles != null && progressFiles.nonEmpty,
      "progress dir must hold a <queryId>.jsonl")
    val lines = scala.io.Source.fromFile(progressFiles.head).getLines().toSeq
    assert(lines.nonEmpty && lines.forall(_.contains("numInputRows")),
      "each line must be a StreamingQueryProgress JSON")
  }

  test("CorpusIngestApp --state-store rocksdb: same admissions, RocksDB provider active") {
    val in = tmp("approcks-in"); val out = tmp("approcks-out")
    val idx = tmp("approcks-idx"); val cp = tmp("approcks-cp")
    def doc(id: Long, text: String, ts: Long) =
      s"""{"doc_id":$id,"text":"$text","ts":$ts}"""
    writeLines(in, "00_docs.jsonl", Seq(
      doc(1, "some interesting prose about glaciers and mountain weather", 10),
      doc(2, "some interesting prose about glaciers and mountain weather", 11), // exact dup
      doc(3, "entirely different words concerning harbor logistics and cranes", 12)))
    try {
      CorpusIngestApp.main(Array(
        "--source", "file", "--input", in, "--index", idx, "--out", out,
        "--checkpoint", cp, "--state-store", "rocksdb"))
      spark.sparkContext.setLogLevel("ERROR")
      // the dedup state (dropDuplicatesWithinWatermark) ran under RocksDB
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
      assert(spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
        == Set(1L, 3L))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("CorpusIngestApp --eval-containment: graded decontamination in the ingest path, via the real main") {
    val in = tmp("appcont-in"); val out = tmp("appcont-out")
    val idx = tmp("appcont-idx"); val cp = tmp("appcont-cp")
    val evalDir = tmp("appcont-eval")
    val evalText = "the quick brown fox jumps over the lazy dog near " +
      "the river bank at dawn while the birds sing softly"
    Seq((100L, evalText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(evalDir)
    def doc(id: Long, text: String, ts: Long) =
      s"""{"doc_id":$id,"text":"$text","ts":$ts}"""
    writeLines(in, "00_docs.jsonl", Seq(
      // covers the whole eval shingle set -> dropped by containment
      doc(1, evalText + " with a few extra trailing words appended today", 10),
      // shares one phrase (2 shingles < 3/5) -> SURVIVES the graded mode
      // (the any-overlap --eval mode would delete it)
      doc(2, "the quick brown fox jumps over many unrelated stories " +
        "about harbor logistics and heavy shipping cranes downtown", 11),
      doc(3, "entirely different words concerning glacier weather and mountain climbing routes", 12)))
    CorpusIngestApp.main(Array(
      "--source", "file", "--input", in, "--index", idx, "--out", out,
      "--checkpoint", cp, "--eval", evalDir, "--eval-containment", "3/5"))
    spark.sparkContext.setLogLevel("ERROR")
    val admitted = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(admitted == Set(2L, 3L),
      s"expected the covering doc dropped, the one-phrase doc kept; got $admitted")
  }

  test("CorpusCurateApp main: batch quality -> exact -> near-dedup funnel, from CLI over parquet") {
    val in = tmp("appcurate-in"); val out = tmp("appcurate-out")
    val statsDir = tmp("appcurate-stats")
    val base = "anchor bridge canyon delta engine furnace glacier hammer " +
      "ingot journey keystone ladder mortar needle oxide piston quarry"
    Seq(
      (1L, base, "en", "src0", 0L),
      (2L, base, "en", "src0", 0L),                 // exact dup of 1
      (3L, "a a a a a a a a", "en", "src0", 0L),    // quality reject
      (4L, base + " appended", "en", "src0", 0L),   // near-dup of 1
      (5L, "completely different prose about volcanic geology and rare minerals", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(in)

    CorpusCurateApp.main(Array("--input", in, "--out", out, "--stats", statsDir))
    spark.sparkContext.setLogLevel("ERROR")

    val survivors = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 5L),
      s"expected exact dup 2, low-quality 3, near-dup 4 dropped; got $survivors")
    val stages = spark.read.parquet(statsDir).select($"stage").as[String].collect().toSet
    assert(stages.nonEmpty, "the funnel stats must record per-stage counts")

    // --eval: the containment pre-filter drops every doc covering the
    // eval text's shingles (1, 2, and the embedding 4); 3 still dies to
    // quality, leaving only 5
    val evalDir = tmp("appcurate-eval"); val out2 = tmp("appcurate-out2")
    Seq((100L, base)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(evalDir)
    CorpusCurateApp.main(Array("--input", in, "--out", out2,
      "--eval", evalDir, "--containment", "1/2"))
    spark.sparkContext.setLogLevel("ERROR")
    val decon = spark.read.parquet(out2).select($"doc_id").as[Long].collect().toSet
    assert(decon == Set(5L),
      s"expected 1/2/4 decontaminated away and 3 quality-dropped; got $decon")
  }

  test("CorpusReportApp main: the four-diagnostic bundle lands under --out") {
    val data = tmp("appreport-in"); val out = tmp("appreport-out")
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s1", 0L),
      (1L, "alpha beta gamma delta epsilon lambda mu nu xi omicron", "en", "s2", 0L),
      (2L, "pi rho sigma tau upsilon phi chi psi omega alpha", "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$data/documents.parquet")

    CorpusReportApp.main(Array("--data", data, "--out", out))
    spark.sparkContext.setLogLevel("ERROR")

    val funnel = spark.read.parquet(s"$out/rule_funnel").collect()
    assert(funnel.length == 1 && funnel(0).getAs[Long]("docs") == 3L)
    val mix = spark.read.parquet(s"$out/mixture")
      .select($"source").as[String].collect().toSet
    assert(mix == Set("s1", "s2"))
    // docs 0/1 share the 5-gram "alpha beta gamma delta epsilon"
    val overlap = spark.read.parquet(s"$out/source_overlap")
      .as[(String, String, Long)].collect().toSet
    assert(overlap == Set(("s1", "s2", 1L)))
    assert(spark.read.parquet(s"$out/zipf").count() == 1L)
  }

  test("ProductReportApp main: funnel + retention land under --out; psi only with --docs") {
    val data = tmp("appprod-in"); val out = tmp("appprod-out")
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")
    Seq(
      (1L, ts(1), 1L, "view", 1.0, "{}"),
      (2L, ts(2), 1L, "click", 1.0, "{}"),
      (3L, ts(3), 1L, "purchase", 1.0, "{}"),
      (4L, ts(1), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$data/events.parquet")

    graft.apps.ProductReportApp.main(Array("--data", data, "--out", out))
    spark.sparkContext.setLogLevel("ERROR")

    val funnel = spark.read.parquet(s"$out/funnel").collect()
      .map(r => r.getAs[Long]("step") -> r.getAs[Long]("users")).toMap
    assert(funnel == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    assert(spark.read.parquet(s"$out/retention").count() == 1L) // one cohort-day
    assert(!new java.io.File(s"$out/psi_drift").exists, "psi needs --docs")
  }

  test("GraphRankApp main: pagerank + hits land under --out; seeds switch to ppr") {
    val in = tmp("appgraph-in"); val out = tmp("appgraph-out")
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
      .coalesce(1).write.mode("overwrite").parquet(in)

    graft.apps.GraphRankApp.main(Array(
      "--edges", in, "--out", out, "--iters", "20", "--hits", "true"))
    spark.sparkContext.setLogLevel("ERROR")
    val pr = spark.read.parquet(s"$out/pagerank")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 4 && pr(1L) == pr.values.max) // 1 has the extra in-link
    assert(spark.read.parquet(s"$out/hits").count() == 4L)

    val out2 = tmp("appgraph-ppr")
    graft.apps.GraphRankApp.main(Array(
      "--edges", in, "--out", out2, "--iters", "20", "--seeds", "4"))
    spark.sparkContext.setLogLevel("ERROR")
    val ppr = spark.read.parquet(s"$out2/pagerank")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // near the fixpoint the seed's neighbor 1 holds the most mass
    // (r1 ≈ .267 > r2 ≈ .227 > r3 ≈ .193 > r4 = teleport .15)
    assert(ppr(1L) == ppr.values.max && ppr(4L) > 0.149 && ppr(3L) > 0)
  }

  test("DwsUserRegisterWindowApp + DwsTradePaymentSucWindowApp mains over one CDC feed") {
    val in = tmp("appdws-in"); val regOut = tmp("appdws-reg")
    val payOut = tmp("appdws-pay")
    val cp1 = tmp("appdws-c1"); val cp2 = tmp("appdws-c2")

    def payment(id: String, user: String, ts: Long, status: String = "1602") =
      s"""{"database":"gmall","table":"payment_info","type":"update","data":{"id":"$id","order_id":"o$id","user_id":"$user","payment_type":"1102","callback_time":"t","payment_status":"$status"},"old":{"payment_status":"1601"},"ts":$ts}"""
    writeLines(in, "00_cdc.jsonl", Seq(
      env("user_info", "insert", 100, "id" -> "u1", "create_time" -> "2022-01-01 00:00:01"),
      env("user_info", "insert", 103, "id" -> "u2", "create_time" -> "2022-01-01 00:00:02"),
      // update, not insert: not a registration
      """{"database":"gmall","table":"user_info","type":"update","data":{"id":"u1","name":"x"},"old":{"name":"y"},"ts":104}""",
      payment("p1", "u1", 101),
      payment("p2", "u1", 102),                      // same payer, same day: uu once
      payment("p3", "u2", 103),
      payment("p4", "u3", 105, status = "1601")))    // status not 1602: excluded
    // watermark food in later one-file batches (the payment window chains
    // dedup + flagger + window — three stateful ops)
    for (i <- 1 to 4) {
      val t = 500000L + i
      writeLines(in, f"$i%02d_food.jsonl", Seq(
        env("user_info", "insert", t, "id" -> s"uf$i", "create_time" -> "t"),
        payment(s"pf$i", "uf", t)))
    }

    DwsUserRegisterWindowApp.main(Array(
      "--source", "file", "--input", in, "--out", regOut, "--checkpoint", cp1,
      "--max-files-per-trigger", "1"))
    DwsTradePaymentSucWindowApp.main(Array(
      "--source", "file", "--input", in, "--out", payOut, "--checkpoint", cp2,
      "--max-files-per-trigger", "1"))
    spark.sparkContext.setLogLevel("ERROR")

    val reg = spark.read.parquet(regOut)
      .select($"stt".cast("long"), $"register_ct")
      .as[(Long, Long)].collect().toSet
    assert(reg.contains((100L, 2L)), s"expected 2 registrations in [100,110): $reg")

    val pay = spark.read.parquet(payOut)
      .select($"stt".cast("long"), $"payment_suc_unique_user_ct",
        $"payment_suc_new_user_ct")
      .as[(Long, Long, Long)].collect().toSet
    assert(pay.contains((100L, 2L, 2L)),
      s"expected 2 unique payers (u1 deduped) in [100,110): $pay")
  }
}
