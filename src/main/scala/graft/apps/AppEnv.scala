package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.KafkaJsonSource

/** Shared plumbing for the deployable app mains (`graft.apps.*`).
  *
  * The reference ships each warehouse stage as a runnable job with its own
  * `main()` (…/app/dwd/log/BaseLogApp.java:42-60 builds env + checkpoint,
  * …/app/dim/DimSinkApp.java:39-55 the same); the graft pipelines are pure
  * `DataFrame => DataFrame` functions, and this layer is the missing glue:
  * CLI config → source (kafka/file) → pipeline → sink + checkpoint. Specs
  * cover the third source kind (memory) by calling each app's `run(spark,
  * raw, …)` directly with a MemoryStream frame — `main` and the specs
  * exercise the SAME code path past the source edge.
  *
  * Config is `--key value` CLI args (see each app's usage string), run via
  * `scripts/run.sh graft.apps.<App> --source file --input … --out …`.
  */
object AppEnv {

  /** `--key value` pairs → map (keys without the `--`). */
  def parseArgs(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0,
      s"expected --key value pairs, got: ${args.mkString(" ")}")
    args.grouped(2).map {
      case Array(k, v) =>
        require(k.startsWith("--"), s"expected --key, got $k")
        k.stripPrefix("--") -> v
    }.toMap
  }

  def get(conf: Map[String, String], key: String, usage: String): String =
    conf.getOrElse(key, sys.error(s"missing --$key\nusage: $usage"))

  /** Session for a deployed job. local[*] here; on a cluster the master
    * comes from spark-submit and this builder's master is ignored.
    *
    * `--state-store rocksdb` switches keyed streaming state to the
    * RocksDB provider — the required setting once state outgrows executor
    * heaps (a corpus-scale dedup fingerprint set, multi-day flagger
    * state); RocksDbStateSpec proves result-parity under it. Default is
    * Spark's in-memory HDFS-backed provider.
    */
  def session(appName: String, conf: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE size-gated SMJ->SHJ conversion - the measured engine default
      // (see Bench.scala); safe at any scale because an oversized build
      // partition keeps SMJ's spillable sort
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // the engine's native expressions (shingle_hashes, minhash_sig, …) are
    // part of the job runtime — any pipeline may reach them
    graft.plans.GraftFunctions.register(s)
    conf.get("state-store") match {
      case Some("rocksdb") => s.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case Some(other) if other != "memory" =>
        sys.error(s"unknown --state-store $other (rocksdb|memory)")
      case _ => ()
    }
    // --progress <dir>: append each trigger's StreamingQueryProgress JSON
    // to <dir>/<queryId>.jsonl — throughput/lag/state-size observability
    // for headless jobs (the UI is what a cluster operator does NOT have
    // on a batch-submitted streaming job). One line per trigger; rotation
    // is the operator's logrotate problem, like any app log. The listener
    // lives for the session lifetime — a CLI job is one JVM, which is the
    // deployment this targets.
    conf.get("progress").foreach { dir =>
      new java.io.File(dir).mkdirs()
      s.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"${e.progress.id}.jsonl"),
            (e.progress.json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      })
    }
    s
  }

  /** Source edge: a streaming frame with a string `value` column — the
    * contract every pipeline consumes (same column a Kafka topic yields).
    *  - `--source file --input <dir>`: text-file stream of JSON lines;
    *  - `--source kafka --brokers <csv> --topics <csv>`: real broker.
    */
  def source(spark: SparkSession, conf: Map[String, String], usage: String): DataFrame =
    conf.getOrElse("source", "file") match {
      case "file" =>
        // --max-files-per-trigger bounds each micro-batch; watermarks
        // advance BETWEEN batches, so multi-stateful pipelines (join
        // chains) draining a directory need >1 batch to flush outer/
        // window state — one file per batch is the faithful replay of
        // the topic feed they were designed against.
        val reader = conf.get("max-files-per-trigger")
          .map(n => spark.readStream.option("maxFilesPerTrigger", n))
          .getOrElse(spark.readStream)
        reader.text(get(conf, "input", usage))
      case "kafka" =>
        KafkaJsonSource.raw(spark, get(conf, "brokers", usage),
          get(conf, "topics", usage),
          conf.getOrElse("starting-offsets", "latest"))
          .select("value")
      case other => sys.error(s"unknown --source $other (file|kafka)\nusage: $usage")
    }

  /** `--trigger available-now` (default: drain what's there, then exit —
    * the batch-recap / smoke mode) or `--trigger "<interval>"` (continuous
    * micro-batches, e.g. "5 seconds" like the reference's batch interval).
    */
  def trigger(conf: Map[String, String]): Trigger =
    conf.getOrElse("trigger", "available-now") match {
      case "available-now" => Trigger.AvailableNow()
      case interval => Trigger.ProcessingTime(interval)
    }

  /** AvailableNow queries terminate on their own — wait for each; interval
    * triggers run until killed — block on any failure/stop.
    */
  def await(spark: SparkSession, conf: Map[String, String],
            queries: Seq[StreamingQuery]): Unit =
    if (conf.getOrElse("trigger", "available-now") == "available-now")
      queries.foreach(_.awaitTermination())
    else spark.streams.awaitAnyTermination()

  /** Batch read of a small side table (dict / config / dim) by extension:
    * `.csv` (with header), `.json`/`.jsonl` (lines), else parquet.
    */
  def readTable(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".csv"))
      spark.read.option("header", "true").csv(path)
    else if (path.endsWith(".json") || path.endsWith(".jsonl"))
      spark.read.json(path)
    else spark.read.parquet(path)
}
