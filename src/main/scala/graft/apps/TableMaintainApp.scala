package graft.apps

import graft.operators.Layout

/** Deployable table maintenance — the nightly pass a continuously-ingested
  * lakehouse table needs, as one runnable job: small-file compaction
  * ([[Layout.compact]] — streaming sinks and micro-batch merges leave
  * KB-sized files whose per-file overhead dominates scans at 100 TB),
  * then a per-file min/max stats manifest over the compacted output
  * ([[Layout.writeStats]]) so subsequent range reads file-skip. With
  * `--zorder x,y` the rewrite is z-clustered instead of round-robin
  * ([[Layout.zOrderWriteQuantile]] — quantile-bucketed, so skewed raw
  * columns still spread evenly), giving 2-D box queries both directory
  * pruning and tight file stats.
  *
  * The reference has no maintenance story (Kafka/HBase own storage
  * there); on parquet tables it is the difference between a table that
  * stays fast under continuous ingest and one that decays.
  */
object TableMaintainApp {

  val usage = "graft.apps.TableMaintainApp --in <dir> --out <dir> " +
    "--stats <col,col,...> and either --target-bytes <n> (compact mode) " +
    "or --zorder xCol,yCol [--zbits <n> --zprefix <n>] (z-cluster mode)"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-table-maintain", conf)
    val in = AppEnv.get(conf, "in", usage)
    val out = AppEnv.get(conf, "out", usage)
    val statCols = AppEnv.get(conf, "stats", usage)
      .split(",").map(_.trim).toSeq

    conf.get("zorder") match {
      case Some(xy) =>
        val cols = xy.split(",").map(_.trim).filter(_.nonEmpty)
        require(cols.length == 2,
          s"--zorder expects exactly xCol,yCol, got '$xy'\nusage: $usage")
        val bits = conf.getOrElse("zbits", "6").toInt
        val prefix = conf.getOrElse("zprefix", "6").toInt
        Layout.zOrderWriteQuantile(spark.read.parquet(in), cols(0), cols(1),
          bits, prefix, out)
        println(s"[maintain] z-clustered $in -> $out (bits=$bits prefix=$prefix; " +
          "quantile splits persisted in _zsplits)")
      case None =>
        val target = AppEnv.get(conf, "target-bytes", usage).toLong
        val (nin, nout) = Layout.compact(spark, in, out, target)
        println(s"[maintain] compacted $in ($nin files) -> $out ($nout files)")
    }
    Layout.writeStats(spark, out, statCols)
    println(s"[maintain] stats manifest written for ${statCols.mkString(",")}")
    // No spark.stop(): the session is shared/getOrCreate (app-harness
    // convention — the JVM exit tears it down in a real deployment)
  }
}
