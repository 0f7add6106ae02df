package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Ivf, Pq}

/** Deployable ANN index lifecycle job over [[graft.operators.AnnIndex]]
  * — build once, append without retraining, probe from the persisted
  * artifacts (the serving loop a real embedding pipeline runs, vs the
  * in-session train+query of q61/q149):
  *
  *  - `--mode build`: train the coarse quantizer + PQ codebooks on
  *    `--input` (optionally on a `--train-fraction` sample — the 100 TB
  *    path), write `<index>/model` + the centroid-partitioned
  *    `<index>/coded` posting lists;
  *  - `--mode append`: assign NEW vectors with the persisted models and
  *    append to the posting lists — scan-local, no retrain;
  *  - `--mode probe`: IVF-PQ top-k for `--queries` from the artifacts
  *    alone, written to `--out` (or printed when omitted).
  *
  * The coarse k defaults to [[graft.operators.Ivf.kFor]]'s corpus-sized
  * rule so posting lists stay probe-sized as the corpus grows; `--nprobe`
  * is the measured recall dial (scale it with k — BASELINE.md round-6
  * recall rows).
  */
object AnnIndexApp {

  val usage = "graft.apps.AnnIndexApp " +
    "--mode build|append|stream-append|compact|stats|probe|delete --index <dir> " +
    "[stats: --psi-threshold 0.2] " +
    "[delete: --ids <comma-separated> | --ids-parquet <parquet with id col>] " +
    "[build/append: --input <vectors parquet>] " +
    "[stream-append: --source file|kafka --input <dir of JSON lines> " +
    "--checkpoint <dir> [--trigger available-now|'<interval>']] " +
    "[probe: --queries <parquet> " +
    "[--out <dir>] [--nprobe 2] [--topk 5] [--prune true]] " +
    "[--id-col vec_id] [--vec-col embedding] [--dims 64] " +
    "[build: --list-size 64 --pq-m 8 --pq-subdims 8 --pq-k 16 --iters 2 " +
    "--train-fraction 1.0 --seed 42]"

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark: SparkSession = AppEnv.session("graft-ann-index", conf)
    val index = AppEnv.get(conf, "index", usage)
    val idCol = conf.getOrElse("id-col", "vec_id")
    val vecCol = conf.getOrElse("vec-col", "embedding")
    val dims = conf.getOrElse("dims", "64").toInt
    conf.getOrElse("mode", "build") match {
      case "build" =>
        val corpus = spark.read.parquet(AppEnv.get(conf, "input", usage))
        val k = conf.get("k").map(_.toInt).getOrElse(
          Ivf.kFor(corpus.count(), conf.getOrElse("list-size", "64").toInt))
        val m = conf.getOrElse("pq-m", "8").toInt
        val subDims = conf.getOrElse("pq-subdims", "8").toInt
        val pqK = conf.getOrElse("pq-k", "16").toInt
        val iters = conf.getOrElse("iters", "2").toInt
        val fraction = conf.getOrElse("train-fraction", "1.0").toDouble
        val seed = conf.getOrElse("seed", "42").toLong
        val (coarse, pq) =
          if (fraction >= 1.0)
            (Ivf.train(corpus, idCol, vecCol, k, dims, iters),
              Pq.train(corpus, idCol, vecCol, m, subDims, pqK, iters))
          else
            (Ivf.trainOnSample(corpus, fraction, seed, idCol, vecCol, k, dims, iters),
              Pq.trainOnSample(corpus, fraction, seed, idCol, vecCol, m, subDims, pqK, iters))
        AnnIndex.write(corpus, idCol, vecCol, coarse, dims, pq, subDims, index)
        println(s"[ann-index] built: k=$k lists, m=$m codes, " +
          s"${AnnIndex.loadCoded(spark, index).count()} vectors")
      case "append" =>
        val vecs = spark.read.parquet(AppEnv.get(conf, "input", usage))
        AnnIndex.append(vecs, idCol, vecCol, index)
        println(s"[ann-index] appended ${vecs.count()} vectors")
      case "stream-append" =>
        // continuous ingestion of new vectors (JSON lines
        // {"<id-col>": …, "<vec-col>": [f, …]}) into the posting lists:
        // the model loads ONCE (immutable between rebuilds by contract)
        // and every micro-batch is a scan-local assign + partitioned
        // append — the Ivf.assign-on-a-stream composition
        import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
        val schema = StructType(Seq(
          StructField(idCol, LongType),
          StructField(vecCol, ArrayType(FloatType))))
        val model = AnnIndex.loadModel(spark, index)
        val vecs = AppEnv.source(spark, conf, usage)
          .withColumn("j", from_json(col("value"), schema))
          .filter(col("j").isNotNull && col(s"j.$idCol").isNotNull &&
            col(s"j.$vecCol").isNotNull)
          .select(col(s"j.$idCol").as(idCol), col(s"j.$vecCol").as(vecCol))
        val q = graft.sinks.Sinks.foreachBatchSink(vecs,
          AppEnv.get(conf, "checkpoint", usage), AppEnv.trigger(conf),
          outputMode = "append") { (batch, _) =>
          AnnIndex.appendWith(batch, idCol, vecCol, model, index)
        }
        AppEnv.await(spark, conf, Seq(q))
      case "compact" =>
        // the at-least-once appender's K1-style key dedup: drop replayed
        // duplicate ids and rewrite the posting lists (TableMaintainApp
        // cadence)
        val (before, after) = AnnIndex.compactCoded(spark, index)
        println(s"[ann-index] compacted: $before -> $after rows")
      case "stats" =>
        // the retrain gate: posting-list occupancy drift (PSI) of the
        // current index vs its train-time histogram — the measurement
        // behind the "retrain when the distribution drifts" contract.
        // Run on the compact cadence; >= --psi-threshold means the
        // coarse quantizer no longer tessellates the data and a --mode
        // build rebuild is due.
        val (rows, lists, drift) = AnnIndex.driftStats(spark, index)
        val threshold = conf.getOrElse("psi-threshold", "0.2").toDouble
        println(f"[ann-index] stats: rows=$rows lists=$lists " +
          f"drift_psi=$drift%.6f threshold=$threshold " +
          f"retrain_due=${drift >= threshold}")
      case "delete" =>
        // takedown / right-to-be-forgotten: file tombstones — effective
        // at the next probe, folded into storage (and cleared) by the
        // next compact or rebuild
        import spark.implicits._
        val ids = (conf.get("ids"), conf.get("ids-parquet")) match {
          case (Some(list), _) =>
            list.split(",").map(_.trim.toLong).toSeq.toDF(idCol)
          case (None, Some(p)) => spark.read.parquet(p)
          case (None, None) =>
            sys.error(s"--mode delete needs --ids or --ids-parquet\nusage: $usage")
        }
        AnnIndex.deleteIds(ids, idCol, index)
        println(s"[ann-index] filed ${ids.count()} tombstones " +
          s"(probe-effective now; folded at the next compact)")
      case "probe" =>
        val queries = spark.read.parquet(AppEnv.get(conf, "queries", usage))
        // --prune true (default): compute the probed centroid set
        // driver-side and scan ONLY those posting-list partitions — the
        // point of the layout; identical results to the unpruned join
        val doProbe = if (conf.getOrElse("prune", "true").toBoolean)
          AnnIndex.probePruned _ else AnnIndex.probe _
        val got = doProbe(spark, index, queries, idCol, vecCol,
          conf.getOrElse("nprobe", "2").toInt,
          conf.getOrElse("topk", "5").toInt)
        conf.get("out") match {
          case Some(out) => got.write.mode("overwrite").parquet(out)
          case None => got.orderBy(col("query_id"), col("rank"))
            .collect().foreach(r => println(s"[ann-probe] $r"))
        }
      case other => sys.error(s"unknown --mode $other\nusage: $usage")
    }
  }
}
