package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipelines.DwdFacts
import graft.sources.CdcEnvelope

/** Deployable twin of the reference's twelve single-fact DWD jobs
  * (…/app/dwd/db/DwdTradeCartAdd.java, DwdTradeOrderDetail.java,
  * DwdTradeCancelDetail.java, DwdTradePayDetailSuc.java,
  * DwdTradeOrderRefund.java, DwdTradeRefundPaySun.java,
  * DwdToolCouponGet.java, DwdToolCouponOrder.java, DwdToolCouponPay.java,
  * DwdInteractionComment.java, DwdInteractionFavorAdd.java,
  * DwdUserRegister.java — each a `main()` differing only in its
  * table/type/column parameterization).
  *
  * In the reference each job is a separate class because Flink deploys
  * per-main; here the parameterization already lives in data
  * ([[DwdFacts.defs]]), so ONE main serves every fact: `--fact cart_add`
  * runs the cart-add job, `--fact all` runs every extraction off a single
  * shared scan (Catalyst reuses the source — the reference pays one Kafka
  * read PER job). `--dict <table>` adds the base_dic decode for the facts
  * the reference dict-joins at extraction time (comment_info's appraise,
  * …/app/dwd/db/DwdInteractionComment.java:83-86).
  */
object DwdFactApp {

  val usage = "graft.apps.DwdFactApp --fact <name>|all --source file|kafka " +
    "--input <dir> [--brokers <csv> --topics <csv>] [--dict <table>] " +
    "--out <dir> --checkpoint <dir> [--trigger available-now|'<interval>']\n" +
    s"facts: ${DwdFacts.defs.map(_.name).mkString(", ")}"

  /** Source-agnostic body: envelope `value` lines → per-fact parquet
    * directories `out/<fact>` (one streaming query per fact, mirroring the
    * reference's one-topic-per-job layout). Dirty rows go to `out/dirty`.
    */
  def run(spark: SparkSession, raw: DataFrame, facts: Seq[DwdFacts.FactDef],
          dict: Option[DataFrame], outDir: String, checkpointDir: String,
          trigger: Trigger): Seq[StreamingQuery] = {
    val (clean, dirty) = CdcEnvelope.parse(raw, "value")
    val env = CdcEnvelope.etlFilter(clean)
    val factQueries = facts.map { d =>
      val extracted = DwdFacts.extract(env, d)
      val out = (d.name, dict) match {
        case ("comment_info", Some(dic)) =>
          DwdFacts.withDict(extracted, dic, "appraise", "appraise_name")
        case _ => extracted
      }
      out.writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", s"$outDir/${d.name}")
        .option("checkpointLocation", s"$checkpointDir/${d.name}")
        .trigger(trigger)
        .start()
    }
    val dirtyQuery = dirty.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", s"$outDir/dirty")
      .option("checkpointLocation", s"$checkpointDir/dirty")
      .trigger(trigger)
      .start()
    factQueries :+ dirtyQuery
  }

  def main(args: Array[String]): Unit = {
    val conf = AppEnv.parseArgs(args)
    val spark = AppEnv.session("graft-dwd-fact", conf)
    val facts = AppEnv.get(conf, "fact", usage) match {
      case "all" => DwdFacts.defs
      case name => Seq(DwdFacts.defs.find(_.name == name)
        .getOrElse(sys.error(s"unknown --fact $name\n$usage")))
    }
    val queries = run(spark, AppEnv.source(spark, conf, usage), facts,
      conf.get("dict").map(AppEnv.readTable(spark, _)),
      AppEnv.get(conf, "out", usage), AppEnv.get(conf, "checkpoint", usage),
      AppEnv.trigger(conf))
    AppEnv.await(spark, conf, queries)
  }
}
