package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.DistinctSetAgg
import graft.operators.Relational

class SkewAggSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("saltedJoin result equals plain join (inner, incl. skewed key)") {
    // 10k rows of one hot key + tail
    val big = spark.range(10000).select(
      when($"id" < 9000, lit(1L)).otherwise($"id").as("k"), $"id".as("payload"))
    val small = Seq((1L, "hot"), (9042L, "cold"), (9999L, "x")).toDF("sk", "name")
    val plain = big.join(small, $"k" === $"sk").select($"payload", $"name")
      .as[(Long, String)].collect().sorted.toSeq
    val salted = Relational.saltedJoin(big, small, "k", "sk", 8)
      .select($"payload", $"name").as[(Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 9002) // 9000 hot + 2 tail matches
  }

  test("saltedJoin spreads the hot key across buckets") {
    val big = spark.range(8000).select(lit(7L).as("k"), $"id".as("p"))
    val salted = big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(8L)))
    val perBucket = salted.groupBy("__salt").count().as[(Long, Long)].collect()
    assert(perBucket.length == 8)
    assert(perBucket.map(_._2).max < 8000) // no single bucket holds everything
  }

  test("DistinctSetAgg == count_distinct on events, with working merge") {
    val dsa = udaf(new DistinctSetAgg)
    val ev = Tables.loadEvents(spark, TestSession.sf)
    val got = ev.groupBy($"event_type")
      .agg(dsa($"user_id".cast("string")).as("uniq"),
        countDistinct($"user_id").as("expected"))
    assert(got.filter($"uniq" =!= $"expected").count() == 0)
  }

  test("approx_count_distinct: within rsd of exact and mergeable across splits") {
    // the sketch behind TradeProvinceOrderWindow's order_ct at scale —
    // exact Set state (the reference's orderIdSet) is O(distinct) per key
    val ev = Tables.loadEvents(spark, TestSession.sf)
    val row = ev.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id", 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
    // mergeability: the same estimator over a union of disjoint halves
    // equals the whole-table estimate (partial aggregation = sketch merge)
    val halves = ev.filter($"event_id" % 2 === 0)
      .unionByName(ev.filter($"event_id" % 2 === 1))
    val merged = halves.agg(approx_count_distinct($"user_id", 0.02)).head().getLong(0)
    assert(merged == approx)
  }
}
