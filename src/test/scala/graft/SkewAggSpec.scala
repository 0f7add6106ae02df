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
}
