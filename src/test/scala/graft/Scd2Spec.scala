package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** SCD2 change-log collapse: consecutive duplicates fold, intervals chain
  * exactly (valid_to = next valid_from), versions number from 1, the open
  * version is flagged current.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val log = Seq(
    // (user, ord, status): consecutive "a" rows must fold into one version
    (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
    (2L, 5L, "x")).toDF("user_id", "ord", "attr0")

  private def run() =
    Relational.scd2(log.withColumnRenamed("attr0", "event_type"),
        "user_id", "ord", "event_type")
      .orderBy("user_id", "version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4), r.getInt(5)))

  test("consecutive duplicates collapse; intervals chain; last version is current") {
    val got = run()
    assert(got.toSeq == Seq(
      (1L, "a", 10L, Some(30L), 1L, 0),
      (1L, "b", 30L, Some(40L), 2L, 0),
      (1L, "a", 40L, None, 3L, 1),
      (2L, "x", 5L, None, 1L, 1)))
  }

  test("intervals tile the key's history: each valid_to equals the next valid_from") {
    val byUser = run().groupBy(_._1)
    byUser.values.foreach { vs =>
      val sorted = vs.sortBy(_._5)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3))
        case _           =>
      }
      assert(sorted.last._4.isEmpty && sorted.last._6 == 1)
      assert(sorted.init.forall(_._6 == 0))
    }
  }
}
