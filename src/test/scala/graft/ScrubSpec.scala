package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scrub

/** PII scrubbing pinned on hand fixtures: every pattern family, the
  * email→ip→phone precedence (an IP-hosted address), idempotence (a
  * scrubbed document re-scrubs to itself — placeholders must not
  * re-match), and the NULL/no-PII identity cases.
  */
class ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def scrub(rows: Seq[(Long, String)]) =
    Scrub.scrubPii(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("each pattern family scrubs to its placeholder with the right counts") {
    val got = scrub(Seq(
      (1L, "mail me at jo.doe+spam@sub.example.co.uk today"),
      (2L, "server at 192.168.001.7 and 10.0.0.1 replied"),
      (3L, "call +44 207 946 0958 or +1 555 0100 4242"),
      (4L, "plain text with numbers 12345 and a dot. end"),
      (5L, null.asInstanceOf[String])))
    assert(got(1L) == ((1L, "mail me at <EMAIL> today", 1L, 0L, 0L)))
    assert(got(2L) == ((2L, "server at <IP> and <IP> replied", 0L, 2L, 0L)))
    assert(got(3L) == ((3L, "call <PHONE> or <PHONE>", 0L, 0L, 2L)))
    // no PII -> identity, zero counts (plain numerics never false-positive)
    assert(got(4L) == ((4L, "plain text with numbers 12345 and a dot. end", 0L, 0L, 0L)))
    // NULL text stays NULL with zero counts
    assert(got(5L)._2 == null && got(5L)._3 == 0L && got(5L)._5 == 0L)
  }

  test("precedence: a normal email disappears whole; an IP-hosted address keeps its quad for the IP pass") {
    val got = scrub(Seq(
      (1L, "a@b.com at 1.2.3.4"),        // email then separate IP
      (2L, "root@10.0.0.1 logged in")))  // no TLD -> EMAIL skips, IP fires
    assert(got(1L) == ((1L, "<EMAIL> at <IP>", 1L, 1L, 0L)))
    assert(got(2L) == ((2L, "root@<IP> logged in", 0L, 1L, 0L)))
  }

  test("idempotence: scrubbed text re-scrubs to itself") {
    val once = Scrub.scrubPii(Seq(
      (1L, "jo@x.org from 8.8.8.8 call +1 555 123 4567"))
      .toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"scrubbed".as("text"))
    val twice = Scrub.scrubPii(once, "doc_id", "text")
      .as[(Long, String, Long, Long, Long)].head()
    assert(twice._2 == "<EMAIL> from <IP> call <PHONE>")
    assert(twice._3 == 0L && twice._4 == 0L && twice._5 == 0L,
      s"placeholders must not re-match: $twice")
  }

  test("scrubString is the exact driver-side twin of the scrubbed column") {
    val samples = Seq(
      "jo@x.org at 8.8.8.8 call +1 555 123 4567",
      "no pii in this one at all",
      "root@10.0.0.1 logged in from 192.168.1.1")
    val viaColumn = Scrub.scrubPii(
        samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy($"doc_id").select($"scrubbed").as[String].collect().toSeq
    assert(viaColumn == samples.map(Scrub.scrubString),
      "the plan-time and driver-side scrubs must agree byte-for-byte")
  }

  test("q167 row shape on the shared tables: planted docs scrubbed, unplanted untouched") {
    val got = SparkEntry.queries("q167_pii_scrub")(spark, TestSession.sf)
      .as[(Long, String, Long, Long, Long)].collect()
    val planted = got.filter(_._1 % 3 == 0)
    val clean = got.filter(_._1 % 3 != 0)
    assert(planted.nonEmpty && clean.nonEmpty)
    assert(planted.forall(r => r._3 == 1 && r._4 == 1 && r._5 == 1),
      s"every planted doc carries one of each: ${planted.find(r => r._3 != 1 || r._4 != 1 || r._5 != 1)}")
    assert(planted.forall(r => r._2.endsWith("<EMAIL> via <IP> or <PHONE>")),
      s"scrub must hit all three plants: ${planted.head}")
    assert(clean.forall(r => r._3 == 0 && r._4 == 0 && r._5 == 0))
  }
}
