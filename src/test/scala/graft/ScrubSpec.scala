package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scrub

/** PII scrubbing pinned on hand fixtures: every pattern family (email,
  * IP, intl + NANP phones, SSN, separated + contiguous cards), the pass
  * precedence (an IP-hosted address), near-miss NEGATIVES for each new
  * class (the compliance-pass failure mode is silent under-coverage, so
  * the boundaries are pinned too), idempotence (a scrubbed document
  * re-scrubs to itself — placeholders must not re-match), and the
  * NULL/no-PII identity cases.
  */
class ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  type Row8 = (Long, String, Long, Long, Long, Long, Long, Long)

  private def scrub(rows: Seq[(Long, String)]): Map[Long, Row8] =
    Scrub.scrubPii(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[Row8].collect()
      .map(r => r._1 -> r).toMap

  test("each pattern family scrubs to its placeholder with the right counts") {
    val got = scrub(Seq(
      (1L, "mail me at jo.doe+spam@sub.example.co.uk today"),
      (2L, "server at 192.168.001.7 and 10.0.0.1 replied"),
      (3L, "call +44 207 946 0958 or +1 555 0100 4242"),
      (4L, "plain text with numbers 12345 and a dot. end"),
      (5L, null.asInstanceOf[String]),
      (6L, "call (555) 123-4567 or 555-123-4567 or 555.123.4567"),
      (7L, "ssn is 123-45-6789 ok"),
      (8L, "card 4111111111111111 and 4242-4242-4242-4242 and 378282246310005")))
    assert(got(1L) == ((1L, "mail me at <EMAIL> today", 1L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(2L) == ((2L, "server at <IP> and <IP> replied", 0L, 2L, 0L, 0L, 0L, 0L)))
    assert(got(3L) == ((3L, "call <PHONE> or <PHONE>", 0L, 0L, 2L, 0L, 0L, 0L)))
    // no PII -> identity, zero counts (plain numerics never false-positive)
    assert(got(4L) == ((4L, "plain text with numbers 12345 and a dot. end", 0L, 0L, 0L, 0L, 0L, 0L)))
    // NULL text stays NULL with zero counts
    assert(got(5L)._2 == null && got(5L)._3 == 0L && got(5L)._8 == 0L)
    assert(got(6L) == ((6L, "call <PHONE> or <PHONE> or <PHONE>", 0L, 0L, 0L, 3L, 0L, 0L)))
    assert(got(7L) == ((7L, "ssn is <SSN> ok", 0L, 0L, 0L, 0L, 1L, 0L)))
    // 15-digit Amex hits the contiguous form too
    assert(got(8L) == ((8L, "card <CARD> and <CARD> and <CARD>", 0L, 0L, 0L, 0L, 0L, 3L)))
  }

  test("near-miss negatives: each new class's boundary holds") {
    val texts = Seq(
      (1L, "short phone 555-123-456 stays"),        // 3-digit last group
      (2L, "three ints 555 123 4567 stay"),          // space-sep NANP excluded by contract
      (3L, "id 12345678901234567 stays"),            // 17 digits: not a card
      (4L, "run 123456789012 stays"),                // 12 digits: not a card
      (5L, "date-ish 123-4-6789 stays"),             // SSN middle group must be 2
      (6L, "v1.2.3 release stays"),                  // 3 quads: not an IP
      (7L, "caught in 4k 1234-5678-9012 stays"))     // 3 groups: not a sep card
    val got = scrub(texts)
    for ((id, t) <- texts) {
      assert(got(id)._2 == t, s"near-miss must survive unscrubbed: ${got(id)}")
      assert(got(id).productIterator.drop(2).forall(_ == 0L),
        s"near-miss must count zero: ${got(id)}")
    }
  }

  test("precedence: a normal email disappears whole; an IP-hosted address keeps its quad for the IP pass") {
    val got = scrub(Seq(
      (1L, "a@b.com at 1.2.3.4"),        // email then separate IP
      (2L, "root@10.0.0.1 logged in")))  // no TLD -> EMAIL skips, IP fires
    assert(got(1L) == ((1L, "<EMAIL> at <IP>", 1L, 1L, 0L, 0L, 0L, 0L)))
    assert(got(2L) == ((2L, "root@<IP> logged in", 0L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("cross-class on-original counts may overlap but the scrub is single-coverage") {
    // a dashed intl phone: the intl pass eats it whole; the NANP tail
    // still COUNTS on the original (documented funnel semantics)
    val got = scrub(Seq((1L, "dial +1-555-123-4567 now")))
    assert(got(1L)._2 == "dial <PHONE> now")
    assert(got(1L)._5 == 1L && got(1L)._6 == 1L, s"intl + nanp-tail counts: ${got(1L)}")
  }

  test("idempotence: scrubbed text re-scrubs to itself") {
    val once = Scrub.scrubPii(Seq(
      (1L, "jo@x.org from 8.8.8.8 call +1 555 123 4567 or (555) 123-4567, ssn 123-45-6789, card 4111111111111111"))
      .toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"scrubbed".as("text"))
    val twice = Scrub.scrubPii(once, "doc_id", "text")
      .as[Row8].head()
    assert(twice._2 == "<EMAIL> from <IP> call <PHONE> or <PHONE>, ssn <SSN>, card <CARD>")
    assert(twice.productIterator.drop(2).forall(_ == 0L),
      s"placeholders must not re-match: $twice")
  }

  test("scrubString is the exact driver-side twin of the scrubbed column") {
    val samples = Seq(
      "jo@x.org at 8.8.8.8 call +1 555 123 4567",
      "no pii in this one at all",
      "root@10.0.0.1 logged in from 192.168.1.1",
      "(555) 123-4567 ssn 123-45-6789 card 4242-4242-4242-4242 ref 12345678901234567")
    val viaColumn = Scrub.scrubPii(
        samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy($"doc_id").select($"scrubbed").as[String].collect().toSeq
    assert(viaColumn == samples.map(Scrub.scrubString),
      "the plan-time and driver-side scrubs must agree byte-for-byte")
  }

  test("q167 row shape on the shared tables: planted docs scrubbed, unplanted untouched") {
    val got = SparkEntry.queries("q167_pii_scrub")(spark, TestSession.sf)
      .as[Row8].collect()
    val planted0 = got.filter(_._1 % 3 == 0)
    val planted1 = got.filter(_._1 % 3 == 1)
    val clean = got.filter(_._1 % 3 == 2)
    assert(planted0.nonEmpty && planted1.nonEmpty && clean.nonEmpty)
    assert(planted0.forall(r => r._3 == 1 && r._4 == 1 && r._5 == 1),
      s"every mod-0 doc carries one email/ip/intl-phone: ${planted0.find(r => r._3 != 1 || r._4 != 1 || r._5 != 1)}")
    assert(planted0.forall(r => r._2.endsWith("<EMAIL> via <IP> or <PHONE>")),
      s"scrub must hit all three plants: ${planted0.head}")
    assert(planted1.forall(r => r._6 == 2 && r._7 == 1 && r._8 == 2),
      s"every mod-1 doc carries 2 US phones / 1 ssn / 2 cards: ${planted1.find(r => r._6 != 2 || r._7 != 1 || r._8 != 2)}")
    assert(planted1.forall(r => r._2.endsWith(
      "call <PHONE> or <PHONE>, ssn <SSN>, card <CARD> or <CARD>, ref 12345678901234567")),
      s"scrub must hit the mod-1 plants and spare the 17-digit near-miss: ${planted1.head}")
    assert(clean.forall(r => r.productIterator.drop(2).forall(_ == 0L)))
  }
}
