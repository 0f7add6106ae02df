package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass a training-data pipeline runs
  * before anything else sees the text (emails, IPv4 literals, phone
  * numbers → typed placeholder tokens), with per-document match counts
  * for the compliance funnel ("how much PII did this source carry").
  *
  * Patterns are deliberately restricted to the regex subset where Java's
  * engine (Spark codegen) and RE2-family engines (DuckDB, Go tooling)
  * agree token-for-token: character classes, bounded quantifiers,
  * alternation-free bodies, word boundaries — no lookaround, no
  * backreferences (RE2 has neither), no possessive quantifiers. Both
  * engines scan leftmost with greedy quantifiers over these patterns, so
  * the scrubbed text replays bit-identically (q167 puts that under the
  * driver's hash gate).
  *
  * Scale shape: ZERO shuffle — three codegen'd regexp_replace passes and
  * three regexp_count's per row, all scan-local; the operator composes
  * ahead of any fingerprinting stage (scrub BEFORE dedup, or the same
  * document with two emails survives as two "distinct" docs).
  */
object Scrub {

  /** user@host.tld — local part per RFC-practical subset. */
  val EMAIL: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 literal, word-bounded so version strings like
    * 1.2.3.4.5 still match their first quad (the conservative choice:
    * over-scrub beats leaking).
    */
  val IPV4: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International-form phone: +CC then 3 space/dash-separated groups.
    * Anchored on the '+' so plain numeric tokens (ids, counts) never
    * false-positive.
    */
  val PHONE: String = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{3,4}[- ]\\d{3,4}"

  /** The scrub expression alone, in email → ip → phone order: a normal
    * email disappears whole before the later passes run, while an
    * IP-hosted address (user@10.0.0.1 — no alphabetic TLD, so EMAIL
    * skips it) still gets its quad scrubbed by the IP pass. The order is
    * part of the operator's contract — the oracle replays it verbatim.
    */
  def scrubbed(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, EMAIL, "<EMAIL>"),
        IPV4, "<IP>"),
      PHONE, "<PHONE>")

  /** Driver-side twin of [[scrubbed]] — the SAME three patterns in the
    * SAME order through `java.util.regex` (the engine behind Spark's
    * regexp_replace), for scrubbing plan-time strings: eval/canary text
    * must pass through the identical redaction as the corpus, or a
    * phrase containing PII can never match its scrubbed training copy
    * and decontamination silently weakens.
    */
  def scrubString(s: String): String =
    s.replaceAll(EMAIL, "<EMAIL>")
      .replaceAll(IPV4, "<IP>")
      .replaceAll(PHONE, "<PHONE>")

  /** (idCol, scrubbed, n_email, n_ip, n_phone) — counts measured on the
    * ORIGINAL text, so the funnel reports what was found, not what was
    * left. NULL text stays NULL with zero counts (in-domain, the module
    * convention).
    */
  def scrubPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    for (c <- Seq("scrubbed", "n_email", "n_ip", "n_phone"))
      require(idCol != c && textCol != c,
        s"Scrub.scrubPii: column name '$c' is reserved by the operator")
    def cnt(p: String) =
      coalesce(regexp_count(col(textCol), lit(p)), lit(0)).cast("long")
    docs.select(col(idCol),
      scrubbed(col(textCol)).as("scrubbed"),
      cnt(EMAIL).as("n_email"),
      cnt(IPV4).as("n_ip"),
      cnt(PHONE).as("n_phone"))
  }
}
