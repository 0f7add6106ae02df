package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass a training-data pipeline runs
  * before anything else sees the text (emails, IPv4 literals, phone
  * numbers in international AND North-American formats, SSNs, payment
  * card numbers → typed placeholder tokens), with per-document match
  * counts for the compliance funnel ("how much PII did this source
  * carry").
  *
  * Patterns are deliberately restricted to the regex subset where Java's
  * engine (Spark codegen) and RE2-family engines (DuckDB, Go tooling)
  * agree token-for-token: character classes, bounded quantifiers,
  * alternation-free bodies, word boundaries — no lookaround, no
  * backreferences (RE2 has neither), no possessive quantifiers. Both
  * engines scan leftmost with greedy quantifiers over these patterns, so
  * the scrubbed text replays bit-identically (q167 puts that under the
  * driver's hash gate). Alternation is avoided on purpose even where it
  * would be convenient: Java picks leftmost-FIRST among branches, RE2
  * leftmost-LONGEST — the one place the engines genuinely diverge — so
  * each format variant is its own sequential pass instead.
  *
  * Scale shape: ZERO shuffle — a fixed chain of codegen'd regexp_replace
  * passes plus one regexp_count per class, all scan-local; the operator
  * composes ahead of any fingerprinting stage (scrub BEFORE dedup, or
  * the same document with two emails survives as two "distinct" docs).
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

  /** NANP paren form: (555) 123-4567 / (555)123-4567 / (555) 123 4567.
    * The paren prefix is the anchor, so the trailing separator class may
    * safely include the space.
    */
  val PHONE_PAREN: String = "\\(\\d{3}\\) ?\\d{3}[-. ]\\d{4}"

  /** NANP dashed/dotted form: 555-123-4567 / 555.123.4567. Space is NOT
    * accepted as the separator here — "555 123 4567" is indistinguishable
    * from three adjacent numeric tokens, and a compliance pass that eats
    * those would destroy ordinary numeric text (documented coverage
    * boundary; the international '+' form covers space-separated phones).
    */
  val PHONE_NANP: String = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** US SSN: 123-45-6789. The 3-2-4 group shape is disjoint from every
    * phone pattern (their middle group is 3 digits), so pass order
    * between them is immaterial.
    */
  val SSN: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Payment card, separated form: 4 groups of 4 digits with '-' or ' '.
    * A space-separated card IS eaten (4-4-4-4 is a much stronger shape
    * than the phone's 3-3-4, so the false-positive exposure differs).
    */
  val CARD_SEP: String = "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b"

  /** Payment card, contiguous form: a word-bounded 13–16 digit run
    * (Visa/Mastercard/Amex lengths). The trailing \b makes 17+-digit
    * runs (ids, hashes) no-match in BOTH engines: Java backtracks out of
    * every width, RE2's leftmost-longest must also satisfy the boundary.
    */
  val CARD: String = "\\b\\d{13,16}\\b"

  /** (pattern, placeholder, count-column) for every class, in scrub
    * order. The order is part of the operator's contract — the oracle
    * replays it verbatim: email → ip → phones → ssn → cards, so a normal
    * email disappears whole before the later passes run, while an
    * IP-hosted address (user@10.0.0.1 — no alphabetic TLD, so EMAIL
    * skips it) still gets its quad scrubbed by the IP pass. Placeholders
    * contain no digits or '@', so no pass can create a later match
    * (idempotence, ScrubSpec-pinned).
    */
  val PASSES: Seq[(String, String, String)] = Seq(
    (EMAIL, "<EMAIL>", "n_email"),
    (IPV4, "<IP>", "n_ip"),
    (PHONE, "<PHONE>", "n_phone"),
    (PHONE_PAREN, "<PHONE>", "n_phone_us"),
    (PHONE_NANP, "<PHONE>", "n_phone_us"),
    (SSN, "<SSN>", "n_ssn"),
    (CARD_SEP, "<CARD>", "n_card"),
    (CARD, "<CARD>", "n_card"))

  /** Count-column order for the output schema (insertion order of
    * PASSES, duplicates collapsed).
    */
  val COUNT_COLS: Seq[String] = PASSES.map(_._3).distinct

  /** The scrub expression alone: the PASSES chain folded left. */
  def scrubbed(textCol: Column): Column =
    PASSES.foldLeft(textCol) { case (acc, (p, repl, _)) =>
      regexp_replace(acc, p, repl)
    }

  /** Driver-side twin of [[scrubbed]] — the SAME patterns in the SAME
    * order through `java.util.regex` (the engine behind Spark's
    * regexp_replace), for scrubbing plan-time strings: eval/canary text
    * must pass through the identical redaction as the corpus, or a
    * phrase containing PII can never match its scrubbed training copy
    * and decontamination silently weakens.
    */
  def scrubString(s: String): String =
    PASSES.foldLeft(s) { case (acc, (p, repl, _)) => acc.replaceAll(p, repl) }

  /** (idCol, scrubbed, n_email, n_ip, n_phone, n_phone_us, n_ssn,
    * n_card) — counts measured on the ORIGINAL text, so the funnel
    * reports what was found, not what was left. Counts for a class with
    * several format passes (phones, cards) sum passes whose on-original
    * match sets are disjoint by shape (paren-anchored vs word-bounded;
    * separated vs contiguous digits). ACROSS classes the on-original
    * counts may overlap — a dashed international phone
    * ("+1-555-123-4567") counts under n_phone AND its NANP tail under
    * n_phone_us — the scrub itself is still single-coverage (first pass
    * in order wins); funnel counts answer "how often did this shape
    * appear", not "how many replacements ran". NULL text stays NULL
    * with zero counts (in-domain, the module convention).
    */
  def scrubPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    for (c <- "scrubbed" +: COUNT_COLS)
      require(idCol != c && textCol != c,
        s"Scrub.scrubPii: column name '$c' is reserved by the operator")
    docs.select(col(idCol) +: scrubbed(col(textCol)).as("scrubbed")
      +: countColumns(col(textCol)): _*)
  }

  /** The per-class count columns alone (aliased per [[COUNT_COLS]]) —
    * for funnels that aggregate counts without materializing the
    * scrubbed text.
    */
  def countColumns(textCol: Column): Seq[Column] = {
    def cnt(p: String) =
      coalesce(regexp_count(textCol, lit(p)), lit(0)).cast("long")
    COUNT_COLS.map { c =>
      PASSES.filter(_._3 == c).map(t => cnt(t._1)).reduce(_ + _).as(c)
    }
  }
}
