package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup stripping — the first cleaning pass every web-scrape
  * corpus needs before tokenization: script/style elements and comments
  * dropped WITH their content, tags and DOCTYPE declarations dropped
  * keeping their content, the six ubiquitous entities decoded, then
  * whitespace collapsed.
  *
  * Like [[Scrub]], every pattern stays inside the Java-regex/RE2
  * agreeing subset so the stripped text replays bit-identically under
  * the driver's DuckDB hash gate (q169): character classes, `[\s\S]`
  * for dot-with-newlines, LAZY `*?` bodies between DISTINCT literal
  * delimiters (both engines take the earliest open to the nearest
  * close — agreement verified empirically for each pattern shape), the
  * `(?i)` inline flag, no alternation (Java is leftmost-first, RE2
  * leftmost-longest — the one divergence, so each element kind is its
  * own sequential pass).
  *
  * Pass order is part of the contract: script/style BEFORE comments so
  * the classic `<script><!-- code // --></script>` hiding pattern drops
  * as one element; comments before tags so commented-out markup
  * vanishes whole; entity decodes after tag removal (a decoded `&lt;` is
  * TEXT and must not look like a tag opener), with `&amp;` LAST so
  * double-escaped text renders one level, exactly like a browser
  * ("&amp;lt;" → "&lt;" the literal string). Unknown entities are left
  * in place — eating every `&word;` would destroy legitimate prose, and
  * silent over-deletion is the failure mode a cleaning pass must not
  * have (documented coverage boundary).
  *
  * Malformation boundary: an UNTERMINATED script/style/comment never
  * matches its lazy body (no closing delimiter), so the open tag alone
  * is stripped by the tag pass and the content survives as text — the
  * conservative choice (keep possibly-junk text) over the destructive
  * one (eat everything to end-of-document).
  *
  * Scale shape: ZERO shuffle — a fixed chain of codegen'd
  * regexp_replace passes, all scan-local; composes ahead of [[Scrub]]
  * and any fingerprinting stage.
  */
object Markup {

  /** Script element with content (old-school comment-hiding included). */
  val SCRIPT: String = "(?i)<script[^>]*>[\\s\\S]*?</script>"

  /** Style element with content. */
  val STYLE: String = "(?i)<style[^>]*>[\\s\\S]*?</style>"

  /** Comment, possibly spanning lines. */
  val COMMENT: String = "<!--[\\s\\S]*?-->"

  /** DOCTYPE and other `<!...>` declarations. */
  val DECL: String = "<![A-Za-z][^>]*>"

  /** Any remaining open/close/self-closing tag (content kept). */
  val TAG: String = "</?[A-Za-z][^>]*>"

  /** Element passes in order; every removal leaves one space so word
    * boundaries survive (`a<br/>b` must not fuse to "ab").
    */
  val STRIP: Seq[String] = Seq(SCRIPT, STYLE, COMMENT, DECL, TAG)

  /** Entity decodes in order — `&nbsp;` to plain space, the four
    * character escapes, `&amp;` strictly last (see scaladoc above).
    */
  val ENTITIES: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&")

  /** ASCII whitespace runs collapse to one space; trim finishes. */
  val WS: String = "[ \\t\\r\\n]+"

  /** The strip expression alone: element passes → entity decodes →
    * whitespace collapse → trim.
    */
  def stripped(textCol: Column): Column = {
    val noMarkup = STRIP.foldLeft(textCol)((acc, p) => regexp_replace(acc, p, " "))
    val decoded = ENTITIES.foldLeft(noMarkup) { case (acc, (e, r)) =>
      regexp_replace(acc, e, r)
    }
    trim(regexp_replace(decoded, WS, " "))
  }

  /** Driver-side twin of [[stripped]] through `java.util.regex` (the
    * engine behind Spark's regexp_replace) — for plan-time strings:
    * when a pipeline strips its corpus, eval/canary probe text must
    * pass through the IDENTICAL transform or decontamination silently
    * weakens (the [[Scrub.scrubString]] discipline).
    */
  def stripString(s: String): String = {
    val noMarkup = STRIP.foldLeft(s)((acc, p) => acc.replaceAll(p, " "))
    val decoded = ENTITIES.foldLeft(noMarkup) { case (acc, (e, r)) =>
      acc.replaceAll(e, java.util.regex.Matcher.quoteReplacement(r))
    }
    decoded.replaceAll(WS, " ").trim
  }

  /** (idCol, stripped) — NULL text stays NULL (in-domain, the module
    * convention).
    */
  def stripMarkup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(idCol != "stripped" && textCol != "stripped",
      "Markup.stripMarkup: column name 'stripped' is reserved by the operator")
    docs.select(col(idCol), stripped(col(textCol)).as("stripped"))
  }
}
