package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Markup

/** Markup stripping pinned on hand fixtures: each element kind, the
  * classic script comment-hiding pattern, entity decode order (double
  * escapes render ONE level, like a browser), the malformation boundary
  * (unterminated elements keep their content), the over-deletion
  * boundary (unknown entities and bare '<' survive), and the
  * column/driver-string twin equivalence.
  */
class MarkupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def strip(rows: Seq[(Long, String)]): Map[Long, String] =
    Markup.stripMarkup(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().toMap

  test("element kinds: script/style with content, comments, doctype, tags without") {
    val got = strip(Seq(
      (1L, "<!DOCTYPE html><html><body><p>keep me</p></body></html>"),
      (2L, "a<style>p { color: red; }</style>b"),
      (3L, "a<SCRIPT type=\"module\">var x = 1 < 2;</SCRIPT>b"),
      (4L, "a<!-- gone\nacross lines -->b"),
      (5L, "one<br/>two<img src=\"x.png\">three"),
      (6L, "<script><!-- var hidden = 1; // --></script>visible")))
    assert(got(1L) == "keep me")
    assert(got(2L) == "a b")
    assert(got(3L) == "a b", "case-insensitive, content dropped")
    assert(got(4L) == "a b")
    assert(got(5L) == "one two three")
    assert(got(6L) == "visible", "comment-hidden script drops as one element")
  }

  test("entities: common ones decode, &amp; last so double escapes render one level, unknown survive") {
    val got = strip(Seq(
      (1L, "a &lt;tag&gt; &quot;q&quot; it&#39;s b&nbsp;c &amp; d"),
      (2L, "literal &amp;lt; stays escaped"),
      (3L, "unknown &foo; and &copy; stay")))
    assert(got(1L) == "a <tag> \"q\" it's b c & d")
    assert(got(2L) == "literal &lt; stays escaped")
    assert(got(3L) == "unknown &foo; and &copy; stay")
  }

  test("malformation boundary: unterminated elements keep their content as text") {
    val got = strip(Seq(
      (1L, "a<script>var x = 1; end of doc"),
      (2L, "a<!-- never closed b"),
      (3L, "bare 3 < 5 comparison stays")))
    assert(got(1L) == "a var x = 1; end of doc",
      "open tag stripped, content conservatively kept")
    assert(got(2L) == "a<!-- never closed b", "unclosed comment untouched")
    assert(got(3L) == "bare 3 < 5 comparison stays")
  }

  test("whitespace collapses and trims; NULL stays NULL") {
    val got = Markup.stripMarkup(Seq(
      (1L, "  <p>a</p>\n\t<p>b</p>  "),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "a b")
    assert(got(2L) == null)
  }

  test("stripString is the exact driver-side twin of the stripped column") {
    val samples = Seq(
      "<html><body onload=\"f()\"><!-- c --><p>x &amp; y</p><script>s</script></body></html>",
      "no markup here at all",
      "it&#39;s &quot;quoted&quot; &amp;amp; done")
    val viaColumn = Markup.stripMarkup(
        samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy($"doc_id").select($"stripped").as[String].collect().toSeq
    assert(viaColumn == samples.map(Markup.stripString),
      "the plan-time and driver-side strips must agree byte-for-byte")
  }

  test("q169 row shape on the shared tables: planted docs stripped, unplanted only ws-normalized") {
    val docs = graft.core.Tables.Tpch(spark, TestSession.sf).documents
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val got = SparkEntry.queries("q169_markup_strip")(spark, TestSession.sf)
      .as[(Long, String)].collect()
    assert(got.nonEmpty)
    for ((id, s) <- got) (id % 4) match {
      case 0 =>
        assert(s.startsWith("Doc ") && s.endsWith("tail &amp; <esc> fin"),
          s"wrap must strip to title + text + decoded tail: $id -> $s")
        assert(!s.contains("<p") && !s.contains("var a=1") && !s.contains("margin"),
          s"tags/script/style must vanish: $id -> $s")
      case 2 =>
        assert(s.endsWith("say \"hi's\" ok bold unknown &foo; stays"),
          s"entity tail must decode, unknown entity survive: $id -> $s")
      case _ =>
        assert(s == Markup.stripString(docs(id)),
          s"unplanted doc must only be ws-normalized: $id")
    }
  }
}
