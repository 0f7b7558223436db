package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{HtmlExpressions, HtmlStrip}

/** HTML boilerplate stripping: the five documented contract rules plus
  * the junk-tolerance edge cases. */
class HtmlStripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("script/style removed WITH content; the HTML5 end-tag rule holds") {
    assert(HtmlStrip.strip("<p>a</p><script>var x = 1 < 2;</script><p>b</p>") == "a b")
    assert(HtmlStrip.strip("a<style>.x{color:red}</style>b") == "a b")
    // attributes on the opening tag
    assert(HtmlStrip.strip("a<script type=\"module\" async>ignored</script>b") == "a b")
    // a literal '</scripty>' inside code must NOT end the element
    assert(HtmlStrip.strip("a<script>s = \"</scripty>\"; t = 1;</script>b") == "a b")
    // case-insensitive tags, end tag with whitespace before '>'
    assert(HtmlStrip.strip("a<SCRIPT>x</SCRIPT >b") == "a b")
    // self-closing script has no content to swallow
    assert(HtmlStrip.strip("a<script src=\"x.js\"/>b</p>c") == "a b c")
  }

  test("comments removed with content; other tags become one space") {
    assert(HtmlStrip.strip("a<!-- <p>not text</p> -->b") == "a b")
    assert(HtmlStrip.strip("<h1>T</h1><p>x</p>") == "T x")
    assert(HtmlStrip.strip("a<br/>b<img src=\"u\">c") == "a b c")
    // adjacent tags collapse to ONE space
    assert(HtmlStrip.strip("a</div></body></html>b") == "a b")
  }

  test("entities: known decode, unknown pass through verbatim") {
    assert(HtmlStrip.strip("&quot;a&quot; &amp; b &lt;c&gt; &apos;d&#39; e&nbsp;f")
      == "\"a\" & b <c> 'd' e f")
    assert(HtmlStrip.strip("&unknown; &x") == "&unknown; &x")
    // bare ampersand
    assert(HtmlStrip.strip("R&D") == "R&D")
  }

  test("junk tolerance: unclosed constructs swallow, never throw") {
    assert(HtmlStrip.strip("<div unclosed attr text") == "")
    assert(HtmlStrip.strip("a<!-- never closed b") == "a")
    assert(HtmlStrip.strip("a<script>never closed") == "a")
    assert(HtmlStrip.strip("") == "")
    assert(HtmlStrip.strip("plain text stays") == "plain text stays")
  }

  test("whitespace collapse + trim; expression path over a column") {
    assert(HtmlStrip.strip("  a\n\t b  \r\n c  ") == "a b c")
    val r = Seq("<p>Hello</p>\n<p>World</p>", null).toDF("h")
      .select(HtmlExpressions.stripHtml(col("h")).as("t"))
      .as[Option[String]].collect()
    assert(r(0).contains("Hello World"))
    assert(r(1).isEmpty)
  }
}
