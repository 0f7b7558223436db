package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** HTML boilerplate stripping — the text-extraction step every
  * web-crawl curation pipeline runs before any quality/dedup pass
  * (C4 and friends train on EXTRACTED text, not markup). One lenient
  * single-pass scan with a deterministic, oracle-predictable contract:
  *
  *  1. `<script>`/`<style>` elements are removed WITH their content —
  *     matching is case-insensitive, attributes on the opening tag are
  *     allowed, `<` inside the content does not confuse the scan, and
  *     the element only ends at `</script`/`</style` followed by `>`,
  *     whitespace or `/` (the HTML5 rule — a literal `</scripty>` in
  *     code does NOT end it);
  *  2. comments `<!-- ... -->` are removed with their content;
  *  3. every other tag (open/close/self-closing, any attributes)
  *     becomes a single space — content between tags survives;
  *  4. the five XML entities plus `&#39;` and `&nbsp;` decode
  *     (`&amp; &lt; &gt; &quot; &apos;` → literal, `&nbsp;` → space);
  *     unknown entities pass through verbatim (a crawl corpus is full
  *     of them — guessing corrupts);
  *  5. whitespace runs (space/tab/CR/LF) collapse to one space and the
  *     result is trimmed.
  *
  * Junk tolerance: an unclosed tag or comment swallows to end-of-input
  * (drop, don't throw) — bad markup classifies as short/empty text and
  * falls out at the quality gate, exactly what a 100 TB crawl scan
  * needs.
  */
object HtmlStrip {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** True when html[i..] starts with `lit` case-insensitively. */
  private def matchesAt(html: String, i: Int, lit: String): Boolean = {
    if (i + lit.length > html.length) return false
    var k = 0
    while (k < lit.length) {
      if (Character.toLowerCase(html.charAt(i + k)) != lit.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Index just past the closing `>` of `</name ...>` starting the end
    * tag search at `from`, honoring the HTML5 "followed by > / ws / /"
    * rule; -1 when the element never closes (content swallows to EOF). */
  private def endOfElement(html: String, from: Int, name: String): Int = {
    val n = html.length
    val probe = "</" + name
    var i = from
    while (i < n) {
      if (matchesAt(html, i, probe)) {
        val after = i + probe.length
        if (after >= n) return n // '</script' at EOF: treat as closed
        val c = html.charAt(after)
        if (c == '>' || c == '/' || isWs(c)) {
          var j = after
          while (j < n && html.charAt(j) != '>') j += 1
          return if (j < n) j + 1 else n
        }
      }
      i += 1
    }
    -1
  }

  def strip(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (matchesAt(html, i, "<!--")) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
          out.append(' ')
        } else if (matchesAt(html, i, "<script") || matchesAt(html, i, "<style")) {
          val name = if (matchesAt(html, i, "<script")) "script" else "style"
          // find the end of the OPENING tag first (attrs allowed)
          var j = i
          while (j < n && html.charAt(j) != '>') j += 1
          if (j >= n) i = n // unclosed opening tag: swallow
          else if (html.charAt(j - 1) == '/') i = j + 1 // self-closing: no content
          else {
            val end = endOfElement(html, j + 1, name)
            i = if (end < 0) n else end
          }
          out.append(' ')
        } else {
          // any other tag: skip to '>' (or EOF), emit one space
          var j = i + 1
          while (j < n && html.charAt(j) != '>') j += 1
          i = if (j < n) j + 1 else n
          out.append(' ')
        }
      } else if (c == '&') {
        if (matchesAt(html, i, "&amp;")) { out.append('&'); i += 5 }
        else if (matchesAt(html, i, "&lt;")) { out.append('<'); i += 4 }
        else if (matchesAt(html, i, "&gt;")) { out.append('>'); i += 4 }
        else if (matchesAt(html, i, "&quot;")) { out.append('"'); i += 6 }
        else if (matchesAt(html, i, "&apos;")) { out.append('\''); i += 6 }
        else if (matchesAt(html, i, "&#39;")) { out.append('\''); i += 5 }
        else if (matchesAt(html, i, "&nbsp;")) { out.append(' '); i += 6 }
        else { out.append('&'); i += 1 }
      } else {
        out.append(c)
        i += 1
      }
    }
    // collapse whitespace runs, trim
    val raw = out
    val res = new java.lang.StringBuilder(raw.length)
    var k = 0
    var pendingSpace = false
    while (k < raw.length) {
      val c = raw.charAt(k)
      if (isWs(c)) pendingSpace = true
      else {
        if (pendingSpace && res.length > 0) res.append(' ')
        pendingSpace = false
        res.append(c)
      }
      k += 1
    }
    res.toString
  }

  def stripU(u: UTF8String): UTF8String =
    if (u == null) null else UTF8String.fromString(strip(u.toString))
}

/** Extracted text of an HTML document (boilerplate contract in
  * [[HtmlStrip]]) — NULL only for NULL input; bad markup degrades to
  * short/empty text, never throws. */
case class StripHtml(child: Expression) extends StringInputExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HtmlStrip.stripU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HtmlStrip.stripU($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object HtmlExpressions {
  def stripHtml(c: Column): Column =
    ColumnBridge.column(StripHtml(ColumnBridge.expression(c)))
}
