package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for web-corpus curation — the dedup key a
  * crawl pipeline needs BEFORE any content pass: the same page
  * arrives as `HTTP://Site.com:80/a?utm_source=x#frag` and
  * `http://site.com/a`, and byte-level dedup misses it. One
  * deterministic, lenient, byte-level pass (no java.net.URI — a 100 TB
  * crawl column contains junk that must classify, not throw):
  *
  *  1. scheme → lowercase; only http/https are canonicalizable (other
  *     or missing schemes → NULL — route to quarantine);
  *  2. host → lowercase; userinfo (`user@`) stripped;
  *  3. default port stripped (`:80` for http, `:443` for https);
  *  4. fragment stripped;
  *  5. tracking query params dropped — `utm_*`, `fbclid`, `gclid`,
  *     `msclkid`, `ref` (the industry-standard strip list); remaining
  *     params keep their original ORDER and bytes (sorting would merge
  *     semantically different URLs on servers where order matters);
  *  6. an emptied query drops its `?`; path bytes are preserved
  *     verbatim (case-significant on most servers).
  *
  * [[UrlHost]] additionally extracts the lowercased host with a
  * leading `www.` removed — the cheap per-host key. [[UrlDomain]]
  * extracts the REGISTRABLE domain against the embedded Public
  * Suffix List snapshot ([[PublicSuffixes]]) — the key per-site caps
  * and blocklists actually group by at 100 TB (`a.blogs.co.uk` ≡
  * `b.blogs.co.uk` one site; `a.github.io` ≠ `b.github.io` two
  * sites — host-minus-www gets both wrong).
  */
object UrlCanon {

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val key = if (eq < 0) param else param.substring(0, eq)
    val k = key.toLowerCase
    k.startsWith("utm_") || k == "fbclid" || k == "gclid" || k == "msclkid" || k == "ref"
  }

  /** Canonical form, or null for non-http(s)/unparseable input. */
  def canonicalize(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return null
    val scheme = url.substring(0, schemeEnd).toLowerCase
    if (scheme != "http" && scheme != "https") return null
    val rest = url.substring(schemeEnd + 3)
    if (rest.isEmpty) return null
    // authority ends at the first '/', '?' or '#'
    var authEnd = rest.length
    var i = 0
    while (i < authEnd) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') authEnd = i else i += 1
    }
    var auth = rest.substring(0, authEnd)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1) // strip userinfo
    if (auth.isEmpty) return null
    // split host[:port]
    val colon = auth.lastIndexOf(':')
    var host = auth
    var port = ""
    if (colon >= 0 && auth.indexOf(']') < colon) { // ']' guard: IPv6 literals
      host = auth.substring(0, colon)
      port = auth.substring(colon + 1)
      if (port.nonEmpty && !port.forall(_.isDigit)) return null
    }
    if (host.isEmpty) return null
    host = host.toLowerCase
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    // path / query / fragment
    val tail = rest.substring(authEnd)
    val hash = tail.indexOf('#')
    val noFrag = if (hash < 0) tail else tail.substring(0, hash)
    val q = noFrag.indexOf('?')
    val path = if (q < 0) noFrag else noFrag.substring(0, q)
    val query = if (q < 0) "" else noFrag.substring(q + 1)
    val keptParams =
      if (query.isEmpty) Array.empty[String]
      else query.split("&", -1).filter(p => p.nonEmpty && !isTracking(p))
    val sb = new java.lang.StringBuilder(url.length)
    sb.append(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(if (path.isEmpty) "/" else path)
    if (keptParams.nonEmpty) sb.append('?').append(keptParams.mkString("&"))
    sb.toString
  }

  /** Lowercased canonical host, unmodified — the PSL matcher's input
    * (`www.` is a real label to the exception rules: !www.ck). */
  def rawHostOf(url: String): String = {
    val c = canonicalize(url)
    if (c == null) return null
    val start = c.indexOf("://") + 3
    var end = c.length
    var i = start
    while (i < end) {
      val ch = c.charAt(i)
      if (ch == '/' || ch == ':' || ch == '?') end = i else i += 1
    }
    c.substring(start, end)
  }

  /** Lowercased host minus a leading `www.`, or null when the URL
    * doesn't canonicalize. */
  def hostOf(url: String): String = {
    val h = rawHostOf(url)
    if (h == null) null
    else if (h.startsWith("www.") && h.length > 4) h.substring(4) else h
  }

  /** Registrable domain (PSL snapshot semantics) of the URL's host, or
    * null when the URL doesn't canonicalize or the host has no
    * registrable domain (bare public suffix, IP literal). */
  def domainOf(url: String): String = {
    val h = rawHostOf(url)
    if (h == null) null else PublicSuffixes.registrableDomain(h)
  }

  def canonicalizeU(u: UTF8String): UTF8String = {
    if (u == null) return null
    val r = canonicalize(u.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def hostOfU(u: UTF8String): UTF8String = {
    if (u == null) return null
    val r = hostOf(u.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def domainOfU(u: UTF8String): UTF8String = {
    if (u == null) return null
    val r = domainOf(u.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}

private[plans] trait StringInputExpr extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects a string column, got $other")
  }
}

/** Canonical URL (scheme/host case, default port, fragment, tracking
  * params) — NULL for non-http(s) or unparseable input. */
case class UrlCanonicalize(child: Expression) extends StringInputExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UrlCanon.canonicalizeU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.UrlCanon.canonicalizeU($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Lowercased host minus leading `www.` — the per-site grouping key;
  * NULL when the URL doesn't canonicalize. */
case class UrlHost(child: Expression) extends StringInputExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UrlCanon.hostOfU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.UrlCanon.hostOfU($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Registrable domain against the embedded PSL snapshot — the per-SITE
  * grouping key (public suffix + one label); NULL when the URL doesn't
  * canonicalize or the host is a bare public suffix / IP literal. */
case class UrlDomain(child: Expression) extends StringInputExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UrlCanon.domainOfU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.UrlCanon.domainOfU($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object UrlExpressions {
  def urlCanonicalize(c: Column): Column =
    ColumnBridge.column(UrlCanonicalize(ColumnBridge.expression(c)))
  def urlHost(c: Column): Column =
    ColumnBridge.column(UrlHost(ColumnBridge.expression(c)))
  def urlDomain(c: Column): Column =
    ColumnBridge.column(UrlDomain(ColumnBridge.expression(c)))
}
