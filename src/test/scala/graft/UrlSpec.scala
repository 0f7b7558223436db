package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{UrlCanon, UrlExpressions}

/** URL canonicalization: the documented six normalization steps, the
  * quarantine NULLs, and the expression path over a string column. */
class UrlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonicalize: scheme/host case, default ports, fragments, tracking params") {
    assert(UrlCanon.canonicalize("HTTP://WWW.Ex.COM:80/A/b?utm_source=x&q=1#f")
      == "http://www.ex.com/A/b?q=1")
    assert(UrlCanon.canonicalize("https://a.com:443/x") == "https://a.com/x")
    assert(UrlCanon.canonicalize("https://a.com:8443/x") == "https://a.com:8443/x",
      "non-default port survives")
    assert(UrlCanon.canonicalize("http://a.com:443/x") == "http://a.com:443/x",
      "443 is NOT default for http")
    assert(UrlCanon.canonicalize("http://u:p@Host.net/p") == "http://host.net/p",
      "userinfo stripped")
    // path case preserved; already-canonical is a fixpoint
    val c = "http://a.com/CaseSensitive?x=1"
    assert(UrlCanon.canonicalize(c) == c)
    assert(UrlCanon.canonicalize(UrlCanon.canonicalize(c)) == c)
  }

  test("canonicalize: query-param semantics — order kept, strip list exact-match keys") {
    assert(UrlCanon.canonicalize("http://a.com/p?b=2&a=1") == "http://a.com/p?b=2&a=1",
      "param ORDER is significant and preserved")
    assert(UrlCanon.canonicalize("http://a.com/p?ref=x&referrer=y")
      == "http://a.com/p?referrer=y", "ref is stripped by exact key, referrer is not")
    assert(UrlCanon.canonicalize("http://a.com/p?a=utm_x") == "http://a.com/p?a=utm_x",
      "utm_ in a VALUE does not strip")
    assert(UrlCanon.canonicalize("http://a.com/p?UTM_Source=x&q=1") == "http://a.com/p?q=1",
      "strip keys are case-insensitive")
    assert(UrlCanon.canonicalize("http://a.com/p?a=1&&b=2") == "http://a.com/p?a=1&b=2",
      "empty params drop")
    assert(UrlCanon.canonicalize("http://a.com/p?utm_source=x") == "http://a.com/p",
      "fully-stripped query drops its '?'")
    assert(UrlCanon.canonicalize("http://a.com?x=1") == "http://a.com/?x=1",
      "empty path normalizes to /")
    assert(UrlCanon.canonicalize("http://a.com") == "http://a.com/")
  }

  test("canonicalize: IPv6, junk, and non-http quarantine to null") {
    assert(UrlCanon.canonicalize("http://[::1]:80/x") == "http://[::1]/x")
    assert(UrlCanon.canonicalize("http://[::1]:8080/x") == "http://[::1]:8080/x")
    assert(UrlCanon.canonicalize("ftp://files.ex.com/x") == null, "non-http scheme")
    assert(UrlCanon.canonicalize("mailto:a@b.com") == null)
    assert(UrlCanon.canonicalize("//scheme.relative/x") == null)
    assert(UrlCanon.canonicalize("http://") == null)
    assert(UrlCanon.canonicalize("http:///path") == null)
    assert(UrlCanon.canonicalize("http://a.com:8x/") == null, "non-numeric port")
    assert(UrlCanon.canonicalize("not a url") == null)
    assert(UrlCanon.canonicalize("") == null)
  }

  test("hostOf: lowercased host minus leading www., null propagates") {
    assert(UrlCanon.hostOf("HTTP://WWW.Ex.COM/a") == "ex.com")
    assert(UrlCanon.hostOf("http://www2.ex.com/a") == "www2.ex.com", "only exact www. strips")
    assert(UrlCanon.hostOf("http://u@Sub.Ex.ORG:8080/a?x=1") == "sub.ex.org")
    assert(UrlCanon.hostOf("ftp://x.com/") == null)
  }

  test("domainOf: PSL registrable-domain branches — rules, wildcard, exception, fallback") {
    import graft.plans.PublicSuffixes.registrableDomain
    // multi-label ICANN rules: the suffix wins over the naive 2-label cut
    assert(UrlCanon.domainOf("https://News.BBC.CO.UK/x") == "bbc.co.uk")
    assert(UrlCanon.domainOf("http://a.b.shop.com.au/") == "shop.com.au")
    // private-section hosting: each user subdomain is its own site
    assert(UrlCanon.domainOf("https://Alice.GitHub.IO/r") == "alice.github.io")
    assert(UrlCanon.domainOf("https://bob.github.io/r") == "bob.github.io")
    // www. is a real label to the matcher (and strips out of the key)
    assert(UrlCanon.domainOf("http://www.example.co.uk/") == "example.co.uk")
    // flat-TLD default rule: unlisted TLD → suffix is the bare TLD
    assert(UrlCanon.domainOf("http://a.b.site.de/") == "site.de")
    assert(UrlCanon.domainOf("https://x.y.weird.xyzzy/") == "weird.xyzzy")
    // wildcard *.ck: every label under ck is itself a public suffix
    assert(registrableDomain("shop.stuff.ck") == "shop.stuff.ck")
    assert(registrableDomain("stuff.ck") == null, "one-label-under-wildcard IS a suffix")
    // exception !www.ck beats the wildcard
    assert(registrableDomain("www.ck") == "www.ck")
    assert(registrableDomain("deep.www.ck") == "www.ck")
    // no registrable domain: bare suffixes, TLDs, IP literals, junk
    assert(registrableDomain("co.uk") == null)
    assert(registrableDomain("github.io") == null)
    assert(registrableDomain("com") == null)
    assert(registrableDomain("192.168.10.1") == null)
    assert(registrableDomain("ex..com") == null)
    assert(registrableDomain(".com") == null)
    assert(UrlCanon.domainOf("ftp://x.co.uk/") == null, "non-canonicalizable stays null")
  }

  test("urlDomain expression: codegen'd, null semantics") {
    val r = Seq("https://A.B.Example.CO.UK/p?utm_source=x", "http://10.0.0.1/",
      "https://co.uk/", null)
      .toDF("u").select(UrlExpressions.urlDomain(col("u")).as("d"))
      .as[Option[String]].collect()
    assert(r.toSeq == Seq(Some("example.co.uk"), None, None, None))
  }

  test("expression path: codegen'd over a string column, null semantics") {
    val r = Seq("HTTP://A.com:80/x?utm_source=1&k=2#f", "gopher://old.net", null)
      .toDF("u")
      .select(UrlExpressions.urlCanonicalize(col("u")).as("c"),
        UrlExpressions.urlHost(col("u")).as("h"))
      .as[(Option[String], Option[String])].collect()
    assert(r(0) == ((Some("http://a.com/x?k=2"), Some("a.com"))))
    assert(r(1) == ((None, None)))
    assert(r(2) == ((None, None)))
  }
}
