package graft.plans

/** Public-Suffix-List snapshot for registrable-domain extraction —
  * the grouping key per-site caps and blocklists actually need at
  * 100 TB: `a.blogs.co.uk` and `b.blogs.co.uk` are the same SITE
  * (`blogs.co.uk`), while `a.github.io` and `b.github.io` are
  * DIFFERENT sites (user pages) — host-minus-www gets both wrong.
  *
  * Data: a curated snapshot subset of the PUBLIC Public Suffix List
  * (publicsuffix.org, Mozilla, MPL-2.0 — public data, embedded as a
  * generated table because this build is offline). It covers the
  * high-traffic multi-label ccTLD registries, the wildcard/exception
  * machinery, and the common hosting providers from the PSL's private
  * section. Suffixes NOT in the snapshot fall back to the PSL's own
  * default rule `*` (the bare TLD is the public suffix) — exactly the
  * list's specified behavior for unlisted TLDs, so the degradation
  * mode is "treats an exotic registry like a flat TLD", never a crash
  * or a junk key. Swap in the full ~9k-rule list by regenerating
  * [[Rules]]/[[Wildcards]]/[[Exceptions]] from the published file.
  *
  * Algorithm (the PSL spec, publicsuffix.org/list/):
  *  1. the prevailing rule is the MATCHING rule with the most labels
  *     (`*` in a rule matches exactly one label);
  *  2. exception rules (`!`) beat everything: their public suffix is
  *     the rule minus its first label;
  *  3. no match → `*` (the TLD itself);
  *  4. registrable domain = public suffix + one more label; a host
  *     that IS a public suffix has none.
  */
object PublicSuffixes {

  /** Multi-label ICANN rules (the single-label default needs no
    * listing) + PSL private-section hosting providers. */
  private val RuleList: Array[String] = Array(
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz",
    "gen.nz", "kiwi.nz", "maori.nz",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br", "blog.br",
    // China + Hong Kong + Taiwan
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    // Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr", "ac.kr",
    "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    // South Africa
    "co.za", "net.za", "org.za", "edu.za", "gov.za", "ac.za", "web.za",
    // Mexico / Argentina / Chile / Colombia / Peru / Venezuela / Ecuador
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar",
    "gov.cl", "gob.cl", "co.cl", "mil.cl",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "co.ve", "edu.ve", "gob.ve", "mil.ve", "web.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gov.ec", "gob.ec", "mil.ec",
    "fin.ec", "med.ec", "pro.ec", "info.ec", "k12.ec",
    // Turkey
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "k12.tr",
    "av.tr", "gen.tr", "web.tr",
    // Singapore / Malaysia / Indonesia / Thailand / Vietnam / Philippines
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    "co.id", "net.id", "or.id", "web.id", "sch.id", "ac.id", "go.id",
    "mil.id", "biz.id", "my.id",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "mi.th", "in.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph", "i.ph",
    // Israel / Saudi Arabia / UAE / Egypt / Nigeria / Kenya / Ukraine
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "idf.il", "k12.il", "muni.il",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "pub.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg", "eun.eg",
    "mil.eg", "name.eg",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng",
    "mobi.ng", "name.ng", "sch.ng",
    "co.ke", "ne.ke", "or.ke", "go.ke", "ac.ke", "sc.ke", "info.ke", "me.ke", "mobi.ke",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    // Poland / Greece
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    // Canada (provincial registries + federal)
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca", "nt.ca",
    "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca", "gc.ca",
    // PSL private section: per-user hosting (each subdomain = a SITE)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com", "appspot.com",
    "netlify.app", "vercel.app", "web.app", "pages.dev", "workers.dev",
    "firebaseapp.com", "readthedocs.io", "azurewebsites.net", "cloudfront.net",
    "s3.amazonaws.com", "fastly.net", "onrender.com", "surge.sh", "neocities.org")

  /** `*.<base>` wildcard rules: EVERY label directly under the base is
    * itself a public suffix. */
  private val WildcardList: Array[String] = Array("ck", "bd", "er", "fk", "mm", "np")

  /** `!` exception rules, stored full (public suffix = rule minus its
    * first label). */
  private val ExceptionList: Array[String] = Array("www.ck")

  private val Rules: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](RuleList.length * 2)
    RuleList.foreach(s.add); s
  }
  private val Wildcards: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](16)
    WildcardList.foreach(s.add); s
  }
  private val Exceptions: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](4)
    ExceptionList.foreach(s.add); s
  }

  /** Registrable domain (public suffix + 1 label) of an already-
    * lowercased host, or null when the host has none: it IS a public
    * suffix, is an IP literal, or isn't a dotted hostname. */
  def registrableDomain(host: String): String = {
    if (host == null || host.isEmpty) return null
    if (host.charAt(0) == '.' || host.charAt(host.length - 1) == '.') return null
    var i = 0
    var digitsAndDotsOnly = true
    while (i < host.length) {
      val c = host.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '-' || c == '.'
      if (!ok) return null // brackets, ':', '_', uppercase (caller lowercases)
      if (!((c >= '0' && c <= '9') || c == '.')) digitsAndDotsOnly = false
      i += 1
    }
    if (digitsAndDotsOnly) return null // IPv4 literal
    val labels = host.split('.')
    if (labels.exists(_.isEmpty)) return null
    val n = labels.length
    // exception rules beat everything
    var j = 0
    while (j < n) {
      if (j + 1 <= n && Exceptions.contains(labels.drop(j).mkString("."))) {
        // public suffix = exception minus first label → registrable
        // domain = the exception match itself
        return labels.drop(j).mkString(".")
      }
      j += 1
    }
    // longest matching rule; default `*` = bare TLD (psLen 1)
    var psLen = 1
    j = 0
    while (j < n) {
      val len = n - j
      if (len > psLen && Rules.contains(labels.drop(j).mkString("."))) psLen = len
      if (j + 1 < n && len > psLen && Wildcards.contains(labels.drop(j + 1).mkString(".")))
        psLen = len
      j += 1
    }
    if (n <= psLen) null
    else labels.drop(n - psLen - 1).mkString(".")
  }
}
