package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{HtmlStrip, ImageHeaders, MediaHeaders, UrlCanon}

/** Fuzz hardening for every parser that runs over UNTRUSTED bytes or
  * strings at scan throughput: on arbitrary input the parsers must
  * (a) never throw — a 100 TB scan cannot die on one bad record,
  * (b) keep their packing/nullability invariants, and (c) stay
  * deterministic. Deterministic scalacheck generators (fixed Seed, no
  * scalatestplus bridge on the offline classpath) — failures replay. */
class ParserFuzzSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(seed)).get

  private val byteArrays: List[Array[Byte]] = {
    val g = for {
      n <- Gen.chooseNum(0, 96)
      bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield bs.toArray
    sample(g, 1500, 1L)
  }

  /** Random bytes prefixed with each REAL magic — forces every parser
    * past the sniff into its deep-parse path with garbage payloads. */
  private val magicked: List[Array[Byte]] = {
    val magics = List[Array[Byte]](
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), // png
      Array(0xff, 0xd8).map(_.toByte),                                     // jpeg
      "GIF89a".getBytes, "GIF87a".getBytes, "BM".getBytes,                 // gif/bmp
      "RIFF1234WAVE".getBytes,                                             // wav
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes,                     // mp4
      "OggS".getBytes, "fLaC".getBytes,
      Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte), "ID3".getBytes)
    for { m <- magics; b <- byteArrays.take(120) } yield m ++ b
  }

  test("image/media header parsers never throw and keep invariants on arbitrary bytes") {
    (byteArrays ++ magicked).foreach { b =>
      val f1 = ImageHeaders.formatOf(b)
      val d = ImageHeaders.dims(b)
      val w = ImageHeaders.widthOf(b)
      val h = ImageHeaders.heightOf(b)
      // packed-dims invariant: -1 (invalid) or BOTH halves positive ints
      if (d == -1L) assert(w == -1 && h == -1)
      else { assert(w > 0 && h > 0); assert(d == ((w.toLong << 32) | h.toLong)) }
      // dims parse implies a sniffable container
      if (w > 0) assert(f1 != null)

      val mf = MediaHeaders.formatOf(b)
      val wi = MediaHeaders.wavInfo(b)
      val ms = MediaHeaders.durationMsOf(b)
      val sr = MediaHeaders.sampleRateOf(b)
      val ch = MediaHeaders.channelsOf(b)
      MediaHeaders.mp4DurationMs(b)
      if (wi == -1L) assert(sr == -1 && ch == -1)
      else {
        assert(sr > 0 && sr <= 0xffffff && ch > 0 && ch <= 255)
        assert((wi & 0xffffffffL) >= 0L)
      }
      if (ms >= 0L) assert(mf != null, "a parsed duration implies a sniffed container")
      // determinism
      assert(ImageHeaders.dims(b) == d && MediaHeaders.wavInfo(b) == wi)
    }
  }

  private val junkStrings: List[String] = {
    val weird = Gen.oneOf('<', '>', '&', ';', ':', '/', '?', '#', '@', '=', '.',
      'a', 'Z', '0', ' ', '\n', 'é', '中')
    val g = for {
      n <- Gen.chooseNum(0, 80)
      cs <- Gen.listOfN(n, weird)
    } yield cs.mkString
    sample(g, 800, 2L)
  }

  private val urlish: List[String] = {
    val g = for {
      scheme <- Gen.oneOf("http", "HTTPS", "ftp", "", "ht tp")
      host <- Gen.oneOf("A.com", "", "[::1]", "x", "WWW.x.Y")
      port <- Gen.oneOf("", ":80", ":443", ":8080", ":x", ":")
      path <- Gen.oneOf("", "/", "/P/q", "//", "/a b")
      query <- Gen.oneOf("", "?", "?a=1", "?utm_source=2&b=3", "?&&", "?ref")
      frag <- Gen.oneOf("", "#", "#f", "#a#b")
    } yield s"$scheme://${host}${port}${path}${query}${frag}"
    sample(g, 600, 3L)
  }

  test("UrlCanon never throws; canonicalize is a FIXPOINT on its own output") {
    (junkStrings ++ urlish).foreach { s =>
      val c = UrlCanon.canonicalize(s)
      UrlCanon.hostOf(s)
      if (c != null) {
        assert(UrlCanon.canonicalize(c) == c, s"not a fixpoint: '$s' -> '$c'")
        assert(c.startsWith("http://") || c.startsWith("https://"))
        assert(!c.contains("#"), s"fragment survived: '$s' -> '$c'")
      }
      // PSL extraction: never throws; a domain implies a canonical host
      // that ENDS WITH it (suffix-of-host invariant)
      val d = UrlCanon.domainOf(s)
      if (d != null) {
        val h = UrlCanon.rawHostOf(s)
        assert(h != null && (h == d || h.endsWith("." + d)),
          s"domain not a host suffix: '$s' host '$h' domain '$d'")
        assert(d.contains("."), s"registrable domain needs ≥2 labels: '$d'")
      }
    }
  }

  test("HtmlStrip never throws; output carries no un-entity'd markup") {
    val taggy = junkStrings.map(s => s"<div a='$s'>$s</div><script>$s</script>$s")
    (junkStrings ++ taggy).foreach { s =>
      val out = HtmlStrip.strip(s)
      assert(out == out.trim)
      assert(!out.contains("  "), s"whitespace not collapsed for '$s'")
      assert(HtmlStrip.strip(s) == out) // deterministic
    }
  }
}
