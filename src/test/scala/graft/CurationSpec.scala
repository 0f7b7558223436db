package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** PII redaction + per-source quota capping. The driver's q_pii_scrub
  * runs over synthetic text with no real PII (counts 0, fingerprints
  * still cross-engine-checked); this spec plants real-shaped PII and
  * pins the redaction semantics. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("piiScrub redacts emails, IPv4s and phone numbers; counts match") {
    val df = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk or 555 123-4567"),
      (2L, "server at 192.168.0.1 and backup at 10.0.0.255, call 555-123-4567"),
      (3L, "mixed: bob@host.org from 172.16.254.3 dials +1 555 867 5309"),
      (4L, "nothing sensitive here, just words and the number 42")
    ).toDF("doc_id", "text")
    val got = Curation.piiScrub(df, "text")
      .select("doc_id", "n_emails", "n_ipv4", "n_phones", "redacted")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)

    assert(got(0) == ((1L, 1, 0, 1, "contact me at <EMAIL> or <PHONE>")))
    assert(got(1) == ((2L, 0, 2, 1, "server at <IP> and backup at <IP>, call <PHONE>")))
    // "+1 555 867 5309" — the pattern anchors on the 10-digit run with
    // optional separators, leaving the country-code prefix in place
    assert(got(2)._2 == 1 && got(2)._3 == 1 && got(2)._4 == 1)
    assert(got(2)._5.contains("<EMAIL>") && got(2)._5.contains("<IP>") && got(2)._5.contains("<PHONE>"))
    assert(got(3) == ((4L, 0, 0, 0, "nothing sensitive here, just words and the number 42")))
  }

  test("piiScrub order: the email pass consumes its domain before the IPv4 pass runs") {
    // mail.example.com must be swallowed by <EMAIL>, not re-scanned;
    // the standalone dotted quad is still an <IP>
    val df = Seq((1L, "x@mail.example.com then 111.222.333.444")).toDF("doc_id", "text")
    val r = Curation.piiScrub(df, "text").select("redacted").as[String].head()
    assert(r == "<EMAIL> then <IP>", s"got: $r")
  }

  test("counts report redactions PERFORMED, not raw pattern hits") {
    // the dotted quad lives inside the email's domain: the email pass
    // consumes it, so n_ipv4 must be 0 even though the raw text matches
    // the IPv4 pattern once
    val df = Seq((1L, "bob@1.2.3.4.co says hi")).toDF("doc_id", "text")
    val r = Curation.piiScrub(df, "text")
      .select("n_emails", "n_ipv4", "n_phones", "redacted")
      .as[(Int, Int, Int, String)].head()
    assert(r == ((1, 0, 0, "<EMAIL> says hi")), s"got: $r")
  }

  test("reserved output names fail fast") {
    val e1 = intercept[IllegalArgumentException] {
      Curation.piiScrub(Seq((1L, "t", 0)).toDF("doc_id", "text", "n_emails"), "text")
    }
    assert(e1.getMessage.contains("n_emails"))
    val e2 = intercept[IllegalArgumentException] {
      Curation.capPerKey(Seq((1L, "a", 2L)).toDF("k", "s", "__rn"), "k", col("s"), col("s"), 1)
    }
    assert(e2.getMessage.contains("__rn"))
  }

  test("capPerKey keeps exactly n rows per key with deterministic preference") {
    val df = (1L to 40L).map(i => (s"s${i % 4}", i, i * 10)).toDF("source", "doc_id", "n_chars")
    val got = Curation.capPerKey(df, "source", col("n_chars").desc, col("doc_id"), n = 3)
    assert(got.groupBy("source").count().as[(String, Long)].collect().forall(_._2 == 3L))
    // preference: the 3 largest n_chars per source survive
    val s0 = got.filter(col("source") === "s0").select("doc_id").as[Long].collect().sorted.toSeq
    assert(s0 == Seq(32L, 36L, 40L), s"got $s0")
  }

  test("capPerKey plans as WindowGroupLimit (rank filter pushed into the sort)") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = Curation.capPerKey(docs, "source", col("n_chars").desc, col("doc_id"), n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("curationPipeline: each gate removes exactly its target row") {
    // long common-vocab filler pushes quality up and xent down; every
    // doc shares it so the LM gate only reacts to the rare-token doc
    val filler = Seq.fill(40)("the quick brown fox jumps over a lazy dog").mkString(" ")
    val docs = Seq(
      (1L, filler, "s1"),                                 // keeper
      (2L, filler, "s1"),                                 // exact dup of 1 → dedup drops (higher id)
      (3L, "tiny!!!", "s1"),                              // low quality → score gate drops
      (4L, filler + " zzqx wwvv qqrr kkjj xxyy zzaa", "s1"), // rare tail → worst xent
      (5L, filler + " extra tail of plain words", "s2")   // keeper, other source
    ).toDF("doc_id", "text", "source")
    // threshold chosen between doc-4's xent and the keepers' (doc 4 is
    // strictly worse than 1/5 by construction)
    val xents = graft.operators.Collocations
      .unigramCrossEntropy(docs, "doc_id", "text")
      .select("doc_id", "lm_xent").as[(Long, Double)].collect().toMap
    assert(xents(4L) > xents(1L) && xents(4L) > xents(5L))
    val cut = (xents(4L) + math.max(xents(1L), xents(5L))) / 2
    val kept = Curation.curationPipeline(docs, "doc_id", "text", "source",
        minScore = 0.7, maxXent = cut, perSourceCap = 1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 5L), s"got $kept")
    // relaxing the cap to 2 must not resurrect gate-dropped rows
    val kept2 = Curation.curationPipeline(docs, "doc_id", "text", "source",
        minScore = 0.7, maxXent = cut, perSourceCap = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept2 == Seq(1L, 5L), s"got $kept2")
  }

  test("funnelAttribution: first-fail only, conserved counts, zero-drop rules present") {
    val df = Seq(
      (1L, 5, 0.5),   // fails rule 1 AND rule 2 — attributed to rule 1 only
      (2L, 50, 0.9),  // fails rule 2
      (3L, 50, 0.1),  // passes both
      (4L, 50, 0.2)   // passes both
    ).toDF("id", "n_tok", "ratio")
    val out = Curation.funnelAttribution(df, Seq(
        "short" -> ($"n_tok" < 10),
        "noisy" -> ($"ratio" > 0.8),
        "never" -> lit(false)))
      .orderBy("rule_order")
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1, "short", 4L, 1L, 3L), (2, "noisy", 3L, 1L, 2L),
      (3, "never", 2L, 0L, 2L)), s"got $out")
  }

  test("funnelAttribution: rejects duplicate and reserved rule names") {
    val df = Seq((1L, 1)).toDF("id", "x")
    intercept[IllegalArgumentException] {
      Curation.funnelAttribution(df, Seq("a" -> lit(true), "a" -> lit(false)))
    }
    intercept[IllegalArgumentException] {
      Curation.funnelAttribution(df, Seq("kept" -> lit(true)))
    }
  }

  test("thresholdImpact: rank-k threshold, tie overshoot, per-domain rates") {
    val df = Seq(
      ("a", 0.9), ("a", 0.8), ("a", 0.7), ("a", 0.7),
      ("b", 0.7), ("b", 0.3), ("b", 0.2), ("b", 0.1)
    ).toDF("dom", "score")
    // f=0.5 of 8 rows → rank 4 descending = 0.7; ties keep all three 0.7s
    val out = Curation.thresholdImpact(df, "dom", "score", 0.5)
      .orderBy("dom").as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("a", 4L, 4L, 1.0, 0.7), ("b", 4L, 1L, 0.25, 0.7)), s"got $out")
  }

  test("fimTransform: reconstruction property, determinism, rate bounds, null text") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 200L).map(i => (i, s"document body number $i with some fill text"))
      .toDF("doc_id", "text")
    val out = graft.operators.Curation.fimTransform(docs, "doc_id", "text", ratePct = 50)
      .select("doc_id", "text", "fim_applied", "fim_text", "n_prefix", "n_middle")
      .collect()
    val applied = out.filter(_.getBoolean(2))
    // hash-selected rate lands near 50% (md5 buckets, 200 ids)
    assert(applied.length > 60 && applied.length < 140, s"rate off: ${applied.length}/200")
    applied.foreach { r =>
      val (orig, fim) = (r.getString(1), r.getString(3))
      // PSM surgery is lossless: prefix + middle + suffix == original
      val pre = fim.substring(5, fim.indexOf("<SUF>"))
      val suf = fim.substring(fim.indexOf("<SUF>") + 5, fim.indexOf("<MID>"))
      val mid = fim.substring(fim.indexOf("<MID>") + 5)
      assert(pre + mid + suf === orig, s"doc ${r.getLong(0)} not reconstructible")
      assert(r.getLong(4) === pre.length.toLong && r.getLong(5) === mid.length.toLong)
    }
    // untouched docs pass through byte-identical
    out.filterNot(_.getBoolean(2)).foreach(r => assert(r.getString(3) === r.getString(1)))
    // deterministic: same seed, same deal and same splits
    val again = graft.operators.Curation.fimTransform(docs, "doc_id", "text", ratePct = 50)
      .select("fim_text").collect().map(_.getString(0)).toSeq
    assert(again === out.map(_.getString(3)).toSeq)
    // a different seed deals differently (not a constant function)
    val other = graft.operators.Curation.fimTransform(docs, "doc_id", "text",
      ratePct = 50, seed = "fim2").select("fim_text").collect().map(_.getString(0)).toSeq
    assert(other !== again)
    // null text never applies, never throws
    val n = graft.operators.Curation.fimTransform(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"), "doc_id", "text")
      .select("fim_applied", "fim_text").collect().head
    assert(!n.getBoolean(0) && n.isNullAt(1))
    // rate 0 and 100 are exact
    assert(graft.operators.Curation.fimTransform(docs, "doc_id", "text", ratePct = 0)
      .filter(col("fim_applied")).count() === 0L)
    assert(graft.operators.Curation.fimTransform(docs, "doc_id", "text", ratePct = 100)
      .filter(!col("fim_applied")).count() === 0L)
  }
}
