package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextAnalysis
import graft.operators.{Dedup, Similarity, TfIdf}

class TextDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles: short docs yield empty array, not descending-sequence garbage") {
    val df = Seq((1L, "one two"), (2L, "one two three four")).toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokens("text"))
      .withColumn("sh", TextAnalysis.shingles("toks", 3))
    val got = df.select("doc_id", "sh").as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq())
    assert(got(2L) == Seq("one two three", "two three four"))
  }

  test("incrementalCandidatePairs ≡ full lshCandidatePairs restricted to batch-touching pairs") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 8).persist()
    sigs.count()
    val newSigs = sigs.filter(col("doc_id") % 5 === 0)
    val incr = Dedup.incrementalCandidatePairs(newSigs, sigs, "doc_id", 8, 2)
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.lshCandidatePairs(sigs, "doc_id", 8, 2)
      .as[(Long, Long, Double)].collect()
      .filter(p => p._1 % 5 == 0 || p._2 % 5 == 0).toSet
    assert(incr == full, s"incremental probe diverged: ${incr.diff(full)} / ${full.diff(incr)}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("simhashNearDups (banded equi-join) ≡ brute-force hamming filter") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val banded = Dedup.simhashNearDups(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sig = Dedup.simhash16(docs, "doc_id", "text")
    val a = sig.select(col("doc_id").as("id_a"), col("simhash16").as("sa"))
    val b = sig.select(col("doc_id").as("id_b"), col("simhash16").as("sb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Dedup.hamming(col("sa"), col("sb")) <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == brute, "pigeonhole banding must be complete for hamming <= 3")
  }

  test("simhashNearDups 64-bit (16-bit bands) ≡ brute-force hamming filter") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val banded = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3, bits = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sig = Dedup.simhash(docs, "doc_id", "text", bits = 64)
    val a = sig.select(col("doc_id").as("id_a"), col("simhash64").as("sa"))
    val b = sig.select(col("doc_id").as("id_b"), col("simhash64").as("sb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Dedup.hamming(col("sa"), col("sb")) <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == brute, "16-bit-band pigeonhole must be complete for hamming <= 3 at 64 bit")
    // 64-bit candidate volume must be a small fraction of 16-bit's
    // (the whole point of widening: buckets of ~n/2^16, not ~n/16)
    val banded16 = Dedup.simhashNearDups(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded.size <= banded16.size,
      s"64-bit pairs (${banded.size}) should not exceed 16-bit pairs (${banded16.size})")
  }

  test("simhash 64-bit: identical docs identical, hi/lo chunk assembly exact") {
    val docs = Seq((1L, "spark window join"), (2L, "spark window join"), (3L, "cat dog mouse"))
      .toDF("doc_id", "text")
    val m = Dedup.simhash(docs, "doc_id", "text", bits = 64).as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
    // single-token doc: fingerprint == the token's 64-bit md5-chunk hash
    // (every bit vote has multiplicity 1, sign = the bit itself)
    val one = Seq((1L, "hello")).toDF("doc_id", "text")
    val fp = Dedup.simhash(one, "doc_id", "text", bits = 64).as[(Long, Long)].collect().head._2
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hi = java.lang.Long.parseLong(md5hex.substring(0, 8), 16)
    val lo = java.lang.Long.parseLong(md5hex.substring(8, 16), 16)
    assert(fp == ((hi << 32) | lo))
  }

  test("exact dedup groups duplicates under canonical min id") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .select("canonical_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(g == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash: identical docs share full signature; est_jaccard = 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words nothing shared here at all ok")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", k = 8, rowsPerBand = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }

  test("ngram jaccard: identical=1, disjoint=0") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.ngramJaccard(pairs, docs, "doc_id", "text")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    assert(got((1L, 2L)) == 1.0)
    assert(got((1L, 3L)) == 0.0)
  }

  test("simhash: identical docs get identical fingerprints, hamming 0") {
    val docs = Seq((1L, "spark window join"), (2L, "spark window join"), (3L, "cat dog mouse"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhash16(docs, "doc_id", "text")
    val m = sh.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    val d = sh.toDF("id", "s")
    val ham = d.as("a").crossJoin(d.as("b"))
      .filter(col("a.id") === 1 && col("b.id") === 2)
      .select(Dedup.hamming(col("a.s"), col("b.s"))).as[Long].head()
    assert(ham == 0L)
  }

  test("cosine: self-similarity 1, orthogonal 0, topk ranks by similarity") {
    val vs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.1f)), (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val self = vs.filter(col("vec_id") === 0).select(Similarity.cosineExpr("embedding", "embedding"))
      .as[Double].head()
    assert(math.abs(self - 1.0) < 1e-12)
    val topk = Similarity.bruteForceTopK(vs, vs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().sorted.toSeq
    assert(topk == Seq((1, 2L), (2, 1L), (3, 3L)))
  }

  test("custom CosineSim/DotProduct expressions are bit-identical to the fold formulation") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < 20 && col("ib") < 20)
    val diff = pairs.select(
        (Similarity.cosineExpr("va", "vb") - Similarity.cosineFoldExpr("va", "vb")).as("dc"),
        (Similarity.dotExpr("va", "vb") - Similarity.dotFoldExpr("va", "vb")).as("dd"))
      .agg(max(abs(col("dc"))), max(abs(col("dd")))).as[(Double, Double)].head()
    assert(diff == ((0.0, 0.0)), s"custom vs fold drift: $diff")
  }

  test("cosine_sim registered for SQL") {
    graft.plans.VectorExpressions.register(spark)
    graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings").createOrReplaceTempView("emb_t")
    val r = spark.sql(
      "SELECT cosine_sim(a.embedding, a.embedding) c, dot_product(a.embedding, a.embedding) d FROM emb_t a WHERE a.vec_id = 0")
      .as[(Double, Double)].head()
    assert(math.abs(r._1 - 1.0) < 1e-12 && r._2 > 0.0)
  }

  test("heapTopK (bounded native aggregate) matches window bruteForceTopK exactly") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 12)
    val win = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().sorted.toSeq
    val heapDf = Similarity.heapTopK(e, q, "vec_id", "embedding", k = 5)
    val heap = heapDf
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(heap == win)
    // the point of the native aggregate: the scoring pipeline stays on
    // unsafe rows — no object-serde hop anywhere in the physical plan
    val plan = heapDf.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("SerializeFromObject"),
      s"object serde leaked into heapTopK plan:\n$plan")
  }

  test("heapTopK tie-break and NaN ordering match the window formulation") {
    // scores engineered so ties and NaN are present: identical vectors
    // (cosine 1.0 ties), a zero vector (cosine NaN, ranks FIRST under
    // descending sort — Double.compare semantics)
    val vs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(0f, 0f)), (4L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val q = vs.filter(col("vec_id") === 0)
    val win = Similarity.bruteForceTopK(vs, q, "vec_id", "embedding", k = 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().sorted.toSeq
    val heap = Similarity.heapTopK(vs, q, "vec_id", "embedding", k = 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(heap == win && win.nonEmpty)
  }

  test("decontaminate: flags exactly the train docs sharing an n-gram with the eval set") {
    val evalSet = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "zzz alpha beta gamma delta epsilon yyy"), // contains the eval 5-gram (3 positions)
      (11L, "totally unrelated words only here now"),
      (12L, "alpha beta gamma delta epsilon")          // exact copy
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, evalSet, "doc_id", "text", shingleN = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 1L, 1L), (12L, 1L, 1L)))
  }

  test("cleanText: tags stripped, control chars removed, whitespace collapsed, trimmed") {
    val df = Seq((1L, "  a  <b>x</b>\ty z  ")).toDF("id", "text")
    val got = df.select(TextAnalysis.cleanText("text")).as[String].head()
    assert(got == "a x y z")
  }

  test("chunks: stride/overlap cover every token; tail chunk shorter; reconstruction exact") {
    val docs = Seq((1L, Some((1 to 11).map(i => s"w$i").mkString(" "))),
        (2L, Some("")), (3L, Some("only two")), (4L, Option.empty[String]))
      .toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokens("text"))
      .withColumn("ch", explode(TextAnalysis.chunks("toks", size = 4, overlap = 1)))
      .select(col("doc_id"), col("ch.start").as("start"), col("ch.toks").as("toks"))
    val got = docs.as[(Long, Int, Seq[String])].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc 1 (11 tokens, stride 3): starts 1,4,7,10; tail chunk length 2
    assert(got.map(r => (r._1, r._2, r._3.length)) ==
      Seq((1L, 1, 4), (1L, 4, 4), (1L, 7, 4), (1L, 10, 2), (3L, 1, 2)))
    // consecutive chunks share exactly `overlap` tokens; dropping the
    // overlap from every non-first chunk reconstructs the document
    val d1 = got.filter(_._1 == 1L).map(_._3)
    d1.sliding(2).foreach { case Seq(a, b) => assert(a.takeRight(1) == b.take(1)) }
    val rebuilt = d1.head ++ d1.tail.flatMap(_.drop(1))
    assert(rebuilt == (1 to 11).map(i => s"w$i"))
    // empty doc and NULL-text doc yield no chunks (docs 2, 4 absent)
    assert(!got.exists(r => r._1 == 2L || r._1 == 4L))
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 token run share a fingerprint") {
    // k=3, w=4: any shared 6-token run must be caught
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"unrelated prefix words here $shared and a tail"),
      (2L, s"$shared completely different continuation text follows"),
      (3L, "nothing in common with anything else at all today")).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlap(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "guaranteed shared fingerprint missed")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "disjoint doc must not pair")
  }

  test("repeatedSpans: planted shared run recovered maximally, both docs, exact bounds") {
    // 10 shared tokens; n=6 → 5 overlapping repeated windows merge into
    // ONE maximal span covering exactly the shared run
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 $shared t1 t2"),          // run at tokens 4..13
      (2L, s"$shared v1 v2 v3 v4 v5"),          // run at tokens 1..10
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12")).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", n = 6, minDocs = 2)
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_windows")
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    assert(spans == Set((1L, 4, 13, 10, 5L), (2L, 1, 10, 10, 5L)),
      s"expected the maximal planted span in both docs, got $spans")
  }

  test("repeatedSpans: two separated shared runs split into two spans (gap preserved)") {
    val runA = (1 to 6).map(i => s"a$i").mkString(" ")
    val runB = (1 to 6).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$runA x1 x2 x3 x4 $runB"),         // runs at 1..6 and 11..16
      (2L, s"p1 p2 $runA q1 q2"),
      (3L, s"r1 r2 r3 $runB r4")).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", n = 6, minDocs = 2)
      .filter($"doc_id" === 1L)
      .select("span_start", "span_end").as[(Int, Int)].collect().toSet
    assert(spans == Set((1, 6), (11, 16)), s"expected two separate spans, got $spans")
  }

  test("repeatedSpans: no cross-doc repeat → empty; within-doc repeat alone does not count") {
    val rep = (1 to 6).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, s"$rep filler1 filler2 $rep"),       // repeats only within doc 1
      (2L, "totally different tokens without any overlap at all")).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(docs, "doc_id", "text", n = 6, minDocs = 2).isEmpty)
  }

  test("asciiTokenOffsets: positional twin of the tokenizer — raw slices lower to the tokens") {
    // punctuation, casing, multi-space runs, and a UTF-8 multibyte char:
    // the offset pairs must slice the RAW bytes of exactly the runs the
    // tokenizer emits, in order
    val txt = "Hello,  WORLD—42!x9  end"
    val r = Seq(txt).toDF("text")
      .select(graft.plans.TextExpressions.asciiTokens(col("text")).as("t"),
        graft.plans.TextExpressions.asciiTokenOffsets(col("text")).as("o"))
      .as[(Seq[String], Seq[Long])].collect().head
    val (toks, offs) = r
    assert(toks.length == offs.length)
    val bytes = txt.getBytes("UTF-8")
    val sliced = offs.map { p =>
      val s = (p >>> 32).toInt; val e = (p & 0xffffffffL).toInt
      new String(bytes.slice(s - 1, e), "UTF-8")
    }
    assert(sliced == Seq("Hello", "WORLD", "42", "x9", "end"), s"raw slices: $sliced")
    assert(sliced.map(_.toLowerCase) == toks, "offset twin must mirror the tokenizer 1:1")
    // empty / no-token inputs: empty array, never null elements
    val e = Seq("—…—", "").toDF("text")
      .select(graft.plans.TextExpressions.asciiTokenOffsets(col("text")).as("o"))
      .as[Seq[Long]].collect()
    assert(e.forall(_.isEmpty))
  }

  test("repeatedSpansExact: planted raw run recovered with exact byte offsets + md5, " +
    "boundary bytes kept out of the span") {
    // shared RAW run keeps original casing and punctuation — 'exact'
    // means exact bytes; preamble/tail differ per doc
    val shared = "The Quick-Brown fox JUMPS over the lazy DOG now"  // 10 tokens
    val d1 = s"u1 u2 u3 $shared t1 t2"
    val d2 = s"$shared v1 v2 v3 v4 v5"
    val docs = Seq((1L, d1), (2L, d2),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12")).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpansExact(docs, "doc_id", "text", n = 6, minDocs = 2)
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_windows", "span_md5")
      .as[(Long, Int, Int, Int, Long, String)].collect().toSet
    val md5Shared = java.security.MessageDigest.getInstance("MD5")
      .digest(shared.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc1: run starts after "u1 u2 u3 " = byte 10 (1-based), ends before " t1 t2"
    val s1 = d1.indexOf(shared) + 1
    val s2 = d2.indexOf(shared) + 1
    assert(spans == Set(
      (1L, s1, s1 + shared.length - 1, 10, 5L, md5Shared),
      (2L, s2, s2 + shared.length - 1, 10, 5L, md5Shared)),
      s"expected the exact byte range + md5 of the planted run, got $spans")
  }

  test("repeatedSpansExact: same token sequence, different raw bytes → NO match " +
    "(byte-exactness, where token-normalized repeatedSpans DOES match)") {
    // docs agree token-wise (case-folded, punct-stripped) but the raw
    // bytes differ: double space + different casing + a comma
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "Alpha  beta gamma, delta epsilon zeta")).toDF("doc_id", "text")
    assert(Dedup.repeatedSpansExact(docs, "doc_id", "text", n = 6, minDocs = 2).isEmpty,
      "raw-byte windows must NOT match across normalization differences")
    assert(Dedup.repeatedSpans(docs, "doc_id", "text", n = 6, minDocs = 2).count() == 2,
      "sanity: the token-normalized form does match these docs")
  }

  test("winnowing density: selection keeps a fraction of k-gram hashes, short docs keep one") {
    val long = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, "just four small words"), (3L, "ab cd")).toDF("doc_id", "text")
    val counts = Dedup.winnowFingerprints(docs, "doc_id", "text")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // doc1: 98 k-gram hashes, 95 windows — winnowing keeps ~2/(w+1)=40%,
    // far fewer than all hashes
    assert(counts(1L) < 70, s"selection not sparse: ${counts(1L)} of 98")
    assert(counts(1L) > 10, "implausibly sparse")
    // doc2: 2 hashes < w -> single min; doc3: 0 trigrams -> absent
    assert(counts(2L) == 1L)
    assert(!counts.contains(3L))
    // fingerprints are a subset of the doc's k-gram hash set: re-derive
    // doc1's full hash list through the same md5 path and check containment
    val all = docs.filter($"doc_id" === 1L)
      .withColumn("toks", TextAnalysis.tokens("text"))
      .select(explode(TextAnalysis.shingles("toks", 3)).as("g"))
      .select(expr("cast(conv(substr(md5(g), 1, 15), 16, 10) as bigint)").as("h"))
      .as[Long].collect().toSet
    val sel = Dedup.winnowFingerprints(docs.filter($"doc_id" === 1L), "doc_id", "text")
      .select("fingerprint").as[Long].collect().toSet
    assert(sel.subsetOf(all))
  }

  test("quality band thresholds") {
    val df = Seq(0.71, 0.69, 0.5, 0.49).toDF("s")
    val got = df.select(TextAnalysis.qualityBand(col("s"))).as[String].collect().toSeq
    assert(got == Seq("high", "medium", "medium", "low"))
  }

  test("token estimators: whitespace count and BPE-ish count on hand-verified cases") {
    val df = Seq(
      (1L, "Don't stop"),     // ws 2 | bpeish: "Don" "'t" " stop" = 3
      (2L, "   "),            // ws 0 | bpeish 0
      (3L, ""),               // ws 0 | bpeish 0
      (4L, "a1b2"),           // ws 1 | bpeish: "a" "1" "b" "2" = 4
      (5L, "hello, world!!"), // ws 2 | bpeish: "hello" "," " world" "!!" = 4
      (6L, "x  y")            // ws 2 | bpeish: "x" " y" = 2 (double space: 2nd absorbs)
    ).toDF("id", "t")
    val got = df.select(col("id"),
        TextAnalysis.wsTokenCount("t").as("ws"),
        TextAnalysis.bpeishTokenCount("t").as("bp"))
      .orderBy("id").as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq((1L, 2, 3), (2L, 0, 0), (3L, 0, 0), (4L, 1, 4), (5L, 2, 4), (6L, 2, 2)),
      s"token estimator counts drifted: $got")
  }

  test("semanticDedup: lowest id per near-dup relation survives; cross-cluster pairs never compared") {
    // centroids at (1,0) and (0,1); ids 0,1,2 cluster to (1,0) — 0 and 1
    // are near-dups (keep 0, drop 1), 2 is distinct within the cluster;
    // id 3 aligns to (0,1): similar to 1 in ABSOLUTE cosine but in the
    // other cluster, so it must NOT be dropped.
    val embs = Seq(
      (0L, Seq(1.0f, 0.05f)), (1L, Seq(0.99f, 0.06f)), (2L, Seq(0.6f, 0.52f)),
      (3L, Seq(0.05f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("centroid_id", "centroid_vec")
    val got = Dedup.semanticDedup(embs, "vec_id", "embedding", cents, tau = 0.99)
      .select("id", "bucket", "dup_of").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 0L)), s"expected only id 1 dropped (dup of 0): $got")
  }

  test("semanticDedup: dup_of is the most-similar lower-id member, not just any") {
    // 2's nearest lower-id member is 1 (not 0) — the ledger must say so
    val embs = Seq(
      (0L, Seq(1.0f, 0.3f)), (1L, Seq(1.0f, 0.01f)), (2L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0f, 0.0f))).toDF("centroid_id", "centroid_vec")
    val got = Dedup.semanticDedup(embs, "vec_id", "embedding", cents, tau = 0.9)
      .select("id", "dup_of").as[(Long, Long)].collect().toMap
    assert(got(2L) == 1L, s"id 2 should ledger dup_of=1 (cos≈1) not 0: $got")
  }

  test("semanticDedup: maxCanonicals bounds a planted mega-cluster without " +
    "over-dropping — in-cap results exact, out-of-cap only escapes conservatively") {
    // one centroid, a planted mega-cluster of 40 near-identical vectors
    // (ids 0..39, all ≥τ of each other) plus one distinct member (99)
    val embs = ((0L until 40L).map(i => (i, Seq(1.0f, (i * 1e-4).toFloat))) :+
        (99L, Seq(0.5f, 0.87f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0f, 0.0f))).toDF("centroid_id", "centroid_vec")
    val capped = Dedup.semanticDedup(embs, "vec_id", "embedding", cents,
        tau = 0.999, maxCanonicals = 5)
      .select("id", "dup_of").as[(Long, Long)].collect().toMap
    // every near-dup of the mega-cluster is still dropped (the global
    // min id 0 is inside the cap and is ≥τ of all of them)...
    assert(capped.keySet == (1L until 40L).toSet,
      s"cap must not change WHICH rows drop when the min id covers them: ${capped.keySet}")
    // ...and every ledgered canonical comes from the capped candidate
    // set (the 5 lowest ids), which bounds the pair join at |cluster|·5
    assert(capped.values.forall(_ < 5L),
      s"dup_of must come from the ${5} lowest-id candidates: $capped")
    // clusters within the cap are bit-identical to the uncapped run
    val uncapped = Dedup.semanticDedup(embs, "vec_id", "embedding", cents, tau = 0.999)
      .select("id", "dup_of").as[(Long, Long)].collect().toMap
    val small = Dedup.semanticDedup(embs, "vec_id", "embedding", cents,
        tau = 0.999, maxCanonicals = 40)
      .select("id", "dup_of").as[(Long, Long)].collect().toMap
    assert(small == uncapped, "cap ≥ cluster size must be a no-op")
  }

  test("containmentPairs: planted sub-document has containment 1 in its superset, not vice versa") {
    val sub = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, sub),
      (2L, sub + " zeta eta theta iota kappa lambda"),
      (3L, "completely different words entirely here now")).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", maxDf = 10, minContainment = 0.9)
      .select("id_a", "id_b", "cont_a", "cont_b")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"only the planted pair: $pairs")
    val (_, _, ca, cb) = pairs.head
    assert(ca == 1.0, s"all of doc 1's shingles are in doc 2: $ca")
    assert(cb < 1.0, s"doc 2 has shingles outside doc 1: $cb")
  }

  test("shingleCosinePairs: identical docs cosine 1; df cutoff removes corpus-wide shingles") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zz yy xx ww vv")).toDF("doc_id", "text")
    val pairs = TfIdf.shingleCosinePairs(docs, "doc_id", "text", maxDf = 10, minCosine = 0.1)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    // sqrt(n)*sqrt(n) is one ulp off n in IEEE — cosine of identical
    // vectors lands within 1e-12 of 1, identically on both engines
    assert(pairs.keySet == Set((1L, 2L)) && math.abs(pairs((1L, 2L)) - 1.0) < 1e-12,
      s"only the identical pair, at cosine ~1: $pairs")
    // with maxDf = 1 every shared shingle (df=2) is pruned -> no pairs
    val pruned = TfIdf.shingleCosinePairs(docs, "doc_id", "text", maxDf = 1, minCosine = 0.0)
    assert(pruned.isEmpty, "df cutoff must remove all candidate keys")
  }

  test("paragraphDedup: shared para cut once, CRLF ≡ LF, whitespace pseudo-para dropped") {
    val df = Seq(
      (1L, "HEADER\n\nbody one\n\nFOOTER"),
      (2L, "HEADER\r\n\r\nbody two"),          // CRLF must normalize → same HEADER hash
      (3L, "intro\n\n \t \n\nFOOTER"),          // whitespace-only para must vanish
      (4L, "  HEADER  \n\nbody four"))          // trim → same HEADER hash
      .toDF("doc_id", "text")
    val r = graft.operators.Dedup.paragraphDedup(df, "doc_id", "text")
      .orderBy("doc_id", "para_idx")
      .as[(Long, Long, String, Long, Boolean)].collect()
    val byDoc = r.groupBy(_._1)
    // doc 3: exactly 2 paragraphs survive (intro, FOOTER) — no empty third
    assert(byDoc(3L).length === 2)
    val headerRows = r.filter(_._3 == r.find(x => x._1 == 1L && x._2 == 1L).get._3)
    assert(headerRows.map(_._1).toSet === Set(1L, 2L, 4L), "CRLF + trimmed share the hash")
    assert(headerRows.count(_._5) === 1, "exactly one HEADER occurrence keeps")
    assert(headerRows.find(_._5).get._1 === 1L, "the globally first one")
    assert(headerRows.forall(_._4 === 3L), "n_copies = 3")
    val footerRows = r.filter(x => (x._1 == 1L && x._2 == 3L) || (x._1 == 3L && x._2 == 2L))
    assert(footerRows.map(_._3).distinct.length === 1)
    assert(footerRows.count(_._5) === 1 && footerRows.find(_._5).get._1 === 1L)
    // every non-duplicated paragraph keeps
    assert(r.filter(_._4 == 1L).forall(_._5))
  }
}
