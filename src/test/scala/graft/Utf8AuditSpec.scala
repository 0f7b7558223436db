package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{Utf8Audit, Utf8Expressions}

/** RFC 3629 / Unicode 15 well-formedness audit: known-value battery,
  * the maximal-subpart resynchronization contract (error counts stable
  * under concatenation), agreement with the JDK's own decoder as an
  * independent oracle, and the packed-scan expression plumbing
  * (bit-extraction ≡ the five single-column expressions; codegen CSE
  * collapses the five packed subtrees to ONE audit() call). */
class Utf8AuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def counts(b: Array[Byte]): (Boolean, Int, Int, Int, Int) =
    (Utf8Audit.wellFormed(b), Utf8Audit.invalidCount(b), Utf8Audit.replacementCount(b),
      Utf8Audit.controlCount(b), Utf8Audit.mojibakeCount(b))

  test("known-value battery: clean, replacement, control, mojibake, malformed") {
    // plain ASCII + é + € + emoji: well-formed, zero signals
    assert(counts("ABC".getBytes ++ bytes("C3A9E282ACF09F9880")) === ((true, 0, 0, 0, 0)))
    // decoded U+FFFD twice
    assert(counts(bytes("41EFBFBDEFBFBD")) === ((true, 0, 2, 0, 0)))
    // C0 controls minus tab/LF/CR, plus DEL; tab/LF/CR must NOT count
    assert(counts(bytes("4101021F7F090A0D")) === ((true, 0, 0, 4, 0)))
    // Â (C382) and Ã (C383) decode fine but are the double-encoding tell
    assert(counts(bytes("C382C383C3A9")) === ((true, 0, 0, 0, 2)))
    // stray continuation, illegal leads, truncated 3-byte at EOF
    assert(counts(bytes("80FFC0E0A0")) === ((false, 4, 0, 0, 0)))
    // overlong-lead C0 and out-of-range F5 never start a sequence:
    // each resyncs at the NEXT byte, so the orphaned continuations
    // count as their own events (C0,AF,F5,8F → 4)
    assert(counts(bytes("C0AFF58F")) === ((false, 4, 0, 0, 0)))
    // surrogate range: ED A0 80 (U+D800) must be rejected at byte 2
    assert(Utf8Audit.invalidCount(bytes("EDA080")) >= 1)
    // F0 second-byte narrowing: F0 80 80 80 is overlong → invalid
    assert(!Utf8Audit.wellFormed(bytes("F0808080")))
    // F4 90 exceeds U+10FFFF → invalid
    assert(!Utf8Audit.wellFormed(bytes("F4908080")))
    assert(counts(Array.emptyByteArray) === ((true, 0, 0, 0, 0)))
  }

  test("maximal-subpart resync: error counts are stable under concatenation") {
    // a torn 3-byte sequence at a chunk boundary counts ONCE, and
    // gluing chunks never creates or destroys errors in the clean parts
    val clean = "hello world".getBytes
    val torn = bytes("E282") // € missing its last byte
    val a = Utf8Audit.invalidCount(clean ++ torn)
    val b = Utf8Audit.invalidCount(torn ++ clean)
    assert(a === 1 && b === 1)
    // self-concatenation doubles exactly (no boundary double-count)
    val doubled = Utf8Audit.invalidCount(clean ++ torn ++ clean ++ torn)
    assert(doubled === 2)
  }

  private def fuzzCorpus: List[Array[Byte]] = {
    val g = for {
      n <- Gen.chooseNum(0, 80)
      bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield bs.toArray
    Gen.listOfN(1200, g)(Gen.Parameters.default, Seed(77L)).get
  }

  test("fuzz: never throws; packing invariants; JDK decoder agreement on well-formedness") {
    fuzzCorpus.foreach { b =>
      val p = Utf8Audit.audit(b)
      val (wf, inv, rep, ctl, moj) = counts(b)
      // packed fields match the convenience accessors
      assert(((p >>> 62) == 1L) === wf)
      assert((p & 0xffff).toInt === inv)
      assert(((p >>> 16) & 0xffff).toInt === rep)
      assert(((p >>> 32) & 0xffff).toInt === ctl)
      assert(((p >>> 48) & 0x3fff).toInt === moj)
      assert(wf === (inv == 0))
      // independent oracle: the JDK decoder round-trips exactly iff the
      // bytes are well-formed (String decode substitutes U+FFFD otherwise)
      val roundTrips = java.util.Arrays.equals(
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8), b)
      assert(roundTrips === wf,
        s"JDK decoder disagrees on ${b.map("%02X".format(_)).mkString}")
      // determinism
      assert(Utf8Audit.audit(b) === p)
    }
  }

  test("packed expression ≡ five single-column expressions (engine-level)") {
    import spark.implicits._
    val hexes = Seq("41C3A9", "EFBFBD", "01027F", "C382C383", "80FFC0E0A0", "",
      "F09F9880", "EDA080", "C0AF")
    val df = hexes.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "hex")
      .select(col("id"), unhex(col("hex")).as("b"))
    val packed = Utf8Expressions.utf8AuditPacked(col("b"))
    import Utf8Expressions._
    val both = df.select(
      unpackWellFormed(packed).as("wf2"), utf8WellFormed(col("b")).as("wf1"),
      unpackInvalid(packed).as("i2"), utf8InvalidCount(col("b")).as("i1"),
      unpackReplacement(packed).as("r2"), utf8ReplacementCount(col("b")).as("r1"),
      unpackControl(packed).as("c2"), utf8ControlCount(col("b")).as("c1"),
      unpackMojibake(packed).as("m2"), utf8MojibakeCount(col("b")).as("m1"))
      .collect()
    both.foreach { r =>
      assert(r.getBoolean(0) === r.getBoolean(1))
      assert(r.getInt(2) === r.getInt(3))
      assert(r.getInt(4) === r.getInt(5))
      assert(r.getInt(6) === r.getInt(7))
      assert(r.getInt(8) === r.getInt(9))
    }
  }

  test("codegen CSE: five bit-extractions of one packed column compile to ONE audit() call") {
    // non-foldable input (range → encode), or constant folding would
    // evaluate the audit at optimize time and the probe reads nothing
    val df = spark.range(4)
      .select(encode(concat(lit("a"), col("id").cast("string")), "UTF-8").as("b"))
    val packed = Utf8Expressions.utf8AuditPacked(col("b"))
    import Utf8Expressions._
    val out = df.select(unpackWellFormed(packed), unpackInvalid(packed),
      unpackReplacement(packed), unpackControl(packed), unpackMojibake(packed))
    val gen = org.apache.spark.sql.execution.debug.codegenString(out.queryExecution.executedPlan)
    val calls = "Utf8Audit\\.audit\\(".r.findAllIn(gen).size
    assert(calls === 1, s"expected exactly one audit() call site in codegen, got $calls")
  }
}
