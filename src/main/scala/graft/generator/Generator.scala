package graft.generator

import java.security.MessageDigest
import java.time.Instant
import scala.util.Random

/** Deterministic event/CDC generator (reference src/generator/m1):
  * same seed+config ⇒ byte-identical output. Driver-free plain Scala —
  * fixtures are generated locally then parallelized/written by the
  * caller; at scale the same pure functions run inside mapPartitions
  * keyed by (runId, partition) since every draw is purpose-scoped.
  */
object Generator {

  // ---- G1: purpose-scoped RNG ---------------------------------------------

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** seed' = int(sha256(f"{seed}|{purpose}")[:15], 16) — this engine's
    * deterministic purpose-scoping (same SHAPE as the reference's [:16]
    * contract, deterministic.py:11-17, but 15 hex chars so the value
    * stays in the positive signed-long range; the exact constant is
    * pinned by GeneratorSpec/GoldenE2ESpec goldens and must not change). */
  def purposeRng(seed: Long, purpose: String): Random =
    new Random(java.lang.Long.parseUnsignedLong(sha256Hex(s"$seed|$purpose").take(15), 16))

  // ---- G2: deterministic ids ----------------------------------------------

  def videoId(runId: String, seq: Int): String = "vid_" + sha256Hex(s"$runId|video|$seq").take(16)
  def userId(runId: String, seq: Int): String = "usr_" + sha256Hex(s"$runId|user|$seq").take(16)
  def eventId(runId: String, seq: Int): String = "evt_" + sha256Hex(s"$runId|event|$seq").take(20)

  // ---- G3: largest-remainder apportionment --------------------------------

  /** Exact integer counts from mix fractions: floor allocation, then +1
    * to the largest remainders (stable tiebreak by index). */
  def apportion(total: Int, weights: Seq[Double]): Seq[Int] = {
    val raw = weights.map(_ * total)
    val base = raw.map(_.toInt)
    var left = total - base.sum
    val order = raw.zipWithIndex
      .map { case (r, i) => (r - r.toInt, i) }
      .sortBy { case (frac, i) => (-frac, i) }
      .map(_._2)
    val out = base.toArray
    for (i <- order if left > 0) { out(i) += 1; left -= 1 }
    out.toSeq
  }

  // ---- G4: deterministic shuffle + weighted choice ------------------------

  def deterministicShuffle[T](xs: Seq[T], rng: Random): Seq[T] = rng.shuffle(xs)

  def weightedChoice[T](items: Seq[(T, Double)], rng: Random): T = {
    val total = items.map(_._2).sum
    val x = rng.nextDouble() * total
    var acc = 0.0
    for ((t, w) <- items) { acc += w; if (x < acc) return t }
    items.last._1
  }

  // ---- G5: scenario templates ---------------------------------------------

  /** Event-type weight vectors + expected action per scenario (reference
    * scenario.py:30-92, constants.py:3-37). */
  final case class Scenario(name: String, mix: Double, expectedAction: String,
                            eventWeights: Seq[(String, Double)], category: String)

  val Scenarios: Seq[Scenario] = Seq(
    Scenario("normal", 0.55, "NO_ACTION",
      Seq("view" -> 0.5, "click" -> 0.25, "purchase" -> 0.1, "signup" -> 0.1, "error" -> 0.05), "comedy"),
    Scenario("viral_high", 0.20, "BOOST",
      Seq("view" -> 0.3, "click" -> 0.3, "purchase" -> 0.3, "signup" -> 0.05, "error" -> 0.05), "gaming"),
    Scenario("viral_low", 0.10, "REVIEW",
      // high engagement velocity (clicks ≫ views) but poor completion →
      // candidate that fails the quality gate → REVIEW
      Seq("view" -> 0.2, "click" -> 0.5, "purchase" -> 0.05, "signup" -> 0.05, "error" -> 0.2), "sports"),
    Scenario("cold_start", 0.10, "RESCUE",
      Seq("view" -> 0.1, "click" -> 0.4, "purchase" -> 0.3, "signup" -> 0.1, "error" -> 0.1), "education"),
    Scenario("invalid_burst", 0.05, "QUARANTINE",
      Seq("view" -> 1.0), "comedy"))

  // ---- config + outputs ----------------------------------------------------

  final case class RunConfig(runId: String, seed: Long, totalEvents: Int,
                             startAt: Instant, eventsPerSecond: Int = 120,
                             lateEventRatio: Double = 0.02, nUsers: Int = 25)

  final case class GenEvent(eventId: String, eventTimestamp: Instant, videoId: String,
                            userId: String, eventType: String, scenario: String,
                            late: Boolean, valid: Boolean) {
    /** Kafka-value JSON (FIXTURES.md §1); invalid_burst rows are the
      * malformed variant (bad timestamp, broken payload, missing type). */
    def json: String =
      if (valid)
        s"""{"event_id":"$eventId","event_timestamp":"$eventTimestamp","video_id":"$videoId","user_id":"$userId","event_type":"$eventType","schema_version":"m1_v1","payload_json":"{\\"watch_time_ms\\":100,\\"scenario_id\\":\\"$scenario\\"}"}"""
      else
        s"""{"event_id":"$eventId","event_timestamp":"bad-timestamp","video_id":"$videoId","user_id":"$userId","schema_version":"m1_v1","payload_json":"{not-valid-json"}"""
  }

  final case class RegistryRow(videoId: String, scenario: String, category: String,
                               uploadAgeMinutes: Int, expectedAction: String)

  final case class RunOutput(events: Seq[GenEvent], registry: Seq[RegistryRow],
                             realizedMix: Map[String, Double])

  // ---- G6-G8: the run ------------------------------------------------------

  def run(cfg: RunConfig): RunOutput = {
    val counts = apportion(cfg.totalEvents, Scenarios.map(_.mix))

    // G8: registry — one video per scenario; upload age cold_start 1-60,
    // others 61-1440 min (purpose-scoped draw per scenario)
    val registry = Scenarios.zipWithIndex.map { case (sc, i) =>
      val ageRng = purposeRng(cfg.seed, s"upload_age|${sc.name}")
      val age = if (sc.name == "cold_start") 1 + ageRng.nextInt(60) else 61 + ageRng.nextInt(1380)
      RegistryRow(videoId(cfg.runId, i), sc.name, sc.category, age, sc.expectedAction)
    }

    // scenario sequence: counts expanded then deterministically shuffled
    val seq0 = Scenarios.zip(counts).flatMap { case (sc, n) => Seq.fill(n)(sc) }
    val sequence = deterministicShuffle(seq0, purposeRng(cfg.seed, "scenario_sequence"))

    // G6: late-event index sample
    val nLate = math.round(cfg.lateEventRatio * cfg.totalEvents).toInt
    val lateRng = purposeRng(cfg.seed, "late_events")
    val lateIdx = lateRng.shuffle((0 until cfg.totalEvents).toList).take(nLate).toSet
    val offsetRng = purposeRng(cfg.seed, "late_offsets")

    val typeRng = purposeRng(cfg.seed, "event_types")
    val userRng = purposeRng(cfg.seed, "users")
    val vidByScenario = registry.map(r => r.scenario -> r.videoId).toMap

    val events = sequence.zipWithIndex.map { case (sc, i) =>
      val slot = i / cfg.eventsPerSecond // 1-second slots (G9 simulated clock)
      val baseTs = cfg.startAt.plusSeconds(slot)
      val late = lateIdx.contains(i)
      // G6: 80% → [121,150] s, 20% → [151,210] s, subtracted
      val ts = if (!late) baseTs else {
        val off = if (offsetRng.nextDouble() < 0.8) 121 + offsetRng.nextInt(30)
                  else 151 + offsetRng.nextInt(60)
        baseTs.minusSeconds(off.toLong)
      }
      GenEvent(
        eventId = eventId(cfg.runId, i),
        eventTimestamp = ts,
        videoId = vidByScenario(sc.name),
        userId = userId(cfg.runId, userRng.nextInt(cfg.nUsers)),
        eventType = weightedChoice(sc.eventWeights, typeRng),
        scenario = sc.name,
        late = late,
        valid = sc.name != "invalid_burst")
    }

    val realized = events.groupBy(_.scenario).view.mapValues(_.size.toDouble / cfg.totalEvents).toMap
    RunOutput(events, registry, realized)
  }

  // ---- G7: CDC bootstrap/update -------------------------------------------

  def cdcMessages(cfg: RunConfig, registry: Seq[RegistryRow]): Seq[String] = {
    val t0 = cfg.startAt.toEpochMilli
    val creates = registry.map { r =>
      s"""{"op":"c","ts_ms":$t0,"schema_version":"m1_v1","after":{"video_id":"${r.videoId}","category":"${r.category}","region":"US","upload_time":"${cfg.startAt.minusSeconds(r.uploadAgeMinutes * 60L)}","status":"active"}}"""
    }
    val updates = registry.map { r =>
      s"""{"op":"u","ts_ms":${t0 + 60000},"schema_version":"m1_v1","after":{"video_id":"${r.videoId}","category":"${r.category}_u","region":"US","upload_time":"${cfg.startAt.minusSeconds(r.uploadAgeMinutes * 60L)}","status":"active"}}"""
    }
    creates ++ updates
  }

  // ---- G10: acceptance self-check -----------------------------------------

  /** Realized-mix abs error ≤ tol per scenario (reference runner.py:321-357). */
  def mixWithinTolerance(out: RunOutput, tol: Double = 0.02): Boolean =
    Scenarios.forall(sc => math.abs(out.realizedMix.getOrElse(sc.name, 0.0) - sc.mix) <= tol)

  // ---- language-marked document fixture -----------------------------------

  /** Per-language vocabularies for the language-ID fixture: real
    * function words (the profile signal TextAnalysis.langGuess keys on)
    * mixed with language-specific nouns; zh is CJK text. Kept disjoint
    * across languages at the profile-word level so fixture accuracy
    * measures the classifier, not vocabulary luck. */
  private val LangVocab: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "auch",
      "daten", "tabelle", "zeile", "spalte", "abfrage"),
    "en" -> Seq("the", "and", "was", "that", "with", "have", "this", "from", "they", "which",
      "data", "table", "row", "column", "query"),
    "es" -> Seq("el", "que", "los", "las", "una", "por", "con", "para", "como", "pero",
      "datos", "tabla", "fila", "columna", "consulta"),
    "fr" -> Seq("le", "les", "des", "une", "dans", "est", "pour", "qui", "pas", "vous",
      "ligne", "colonne", "cette", "nous", "sont"),
    "zh" -> Seq("数据", "查询", "分析", "处理", "表格", "实时", "批量", "流式", "聚合", "索引"))

  /** Cross-language technical filler: ~30% of every document, so the
    * classifier has to beat genuine shared-token noise. */
  private val SharedFiller = Seq("spark", "hash", "join", "merge", "window", "vector",
    "index", "cache", "parquet", "shuffle")

  /** Deterministic language-marked corpus: (doc_id, lang, text). Same
    * runId+seed ⇒ byte-identical, per-doc purpose-scoped draws (runs
    * inside mapPartitions unchanged at scale). */
  def languageCorpus(runId: String, docsPerLang: Int = 50, wordsPerDoc: Int = 40,
                     seed: Long = 42L): Seq[(Long, String, String)] = {
    val langs = LangVocab.keys.toSeq.sorted
    langs.zipWithIndex.flatMap { case (lang, li) =>
      val vocab = LangVocab(lang)
      (0 until docsPerLang).map { d =>
        val rng = purposeRng(seed, s"$runId|langdoc|$lang|$d")
        val words = Seq.fill(wordsPerDoc) {
          if (rng.nextDouble() < 0.3) SharedFiller(rng.nextInt(SharedFiller.length))
          else vocab(rng.nextInt(vocab.length))
        }
        val sep = if (lang == "zh") "" else " "
        ((li.toLong * docsPerLang + d, lang, words.mkString(sep)))
      }
    }
  }
}
