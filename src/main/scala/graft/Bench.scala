package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line. JVM/session warm-up is amortized with one untimed
  * warm-up pass of a small query; AQE is ON (batch work); timezone
  * locked UTC to match verify semantics.
  *
  * Spike-proofing: earlier rounds timed each query's samples
  * back-to-back, so one sustained machine-load spike owned BOTH
  * samples of the same query (BENCH_r02: q_health_gates 32.6 s vs a
  * reproducible 2.1 s; BENCH_r03: q_revenue_by_nation 7.06 s vs
  * 1.05 s). The sweep now runs end-to-end TWICE — pass 1 of all
  * queries, then pass 2 of all queries — and records the per-query
  * min across sweeps. The two samples of any query are now separated
  * by a full sweep (~tens of seconds), so a transient spike can poison
  * at most one of them; a genuine plan regression still shows in both.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.ScaleDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Full-result action: a noop write computes every projected column
    // (count() would let Catalyst prune the final projections — e.g.
    // rounded cosine columns — out of the measured plan).
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // untimed warm-up: session/codegen/filesystem init out of the numbers
    try run(SparkEntry.queries("q_topk"))
    catch { case _: Throwable => () }

    // dev-loop subset mode: `runMain graft.Bench q_a q_b` times only the
    // named queries and SKIPS the record files (bench_out.json and the
    // history are reserved for full-sweep records)
    val subset = args.toSeq
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      if (subset.isEmpty) all else all.filter(subset.contains)
    }

    // One timed sample of each query; failures must be VISIBLE (a
    // swallowed exception would record its short time-to-throw and read
    // as a speedup), and per-query persists must not leak into the next
    // query's timing.
    def sweep(): Map[String, (Double, Boolean)] =
      names.map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val ok = try { run(fn); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        name -> (dt, ok)
      }.toMap

    val sweeps = Seq(sweep(), sweep())
    val results = names.map { name =>
      val samples = sweeps.map(_(name))
      // min over SUCCESSFUL samples only: a transient failure's short
      // time-to-throw must not displace a valid measurement. If every
      // sample failed, the raw min is recorded (stderr carries the
      // FAILED lines) — same visibility as the single-pass harness had.
      val good = samples.collect { case (dt, true) => dt }
      name -> (if (good.nonEmpty) good.min else samples.map(_._1).min)
    }

    if (subset.nonEmpty) {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      println(s"""{"metric":"subset","value":${results.map(_._2).sum},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
      spark.stop()
      return
    }

    // streaming-throughput micro-bench (reference's only published perf
    // numbers are streaming SLOs — BASELINE.md: 120 ev/s generator,
    // P95 end-to-end < 3 min): the 3-sink fan-out fed by the
    // generator's SLO-shaped stream. Its elapsed seconds are micro-batch
    // orchestration wall-clock (24 batches x 3 sinks), not plan cost, so
    // it is reported ONLY inside the `stream` block — summing it into
    // the batch total would distort any cross-round total comparison.
    val streamJson = try {
      val r = graft.streaming.StreamBench.run(spark, totalEvents = 24000, chunks = 8)
      Some(s""""stream":{"elapsed_sec":${r.elapsedSec},"events":${r.nEvents},""" +
        s""""events_per_sec":${r.eventsPerSec.round},""" +
        s""""batches":${r.nBatches},"max_batch_sec":${r.maxBatchSec},""" +
        s""""drop_ratio":${r.dropRatio},"gold_rows":${r.goldRows}}""")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] stream_fanout FAILED: ${e.getMessage}"); None
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val streamBlock = streamJson.map(_ + ",").getOrElse("")
    val line = s"""{"metric":"total","value":$total,"unit":"sec",$streamBlock"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // also persist to a file: the driver log truncates (BENCH_r04 lost
    // 59/130 per-query numbers to the tail cut), a committed file keeps
    // every round's record complete and diffable
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line + "\n")
    // and APPEND to a durable history: bench_out.json is clobbered by
    // every run (incl. dev-loop sf0.01 runs), which left rounds 1-7
    // with no per-query record at all once the driver's tail cut ate
    // the log line. One stamped JSONL row per run can't be clobbered.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_history.jsonl"),
      s"""{"at":"${java.time.Instant.now()}","line":$line}""" + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
