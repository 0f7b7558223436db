package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line. JVM/session warm-up is amortized with one untimed
  * warm-up pass of a small query; AQE is ON (batch work); timezone
  * locked UTC to match verify semantics.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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

    // Min of two timed passes per query: a single sample lets one
    // machine-load spike become the official number (BENCH_r02 recorded
    // q_health_gates at 32.6 s vs a reproducible 2.1 s). The min of two
    // independent passes is what the plan costs; a genuine regression
    // shows up in both.
    val timedPasses = 2
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples = (1 to timedPasses).map { _ =>
        val t0 = System.nanoTime()
        // a failure must be VISIBLE: a swallowed exception would record its
        // short time-to-throw and read as a speedup in the bench total
        val ok = try { run(fn); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // per-query persists must not leak into the next pass's timing
        spark.sharedState.cacheManager.clearCache()
        (dt, ok)
      }
      // min over SUCCESSFUL passes only: a transient failure's short
      // time-to-throw must not displace a valid measurement. If every
      // pass failed, the raw min is recorded (stderr carries the FAILED
      // lines) — same visibility as the single-pass harness had.
      val good = samples.collect { case (dt, true) => dt }
      name -> (if (good.nonEmpty) good.min else samples.map(_._1).min)
    }
    // streaming-throughput micro-bench (reference's only published perf
    // numbers are streaming SLOs — BASELINE.md: 120 ev/s generator,
    // P95 end-to-end < 3 min): the 3-sink fan-out fed by the
    // generator's SLO-shaped stream. Reported as q_stream_fanout
    // seconds + a structured `stream` block; excluded from the oracle
    // set (no DuckDB analog for a streaming engine).
    val streamJson = try {
      val r = graft.streaming.StreamBench.run(spark, totalEvents = 24000, chunks = 8)
      Some((r.elapsedSec,
        s""""stream":{"events":${r.nEvents},"events_per_sec":${r.eventsPerSec.round},""" +
        s""""batches":${r.nBatches},"max_batch_sec":${r.maxBatchSec},""" +
        s""""drop_ratio":${r.dropRatio},"gold_rows":${r.goldRows}}"""))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] stream_fanout FAILED: ${e.getMessage}"); None
    }

    val allResults = results ++ streamJson.map { case (sec, _) => "q_stream_fanout" -> sec }
    val qs = allResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (allResults.nonEmpty) allResults.map(_._2).sum else 0.0
    val streamBlock = streamJson.map { case (_, j) => j + "," }.getOrElse("")
    println(s"""{"metric":"total","value":$total,"unit":"sec",$streamBlock"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
