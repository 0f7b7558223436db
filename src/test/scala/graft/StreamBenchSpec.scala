package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamBench

class StreamBenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fan-out throughput bench: 3 sinks complete, drop ratio bounded by the late ratio") {
    // one file per micro-batch forces watermark advancement between
    // batches — the arrival pattern under which late events can
    // actually be dropped
    val r = StreamBench.run(spark, totalEvents = 6000, chunks = 6)
    assert(r.bronzeRows + r.quarantineRows == r.nEvents,
      s"every event lands in bronze or quarantine: ${r.bronzeRows}+${r.quarantineRows} != ${r.nEvents}")
    assert(r.quarantineRows > 0, "invalid_burst scenario rows must be quarantined")
    assert(r.goldRows > 0, "gold MERGE must produce windowed rows")
    // only generated-late rows can be beyond-watermark: the observed
    // drop ratio can never exceed the configured late ratio
    assert(r.dropRatio <= r.lateRatioConfigured,
      s"drop ratio ${r.dropRatio} exceeds configured late ratio ${r.lateRatioConfigured}")
    // the engine must comfortably beat the reference generator's
    // 120 ev/s SLO rate even in chunked (watermark-advancing) mode
    assert(r.eventsPerSec > 120.0, s"throughput ${r.eventsPerSec} ev/s below the SLO rate")
    assert(r.nBatches >= 6, s"per-chunk processing must yield >= 6 micro-batches, got ${r.nBatches}")
  }
}
