package graft

import java.io.IOException
import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Fault-injecting local filesystem for crash-replay specs: a
  * `faultfs:///` scheme delegating to the local FS, whose `rename`
  * throws once when armed and the rename DESTINATION carries a chosen
  * name. Arming with the MERGE target's directory name fails exactly
  * the second rename of [[graft.core.AtomicSwap.swap]] (`tmp → dest`)
  * AFTER the first (`dest → old`) succeeded — the worst crash point:
  * the table directory is missing and the snapshot is parked. The
  * throw happens inside the real `foreachBatch` merge on the real FS
  * call path, so the streaming query dies exactly as a process kill
  * at that instant would leave the disk.
  *
  * Register per-test:
  * `hadoopConf.set("fs.faultfs.impl", classOf[FaultFs].getName)` and
  * address the table as `faultfs:///abs/path` (checkpoints stay on
  * `file://`, so only the table swap is in the blast radius).
  */
class FaultFs extends RawLocalFileSystem {
  override def getScheme: String = "faultfs"
  override def getUri: URI = URI.create("faultfs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (FaultFs.armed && dst.getName == FaultFs.failOnDstName) {
      FaultFs.armed = false // one-shot: the restart must run clean
      throw new IOException(s"FaultFs: injected crash renaming $src -> $dst")
    }
    super.rename(src, dst)
  }
}

object FaultFs {
  @volatile var armed: Boolean = false
  @volatile var failOnDstName: String = ""

  def arm(dstName: String): Unit = { failOnDstName = dstName; armed = true }
  def disarm(): Unit = { armed = false; failOnDstName = "" }
}
