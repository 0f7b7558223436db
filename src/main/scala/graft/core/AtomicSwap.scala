package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Checked two-rename directory swap — the single implementation of the
  * crash-safety invariants shared by ParquetUpsertSink (per-micro-batch
  * MERGE rewrite) and Layout.compact (maintenance rewrite):
  *
  *   write(tmp) → [dest → old] → [tmp → dest] → delete old
  *
  * The swap is NOT atomic (two renames); every rename is checked
  * (HDFS-style filesystems return false instead of throwing), and at
  * every crash point the data survives in at least one of dest/old/tmp:
  * a crash between the renames leaves dest missing with the snapshot
  * parked at `old` — [[recoverParked]] restores it on the next run.
  */
object AtomicSwap {

  /** If `dest` is missing, restore the NEWEST sibling parked snapshot
    * whose name is `dest.getName + oldInfix + ...`. Newest = max
    * modification time (name order would mis-sort unpadded numeric
    * suffixes: `__old_9` > `__old_10` lexicographically, and restoring
    * the older snapshot after a double-crash sequence silently loses
    * the later batch). Equal mtimes are possible too (1-second
    * granularity filesystems, adjacent micro-batches), so the
    * tie-break is the NUMERIC value of the suffix when both parse
    * (batch ids), with raw name order as the final resort. No-op when
    * dest exists or nothing is parked. */
  def recoverParked(fs: FileSystem, dest: Path, oldInfix: String): Unit =
    if (!fs.exists(dest)) {
      val parent = dest.getParent
      if (parent != null && fs.exists(parent)) {
        val prefix = dest.getName + oldInfix
        fs.listStatus(parent)
          .filter(_.getPath.getName.startsWith(prefix))
          .sortBy { st =>
            val suffix = st.getPath.getName.drop(prefix.length)
            val numeric = suffix.toLongOption.getOrElse(-1L)
            (st.getModificationTime, numeric, st.getPath.getName)
          }.lastOption
          .map(_.getPath)
          .foreach(o => require(fs.rename(o, dest), s"crash recovery: restoring $o to $dest failed"))
      }
    }

  /** Replace `dest` with the directory `write` produces at `tmp`,
    * parking the previous snapshot at `old` during the switch. A stale
    * `old` (crash after install, before cleanup) is deleted first so
    * step 1's rename cannot collide with it. */
  def swap(fs: FileSystem, dest: Path, tmp: Path, old: Path)(write: Path => Unit): Unit = {
    write(tmp)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(dest))
      require(fs.rename(dest, old), s"swap step 1: rename $dest -> $old failed")
    require(fs.rename(tmp, dest), s"swap step 2: rename $tmp -> $dest failed (snapshot parked at $old)")
    if (fs.exists(old)) fs.delete(old, true)
  }
}
