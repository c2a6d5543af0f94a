package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe in-place rewrite of a directory dataset, shared by every
  * compaction path (enrichment store, IVF index). The invariant: at any
  * instant the data exists under AT LEAST one of `path`,
  * `path_precompact` (the original, mid-swap) or `path_compacting` (the
  * finished replacement, mid-swap) — and a rerun first completes or
  * rolls back an interrupted swap before deleting anything.
  *
  * Swap discipline: two renames, never delete-then-rename, with every
  * rename's boolean result CHECKED (Hadoop FileSystems report most
  * failures by returning false, not throwing); a failed promotion
  * restores the original before aborting.
  *
  * Concurrency contract: rewrite is a single-writer maintenance
  * operation — callers must not append to `path` while it runs (a
  * filesystem layout has no lock to offer; writes landing between the
  * snapshot read and the swap would be lost with the superseded copy).
  */
object AtomicSwap {

  /** Recover an interrupted swap at `path`, if any: restore the original
    * if it was moved aside (preferred — it is always complete), else
    * promote the finished replacement. MUST be called by READERS of a
    * swap-managed path before their first read — the recovery logic
    * living only inside [[rewrite]] would be unreachable exactly when
    * it is needed (every entry point reads the path before it ever
    * rewrites it, so a mid-swap crash would wedge the dataset until the
    * next rewrite that never comes). No-op when the path is live. */
  def recover(fs: FileSystem, path: String): Unit = {
    val live = new Path(path)
    val tmp = new Path(path + "_compacting")
    val old = new Path(path + "_precompact")
    if (!fs.exists(live)) {
      if (fs.exists(old))
        require(fs.rename(old, live), s"swap recovery: cannot restore $old")
      else if (fs.exists(tmp))
        require(fs.rename(tmp, live), s"swap recovery: cannot promote $tmp")
      else throw new java.io.FileNotFoundException(path)
    }
  }

  /** Rewrite `path` by having `write` produce the replacement at the tmp
    * location, then swap it live. `write` reads the live path freely —
    * nothing moves until it returns. */
  def rewrite(fs: FileSystem, path: String)(write: String => Unit): Unit = {
    val live = new Path(path)
    val tmp = new Path(path + "_compacting")
    val old = new Path(path + "_precompact")
    recover(fs, path)
    fs.delete(tmp, true); fs.delete(old, true)
    write(tmp.toString)
    require(fs.rename(live, old), s"swap: cannot move $path aside")
    if (!fs.rename(tmp, live)) {
      // promotion failed (dest recreated, object-store quirk, ...):
      // put the original back so the live path never stays empty
      require(fs.rename(old, live), s"swap: promotion AND restore failed " +
        s"for $path — data is at $old")
      throw new java.io.IOException(
        s"swap: cannot promote $tmp over $path; original restored")
    }
    fs.delete(old, true)
    ()
  }
}
