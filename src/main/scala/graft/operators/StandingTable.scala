package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persistence half of the maintenance plane: a STANDING partial
  * (IncrementalAgg rollup, HLL register table, histogram) lives as a
  * parquet directory and each arriving delta folds into it by the
  * partial's own monoid — read standing, merge delta's partial,
  * atomically swap the directory. A restarted driver resumes from
  * disk; history is never rescanned.
  *
  * The swap is write-to-staging + directory rename (the classic
  * Hadoop output-committer move). A crash can land in any window, so
  * every entry point first runs [[recover]], which makes the protocol
  * total: if the live directory is MISSING, a complete `.staging`
  * generation is promoted (the crash happened mid-swap, after the old
  * generation moved aside — staging is complete by construction,
  * because the staging write finishes before any move starts), else
  * the moved-aside `.old` generation is restored (rollback). Either
  * way a reader or the next fold sees exactly one intact generation —
  * never emptiness, never a mix (spec-pinned with planted mid-swap
  * states). At 100 TB the same three-step lifecycle is fronted by a
  * table format's atomic snapshot commit (Delta/Iceberg) instead of a
  * rename — the monoid merge, which is the part this module owns, is
  * unchanged. The standing table is |groups|-sized (dimension-sized),
  * so the single-directory swap is never the bottleneck the fact
  * table's layout is.
  *
  * SINGLE-WRITER CONTRACT: one fold at a time per standing dir. The
  * rename protocol tolerates any CRASH but not a CONCURRENT writer —
  * two interleaved swaps could each move the other's generation aside
  * and lose one. [[swapInto]] enforces it with an exclusive lockfile
  * (`<dir>.lock`): a second simultaneous writer fails loudly instead
  * of corrupting. stream_ivm's foreachBatch ingest loop is sequential
  * by construction; at 100 TB the table format's optimistic-commit
  * protocol plays this role.
  */
object StandingTable {

  private def p(dir: String) = java.nio.file.Paths.get(dir)
  private def staging(dir: String) = p(dir).resolveSibling(p(dir).getFileName.toString + ".staging")
  private def old(dir: String) = p(dir).resolveSibling(p(dir).getFileName.toString + ".old")

  /** A staging generation is PROVABLY complete iff its write finished:
    * Spark's committer drops `_SUCCESS` last and `_temporary` exists
    * only mid-write. Needed for the bootstrap window: on the
    * FIRST-ever fold there is no live dir and no `.old`, so a crash
    * mid-staging-write leaves a partial dir that "live missing =>
    * promote staging" would serve as a generation. */
  private def stagingComplete(dir: String): Boolean =
    java.nio.file.Files.exists(staging(dir).resolve("_SUCCESS")) &&
      !java.nio.file.Files.exists(staging(dir).resolve("_temporary"))

  /** Make the on-disk state whole after any crash: promote a COMPLETE
    * staging generation if the live dir vanished mid-swap (an
    * incomplete one is a crashed first write — delete it so the next
    * fold rebuilds from empty), else restore the moved-aside old
    * generation. No-op when the live dir exists — and a deliberate
    * no-op while ANOTHER LIVE WRITER holds the lock: a missing live
    * dir under an active writer is not a crash, it is the middle of
    * that writer's swap, and recovery here would race its renames
    * (crash recovery is for dead writers; the lock tells them apart). */
  def recover(dir: String): Unit = {
    val path = p(dir)
    if (!java.nio.file.Files.exists(path)) {
      val lockPath = p(dir).resolveSibling(p(dir).getFileName.toString + ".lock")
      if (java.nio.file.Files.exists(lockPath)) {
        // CREATE+WRITE, not bare WRITE: the exists() check above can
        // go stale (a sweep or manual cleanup deleting the lock file
        // between the two calls) and bare WRITE would then throw
        // NoSuchFileException out of recover(). Creating an empty lock
        // is harmless — it is exactly what swapInto does.
        val ch = java.nio.channels.FileChannel.open(lockPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val fl =
          try ch.tryLock()
          catch { case _: java.nio.channels.OverlappingFileLockException => null }
        if (fl == null) { ch.close(); return } // live writer mid-swap
        try recoverLocked(dir) finally { fl.release(); ch.close() }
      } else recoverLocked(dir) // never written -> nothing to race
    }
  }

  private def recoverLocked(dir: String): Unit = {
    val path = p(dir)
    if (!java.nio.file.Files.exists(path)) {
      if (java.nio.file.Files.exists(staging(dir))) {
        if (stagingComplete(dir))
          java.nio.file.Files.move(staging(dir), path) // complete the swap
        else
          graft.core.Fs.rmTreeNoFollow(staging(dir)) // crashed bootstrap write
      }
      if (!java.nio.file.Files.exists(path) &&
          java.nio.file.Files.exists(old(dir)))
        java.nio.file.Files.move(old(dir), path) // roll back
    }
  }

  /** Atomically replace `dir` with `df` (written to a staging sibling
    * first; see the object scaladoc for the crash-window analysis and
    * the single-writer contract the lockfile enforces). */
  def swapInto(df: DataFrame, dir: String): Unit = {
    val lockPath = p(dir).resolveSibling(p(dir).getFileName.toString + ".lock")
    if (lockPath.getParent != null) java.nio.file.Files.createDirectories(lockPath.getParent)
    val ch = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    val fl =
      try ch.tryLock()
      catch { case _: java.nio.channels.OverlappingFileLockException => null }
    if (fl == null) {
      ch.close()
      throw new IllegalStateException(
        s"concurrent writer on standing table $dir — the swap protocol is " +
          "one-writer-at-a-time (see StandingTable scaladoc)")
    }
    try {
      recoverLocked(dir) // we ARE the writer — recover under our own lock
      val path = p(dir)
      graft.core.Fs.rmTreeNoFollow(staging(dir))
      graft.core.Fs.rmTreeNoFollow(old(dir))
      df.write.mode("overwrite").parquet(staging(dir).toString)
      if (java.nio.file.Files.exists(path))
        java.nio.file.Files.move(path, old(dir))
      java.nio.file.Files.move(staging(dir), path)
      graft.core.Fs.rmTreeNoFollow(old(dir))
    } finally {
      fl.release(); ch.close()
    }
  }

  /** Read the standing generation, running crash recovery first (a
    * dead writer's remnants are healed; a LIVE writer's in-flight swap
    * is left alone — see [[recover]] — so a reader racing a swap may
    * briefly see empty rather than touch the writer's renames; the
    * sequential ingest loop never interleaves the two). */
  def readOrEmpty(spark: SparkSession, dir: String, like: DataFrame): DataFrame = {
    recover(dir)
    if (java.nio.file.Files.exists(p(dir))) spark.read.parquet(dir)
    else like.limit(0)
  }

  // No localCheckpoint in the folds below: the staging write is the
  // frames' single evaluation (the standing read completes while the
  // live dir still exists, before any move), so caching the merged
  // table would only pin dead blocks across the ingest loop.

  /** Fold a new batch of events into the standing [[IncrementalAgg]]
    * partial at `dir`. */
  def updateAggPartial(dir: String, delta: DataFrame): Unit = {
    val d = IncrementalAgg.partial(delta)
    val standing = readOrEmpty(delta.sparkSession, dir, d)
    swapInto(IncrementalAgg.merge(Seq(standing, d)), dir)
  }

  /** Fold a new batch's HLL registers into the standing register
    * table at `dir` (element-wise max). */
  def updateHllRegisters(dir: String, delta: DataFrame, groupCol: String, keyCol: String): Unit = {
    import org.apache.spark.sql.functions._
    val d = HllSketch.registers(delta, groupCol, keyCol)
    val standing = readOrEmpty(delta.sparkSession, dir, d)
    val merged = standing.unionByName(d)
      .groupBy(groupCol, "bucket").agg(max("reg").as("reg"))
    swapInto(merged, dir)
  }

  /** Fold a new batch's histogram into the standing bin-count table
    * at `dir` (vector add; every generation must share [lo, hi]). */
  def updateHistogram(dir: String, delta: DataFrame, groupCol: String,
      lo: Long, hi: Long): Unit = {
    val d = HistogramSketch.partial(delta, groupCol, lo, hi)
    val standing = readOrEmpty(delta.sparkSession, dir, d)
    swapInto(HistogramSketch.merge(groupCol, Seq(standing, d)), dir)
  }

  /** Fold an LWW change batch (key, seq, value — one row per key,
    * seqs beyond everything already in the history) into the standing
    * SCD2 dimension at `dir` via
    * [[graft.kv.KVEngine.scd2Apply]] — the persisted form of the
    * dimension lifecycle: close the open interval, append the new
    * generation, swap. An empty standing dir bootstraps to the
    * changes themselves as all-open rows (scd2Apply on an empty
    * history is exactly that). */
  def updateScd2(dir: String, changes: DataFrame): Unit = {
    val empty = changes.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("valid_from", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("valid_to", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType))))
    val standing = readOrEmpty(changes.sparkSession, dir, empty)
    swapInto(graft.kv.KVEngine.scd2Apply(standing, changes), dir)
  }
}
