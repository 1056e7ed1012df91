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
  * Hadoop output-committer move): readers either see the old
  * generation or the new one, never a half-written mix. At 100 TB the
  * same three-step lifecycle is fronted by a table format's atomic
  * snapshot commit (Delta/Iceberg) instead of a rename — the monoid
  * merge, which is the part this module owns, is unchanged. The
  * standing table is |groups|-sized (dimension-sized), so the
  * single-directory swap is never the bottleneck the fact table's
  * layout is.
  */
object StandingTable {

  /** Atomically replace `dir` with `df` (written to a staging sibling
    * first). The moved-aside old generation is deleted last — a crash
    * mid-swap leaves either generation intact on disk. */
  def swapInto(df: DataFrame, dir: String): Unit = {
    val path = java.nio.file.Paths.get(dir)
    val staging = path.resolveSibling(path.getFileName.toString + ".staging")
    val old = path.resolveSibling(path.getFileName.toString + ".old")
    rmTree(staging); rmTree(old)
    df.write.mode("overwrite").parquet(staging.toString)
    if (java.nio.file.Files.exists(path))
      java.nio.file.Files.move(path, old)
    java.nio.file.Files.move(staging, path)
    rmTree(old)
  }

  def readOrEmpty(spark: SparkSession, dir: String, like: DataFrame): DataFrame =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
      spark.read.parquet(dir)
    else like.limit(0)

  private def rmTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = java.nio.file.Files.list(p)
      try s.forEach(rmTree(_)) finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  /** Fold a new batch of events into the standing [[IncrementalAgg]]
    * partial at `dir`. */
  def updateAggPartial(dir: String, delta: DataFrame): Unit = {
    val d = IncrementalAgg.partial(delta)
    val standing = readOrEmpty(delta.sparkSession, dir, d)
    swapInto(IncrementalAgg.merge(Seq(standing, d)).localCheckpoint(true), dir)
  }

  /** Fold a new batch's HLL registers into the standing register
    * table at `dir` (element-wise max). */
  def updateHllRegisters(dir: String, delta: DataFrame, groupCol: String, keyCol: String): Unit = {
    import org.apache.spark.sql.functions._
    val d = HllSketch.registers(delta, groupCol, keyCol)
    val standing = readOrEmpty(delta.sparkSession, dir, d)
    val merged = standing.unionByName(d)
      .groupBy(groupCol, "bucket").agg(max("reg").as("reg"))
    swapInto(merged.localCheckpoint(true), dir)
  }

  /** Fold a new batch's histogram into the standing bin-count table
    * at `dir` (vector add; every generation must share [lo, hi]). */
  def updateHistogram(dir: String, delta: DataFrame, groupCol: String,
      lo: Long, hi: Long): Unit = {
    val d = HistogramSketch.partial(delta, groupCol, lo, hi)
    val standing = readOrEmpty(delta.sparkSession, dir, d)
    swapInto(HistogramSketch.merge(groupCol, Seq(standing, d)).localCheckpoint(true), dir)
  }
}
