package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned fact layout + STATIC partition pruning — the scan
  * lever that makes "one day out of years" queries read one directory
  * instead of 100 TB.
  *
  * Complements the shop's other persisted layouts: [[BucketedTables]]
  * co-locates JOINS, the IVF index's `partitionBy(cell)` gets DYNAMIC
  * pruning from a join-derived predicate (PipelineSpec pins it); this
  * is the third and most common form — a LITERAL predicate on the
  * partition column resolved at PLANNING time, before a single task
  * launches (PlanSpec pins `PartitionFilters` + files actually read).
  *
  * Build (cached per (session, sf dir), like every ingest-time
  * artifact): events written `partitionBy(event_date)`, with a
  * `repartition(d)` FIRST — without it every write task emits a file
  * into every day's directory (tasks × days small files, the classic
  * lake pathology); with it each day directory holds one file. At
  * 100 TB the same write shape holds with more tasks per day
  * (repartition on (d, salt)).
  *
  * Serve: [[dayRollup]] — per-type rollup of day `min+3`, the day
  * chosen by a 1-row min aggregate (bounded driver read) so the query
  * stays data-driven and the oracle can model it in SQL.
  */
object PartitionedTables {

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** BUILD: events as a date-partitioned parquet layout; returns its
    * path. Integer cents carried so serve aggregates are exact. */
  def eventsByDay(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate((spark, sfDir), {
      val root = java.nio.file.Files.createTempDirectory("graft_events_byday_")
      val dir = root.resolve("events").toString
      val ev = graft.Tables.events(spark, sfDir)
      ev.select(col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          to_date(graft.Tables.eventTime(ev)).as("d"))
        .repartition(col("d"))
        .write.partitionBy("d").parquet(dir)
      dir
    })

  /** SERVE: one-day per-type rollup whose day predicate is pruned at
    * planning time — the scan lists only that day's directory. */
  def dayRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val path = eventsByDay(spark, sfDir)
    val t = spark.read.parquet(path)
    val day = t.agg(date_add(min("d"), 3)).head().getDate(0) // 1-row agg — bounded
    t.filter(col("d") === lit(day))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      .orderBy("event_type")
  }
}
