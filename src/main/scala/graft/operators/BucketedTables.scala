package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the persisted-layout scale lever.
  *
  * A 100 TB fact-to-fact join (lineitem ⋈ orders on orderkey) is
  * dominated by the two full-table shuffles that hash-partition the
  * sides onto the join key. Bucketing pays that shuffle ONCE at write
  * time: both tables are stored `bucketBy(n, key)` (+ `sortBy` so the
  * merge needs no sort either), and every later join on the key reads
  * both sides already co-partitioned — the planner drops BOTH
  * exchanges and merge-joins bucket i against bucket i, a per-bucket
  * streaming merge with no wide stage at all. At 1000 executors the
  * layout also fixes the join's parallelism to the bucket count, so
  * `n` is sized to the target cluster (here 8 for local[32] testdata;
  * production uses thousands).
  *
  * Build-serve split, like every expensive artifact in the shop: the
  * bucketed write is the BUILD (cached per (session, sf dir) — a real
  * lake writes fact tables bucketed at ingest, so the serve path never
  * pays it), [[colocatedJoin]] is the SERVE. BucketingSpec holds the
  * zero-join-side-shuffle plan pin; the driver's hash gate holds the
  * result (rel_bucket_join, oracle = the plain parquet join).
  */
object BucketedTables {

  private val tableCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** (session, sfDir) -> (lineitem table name, orders table name).
    * Session-scoped: catalog tables and their temp warehouse dirs live
    * for the driver's lifetime, serving every later join at read cost
    * (the build-once convention of Dedup.nearDupIndexCached). */
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, String)]

  /** Bucket count: sized to the join's target parallelism. The gate
    * data fits 8 buckets comfortably; at 100 TB this is thousands and
    * is chosen ONCE at ingest for the whole table lifetime. */
  val NumBuckets = 8

  /** BUILD: write lineitem and orders bucketed+sorted by orderkey into
    * a temp-dir warehouse and register them in the session catalog.
    * Returns the two table names. Idempotent per (session, sfDir). */
  def orderkeyBucketed(spark: SparkSession, sfDir: String): (String, String) =
    cache.getOrElseUpdate((spark, sfDir), {
      val id = tableCounter.incrementAndGet()
      val wh = java.nio.file.Files.createTempDirectory("graft_bucketed_wh_")
      val li = s"graft_li_bucketed_$id"
      val ord = s"graft_ord_bucketed_$id"
      graft.Tables.lineitem(spark, sfDir)
        .write.bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", wh.resolve(li).toString).saveAsTable(li)
      graft.Tables.orders(spark, sfDir)
        .write.bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", wh.resolve(ord).toString).saveAsTable(ord)
      (li, ord)
    })

  /** SERVE: priority × status line rollup over the co-located join.
    * `hint("merge")` keeps the strategy a sort-merge join at ANY sf —
    * at gate scale orders would broadcast under the default threshold,
    * which is exactly the strategy that stops being available at
    * 100 TB; the hint makes the gated plan the production plan
    * (bucketed SMJ: no exchange, no sort, on either side). All
    * aggregates are exact integers (l_quantity is integral by schema
    * contract; the cast is checked by BucketingSpec). */
  def colocatedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (li, ord) = orderkeyBucketed(spark, sfDir)
    spark.table(li).hint("merge")
      .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .orderBy("o_orderpriority", "l_linestatus")
  }
}
