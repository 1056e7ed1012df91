package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-plane [[QueryPack]]s. Key collisions across packs
  * are a bug; [[packs]] order is load order only (keys are disjoint).
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    apps.TextQueries,
    apps.RelationalQueries,
    kv.KVQueries,
    shard.ShardQueries,
    pipeline.PipelineQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    apps.TextApps.topWords(Tables.documents(spark, "/root/testdata/sf0.001"), 10)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names across packs: ${dups.mkString(", ")}")
    all.toMap
  }

  /** For each key in queries, equivalent DuckDB SQL over the same
    * parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
