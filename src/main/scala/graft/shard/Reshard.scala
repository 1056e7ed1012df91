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
      .withColumn("shard", Key2Shard.shardOfFast(spark, col("key")))
      .join(broadcast(cfgDf), Seq("cfg_num", "shard"))
  }

  /** Ops per (config version, owning group) — the observable routing
    * outcome of M1-M4. */
  def routedCounts(ops: Dataset[Op], history: Seq[Config], epochLen: Long): DataFrame =
    route(ops, history, epochLen)
      .groupBy(col("cfg_num"), col("gid"))
      .agg(count(lit(1)).as("n_ops"))

  /** Sharded KV replay with wrong-group rejection (reference:
    * CheckValidKey precedes CheckDuplicated, src/shardkv/server.go:
    * 493-497 — SURVEY §7.4.5). Clients route with a STALE config view
    * (the owner as of seq - lag); an op only applies if its stale
    * target still owns the shard at the op's seq. Critically,
    * rejected occurrences must NOT satisfy the exactly-once dedup:
    * a retry of a rejected op (same clientId/reqId, later seq, fresh
    * routing) must still apply. Hence: validity filter FIRST, dedup
    * and the ordered fold over the surviving ops only.
    */
  def replayRouted(ops: Dataset[graft.kv.Op], epochLen: Long, lag: Long): DataFrame = {
    val spark = ops.sparkSession
    import spark.implicits._
    val shard = Key2Shard.shardOfFast(spark, col("key"))
    def gidAt(epoch: org.apache.spark.sql.Column) =
      (shard % (lit(1) + epoch % 5) + 1).cast("int")
    val ownerEpoch = floor(col("seq") / epochLen).cast("long")
    val targetEpoch = floor(greatest(col("seq") - lag, lit(0L)) / epochLen).cast("long")
    val valid = ops
      .withColumn("owner_gid", gidAt(ownerEpoch))
      .withColumn("target_gid", gidAt(targetEpoch))
      .filter(col("target_gid") === col("owner_gid"))
      .drop("owner_gid", "target_gid")
      .as[graft.kv.Op]
    graft.kv.KVEngine.replay(valid)
  }

  /** Post-migration garbage collection (reference: shard data deleted
    * on the donor after handoff, shardkv test_test.go:620-699): a
    * group's state table keeps only shards it owns under `cfg`. */
  def ownedState(state: DataFrame, cfg: Config, gid: Int): DataFrame = {
    val owned = (0 until Key2Shard.NShards).filter(s => cfg.shards(s) == gid)
    state.filter(Key2Shard.shardOfFast(state.sparkSession, col("key")).isin(owned: _*))
  }

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
