package graft.shard

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shard-assignment control plane (reference: src/shardmaster/ —
  * Config at common.go:28-32, Join/Leave/Move/Query apply at
  * server.go:428-449, rebalance at :367-426).
  *
  * Configs are tiny (NShards = 10 entries) and versioned; the greedy
  * rebalance is deliberately driver-side Scala — it is never a
  * distributed problem (SURVEY §4). The config *history* is exposed as
  * a DataFrame so the data plane can range-join ops to the config in
  * force at their seq (ConfigStepped replay, SURVEY §3.3).
  *
  * Invariants kept (reference test_test.go:22-49):
  *  - every shard maps to a live group (or 0 when no groups exist);
  *  - load balance: max - min <= 1 shards per group;
  *  - rebalance moves as few shards as possible and is deterministic
  *    (ties broken by lowest gid / lowest shard index).
  */
case class Config(num: Int, shards: Vector[Int], groups: Map[Int, Seq[String]]) {
  def liveGids: Seq[Int] = groups.keys.toSeq.sorted

  def shardsPerGroup: Map[Int, Int] =
    liveGids.map(g => g -> shards.count(_ == g)).toMap

  def balanced: Boolean = {
    if (groups.isEmpty) shards.forall(_ == 0)
    else {
      val counts = shardsPerGroup.values
      shards.forall(groups.contains) && (counts.max - counts.min) <= 1
    }
  }
}

object ShardMaster {
  import Key2Shard.NShards

  val initial: Config = Config(0, Vector.fill(NShards)(0), Map.empty)

  /** Deterministic greedy rebalance: while unbalanced, move one shard
    * from the most-loaded group (lowest gid on ties, lowest shard
    * index chosen) to the least-loaded. Also claims shards owned by
    * dead/no groups first. Minimal movement: only over-full donors
    * ever give up shards.
    */
  private def rebalance(shards: Vector[Int], groups: Map[Int, Seq[String]]): Vector[Int] = {
    if (groups.isEmpty) return Vector.fill(NShards)(0)
    val gids = groups.keys.toSeq.sorted
    var s = shards
    def counts = gids.map(g => g -> s.count(_ == g))
    // orphaned shards (gid left, or initial 0) go to the least-loaded group
    (0 until NShards).foreach { i =>
      if (!groups.contains(s(i))) {
        val (target, _) = counts.minBy { case (g, c) => (c, g) }
        s = s.updated(i, target)
      }
    }
    var done = false
    while (!done) {
      val cs = counts
      val (maxG, maxC) = cs.maxBy { case (g, c) => (c, -g) }
      val (minG, minC) = cs.minBy { case (g, c) => (c, g) }
      if (maxC - minC <= 1) done = true
      else {
        val idx = s.indexOf(maxG)
        s = s.updated(idx, minG)
      }
    }
    s
  }

  /** C1: add a replica group and rebalance. */
  def join(cfg: Config, gid: Int, servers: Seq[String]): Config = {
    val groups = cfg.groups + (gid -> servers)
    Config(cfg.num + 1, rebalance(cfg.shards, groups), groups)
  }

  /** C5: batched join (shardmaster2 API, common.go:49-53). */
  def joinAll(cfg: Config, add: Map[Int, Seq[String]]): Config = {
    val groups = cfg.groups ++ add
    Config(cfg.num + 1, rebalance(cfg.shards, groups), groups)
  }

  /** C2: remove a group; its shards go to the least-loaded survivors. */
  def leave(cfg: Config, gid: Int): Config = {
    val groups = cfg.groups - gid
    Config(cfg.num + 1, rebalance(cfg.shards, groups), groups)
  }

  def leaveAll(cfg: Config, gids: Seq[Int]): Config = {
    val groups = cfg.groups -- gids
    Config(cfg.num + 1, rebalance(cfg.shards, groups), groups)
  }

  /** C3: manual pin of one shard (no rebalance — reference
    * server.go:446-449 applies the move verbatim). */
  def move(cfg: Config, shard: Int, gid: Int): Config =
    Config(cfg.num + 1, cfg.shards.updated(shard, gid), cfg.groups)

  /** C4: fetch config `num`; latest if num == -1 or out of range. */
  def query(history: Seq[Config], num: Int): Config = {
    val latest = history.maxBy(_.num)
    if (num == -1 || num > latest.num) latest
    else history.find(_.num == num).getOrElse(latest)
  }

  /** A5: CountShards — gid -> owned shards (server.go:391-400). */
  def countShards(cfg: Config): Map[Int, Seq[Int]] =
    cfg.liveGids.map(g => g -> (0 until NShards).filter(i => cfg.shards(i) == g)).toMap

  /** M2-equivalent delta: shards that must migrate between two configs,
    * as (shard, fromGid, toGid). This is what drives TransferShard
    * fan-out in the reference (server.go:264-319).
    */
  def migrationPlan(from: Config, to: Config): Seq[(Int, Int, Int)] =
    (0 until NShards)
      .filter(i => from.shards(i) != to.shards(i))
      .map(i => (i, from.shards(i), to.shards(i)))

  /** Config history as a small DataFrame (one row per shard per
    * version) for range-joining the op stream — broadcast-sized by
    * construction. */
  def historyDf(spark: SparkSession, history: Seq[Config]): DataFrame = {
    import spark.implicits._
    history
      .flatMap(c => c.shards.zipWithIndex.map { case (gid, shard) => (c.num, shard, gid) })
      .toDF("cfg_num", "shard", "gid")
  }
}
