package graft

import graft.shard.{Config, Key2Shard, Reshard, ShardMaster}
import scala.util.Random

/** Control-plane invariants, mirroring the reference's shardmaster
  * tests (reference: src/shardmaster/test_test.go:8-75 — after every
  * op all shards map to live groups and max-min <= 1; Query time
  * travel; shardmaster2 batch API).
  */
class ShardMasterSpec extends SparkSpec {

  test("join/leave keep every shard on a live group with max-min <= 1") {
    var cfg = ShardMaster.initial
    var history = Vector(cfg)
    val rnd = new Random(7)
    val liveGids = scala.collection.mutable.Set[Int]()
    (1 to 60).foreach { i =>
      val doJoin = liveGids.isEmpty || (liveGids.size < 8 && rnd.nextBoolean())
      val applied: Boolean =
        if (doJoin) {
          val gid = rnd.nextInt(20) + 1
          if (!liveGids.contains(gid)) {
            liveGids += gid
            cfg = ShardMaster.join(cfg, gid, Seq(s"s$gid-a", s"s$gid-b"))
            true
          } else false
        } else {
          val gid = liveGids.toSeq(rnd.nextInt(liveGids.size))
          liveGids -= gid
          cfg = ShardMaster.leave(cfg, gid)
          true
        }
      if (applied) {
        history :+= cfg
        assert(cfg.balanced, s"step $i: config $cfg not balanced")
        assert(cfg.num == history.size - 1)
      }
    }
    // leave of every group returns all shards to gid 0
    liveGids.toSeq.foreach { g => cfg = ShardMaster.leave(cfg, g) }
    assert(cfg.shards.forall(_ == 0))
  }

  test("rebalance moves the minimum number of shards on a single join") {
    var cfg = ShardMaster.initial
    cfg = ShardMaster.join(cfg, 1, Seq("a"))
    assert(cfg.shards.forall(_ == 1)) // first group owns everything
    val before = cfg.shards
    cfg = ShardMaster.join(cfg, 2, Seq("b"))
    val moved = before.zip(cfg.shards).count { case (f, t) => f != t }
    assert(moved == 5, s"10 shards over 2 groups: exactly 5 move, got $moved")
    assert(cfg.balanced)
  }

  test("move pins a shard and query time-travels (C3/C4)") {
    var history = Vector(ShardMaster.initial)
    history :+= ShardMaster.join(history.last, 1, Seq("a"))
    history :+= ShardMaster.join(history.last, 2, Seq("b"))
    history :+= ShardMaster.move(history.last, 3, 1)
    assert(history.last.shards(3) == 1)
    assert(ShardMaster.query(history, 1).num == 1)
    assert(ShardMaster.query(history, -1).num == 3)
    assert(ShardMaster.query(history, 99).num == 3)
    // countShards rollup (A5)
    val counts = ShardMaster.countShards(history(2))
    assert(counts.values.map(_.size).sum == 10)
  }

  test("batch join/leave (shardmaster2 API, C5)") {
    var cfg = ShardMaster.joinAll(ShardMaster.initial, Map(1 -> Seq("a"), 2 -> Seq("b"), 3 -> Seq("c")))
    assert(cfg.balanced && cfg.liveGids == Seq(1, 2, 3))
    cfg = ShardMaster.leaveAll(cfg, Seq(1, 3))
    assert(cfg.balanced && cfg.liveGids == Seq(2))
    assert(cfg.shards.forall(_ == 2))
  }

  test("migrationPlan covers exactly the differing shards") {
    val a = Config(1, Vector(1, 1, 1, 1, 1, 2, 2, 2, 2, 2), Map(1 -> Seq("a"), 2 -> Seq("b")))
    val b = ShardMaster.join(a, 3, Seq("c"))
    val plan = ShardMaster.migrationPlan(a, b)
    assert(plan.nonEmpty && plan.forall { case (s, f, t) => a.shards(s) == f && b.shards(s) == t })
    assert(plan.size == a.shards.zip(b.shards).count { case (f, t) => f != t })
  }

  test("config-stepped routing: each op served under the config at its seq") {
    import spark.implicits._
    val ops = graft.kv.OpLog.fromEvents(Tables.events(spark, sf0001))
    val history = Reshard.steppedHistory(999, 500)
    val routed = Reshard.route(ops, history, 500).collect()
    assert(routed.length == 1000) // every op routed exactly once
    routed.foreach { r =>
      val seq = r.getAs[Long]("seq")
      val cfgNum = r.getAs[Int]("cfg_num")
      val gid = r.getAs[Int]("gid")
      val shard = r.getAs[Int]("shard")
      assert(cfgNum == (seq / 500).toInt)
      assert(gid == history(cfgNum).shards(shard))
    }
  }
}
