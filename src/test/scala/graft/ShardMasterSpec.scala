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

  test("wrong-group rejection precedes dedup: a rejected op's retry still applies (SURVEY 7.4.5)") {
    import spark.implicits._
    import graft.kv.Op
    // epochLen=10, lag=5. Key "1" -> shard 9. Owner gid at epoch e is
    // 9 % (1 + e%5) + 1: epoch 0 -> 1, epoch 1 -> 2.
    // op seq=12 (owner epoch 1 -> gid 2; target epoch of seq-5=7 -> 0 -> gid 1)
    //   => REJECTED. Its retry seq=17 (target epoch of 12 -> 1 -> gid 2,
    //   owner gid 2) => must APPLY despite sharing (client, req) with
    //   the rejected occurrence.
    val ops = Seq(
      Op(12, 1, 1, "append", "1", "A"), // rejected (stale routing)
      Op(17, 1, 1, "append", "1", "A"), // retry, valid -> applies once
      Op(18, 1, 1, "append", "1", "A")) // same (client,req) again -> dedup drops
      .toDS()
    val got = graft.shard.Reshard.replayRouted(ops, epochLen = 10, lag = 5)
      .as[(String, String)].collect().toMap
    assert(got == Map("1" -> "A"), s"got $got")
    // sanity: validity-first matters — dedup-first would keep only the
    // rejected seq=12 occurrence and the key would end up absent
  }

  test("ownedState keeps only the group's shards (post-migration GC)") {
    import spark.implicits._
    val cfg = Config(1, Vector(1, 2, 1, 2, 1, 2, 1, 2, 1, 2), Map(1 -> Seq("a"), 2 -> Seq("b")))
    val state = (0 to 9).map(i => (i.toString, s"v$i")).toDF("key", "value")
    val g1 = graft.shard.Reshard.ownedState(state, cfg, 1)
      .select("key").as[String].collect().toSet
    // key "i" -> shard ascii(i)%10; '0'..'9' -> 48..57 -> shards 8,9,0..7
    val expected = (0 to 9).map(_.toString)
      .filter(k => cfg.shards(('0' + k.toInt).toInt % 10) == 1).toSet
    assert(g1 == expected)
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
