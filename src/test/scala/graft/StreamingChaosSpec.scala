package graft

import graft.kv.{KVEngine, Op, OpLog}
import graft.streaming.LiveKV
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import scala.util.Random

/** Chaos analog of the reference's crash/unreliable sweeps (reference:
  * src/kvraft/test_test.go GenericTest with crash=true restarts
  * servers between rounds; labrpc.go:186-267 re-delivers requests):
  * the SAME op log is fed through >=3 stream incarnations per seed —
  * each incarnation is a fresh MemoryStream resuming the shared
  * checkpoint after a kill — with network-level re-deliveries
  * (verbatim duplicate ops) and a simulated crashed write attempt (a
  * partial version dir with no commit marker). After every
  * incarnation the recovered state must equal the batch replay of
  * exactly the ops delivered so far: exactly-once, no matter where
  * the kill landed.
  */
object StreamingChaosSpec {
  val liveStates = new scala.collection.concurrent.TrieMap[String, String]()
}

class StreamingChaosSpec extends SparkSpec {
  import spark.implicits._

  /** Seq-sorted oplog with extra verbatim re-deliveries sprinkled in
    * later positions, split into `nBlocks` addData blocks. Block
    * boundaries are seed-stable: MemoryStream offsets index blocks, so
    * every incarnation must present identical block alignment. */
  private def chaosBlocks(seed: Long, nBlocks: Int): Vector[Vector[Op]] = {
    val rnd = new Random(seed)
    val base = OpLog.fromEvents(Tables.events(spark, sf0001)).collect().sortBy(_.seq).toVector
    val withRedelivery = base.zipWithIndex.flatMap { case (op, i) =>
      // 5%: the network re-delivers an ALREADY-SENT op (a retry can
      // only duplicate the past; a "future" op cannot be re-delivered)
      if (i > 0 && rnd.nextInt(20) == 0) Vector(op, base(rnd.nextInt(i)).copy())
      else Vector(op)
    }
    val cuts = (Vector(0, withRedelivery.size) ++
      Vector.fill(nBlocks - 1)(rnd.nextInt(withRedelivery.size))).sorted
    cuts.sliding(2).collect { case Seq(a, b) => withRedelivery.slice(a, b).toVector }.toVector
  }

  test("stateTableSink survives seeded kill/restart across incarnations (exactly-once)") {
    Seq(7L, 13L).foreach { seed =>
      implicit val sqlCtx = spark.sqlContext
      val rnd = new Random(seed * 31)
      val stateDir = Files.createTempDirectory(s"graft_chaos_state_$seed").toString
      val ckpt = Files.createTempDirectory(s"graft_chaos_ckpt_$seed").toString
      val blocks = chaosBlocks(seed, nBlocks = 8)
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

      // 4 incarnations, each killed after a random prefix of blocks;
      // the last one sees everything. One randomly-chosen inter-
      // incarnation gap also runs offline compaction (the VACUUM a
      // real deployment schedules between restarts) — state and
      // resume behavior must be unaffected.
      val stops = (Vector.fill(3)(1 + rnd.nextInt(blocks.size)) :+ blocks.size).sorted
      val compactAfter = stops(rnd.nextInt(stops.size - 1))
      var delivered = 0
      stops.foreach { upTo =>
        // crashed previous attempt: a partial, unmarked version dir —
        // the recompute must overwrite it wholesale. Only planted when
        // this incarnation will actually run a batch (repeated stop
        // points model a restart that makes no progress)
        val progresses = upTo > delivered
        val nextBatch = fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
          .map(_.getPath.getName).filter(_.startsWith("_commit_"))
          .map(_.stripPrefix("_commit_").toLong).sorted.lastOption.map(_ + 1).getOrElse(0L)
        val partial = new org.apache.hadoop.fs.Path(s"$stateDir/v$nextBatch/shard=99")
        if (progresses) {
          fs.mkdirs(partial)
          fs.create(new org.apache.hadoop.fs.Path(partial, "part-garbage.parquet"), true).close()
        }

        val stream = MemoryStream[Op]
        // an incarnation must re-present all earlier blocks so offsets
        // line up; committed ones are skipped via the checkpoint
        (0 until upTo).foreach(i => stream.addData(blocks(i)))
        val query = LiveKV.stateTableSink(
          stream.toDS().dropDuplicates("clientId", "reqId"), stateDir, ckpt).start()
        try query.processAllAvailable() finally query.stop()

        delivered = upTo
        val expected = KVEngine.replay(blocks.take(delivered).flatten.toDS())
          .as[(String, String)].collect().toMap
        val got = LiveKV.readStateTable(spark, stateDir)
          .as[(String, String)].collect().toMap
        assert(got == expected, s"state diverged after kill at block $upTo (seed=$seed)")
        if (progresses)
          assert(!fs.exists(partial), s"crashed partial attempt survived (seed=$seed)")
        if (upTo == compactAfter) {
          LiveKV.compactStateTable(spark, stateDir)
          val afterCompact = LiveKV.readStateTable(spark, stateDir)
            .as[(String, String)].collect().toMap
          assert(afterCompact == expected, s"compaction changed state (seed=$seed)")
        }
      }
      assert(delivered == blocks.size)
      // after the whole sweep, GC must hold the per-shard bound: only
      // the newest version and its predecessor of any shard survive
      val shardVersionCounts = fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
        .map(_.getPath.getName).filter(_.startsWith("v")).toSeq
        .flatMap { v =>
          fs.listStatus(new org.apache.hadoop.fs.Path(s"$stateDir/$v"))
            .map(_.getPath.getName).filter(_.startsWith("shard="))
        }
        .groupBy(identity).map { case (s, vs) => s -> vs.size }
      shardVersionCounts.foreach { case (shard, n) =>
        assert(n <= 2, s"$shard survives in $n versions after chaos sweep (seed=$seed)")
      }
    }
  }

  test("liveState survives seeded kill/restart across incarnations (exactly-once)") {
    Seq(5L).foreach { seed =>
      implicit val sqlCtx = spark.sqlContext
      val rnd = new Random(seed * 17)
      val ckpt = Files.createTempDirectory(s"graft_chaos_live_$seed").toString
      val blocks = chaosBlocks(seed, nBlocks = 6)
      StreamingChaosSpec.liveStates.clear()

      val stops = (Vector.fill(2)(1 + rnd.nextInt(blocks.size)) :+ blocks.size).sorted
      stops.foreach { upTo =>
        val stream = MemoryStream[Op]
        (0 until upTo).foreach(i => stream.addData(blocks(i)))
        val query = LiveKV.liveState(stream.toDS())
          .writeStream.outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[LiveKV.KVUpdate], _: Long) =>
            batch.collect().foreach(u => StreamingChaosSpec.liveStates.put(u.key, u.value))
          }
          .option("checkpointLocation", ckpt).start()
        try query.processAllAvailable() finally query.stop()
      }

      val expected = KVEngine.replay(blocks.flatten.toDS())
        .as[(String, String)].collect().toMap
      val got = StreamingChaosSpec.liveStates.toMap
      assert(got == expected, s"live state diverged (seed=$seed)")
    }
  }
}
