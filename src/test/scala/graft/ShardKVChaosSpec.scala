package graft

import graft.kv.ClerkGroup
import graft.shard.{Key2Shard, Reshard}
import scala.util.Random

/** Concurrent-clerk analog for the SHARD plane (reference:
  * src/shardkv/test_test.go TestConcurrent1-3 run concurrent clerks
  * while configs change; :493-497 CheckValidKey precedes
  * CheckDuplicated). Clerk threads interleave appends and stale
  * retries on a shared log while the config steps every `epochLen`
  * seqs; the distributed routed replay must equal a sequential
  * interpreter that applies the reference's rule exactly: an op
  * counts only if the client's stale view (owner as of seq - lag)
  * still owns the shard at the op's seq, and a REJECTED occurrence
  * does not consume the exactly-once dedup — its later retry (fresh
  * seq, fresh routing) must still apply.
  */
class ShardKVChaosSpec extends SparkSpec {
  import spark.implicits._

  /** Mirror of [[Reshard.replayRouted]]'s closed-form ownership. */
  private def gidAt(key: String, epoch: Long): Int =
    Key2Shard.shardOfRef(key) % (1 + (epoch % 5)).toInt + 1

  private def interpretRouted(ops: Seq[graft.kv.Op], epochLen: Long, lag: Long): Map[String, String] = {
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    val db = scala.collection.mutable.Map[String, String]()
    ops.sortBy(_.seq).foreach { op =>
      val ownerEpoch = op.seq / epochLen
      val targetEpoch = math.max(op.seq - lag, 0L) / epochLen
      val valid = gidAt(op.key, ownerEpoch) == gidAt(op.key, targetEpoch)
      if (valid && !seen((op.clientId, op.reqId))) {
        seen += ((op.clientId, op.reqId))
        op.kind match {
          case "put" => db(op.key) = op.value
          case "append" => db(op.key) = db.getOrElse(op.key, "") + op.value
          case _ => ()
        }
      }
    }
    db.toMap
  }

  test("concurrent clerks under config stepping: rejection-before-dedup holds (randomized)") {
    val keys = Vector("3", "17", "42", "alpha", "Ω9")
    Seq(3L, 19L).foreach { seed =>
      val group = new ClerkGroup(spark)
      val threads = (0 until 4).map { c =>
        new Thread(() => {
          val rnd = new Random(seed * 100 + c)
          val ck = group.clerk(c.toLong)
          (0 until 30).foreach { j =>
            val key = keys(rnd.nextInt(keys.size))
            val dups = if (rnd.nextInt(5) == 0) 2 else 1
            ck.append(key, s"<$c.$j>", sendDuplicates = dups)
            if (rnd.nextInt(3) == 0) ck.resendRandom(rnd)
          }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())

      val ops = group.log
      val (epochLen, lag) = (37L, 13L)
      val got = Reshard.replayRouted(ops.toDS(), epochLen, lag)
        .as[(String, String)].collect().toMap
      val expected = interpretRouted(ops, epochLen, lag)
      assert(got == expected, s"seed=$seed")
      // the sweep must actually exercise both rejection and retries
      assert(ops.size > 120, "expected retries in the log")
      assert(expected.values.mkString.nonEmpty)
    }
  }
}
