package graft

import graft.kv.{ClerkGroup, KVEngine}
import scala.util.Random

/** Concurrent multi-clerk analog of the reference's GenericTest +
  * checkClntAppends (reference: src/kvraft/test_test.go:131-235 runs
  * 1-5 concurrent clerks with at-least-once retries; :57-99 asserts
  * every client's appends appear in the final value exactly once and
  * in per-client order). Five clerk threads interleave appends on a
  * shared [[ClerkGroup]] log under real scheduling nondeterminism,
  * plus two retry modes the dedup must absorb: back-to-back
  * duplicates (sendDuplicates) and stale retries surfacing arbitrarily
  * later in the log (resendRandom). The invariants are checked on BOTH
  * distributed fold paths (replay and the salted two-phase fold).
  */
class KVLinearizabilitySpec extends SparkSpec {
  import spark.implicits._

  private val Token = """\[c(\d+)\.(\d+)\]""".r

  test("concurrent clerks: every append exactly once, in per-client order, on both fold paths") {
    val nClients = 5
    val nOpsPer = 40
    val keys = Vector("ka", "kb", "kc")

    Seq(11L, 23L, 42L).foreach { seed =>
      val group = new ClerkGroup(spark)
      // per client, per key: j-indices appended in issue order (each
      // slot written only by its own thread; join() publishes them)
      val issuedOrder = Array.fill(nClients)(
        scala.collection.mutable.Map[String, Vector[Int]]().withDefaultValue(Vector()))
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until nClients).map { c =>
        new Thread(() => {
          try {
            val rnd = new Random(seed * 1000 + c)
            val ck = group.clerk(c.toLong)
            (0 until nOpsPer).foreach { j =>
              val key = keys(rnd.nextInt(keys.size))
              val dups = if (rnd.nextInt(4) == 0) 2 else 1
              ck.append(key, s"[c$c.$j]", sendDuplicates = dups)
              issuedOrder(c)(key) = issuedOrder(c)(key) :+ j
              if (rnd.nextInt(4) == 0) ck.resendRandom(rnd)
            }
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(failures.isEmpty, s"clerk thread failed: ${failures.peek()}")

      val ops = group.log
      // retries must actually be present or this tests nothing
      assert(ops.size > nClients * nOpsPer, "expected duplicate ops in the log")

      val folds = Seq(
        "replay" -> KVEngine.replay(ops.toDS()),
        "replaySalted" -> KVEngine.replaySalted(ops.toDS(), salt = 8))
      var referenceVals: Map[String, String] = Map.empty
      folds.foreach { case (name, state) =>
        val vals = state.as[(String, String)].collect().toMap
        if (referenceVals.isEmpty) referenceVals = vals
        else assert(vals == referenceVals, s"$name diverged from replay (seed=$seed)")
        keys.foreach { key =>
          val v = vals.getOrElse(key, "")
          val toks = Token.findAllMatchIn(v)
            .map(m => (m.group(1).toInt, m.group(2).toInt)).toVector
          // the value is EXACTLY a concatenation of client tokens
          assert(toks.map(t => s"[c${t._1}.${t._2}]").mkString == v,
            s"$name: non-token bytes in value of $key (seed=$seed)")
          // checkClntAppends: per client, exactly once and in order
          (0 until nClients).foreach { c =>
            val mine = toks.filter(_._1 == c).map(_._2)
            assert(mine == issuedOrder(c)(key),
              s"$name: client $c appends to $key are $mine, issued ${issuedOrder(c)(key)} (seed=$seed)")
          }
        }
      }

      // the Clerk read path folds the same shared log
      val reader = group.clerk(99L)
      keys.foreach { key =>
        assert(reader.get(key) == referenceVals.getOrElse(key, ""), s"get($key) (seed=$seed)")
      }
    }
  }
}
