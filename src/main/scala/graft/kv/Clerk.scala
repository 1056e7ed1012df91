package graft.kv

import org.apache.spark.sql.SparkSession

/** Shared committed log for a set of concurrent Clerks — the service
  * half of the reference's kvraft client/server pair from the client's
  * point of view (reference: src/kvraft/client.go + the GenericTest
  * harness test_test.go:131-235, which runs 1-5 clerks against one
  * service). Appends interleave under a lock, modeling the total order
  * Raft's log gives concurrent RPCs; the Spark engine then replays
  * that log. Thread-safe by construction: `record` is the only
  * mutation and it is synchronized.
  */
class ClerkGroup(spark: SparkSession) {
  private var seq = 0L
  private val buf = scala.collection.mutable.ArrayBuffer[Op]()

  private[kv] def record(clientId: Long, reqId: Long, kind: String, key: String,
      value: String, copies: Int): Unit = synchronized {
    (0 until copies).foreach { _ =>
      seq += 1
      buf += Op(seq, clientId, reqId, kind, key, value)
    }
  }

  def clerk(clientId: Long): Clerk = new Clerk(spark, clientId, this)

  /** The committed log so far — what the serving plane replays. */
  def log: Seq[Op] = synchronized { buf.toSeq }
}

/** Client-facade parity with the reference's Clerk (reference:
  * src/kvraft/client.go — monotonic reqId under a lock :47-56, retry
  * loop :57-68). The Spark engine replays a committed log, so the
  * Clerk's job here is the *client half* of the contract: assign
  * (clientId, reqId) to each op, commit it to the (possibly shared)
  * group log, and answer Gets from a fold of everything committed so
  * far (linearizable read-your-writes by construction).
  * `sendDuplicates` models back-to-back at-least-once retries;
  * [[resendRandom]] models a stale retry arriving arbitrarily later,
  * interleaved with other clients — the engine's dedup must absorb
  * both (K4), which KVEngineSpec / KVLinearizabilitySpec assert
  * through this API.
  */
class Clerk(spark: SparkSession, clientId: Long, group: ClerkGroup) {

  def this(spark: SparkSession, clientId: Long) = this(spark, clientId, new ClerkGroup(spark))

  private var nextReq = 0L
  // issued write requests, for late retries: (reqId, kind, key, value)
  private val issued = scala.collection.mutable.ArrayBuffer[(Long, String, String, String)]()

  private def record(kind: String, key: String, value: String, copies: Int): Unit =
    synchronized {
      val reqId = { nextReq += 1; nextReq }
      issued += ((reqId, kind, key, value))
      group.record(clientId, reqId, kind, key, value, copies)
    }

  def put(key: String, value: String, sendDuplicates: Int = 1): Unit =
    record("put", key, value, sendDuplicates)

  def append(key: String, value: String, sendDuplicates: Int = 1): Unit =
    record("append", key, value, sendDuplicates)

  /** Re-send one of this clerk's past requests verbatim (same
    * clientId/reqId, new log position) — an at-least-once network
    * retry that surfaces late. Exactly-once replay must ignore it. */
  def resendRandom(rnd: scala.util.Random): Unit = synchronized {
    if (issued.nonEmpty) {
      val (reqId, kind, key, value) = issued(rnd.nextInt(issued.size))
      group.record(clientId, reqId, kind, key, value, 1)
    }
  }

  /** Linearizable read over everything committed to the group so far.
    * Missing key -> "" (reference client.go:37). */
  def get(key: String): String = {
    import spark.implicits._
    val state = KVEngine.getDirect(group.log.toDS(), Seq(key))
    state.as[(String, String)].collect().headOption.map(_._2).getOrElse("")
  }

  /** The committed log so far — what the serving plane replays. */
  def log: Seq[Op] = group.log
}
