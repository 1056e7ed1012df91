package graft.kv

import org.apache.spark.sql.SparkSession

/** Client-facade parity with the reference's Clerk (reference:
  * src/kvraft/client.go — monotonic reqId under a lock :47-56, retry
  * loop :57-68). The Spark engine replays a committed log, so the
  * Clerk's job here is the *client half* of the contract: assign
  * (clientId, reqId) to each op, buffer them in log order, and answer
  * Gets from a fold of everything buffered so far (linearizable
  * read-your-writes by construction). `sendDuplicates` models
  * at-least-once network retries — the engine's dedup must absorb
  * them (K4), which KVEngineSpec asserts through this API.
  */
class Clerk(spark: SparkSession, clientId: Long) {
  private var nextReq = 0L
  private var seq = 0L
  private val buf = scala.collection.mutable.ArrayBuffer[Op]()

  private def record(kind: String, key: String, value: String, copies: Int): Unit =
    synchronized {
      val reqId = { nextReq += 1; nextReq }
      (0 until copies).foreach { _ =>
        seq += 1
        buf += Op(seq, clientId, reqId, kind, key, value)
      }
    }

  def put(key: String, value: String, sendDuplicates: Int = 1): Unit =
    record("put", key, value, sendDuplicates)

  def append(key: String, value: String, sendDuplicates: Int = 1): Unit =
    record("append", key, value, sendDuplicates)

  /** Linearizable read over everything this clerk has issued. Missing
    * key -> "" (reference client.go:37). */
  def get(key: String): String = {
    import spark.implicits._
    val state = KVEngine.getDirect(buf.toSeq.toDS(), Seq(key))
    state.as[(String, String)].collect().headOption.map(_._2).getOrElse("")
  }

  /** The committed log so far — what the serving plane replays. */
  def log: Seq[Op] = buf.toSeq
}
