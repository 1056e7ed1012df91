package graft.kv

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One consensus-replicated KV operation, i.e. one entry of the
  * reference's replicated log after commit (reference: kvraft Op at
  * src/kvraft/server.go:36-44; log order at src/raft/raft.go:711-727).
  *
  *  - seq: position in the total log order (Raft applyCh order)
  *  - clientId/reqId: the client session pair used for exactly-once
  *    dedup (src/kvraft/client.go:47-56, server.go:72-80)
  *  - kind: get | put | append (the entire query language,
  *    src/kvraft/server.go:113-121)
  */
case class Op(seq: Long, clientId: Long, reqId: Long, kind: String, key: String, value: String)

object OpLog {

  /** Deterministic synthesis of an op log from the driver's `events`
    * table, so every KV query has a DuckDB-expressible oracle:
    *
    *   seq      = event_id                 (total order)
    *   clientId = user_id
    *   reqId    = event_id % 200           (collisions model client retries)
    *   kind     = signup->put, view->get, else->append
    *   key      = user_id % 50 as string   (multiple clients per key)
    *   value    = floor(value*100) as string (exact, portable across engines)
    *
    * Keep in sync with [[KVQueries.OPS_SQL]].
    */
  def fromEvents(events: DataFrame): Dataset[Op] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col("event_id").as("seq"),
        col("user_id").as("clientId"),
        (col("event_id") % 200).as("reqId"),
        when(col("event_type") === "signup", "put")
          .when(col("event_type") === "view", "get")
          .otherwise("append")
          .as("kind"),
        (col("user_id") % 50).cast("string").as("key"),
        floor(col("value") * 100).cast("long").cast("string").as("value"))
      .as[Op]
  }

  /** [[fromEvents]] with a PLANTED HOT KEY: clients whose id ends in
    * 0-6 all write key "hot" (~70% of the log on one key — the zipfian
    * head a real serving log develops), the rest keep their modular
    * key. Retries stay key-consistent (key is a pure function of
    * clientId), so the K4 dedup contract holds unchanged. This is the
    * fixture for the skew-resistant salted fold
    * ([[KVEngine.replaySalted]]): a plain per-key fold would serialize
    * 70% of the log through one task at scale. Keep in sync with
    * [[KVQueries.SKEWED_OPS_SQL]].
    */
  def fromEventsSkewed(events: DataFrame): Dataset[Op] = {
    val spark = events.sparkSession
    import spark.implicits._
    fromEvents(events)
      .withColumn("key",
        when(col("clientId") % 10 < 7, lit("hot"))
          .otherwise(col("key")))
      .as[Op]
  }
}
