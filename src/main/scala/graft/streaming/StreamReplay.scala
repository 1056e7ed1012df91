package graft.streaming

import graft.kv.Op
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-visible STREAMING state replay — the query that puts the
  * whole Structured-Streaming KV plane (file source → exactly-once
  * gate → [[LiveKV.liveState]]'s mapGroupsWithState fold → Update-mode
  * sink) under the driver's DuckDB hash gate, not just under ScalaTest
  * chaos specs. Oracle: the batch replay's SQL — the streaming fold
  * shares its segment monoid with [[graft.kv.KVEngine.replay]]
  * (reference semantics: the kvraft apply loop,
  * src/kvraft/server.go:166-214), so final state is identical by
  * construction and any divergence is a real streaming bug.
  *
  * Protocol (all deterministic, all distributed except the bounded
  * final read):
  *
  *  1. the deduped WRITE log is bucketed by seq range into `nBatches`
  *     parquet files with strictly increasing modification times —
  *     dedup happens batch-side here so the oracle replays exactly
  *     (streaming dropDuplicates keeps the first ARRIVAL of a
  *     (clientId, reqId) pair, which within one micro-batch is
  *     partition-order-dependent; the in-stream dedup path stays
  *     chaos-tested in StreamingSpec where bit-parity with a SQL
  *     oracle is not the contract);
  *  2. a file-source stream reads them with maxFilesPerTrigger=1 under
  *     Trigger.AvailableNow — one micro-batch per bucket, in seq order
  *     (mod-times 2 s apart; path order ties). The state fold is
  *     genuinely INCREMENTAL across micro-batches: per-key GroupState
  *     carries (value, maxSeq) from batch to batch;
  *  3. the Update-mode memory sink holds one row per (key, batch that
  *     touched it); the final state per key is the row with the
  *     highest max_seq. That read is bounded by keys × batches — the
  *     key space is the bounded shard domain (reference:
  *     src/shardkv/client.go:25-32), never the op count.
  *
  * At production scale the memory sink becomes the shard-partitioned
  * parquet sink ([[LiveKV.stateTableSink]]) and the file source a real
  * log (Kafka offsets playing Raft log order); the operator under test
  * — the stateful fold — is byte-identical.
  */
object StreamReplay {

  private val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run `body` (which must both BUILD and DRAIN a streaming query)
    * with `spark.sql.shuffle.partitions` = n, restoring the session
    * value after. Stateful streaming operators take their STATE-STORE
    * partition count from this conf at query planning, and every
    * micro-batch pays a fixed per-partition state checkpoint cost —
    * so the partition count must be sized to the STATE VOLUME, not to
    * the session's batch-compute parallelism (a stream-stream join
    * carries 4 state stores: at 32 partitions × 5 micro-batches that
    * is 640 state commits for what is here kilobytes of state —
    * measured 35 s of a 36 s query). At production state volumes the
    * same knob goes UP instead; the point is that it is a deliberate
    * state-layout choice, set per query. */
  private def withShufflePartitions[T](
      spark: org.apache.spark.sql.SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, old)
  }

  /** State-store partition count for the replay queries' stateful
    * operators — kilobytes of state at any test sf (≤ 50 KV keys /
    * bounded open sessions / a ~1.5 h join window). */
  private val StatePartitions = 8

  /** Driver-visible STREAMING windowed aggregation — the second
    * streaming plane (stateful event-time aggregation, vs
    * [[stateReplay]]'s mapGroupsWithState) under the oracle gate: the
    * events table itself is read as a file-source STREAM, rolled up
    * by 1-hour tumbling window × event_type, and drained under
    * Trigger.AvailableNow into a Complete-mode memory sink — Complete
    * mode makes the final table the full rollup regardless of how the
    * source was micro-batched, so the result equals the batch
    * ev_hourly rollup (same oracle SQL) exactly. The final read is
    * bounded by the hours × types window grid, never the event count.
    * In production the sink is a Delta/parquet table in Update mode
    * with a watermark; the aggregation operator under test is the
    * same. */
  def windowedReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_stream_hourly_")
    try {
      val batchEv = graft.Tables.events(spark, sfDir)
      // the file stream source wants a DIRECTORY; the testdata table is
      // a single parquet file — expose it through a symlinked dir (copy
      // fallback for filesystems without symlinks), zero data movement
      val inDir = java.nio.file.Files.createDirectory(root.resolve("in"))
      val srcFile = java.nio.file.Paths.get(sfDir, "events.parquet")
      val linked = inDir.resolve("events.parquet")
      try java.nio.file.Files.createSymbolicLink(linked, srcFile)
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        java.nio.file.Files.copy(srcFile, linked)
      }
      val src = spark.readStream.schema(batchEv.schema).parquet(inDir.toString)
      val agg = src
        .select(graft.Tables.eventTime(src).as("ts_utc"), col("event_type"), col("value"))
        .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("total"))
      val name = s"stream_hourly_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, StatePartitions) {
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", root.resolve("ck").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val schema = spark.table(name).schema
      val rows = spark.table(name).collect() // hours × types — bounded
      spark.catalog.dropTempView(name)
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(root)
    }
  }

  /** Driver-visible STREAMING sessionization — flatMapGroupsWithState
    * with EVENT-TIME TIMEOUT under the oracle gate (the third stateful
    * streaming operator after [[stateReplay]]'s mapGroupsWithState and
    * [[windowedReplay]]'s windowed aggregation). The events table is
    * bucketed into `nBatches` TIME-ORDERED parquet files (bucket
    * boundaries are equal slices of the [min, max] event-time range,
    * so every batch's events precede the next batch's — the watermark
    * never drops data and the replay is deterministic), streamed
    * through [[LiveKV.sessionize]] (30-min-gap sessions, 1 h
    * watermark), and drained Append-mode under Trigger.AvailableNow.
    *
    * What the final table contains — and what the ORACLE must
    * replicate: a session is emitted either when a later event of the
    * same user closes it (gap exceeded — emitted regardless of
    * watermark), or when the event-time timeout fires (watermark
    * passed lastEvent + gap; the trailing no-data micro-batch fires
    * the last round of timers). So the streamed result is every batch
    * session EXCEPT a user's final one when that session's
    * lastEvent + gap has not been passed by the terminal watermark
    * (max event time − delay). Timestamps are milliseconds
    * (SessionEvent folds java.sql.Timestamp.getTime — µs truncated),
    * matching DuckDB's epoch_ms().
    *
    * The memory sink + final read are bounded by the CLOSED-session
    * count (≪ event count; production writes a parquet sink — the
    * operator under test is identical). */
  def sessionReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_stream_sessions_")
    val inDir = root.resolve("in")
    try {
      val ev = graft.Tables.events(spark, sfDir)
      // ONE eager checkpoint: the per-bucket writes below are
      // coalesce(1) single-task jobs and would each re-scan and
      // re-project the events table without it (the stateReplay fix)
      val e = ev.select(col("user_id"),
        graft.Tables.eventTime(ev).as("ts_utc"),
        graft.Tables.eventMicros(ev).as("tsu"))
        .localCheckpoint(true)
      val r = e.agg(min("tsu"), max("tsu")).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val width = math.max((hi - lo) / nBatches + 1, 1L)
      val bucket = least(((col("tsu") - lo).cast("decimal(25,0)") / width).cast("long"),
        lit(nBatches - 1L))
      val t0 = System.currentTimeMillis()
      (0 until nBatches).foreach { b =>
        val dir = inDir.resolve(f"b$b%03d")
        e.filter(bucket === b).select("user_id", "ts_utc").coalesce(1)
          .write.mode("overwrite").parquet(dir.toString)
        java.nio.file.Files.list(dir).forEach { p =>
          if (!p.getFileName.toString.startsWith("_"))
            java.nio.file.Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis(t0 + b * 2000L))
        }
      }
      graft.pipeline.Dedup.freeCheckpoint(e) // buckets are on disk
      val name = s"stream_sessions_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, StatePartitions) {
        val src = spark.readStream
          .schema("user_id LONG, ts_utc TIMESTAMP")
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$inDir/b*")
        val q = LiveKV.sessionize(src.as[LiveKV.SessionEvent])
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", root.resolve("ck").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val rows = spark.table(name).collect() // closed sessions — bounded
      spark.catalog.dropTempView(name)
      rows.toSeq
        .map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)))
        .toDF("user_id", "start_ms", "end_ms", "n_events")
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(root)
    }
  }

  /** Driver-visible STREAM-STREAM INTERVAL JOIN — the fourth stateful
    * streaming family (after the fold, the windowed aggregation and
    * sessionization): each purchase matched to the same user's clicks
    * in the prior 30 minutes, both sides read as watermarked streams
    * of the events table and inner-joined on a time-bound condition
    * (the streaming twin of the batch [[graft.operators.RangeJoin]]
    * shape ev_bursts uses).
    *
    * Determinism: an INNER interval join emits every match once both
    * rows have arrived — the watermark bounds STATE, not emission —
    * so the drained result is exactly the batch join, provided no
    * needed row is evicted early. Time-ordered buckets guarantee
    * that: both sources admit the same bucket per micro-batch
    * (maxFilesPerTrigger=1 over identical files), so when a purchase
    * in batch k (p_ts ≥ T_{k−1}) probes, the watermark is
    * T_{k−1} − 1 h and a click is evicted only once the watermark
    * passes c_ts + 30 min, i.e. c_ts < T_{k−1} − 90 min — strictly
    * older than any click the purchase can need (≥ p_ts − 30 min ≥
    * T_{k−1} − 30 min). Oracle: the plain batch join SQL. */
  def intervalJoinReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_stream_ssj_")
    val inDir = root.resolve("in")
    try {
      val ev = graft.Tables.events(spark, sfDir)
      val e = ev.select(col("event_id"), col("user_id"), col("event_type"),
        graft.Tables.eventTime(ev).as("ts_utc"),
        graft.Tables.eventMicros(ev).as("tsu"))
        .filter(col("event_type").isin("click", "purchase"))
        .localCheckpoint(true)
      val r = e.agg(min("tsu"), max("tsu")).head()
      val (lo, _) = (r.getLong(0), r.getLong(1))
      val width = math.max((r.getLong(1) - lo) / nBatches + 1, 1L)
      val bucket = least(((col("tsu") - lo).cast("decimal(25,0)") / width).cast("long"),
        lit(nBatches - 1L))
      val t0 = System.currentTimeMillis()
      (0 until nBatches).foreach { b =>
        val dir = inDir.resolve(f"b$b%03d")
        e.filter(bucket === b).select("event_id", "user_id", "event_type", "ts_utc")
          .coalesce(1).write.mode("overwrite").parquet(dir.toString)
        java.nio.file.Files.list(dir).forEach { p =>
          if (!p.getFileName.toString.startsWith("_"))
            java.nio.file.Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis(t0 + b * 2000L))
        }
      }
      graft.pipeline.Dedup.freeCheckpoint(e)
      val name = s"stream_interval_join_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, StatePartitions) {
        val schema = "event_id LONG, user_id LONG, event_type STRING, ts_utc TIMESTAMP"
        def side(kind: String, prefix: String) = spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$inDir/b*")
          .filter(col("event_type") === kind)
          .select(col("event_id").as(s"${prefix}_id"),
            col("user_id").as(s"${prefix}_user"),
            col("ts_utc").as(s"${prefix}_ts"))
          .withWatermark(s"${prefix}_ts", "1 hour")
        val joined = side("purchase", "p")
          .join(side("click", "c"),
            expr("c_user = p_user AND c_ts BETWEEN p_ts - INTERVAL 30 MINUTES AND p_ts"))
          .select(col("p_id").as("purchase_id"), col("c_id").as("click_id"),
            col("p_user").as("user_id"))
        val q = joined.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", root.resolve("ck").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val rows = spark.table(name).collect() // in-window pair count — bounded
      spark.catalog.dropTempView(name)
      rows.toSeq.map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2)))
        .toDF("purchase_id", "click_id", "user_id")
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(root)
    }
  }

  /** Run the op log through the streaming path; return final
    * (key, value) state. Blocking (AvailableNow drains the source and
    * terminates). */
  def stateReplay(ops: Dataset[Op], nBatches: Int = 4): DataFrame = {
    val spark = ops.sparkSession
    import spark.implicits._
    require(nBatches >= 1, "nBatches must be positive")
    val root = java.nio.file.Files.createTempDirectory("graft_stream_replay_")
    val inDir = root.resolve("in")
    try {
      // 1. bucketed, batch-deduped write log (see scaladoc). Folded
      // ONCE into an eager checkpoint: the per-bucket writes below are
      // coalesce(1) single-task jobs, and without the checkpoint each
      // would re-run the whole dedup aggregate single-threaded (4x the
      // dedup cost, serialized).
      val writes = graft.kv.KVEngine.dedup(ops).filter(col("kind") =!= "get")
        .localCheckpoint(true)
      val maxSeqRow = writes.agg(max("seq")).head()
      val maxSeq = if (maxSeqRow.isNullAt(0)) 0L else maxSeqRow.getLong(0)
      val width = math.max(maxSeq / nBatches + 1, 1L)
      val bucket = least((col("seq").cast("decimal(25,0)") / width).cast("long"),
        lit(nBatches - 1L))
      val t0 = System.currentTimeMillis()
      (0 until nBatches).foreach { b =>
        val dir = inDir.resolve(f"b$b%03d")
        writes.filter(bucket === b).coalesce(1)
          .write.mode("overwrite").parquet(dir.toString)
        // strictly increasing mod-times pin the micro-batch order (the
        // file source admits oldest-first; 2 s >> fs timestamp
        // granularity)
        java.nio.file.Files.list(dir).forEach { p =>
          if (!p.getFileName.toString.startsWith("_"))
            java.nio.file.Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis(t0 + b * 2000L))
        }
      }
      graft.pipeline.Dedup.freeCheckpoint(writes.toDF) // buckets are on disk
      // 2. stream the buckets through the live fold, one per batch
      val name = s"stream_state_replay_${runCounter.incrementAndGet()}"
      val src = spark.readStream
        .schema(writes.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/b*")
      // foldStream, not liveState: the streamed log is ALREADY
      // exactly-once (step 1), so the in-stream dropDuplicates would
      // only push every (clientId, reqId) pair through a second state
      // store for nothing — the operator under the gate is the
      // incremental fold; the dedup-in-stream path has its own specs
      withShufflePartitions(spark, StatePartitions) {
        val q = LiveKV.foldStream(src.as[Op])
          .writeStream.format("memory").queryName(name)
          .outputMode("update")
          .option("checkpointLocation", root.resolve("ck").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // 3. bounded final read: keys × batches rows, newest update wins
      val finalRows = spark.table(name)
        .groupBy("key").agg(max_by(col("value"), col("max_seq")).as("value"))
        .collect()
      spark.catalog.dropTempView(name)
      finalRows.toSeq.map(r => (r.getString(0), r.getString(1))).toDF("key", "value")
    } finally {
      // the result is a local relation — every on-disk artifact of the
      // run (source buckets, checkpoint) can go immediately
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(root)
    }
  }
}
