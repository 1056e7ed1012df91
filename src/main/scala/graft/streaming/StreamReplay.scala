package graft.streaming

import graft.kv.Op
import org.apache.spark.sql.{Column, DataFrame, Dataset}
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
  * parquet sink ([[LiveKV.stateTableSink]] — gated directly by
  * [[stateTableReplay]]) and the file source a real log (Kafka offsets
  * playing Raft log order); the operator under test — the stateful
  * fold — is byte-identical.
  *
  * HARNESS SHARE of the bench numbers (round-12 revision): fixture
  * prep — one localCheckpoint of the projected input plus `nBatches`
  * coalesce(1) single-file parquet writes with mod-time pinning — is
  * now built ONCE per session per (sfDir, content-kind) and CACHED
  * ([[cachedFixture]]), so across the bench's 3 interleaved passes
  * only the first invocation of a family pays it (~1 s measured
  * standalone at sf0.1); every later sample times the DRAIN — source
  * admission, state-store commits, sink — which is the operator cost
  * a production deployment (standing log, no per-query fixture) pays.
  * Replays taking caller-supplied datasets (the op-log family) keep
  * per-invocation fixtures: their input is not a pure function of
  * sfDir. The residual floor is the drain itself: ~0.5 s of query
  * start/stop plus per-micro-batch state commits — sized by
  * [[StatePartitions]], remeasured r12: 8 → 2 took the
  * interval-join drains from ~6.6 s to ~5.4 s at kilobytes of state.
  */
object StreamReplay {

  /** Per-hour HLL register state for [[hllReplay]] — fixed 256 ints
    * per group however many events the hour sees. */
  case class HllState(regs: Array[Int], seen: Long)

  /** One state-fold emission: the two exact-integer sketch summaries
    * plus the fold counter that orders updates in the drain. */
  case class HllUpdate(hour: Long, vZero: Long, sScaled: Long, nSeen: Long)

  private val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Symlink-safe recursive delete — the shared [[graft.core.Fs]]
    * helper (single definition; see its scaladoc for why NOFOLLOW). */
  private def rmTree(p: java.nio.file.Path): Unit =
    graft.core.Fs.rmTreeNoFollow(p)

  /** Write each slice as ONE parquet file under `inDir/b00i` with
    * strictly increasing modification times (2 s apart — far above fs
    * timestamp granularity), so a maxFilesPerTrigger=1 file source
    * admits them as micro-batches in exactly `slices` order. Callers
    * pass slices of an already-checkpointed frame: each write is a
    * coalesce(1) single-task job and must not re-run upstream work. */
  private def writeBuckets(slices: Seq[DataFrame], inDir: java.nio.file.Path): Unit = {
    val t0 = System.currentTimeMillis()
    slices.zipWithIndex.foreach { case (df, b) =>
      val dir = inDir.resolve(f"b$b%03d")
      df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
      val ls = java.nio.file.Files.list(dir)
      try ls.forEach { p =>
        if (!p.getFileName.toString.startsWith("_"))
          java.nio.file.Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(t0 + b * 2000L))
      } finally ls.close()
    }
  }

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
      spark: org.apache.spark.sql.SparkSession, n: Int)(body: => T): T =
    graft.core.Confs.withShufflePartitions(spark, n)(body)

  /** State-store partition count for the replay queries' stateful
    * operators — kilobytes of state at any test sf (≤ 50 KV keys /
    * bounded open sessions / a ~1.5 h join window). Lowered 8 → 2 in
    * round 12 after remeasuring the per-partition commit tax (each
    * micro-batch commits EVERY state partition of every store even
    * when untouched; a stream-stream join carries 4 stores, so 5
    * batches × 4 stores × 8 partitions = 160 commits vs 40 at 2):
    * interval-join drains went ~6.6 s → ~5.4 s, results unchanged
    * (state is hash-partitioned; 2 keeps the multi-partition path
    * exercised). Production sizes this UP to state volume / executor
    * count — the point stays: it is a deliberate per-query knob. */
  private val StatePartitions = 2

  /** SCALE-AWARE state-partition count for the event-corpus replays
    * (round 15 — r14's x100 rung: stream_sessions' shuffle records
    * stayed exactly linear to 100× while its WALL segment bent to
    * 1.31, because the pinned 2-partition state layout caps each
    * micro-batch's state work at 2 tasks; at 10M events the knob
    * saturates). Derived from the corpus's events.parquet byte size —
    * a filesystem stat, no action: ~1 state partition per 8 MB of
    * event data, floored at [[StatePartitions]] (so every gate sf and
    * the bench's sf0.1 keep today's measured 2-partition layout and
    * its per-partition commit tax — sf0.1 events are 2 MB) and capped
    * at 2 × the cluster's default parallelism (round 16 — the r15
    * spelling capped at the literal 64, which is 2×cores ON THIS
    * box but encoded local[32] into what reads as "the" formula: a
    * 1000-executor cluster replaying 100 TB of events would have been
    * throttled to 64 state tasks. The commit tax that motivates a cap
    * at all is per partition PER STORE per batch — a stream-stream
    * join carries 4 stores — so the cap tracks how many tasks can
    * actually commit concurrently, not a constant).
    * SPARK_GRAFT_STATE_PARTITIONS overrides — production sizes this to
    * state volume / executor count. The op-log replays keep the flat
    * constant: their state is ≤ 50 KV keys at any sf, bounded by
    * construction. */
  private def statePartitionsFor(sfDir: String): Int = {
    val overridden = sys.env.get("SPARK_GRAFT_STATE_PARTITIONS").map { s =>
      s.toIntOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_STATE_PARTITIONS must be a positive integer, got '$s'"))
    }
    overridden.getOrElse {
      val dir = java.nio.file.Paths.get(sfDir, "events.parquet")
      // NonFatal, not just IOException: the lazy walk stream surfaces
      // a file vanishing mid-walk as UncheckedIOException (a
      // RuntimeException) — any stat failure means "size unknown",
      // and the floor is the safe layout (r15 advice)
      val bytes =
        try {
          val s = java.nio.file.Files.walk(dir)
          try s.filter(p => java.nio.file.Files.isRegularFile(p))
            .mapToLong(p => java.nio.file.Files.size(p)).sum()
          finally s.close()
        } catch { case scala.util.control.NonFatal(_) => 0L }
      val parallelism = org.apache.spark.sql.SparkSession.active
        .sparkContext.defaultParallelism
      derivedStatePartitions(bytes, parallelism)
    }
  }

  /** The pure derivation behind [[statePartitionsFor]], spec-pinned:
    * ~1 state partition per 8 MB of event bytes, floored at
    * [[StatePartitions]], capped at 2 × `parallelism`. On local[32]
    * the cap is 64 — byte-identical to the r15 artifacts at every
    * measured rung (x100 derives 25, below either cap). */
  private[graft] def derivedStatePartitions(bytes: Long, parallelism: Int): Int =
    math.max(StatePartitions,
      math.min(2L * math.max(1, parallelism), bytes / (8L << 20)).toInt)

  /** Checkpoint the prepared events frame `e0` (projected — and
    * filtered, where the replay has a row filter: filters belong
    * BEFORE the checkpoint so the checkpoint holds only needed rows —
    * which must carry a `tsu` µs column), compute the [lo, hi] µs
    * range, and return (checkpointed frame, lo, hi, bucket-index
    * column for `nBatches` equal time slices). Shared fixture step for
    * every event-time replay. */
  private def timeSliced(e0: DataFrame, nBatches: Int): (DataFrame, Long, Long, Column) = {
    val e = e0.localCheckpoint(true)
    val r = e.agg(min("tsu"), max("tsu")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val width = math.max((hi - lo) / nBatches + 1, 1L)
    val bucket = least(((col("tsu") - lo).cast("decimal(25,0)") / width).cast("long"),
      lit(nBatches - 1L))
    (e, lo, hi, bucket)
  }

  /** Driver-visible STREAMING windowed aggregation — the second
    * streaming plane (stateful event-time aggregation, vs
    * [[stateReplay]]'s mapGroupsWithState) under the oracle gate: the
    * events table is bucketed into `nBatches` TIME-ORDERED files,
    * read as a file-source stream with maxFilesPerTrigger=1 (so the
    * Complete-mode aggregation genuinely ACCUMULATES state across
    * micro-batches — a single-batch run would never exercise the
    * cross-batch state merge), rolled up by 1-hour tumbling window ×
    * event_type, and drained under Trigger.AvailableNow into a
    * Complete-mode memory sink — Complete mode makes the final table
    * the full rollup regardless of how the source was micro-batched,
    * so the result equals the batch ev_hourly rollup (same oracle SQL)
    * exactly. The final read is bounded by the hours × types window
    * grid, never the event count. In production the sink is a
    * Delta/parquet table in Update mode with a watermark; the
    * aggregation operator under test is the same. */
  /** (ts_utc, event_type, value) time-ordered buckets — shared by
    * [[windowedReplay]] and [[ivmReplay]] (identical projection and
    * slicing) and across bench passes. */
  private def tevFixture(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, nBatches: Int): java.nio.file.Path =
    cachedFixture(sfDir, s"tev-$nBatches") { inDir =>
      val ev = graft.Tables.events(spark, sfDir)
      val (e, _, _, bucket) = timeSliced(
        ev.select(graft.Tables.eventTime(ev).as("ts_utc"), col("event_type"),
          col("value"), graft.Tables.eventMicros(ev).as("tsu")), nBatches)
      writeBuckets((0 until nBatches).map(b =>
        e.filter(bucket === b).select("ts_utc", "event_type", "value")), inDir)
      graft.pipeline.Dedup.freeCheckpoint(e)
    }

  def windowedReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    val inDir = tevFixture(spark, sfDir, nBatches)
    val root = java.nio.file.Files.createTempDirectory("graft_stream_hourly_")
    try {
      val src = spark.readStream
        .schema("ts_utc TIMESTAMP, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/b*")
      val agg = src
        .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("total"))
      val name = s"stream_hourly_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, statePartitionsFor(sfDir)) {
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
    } finally rmTree(root)
  }

  /** The PRODUCTION ingest loop under the gate — streaming × IVM: the
    * events stream drains through foreachBatch, and every micro-batch
    * folds into the STANDING parquet partial via
    * [[graft.operators.StandingTable.updateAggPartial]] (read
    * standing, monoid-merge, atomic directory swap) — exactly how a
    * lake keeps a rollup current at 100 TB: the fact stream is
    * touched once, history is never rescanned, and the served view is
    * a |groups|-sized read. The result is batching-INDEPENDENT (the
    * partial is a count/sum/min/max monoid), so the oracle is simply
    * the one-shot rollup — no streaming semantics to model; what the
    * gate buys is the end-to-end loop: file source → foreachBatch →
    * swap → serve from the on-disk table (read back AFTER the stream
    * stops, from disk, not from any in-memory sink).
    *
    * Retry caveat (the monoid's one gap): foreachBatch re-runs a
    * failed batch, and count/sum partials are NOT idempotent — a
    * production deployment records the folded batchId next to the
    * standing table (the commit-marker pattern
    * [[LiveKV.stateTableSink]] already implements and chaos-tests)
    * and skips an already-folded id; the AvailableNow happy path the
    * gate runs has no retries.
    */
  def ivmReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    val inDir = tevFixture(spark, sfDir, nBatches)
    val root = java.nio.file.Files.createTempDirectory("graft_stream_ivm_")
    val standing = root.resolve("standing").toString
    try {
      val src = spark.readStream
        .schema("ts_utc TIMESTAMP, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/b*")
      val q = src.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          // IncrementalAgg.partial derives day from the batch's ts
          // column; present the batch under the events-table shape
          graft.operators.StandingTable.updateAggPartial(standing,
            batch.withColumnRenamed("ts_utc", "ts"))
          ()
        }
        .option("checkpointLocation", root.resolve("ck").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // serve from the standing DISK table (groups-sized read)
      val served = graft.operators.IncrementalAgg.finalizeView(
          spark.read.parquet(standing))
        .orderBy("day", "event_type")
      val schema = served.schema
      val rows = served.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } finally rmTree(root)
  }

  /** SKETCH-IN-STATE under the gate — streaming × HLL: per-hour
    * distinct-user registers kept as mapGroupsWithState GROUP STATE
    * (a 256-int array per hour) and folded incrementally across
    * micro-batches by the register monoid (element-wise max). This is
    * the streaming form of the standing count-distinct: per-key state
    * is FIXED-SIZE no matter how many events an hour sees — the
    * property that lets a year-long stream hold a year of hourly
    * distincts in bounded memory, where exact streaming distinct
    * state grows with the key count.
    *
    * The hash/bucket/rank arithmetic is HllSketch.hashed (the same
    * codegen'd batch columns, computed BEFORE the stateful operator),
    * and the drained integer summaries get their estimate from
    * HllSketch.estimateFromCounts — the double arithmetic exists in
    * one association order shared with the batch ev_hll and its
    * DuckDB oracle. State emits (v_zero, s_scaled, n_seen) per
    * update; max_by(n_seen) picks each hour's final summary in the
    * bounded hours-sized drain. Oracle: the one-shot per-hour
    * register build (max is order- and batching-independent).
    */
  def hllReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    import spark.implicits._
    val inDir = cachedFixture(sfDir, s"hll-$nBatches") { fixDir =>
      val ev = graft.Tables.events(spark, sfDir)
      val hourly = ev.select(
        (graft.Tables.eventMicros(ev).cast("decimal(25,0)") / 3600000000L).cast("long").as("hour"),
        col("user_id"), graft.Tables.eventMicros(ev).as("tsu"))
      val (e, _, _, bucket) = timeSliced(hourly, nBatches)
      writeBuckets((0 until nBatches).map { b =>
        graft.operators.HllSketch.hashed(e.filter(bucket === b), "hour", "user_id")
      }, fixDir)
      graft.pipeline.Dedup.freeCheckpoint(e)
    }
    val root = java.nio.file.Files.createTempDirectory("graft_stream_hll_")
    try {
      val src = spark.readStream
        .schema("hour LONG, bucket LONG, rank LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/b*")
      val name = s"stream_hll_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, statePartitionsFor(sfDir)) {
        val updates = src.as[(Long, Long, Long)]
          .groupByKey(_._1)
          .mapGroupsWithState[HllState, HllUpdate](
            org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
            (hour, rows, state) =>
              val st = state.getOption.getOrElse(
                HllState(Array.fill(graft.operators.HllSketch.M)(0), 0L))
              var seen = st.seen
              rows.foreach { case (_, b, r) =>
                if (r > st.regs(b.toInt)) st.regs(b.toInt) = r.toInt
                seen += 1
              }
              val next = HllState(st.regs, seen)
              state.update(next)
              HllUpdate(hour,
                next.regs.count(_ == 0).toLong,
                next.regs.map(graft.operators.HllSketch.sTerm).sum,
                seen)
          }
        val q = updates.toDF
          .writeStream.format("memory").queryName(name)
          .outputMode("update")
          .option("checkpointLocation", root.resolve("ck").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // bounded drain: hours × batches update rows; newest fold wins
      val finalRows = spark.table(name)
        .groupBy("hour")
        .agg(max_by(struct(col("vZero"), col("sScaled")), col("nSeen")).as("s"))
        .select(col("hour"), col("s.vZero").as("v_zero"), col("s.sScaled").as("s_scaled"))
      val served = graft.operators.HllSketch.estimateFromCounts(finalRows)
        .orderBy("hour")
      val schema = served.schema
      val rows = served.collect()
      spark.catalog.dropTempView(name)
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } finally rmTree(root)
  }

  /** LATE / OUT-OF-ORDER data under the streaming gate — the one
    * semantics family the time-ordered replays deliberately sidestep
    * (their buckets arrive in event-time order, so the watermark never
    * drops a row). This replay streams the SAME 1-hour rollup as
    * [[windowedReplay]] but in APPEND mode with a 1 h watermark, and
    * delivers the time slices OUT OF ORDER: slice 0, slice 1, then
    * slice 3 in two halves — and slice 2 LAST, after slice 3 has
    * advanced the watermark to `hi − 1 h`. Every slice-2 row is then
    * strictly late at arrival and is DROPPED by the watermark filter
    * before it reaches the aggregation state. The reference's entire
    * test philosophy is exactly this reordering chaos
    * (src/labrpc/labrpc.go:241-245 delays and reorders RPCs by
    * 200-2200 ms); this is its event-time form.
    *
    * The drop/emit rules — empirically pinned by
    * StreamingBoundarySpec with deliberate-tie fixtures, because TWO
    * of them are not what the docs suggest:
    *
    *  - the late-row filter runs against the PREVIOUS micro-batch's
    *    watermark, not the one just advanced by the previous batch's
    *    data (one-batch lag; when the engine idles, a no-data batch
    *    closes the gap, but back-to-back AvailableNow file batches
    *    never idle). Hence the slice-3 SPLIT: slice 2 must arrive two
    *    batches after the watermark-advancing data, or nothing is
    *    dropped. The filter itself is strict — dropped iff
    *    `ts_ms < wm_ms`; a row AT the watermark survives — and here
    *    the margin is vacuously wide (slice-3a's max is half a slice
    *    above all of slice 2, enforced by the require below);
    *  - window EMISSION in Append mode is NON-strict: a window is
    *    emitted iff `end_ms ≤ wm_ms`, with the terminal watermark
    *    `wm = floor(hi_µs/1000) − 3 600 000 ms` (watermarks are
    *    millisecond-plane; note the asymmetry — row drop is strict,
    *    eviction is not). Windows strictly above the terminal
    *    watermark hold un-emitted state that is discarded at query
    *    stop.
    *
    * So: final table = the rollup of the ON-TIME slices (0, 1, 3)
    * restricted to windows with `end ≤ hi_ms − 1 h`. Windows straddling
    * the slice-1/2 and 2/3 boundaries are emitted with PARTIAL counts
    * (their late rows dropped) — the non-trivial evidence the gate
    * exists for; StreamingSpec pins that at least one emitted window
    * lost rows. Bounded final read (emitted windows grid), as
    * [[windowedReplay]]. */
  def windowedLateReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val inDir = cachedFixture(sfDir, "tev-late") { fixDir =>
      val nSlices = 4
      val ev = graft.Tables.events(spark, sfDir)
      val (e, lo, hi, bucket) = timeSliced(
        ev.select(graft.Tables.eventTime(ev).as("ts_utc"), col("event_type"),
          col("value"), graft.Tables.eventMicros(ev).as("tsu")), nSlices)
      val slices = lateSliceFilters(e, lo, hi, bucket, nSlices)
      writeBuckets(slices.map(s =>
        e.filter(s).select("ts_utc", "event_type", "value")), fixDir)
      graft.pipeline.Dedup.freeCheckpoint(e)
    }
    val root = java.nio.file.Files.createTempDirectory("graft_stream_late_")
    try {
      val src = spark.readStream
        .schema("ts_utc TIMESTAMP, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/b*")
      val agg = src
        .withWatermark("ts_utc", "1 hour")
        .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("total"))
      val name = s"stream_hourly_late_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, statePartitionsFor(sfDir)) {
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", root.resolve("ck").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val schema = spark.table(name).schema
      val rows = spark.table(name).collect() // emitted windows grid — bounded
      spark.catalog.dropTempView(name)
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } finally rmTree(root)
  }

  /** Arrival-order filters for the late replays — slices 0, 1, then
    * slice 3 split at its time midpoint (3a advances the watermark
    * past all of slice 2; 3b is the buffer batch that retires the
    * one-batch late-filter lag), then slice 2 LAST, provably late.
    * The drop must be a THEOREM on the data, not a hope: every
    * slice-2 row is required strictly below slice-3a's watermark
    * (ms plane), else this fails loudly. */
  private def lateSliceFilters(e: DataFrame, lo: Long, hi: Long,
      bucket: Column, nSlices: Int): Seq[Column] = {
    val width = (hi - lo) / nSlices + 1
    val mid3 = lo + 3 * width + (hi - (lo + 3 * width)) / 2
    val slices = Seq(
      bucket === 0L, bucket === 1L,
      bucket === 3L && col("tsu") < mid3,
      bucket === 3L && col("tsu") >= mid3,
      bucket === 2L)
    val m = e.agg(
      max(when(slices(2), col("tsu"))).as("max3a"),
      max(when(slices(4), col("tsu"))).as("max2")).head()
    require(!m.isNullAt(0) && !m.isNullAt(1) &&
      m.getLong(1) / 1000 < m.getLong(0) / 1000 - 3600000L,
      s"slice-2 max ${m.get(1)} not strictly below slice-3a watermark " +
        s"(${m.get(0)} - 1h): late-ness would be data-dependent")
    slices
  }

  /** LATE data through the SESSIONIZATION family — the same
    * out-of-order delivery as [[windowedLateReplay]] (slices 0, 1, 3a,
    * 3b, then 2 provably late) driven through
    * [[LiveKV.sessionize]]'s flatMapGroupsWithState + event-time
    * timeout. The stateful operator's late filter drops every slice-2
    * row before it reaches any group state (same pinned rules: lagged
    * watermark — hence the 3b buffer batch — strict ts < wm), so the
    * drained result is the gap-split session table of the ON-TIME
    * slices only: users whose slice-2 events vanished get the session
    * boundaries their remaining events imply (a session spanning the
    * hole merges or splits purely by the 30-min gap rule on what
    * survived), and the usual Append emission rule applies — every
    * session except a user's last, which needs the terminal watermark
    * strictly past end + gap (timers fire mid-stream too: the
    * inter-slice jumps far exceed the gap, so most sessions close by
    * timeout between batches; emitted either way). Oracle: the
    * stream_sessions SQL over the slice-filtered event set, watermark
    * from ALL events. */
  def sessionLateReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val inDir = cachedFixture(sfDir, "sess-late") { fixDir =>
      val nSlices = 4
      val ev = graft.Tables.events(spark, sfDir)
      val (e, lo, hi, bucket) = timeSliced(
        ev.select(col("user_id"), graft.Tables.eventTime(ev).as("ts_utc"),
          graft.Tables.eventMicros(ev).as("tsu")), nSlices)
      val slices = lateSliceFilters(e, lo, hi, bucket, nSlices)
      writeBuckets(slices.map(s => e.filter(s).select("user_id", "ts_utc")), fixDir)
      graft.pipeline.Dedup.freeCheckpoint(e)
    }
    val root = java.nio.file.Files.createTempDirectory("graft_stream_sess_late_")
    try {
      val name = s"stream_sessions_late_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, statePartitionsFor(sfDir)) {
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
    } finally rmTree(root)
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
    * STRICTLY passed lastEvent + gap — `timeout < wm`, pinned by
    * StreamingBoundarySpec's deliberate-tie fixture; the trailing
    * no-data micro-batch fires the last round of timers). So the
    * streamed result is every batch session EXCEPT a user's final one
    * when that session's lastEvent + gap has not been strictly passed
    * by the terminal watermark (max event time − delay). Timestamps
    * are milliseconds (SessionEvent folds java.sql.Timestamp.getTime —
    * µs truncated), matching DuckDB's epoch_ms().
    *
    * The memory sink + final read are bounded by the CLOSED-session
    * count (≪ event count; production writes a parquet sink — the
    * operator under test is identical). */
  def sessionReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    import spark.implicits._
    val inDir = cachedFixture(sfDir, s"sess-$nBatches") { fixDir =>
      val ev = graft.Tables.events(spark, sfDir)
      val (e, _, _, bucket) = timeSliced(
        ev.select(col("user_id"), graft.Tables.eventTime(ev).as("ts_utc"),
          graft.Tables.eventMicros(ev).as("tsu")), nBatches)
      writeBuckets((0 until nBatches).map(b =>
        e.filter(bucket === b).select("user_id", "ts_utc")), fixDir)
      graft.pipeline.Dedup.freeCheckpoint(e)
    }
    val root = java.nio.file.Files.createTempDirectory("graft_stream_sessions_")
    try {
      val name = s"stream_sessions_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, statePartitionsFor(sfDir)) {
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
    } finally rmTree(root)
  }

  /** Driver-visible STREAM-STATIC ENRICHMENT JOIN — the fifth
    * streaming family under the gate (after the fold, the windowed
    * aggregation, sessionization and the stream-stream join), and the
    * single most common production streaming shape: a fact stream
    * joined per micro-batch against a SLOW dimension table (purchases
    * × customer → market segment), then rolled up statefully.
    *
    * The join itself is STATELESS — each micro-batch hash-joins
    * against the static side with no state store and no watermark; the
    * `broadcast` hint makes it a BroadcastHashJoin inside every
    * micro-batch (the dimension ships to executors once per batch —
    * at 100 TB/day stream scale the dimension is still dimension-
    * sized, so broadcast stays the right strategy; a fact-sized
    * "dimension" would instead become a stream-stream join). The
    * Complete-mode segment rollup AFTER the join is where cross-batch
    * state genuinely accumulates, so the replay exercises
    * join-then-stateful-agg, not just the join. Determinism: stateless
    * join + Complete-mode agg are arrival-order independent — the
    * drained table equals the batch join+rollup (the oracle SQL)
    * regardless of micro-batching; time-ordered buckets are kept only
    * so the fixture shape matches the other replays. Exact arithmetic:
    * purchase values fold as integer cents. Final read bounded by the
    * segment domain (5 rows), never the event count. */
  def staticJoinReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    val inDir = cachedFixture(sfDir, s"enrich-$nBatches") { fixDir =>
      val ev = graft.Tables.events(spark, sfDir)
      val (e, _, _, bucket) = timeSliced(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"),
            round(col("value") * 100).cast("long").as("cents"),
            graft.Tables.eventMicros(ev).as("tsu")), nBatches)
      writeBuckets((0 until nBatches).map(b =>
        e.filter(bucket === b).select("user_id", "cents")), fixDir)
      graft.pipeline.Dedup.freeCheckpoint(e)
    }
    val root = java.nio.file.Files.createTempDirectory("graft_stream_enrich_")
    try {
      val dim = broadcast(graft.Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment")))
      val src = spark.readStream
        .schema("user_id LONG, cents LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/b*")
      val agg = src.join(dim, col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      val name = s"stream_static_join_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, statePartitionsFor(sfDir)) {
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", root.resolve("ck").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val schema = spark.table(name).schema
      val rows = spark.table(name).collect() // segment domain — bounded
      spark.catalog.dropTempView(name)
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } finally rmTree(root)
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
  /** SHARED interval-join fixtures — the round-12 harness-tax cut:
    * the four interval-join drains used to build four near-identical
    * 5-bucket fixtures PER INVOCATION (the fixture write was ~24 s of
    * the 168 s r11 bench for this one family). The ordered fixture
    * (time-ordered buckets + the watermark-flush sentinel bucket) is
    * byte-reusable by ALL THREE ordered drains — inner, leftOuter,
    * fullOuter — and across bench passes, so it is built once per
    * (sfDir, nBatches) per session and cached here; the late variant
    * caches its own out-of-order fixture the same way. Cached roots
    * are deleted by a JVM shutdown hook (the per-drain scratch —
    * checkpoints, memory sinks — stays per-invocation as before: that
    * is the OPERATOR cost the bench exists to measure; in production
    * the source is a standing log, and a per-query fixture write is
    * pure harness).
    *
    * Sentinel-sharing safety for the INNER drain: the sentinel rows
    * (far-future ts, negative NON-MATCHING users -1/-2) can never
    * produce a join match, and an inner interval join's watermark
    * bounds STATE, not emission — so draining the 5-bucket fixture
    * emits exactly the 4-bucket matches (the output filter on
    * negative ids is belt-and-braces). Verified row-identical to the
    * unshared fixture by the unchanged batch oracle. */
  private val fixtureCache =
    new scala.collection.concurrent.TrieMap[(String, String), java.nio.file.Path]()
  private val fixtureRoots =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      fixtureRoots.forEach(p =>
        try rmTree(p) catch { case _: java.io.IOException => () })
    }))
  }

  /** Build the bucket dir for (sfDir, kind) once per session; later
    * calls serve the cached dir. `kind` names the bucket CONTENT
    * (projection + slicing + batch count) — two replays may share a
    * kind only when their buckets are row-identical (windowedReplay /
    * ivmReplay, and the three ordered interval-join drains, do).
    * Only for fixtures that are a pure function of sfDir — replays
    * taking caller-supplied datasets (the op-log family) stay
    * per-invocation. */
  private def cachedFixture(sfDir: String, kind: String)(
      build: java.nio.file.Path => Unit): java.nio.file.Path =
    fixtureCache.getOrElseUpdate((sfDir, kind), {
      val root = java.nio.file.Files.createTempDirectory(s"graft_fixture_${kind}_")
      fixtureRoots.add(root)
      val inDir = root.resolve("in")
      build(inDir)
      inDir
    })

  /** Drop (and delete from disk) every cached fixture built for
    * `sfDir` — the per-rung release a ladder harness calls when a
    * scale rung completes: fixtures are keyed by corpus dir and a
    * finished rung never returns to its corpus, so holding its bucket
    * dirs (10M-event parquet at the 100× rung) until JVM shutdown is
    * pure scratch-disk growth (ScaleBench's per-rung free, r14 advice
    * #4 — session caches accumulated across rungs OOM'd the default
    * driver heap). Safe mid-session: the next request for a dropped
    * (sfDir, kind) simply rebuilds. */
  def dropCachedFixtures(sfDir: String): Unit =
    fixtureCache.keys.filter(_._1 == sfDir).foreach { key =>
      fixtureCache.remove(key).foreach { inDir =>
        val root = inDir.getParent
        fixtureRoots.remove(root)
        try rmTree(root) catch { case _: java.io.IOException => () }
      }
    }

  /** Time-ordered (purchase|click) buckets + sentinel bucket, built
    * once per session per (sfDir, nBatches). Returns the bucket dir. */
  private def orderedIntervalFixture(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, nBatches: Int): java.nio.file.Path =
    cachedFixture(sfDir, s"ssj-$nBatches") { inDir =>
      import spark.implicits._
      val ev = graft.Tables.events(spark, sfDir)
      val (e, _, hi, bucket) = timeSliced(
        ev.select(col("event_id"), col("user_id"), col("event_type"),
          graft.Tables.eventTime(ev).as("ts_utc"),
          graft.Tables.eventMicros(ev).as("tsu"))
          .filter(col("event_type").isin("click", "purchase")), nBatches)
      // watermark-flush sentinel (see intervalJoinOuterReplay): +10 h,
      // one per side so the min-across-sides watermark advances
      val sentinelTs = new java.sql.Timestamp(hi / 1000 + 36000000L)
      val sentinels = Seq(
        (-1L, -1L, "purchase", sentinelTs),
        (-2L, -2L, "click", sentinelTs))
        .toDF("event_id", "user_id", "event_type", "ts_utc")
      writeBuckets((0 until nBatches).map(b =>
        e.filter(bucket === b).select("event_id", "user_id", "event_type", "ts_utc"))
        :+ sentinels, inDir)
      graft.pipeline.Dedup.freeCheckpoint(e)
    }

  def intervalJoinReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    val inDir = orderedIntervalFixture(spark, sfDir, nBatches)
    val root = java.nio.file.Files.createTempDirectory("graft_stream_ssj_")
    try {
      drainIntervalJoin(spark, inDir, root,
        s"stream_interval_join_${runCounter.incrementAndGet()}",
        stateParts = statePartitionsFor(sfDir))
        .filter(col("purchase_id") >= 0) // sentinel can't match; belt-and-braces
    } finally rmTree(root)
  }

  /** Build + drain the purchase×click interval join over the bucket
    * files under `inDir` — shared by the time-ordered, late and
    * left-outer replays. `outer` switches the join type; the result
    * frame keeps null ids (built via createDataFrame, not a typed
    * tuple map, for exactly that reason). user_id coalesces across
    * sides so fullOuter's click-only rows carry it too (a no-op for
    * inner/leftOuter, where p_user is never null). */
  private def drainIntervalJoin(spark: org.apache.spark.sql.SparkSession,
      inDir: java.nio.file.Path, root: java.nio.file.Path, name: String,
      joinType: String = "inner",
      stateParts: Int = StatePartitions): DataFrame = {
    withShufflePartitions(spark, stateParts) {
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
          expr("c_user = p_user AND c_ts BETWEEN p_ts - INTERVAL 30 MINUTES AND p_ts"),
          joinType)
        .select(col("p_id").as("purchase_id"), col("c_id").as("click_id"),
          coalesce(col("p_user"), col("c_user")).as("user_id"))
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", root.resolve("ck").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val rows = spark.table(name).collect() // in-window pair count — bounded
    val outSchema = spark.table(name).schema
    spark.catalog.dropTempView(name)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), outSchema)
  }

  /** LEFT OUTER stream-stream interval join — the join family's
    * eviction-driven half: a matched pair emits like the inner join,
    * but an UNMATCHED purchase emits its null-click row only when the
    * join watermark passes its entire match window (state eviction IS
    * the emission trigger — the engine can't know "no click will
    * come" any earlier). A plain drain would therefore under-emit: the
    * final batch's purchases still sit in state, null rows pending,
    * when AvailableNow terminates. The replay closes that window with
    * a WATERMARK-FLUSH SENTINEL bucket — one far-future row per side
    * (the join's watermark is the MIN across sides, so BOTH must
    * advance), non-matching negative users — appended after the real
    * time-ordered buckets: the final no-data batch then evicts every
    * real purchase and emits its verdict. Statically sufficient:
    * sentinel ts = hi + 10 h, so watermark = hi + 9 h > any
    * p_ts + 30 min. The sentinel purchase itself can never flush
    * (nothing is above it) and is filtered by id; drained result =
    * the batch LEFT JOIN exactly. */
  def intervalJoinOuterReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    val inDir = orderedIntervalFixture(spark, sfDir, nBatches)
    val root = java.nio.file.Files.createTempDirectory("graft_stream_ssj_outer_")
    try {
      drainIntervalJoin(spark, inDir, root,
        s"stream_interval_join_outer_${runCounter.incrementAndGet()}", "leftOuter",
        stateParts = statePartitionsFor(sfDir))
        .filter(col("purchase_id") >= 0) // drop the flush sentinel
    } finally rmTree(root)
  }

  /** FULL OUTER stream-stream interval join — both sides' unmatched
    * verdicts under the same eviction-is-emission rule
    * ([[intervalJoinOuterReplay]], StreamingBoundarySpec fact 5):
    * matched pairs emit like the inner join; an unmatched PURCHASE
    * emits (p, null) and an unmatched CLICK emits (null, c), each when
    * the global watermark passes its entire match window. The same
    * per-side sentinel bucket flushes both directions (the sentinels
    * themselves can never flush — nothing is above them — and are
    * filtered by their negative ids). Drained = the batch FULL JOIN
    * with pre-filtered sides. */
  def intervalJoinFullReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int = 4): DataFrame = {
    val inDir = orderedIntervalFixture(spark, sfDir, nBatches)
    val root = java.nio.file.Files.createTempDirectory("graft_stream_ssj_full_")
    try {
      drainIntervalJoin(spark, inDir, root,
        s"stream_interval_join_full_${runCounter.incrementAndGet()}", "fullOuter",
        stateParts = statePartitionsFor(sfDir))
        .filter(coalesce(col("purchase_id"), lit(0L)) >= 0 &&
          coalesce(col("click_id"), lit(0L)) >= 0) // drop both flush sentinels
    } finally rmTree(root)
  }

  /** LATE data through the STREAM-STREAM join — the third event-time
    * stateful family under disorder (after the windowed aggregation
    * and sessionization): the same out-of-order slice delivery, both
    * join sides watermarked. The join's watermark is the MIN across
    * the two sides' watermark nodes (multipleWatermarkPolicy=min, the
    * default), so the lateness theorem is checked PER KIND: every
    * slice-2 row must sit strictly below BOTH kinds' slice-3a
    * watermark — then both input filters drop all of slice 2 (same
    * pinned lag/strictness rules), and among the surviving time-
    * ordered batches no needed row is evicted early (the
    * [[intervalJoinReplay]] eviction argument, unchanged). Drained
    * result = the batch join over the on-time slices; pairs whose
    * click fell in slice 2 are the observable loss. */
  def intervalJoinLateReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    // out-of-order fixture, cached per session like the ordered one
    // (the lateness-margin require runs at build time — a property of
    // the TABLE, unchanged between passes)
    val inDir = cachedFixture(sfDir, "ssj-late") { fixDir =>
      val nSlices = 4
      val ev = graft.Tables.events(spark, sfDir)
      val (e, lo, hi, bucket) = timeSliced(
        ev.select(col("event_id"), col("user_id"), col("event_type"),
          graft.Tables.eventTime(ev).as("ts_utc"),
          graft.Tables.eventMicros(ev).as("tsu"))
          .filter(col("event_type").isin("click", "purchase")), nSlices)
      val slices = lateSliceFilters(e, lo, hi, bucket, nSlices)
      // per-kind tightening: the global watermark after slice 3a is
      // min over the two sides' maxes
      val mk = e.agg(
        max(when(slices(2) && col("event_type") === "purchase", col("tsu"))).as("p3a"),
        max(when(slices(2) && col("event_type") === "click", col("tsu"))).as("c3a"),
        max(when(slices(4), col("tsu"))).as("max2")).head()
      require(!mk.isNullAt(0) && !mk.isNullAt(1) && !mk.isNullAt(2) &&
        mk.getLong(2) / 1000 < math.min(mk.getLong(0), mk.getLong(1)) / 1000 - 3600000L,
        s"slice-2 max ${mk.get(2)} not strictly below BOTH kinds' slice-3a " +
          s"watermark (purchase ${mk.get(0)}, click ${mk.get(1)}, -1h): " +
          "join lateness would be data-dependent")
      writeBuckets(slices.map(s =>
        e.filter(s).select("event_id", "user_id", "event_type", "ts_utc")), fixDir)
      graft.pipeline.Dedup.freeCheckpoint(e)
    }
    val root = java.nio.file.Files.createTempDirectory("graft_stream_ssj_late_")
    try {
      drainIntervalJoin(spark, inDir, root,
        s"stream_interval_join_late_${runCounter.incrementAndGet()}",
        stateParts = statePartitionsFor(sfDir))
    } finally rmTree(root)
  }

  /** Run the op log through the streaming path; return final
    * (key, value) state. Blocking (AvailableNow drains the source and
    * terminates). */
  /** Resolve the bucket dir for an op-log replay: cached per
    * (cacheKey, kind) when the CALLER vouches the ops are a pure
    * function of that key (KVQueries passes the source dir; specs
    * with synthetic logs pass None and keep per-invocation
    * fixtures). Returns (bucket dir, per-run scratch root). */
  private def opFixture(kind: String, cacheKey: Option[String])(
      build: java.nio.file.Path => Unit): (java.nio.file.Path, java.nio.file.Path) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_stream_${kind}_")
    // callers enter their try/finally only after we return — a build
    // failure here would otherwise leak the freshly created scratch
    // root for the JVM lifetime (cached roots are shutdown-hooked,
    // scratch roots are not)
    val inDir = try {
      cacheKey match {
        case Some(k) => cachedFixture(k, kind)(build)
        case None =>
          val d = root.resolve("in"); build(d); d
      }
    } catch { case e: Throwable => rmTree(root); throw e }
    (inDir, root)
  }

  def stateReplay(ops: Dataset[Op], nBatches: Int = 4,
      cacheKey: Option[String] = None): DataFrame = {
    val spark = ops.sparkSession
    import spark.implicits._
    require(nBatches >= 1, "nBatches must be positive")
    // stateTableReplay shares this fixture kind: both stream the same
    // deduped bucketed write log
    val (inDir, root) = opFixture(s"oplog-writes-$nBatches", cacheKey)(
      bucketedWriteLog(ops, nBatches, _))
    try {
      // 2. stream the buckets through the live fold, one per batch
      val name = s"stream_state_replay_${runCounter.incrementAndGet()}"
      val src = spark.readStream
        .schema(spark.read.parquet(s"$inDir/b*").schema)
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
    } finally rmTree(root)
  }

  /** The IN-STREAM exactly-once gate under the oracle gate — K4's
    * streaming form. [[stateReplay]] deliberately dedups BATCH-side
    * (its fold output depends on WHICH duplicate survives, and
    * streaming dropDuplicates keeps first ARRIVAL — partition-order-
    * dependent within a micro-batch); this replay gates the streaming
    * dedup state store itself instead, on outputs that are SURVIVOR-
    * INSENSITIVE: the raw op log (no batch-side dedup, gets included)
    * streams through `dropDuplicates(clientId, reqId)` across 4
    * seq-ordered micro-batches, and the drained pair set is rolled up
    * per client as (n distinct requests, max request id) — functions
    * of pair IDENTITY only, identical whichever duplicate the state
    * store admitted first. Oracle: the same rollup over the dedup CTE
    * (one row per pair by construction).
    *
    * The Append-mode memory sink holds one row per DISTINCT
    * (clientId, reqId) — bounded by the client × reqId session domain
    * (the reference's dedup table bound, src/kvraft/server.go:72-80),
    * never the op count; production replaces it with the ack-table
    * parquet sink. The per-client rollup is aggregated BEFORE the
    * bounded driver read. */
  def dedupReplay(ops: Dataset[Op], nBatches: Int = 4,
      cacheKey: Option[String] = None): DataFrame = {
    val spark = ops.sparkSession
    require(nBatches >= 1, "nBatches must be positive")
    val (inDir, root) = opFixture(s"oplog-raw-$nBatches", cacheKey) { fixDir =>
      val log = ops.toDF.localCheckpoint(true)
      val maxSeqRow = log.agg(max("seq")).head()
      val maxSeq = if (maxSeqRow.isNullAt(0)) 0L else maxSeqRow.getLong(0)
      val width = math.max(maxSeq / nBatches + 1, 1L)
      val bucket = least((col("seq").cast("decimal(25,0)") / width).cast("long"),
        lit(nBatches - 1L))
      writeBuckets((0 until nBatches).map(b => log.filter(bucket === b)), fixDir)
      graft.pipeline.Dedup.freeCheckpoint(log)
    }
    try {
      val name = s"stream_dedup_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, StatePartitions) {
        val src = spark.readStream
          .schema(spark.read.parquet(s"$inDir/b*").schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$inDir/b*")
        val q = src.dropDuplicates("clientId", "reqId")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", root.resolve("ck").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val rollup = spark.table(name)
        .groupBy(col("clientId").as("client_id"))
        .agg(count(lit(1)).as("n_reqs"), max("reqId").as("max_req_id"))
      val schema = rollup.schema
      val rows = rollup.collect() // client domain — bounded
      spark.catalog.dropTempView(name)
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } finally rmTree(root)
  }

  /** Dedup-state EVICTION under the oracle gate —
    * `dropDuplicatesWithinWatermark`, the form whose state is BOUNDED
    * (the reason in-stream dedup survives 100 TB: plain
    * dropDuplicates keeps every key forever; the within-watermark
    * variant expires a key once the watermark passes its event time +
    * delay, trading unbounded memory for a re-admission window).
    * Both sides of the trade are gated here:
    *
    *  - RE-ADMIT plants: for clients ≡ 0 (mod 5) whose first request
    *    sits early in bucket 0, a duplicate of that (clientId, reqId)
    *    pair arrives in the LAST micro-batch with a fresh event time.
    *    By then the key's state has been evicted, so the pair is
    *    emitted a SECOND time — n_emitted = n_reqs + 1.
    *  - SUPPRESS plants: for clients ≡ 1 (mod 5), the same duplicate
    *    shape arrives in the SAME batch at the SAME event time —
    *    state present, duplicate dropped, n_emitted = n_reqs.
    *
    * The oracle never simulates the watermark: the time layout makes
    * both outcomes THEOREMS under any of the engine's lag variants
    * (the `require`s below), the same discipline as the *_late
    * replays. Delay = w/8 s against bucket width w s: a re-admit
    * plant expires once the watermark clears s0 + 2·delay ≤ w/2 +
    * w/4 < m0 (the max event time of bucket 0 alone), so eviction is
    * certain two full batches before the re-arrival even under the
    * two-batch watermark lag StreamingBoundarySpec pins; the
    * re-arrival's own event time is the corpus max, so it can never
    * be filtered as late. The per-client rollup (emission count +
    * distinct requests) is survivor-insensitive, as stream_dedup's.
    */
  def dedupEvictReplay(ops: Dataset[Op], nBatches: Int = 4,
      cacheKey: Option[String] = None): DataFrame = {
    val spark = ops.sparkSession
    require(nBatches == 4, "margin arithmetic below is written for 4 buckets")
    // the watermark delay (w/8 s) is derived from the log's seq range
    // and must match the cached buckets — it rides the fixture cache
    // as a sibling file
    val (inDir, root) = opFixture(s"oplog-evict-$nBatches", cacheKey) { fixDir =>
      // one row per (clientId, reqId) batch-side: the planted rows are
      // the ONLY duplicates the stream sees, so emission counts are
      // exactly n_reqs + (1 per re-admitted plant)
      val base = graft.kv.KVEngine.dedup(ops).toDF
        .select(col("clientId"), col("reqId"), col("seq"))
        .localCheckpoint(true)
      val maxSeq = base.agg(max("seq")).head().getLong(0)
      val w = maxSeq / 4 + 1
      require(w / 8 >= 1, "log too small for a whole-second delay")
      // eviction-margin theorem: every plant has s0 < w/2, so
      // s0 + 2*delay < w/2 + w/4 — require bucket 0's max event time
      // beyond that, making the plant's state expire on bucket 0's
      // OWN watermark (two batches before the re-arrival)
      val m0 = base.filter(col("seq") < w).agg(max("seq")).head().getLong(0)
      require(m0 > w / 2 + w / 4 + 1,
        s"bucket 0 too sparse for the eviction margin (m0=$m0, w=$w)")
      val firsts = base.groupBy("clientId")
        .agg(min("seq").as("s0"), min_by(col("reqId"), col("seq")).as("req0"))
        .filter(col("s0") < w / 2)
        .localCheckpoint(true) // client-domain-sized
      val readmit = firsts.filter(col("clientId") % 5 === 0)
        .select(col("clientId"), col("req0").as("reqId"), lit(maxSeq).as("seq"))
      val suppress = firsts.filter(col("clientId") % 5 === 1)
        .select(col("clientId"), col("req0").as("reqId"), col("s0").as("seq"))
      require(readmit.count() > 0 && suppress.count() > 0,
        "plant groups empty — the eviction gate would be vacuous")
      val bucket = least((col("seq").cast("decimal(25,0)") / w).cast("long"),
        lit(nBatches - 1L))
      // seq + 1: this operator's late-drop is NON-STRICT (ts <= wm,
      // pinned by StreamingBoundarySpec — aggregations drop strictly)
      // and the initial watermark is epoch 0, so an event at exactly
      // t=0 would be dropped in the FIRST batch; the uniform 1 s shift
      // moves the whole layout off the origin without touching any
      // margin
      def withTs(df: DataFrame) =
        df.withColumn("ets", timestamp_micros((col("seq") + 1) * 1000000L))
      val frames = (0 until nBatches).map { b =>
        val slice = base.filter(bucket === b)
        val planted =
          if (b == 0) slice.unionByName(suppress)
          else if (b == nBatches - 1) slice.unionByName(readmit)
          else slice
        withTs(planted)
      }
      writeBuckets(frames, fixDir)
      java.nio.file.Files.writeString(fixDir.resolve("_delay_seconds"),
        (w / 8).toString)
      graft.pipeline.Dedup.freeCheckpoint(base)
    }
    try {
      val delaySec = java.nio.file.Files.readString(
        inDir.resolve("_delay_seconds")).trim.toLong
      val name = s"stream_dedup_evict_${runCounter.incrementAndGet()}"
      withShufflePartitions(spark, StatePartitions) {
        val src = spark.readStream
          .schema(spark.read.parquet(s"$inDir/b*").schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$inDir/b*")
        val q = src
          .withWatermark("ets", s"$delaySec seconds")
          .dropDuplicatesWithinWatermark("clientId", "reqId")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", root.resolve("ck").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // bounded final read: ≤ pair-domain + plants rows, rolled up
      // per client BEFORE the collect (client-domain-sized)
      val rollup = spark.table(name)
        .groupBy(col("clientId").as("client_id"))
        .agg(count(lit(1)).as("n_emitted"),
          countDistinct("reqId").as("n_reqs"))
      val schema = rollup.schema
      val rows = rollup.collect()
      spark.catalog.dropTempView(name)
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } finally rmTree(root)
  }

  /** Step 1 of the op-log replays, shared by [[stateReplay]] and
    * [[stateTableReplay]]: dedup the log batch-side, bucket the writes
    * by seq range into `nBatches` ordered files under `inDir` (see the
    * object scaladoc for why dedup is batch-side), and return the
    * (already-freed-from-checkpoint) writes frame for its schema. */
  private def bucketedWriteLog(ops: Dataset[Op], nBatches: Int,
      inDir: java.nio.file.Path): DataFrame = {
    // Folded ONCE into an eager checkpoint: the per-bucket writes are
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
    writeBuckets((0 until nBatches).map(b => writes.filter(bucket === b).toDF), inDir)
    graft.pipeline.Dedup.freeCheckpoint(writes.toDF) // buckets are on disk
    writes.toDF
  }

  /** The PRODUCTION streaming sink under the gate: the same bucketed
    * op-log replay as [[stateReplay]], but written through
    * [[LiveKV.stateTableSink]] — the shard-partitioned incremental
    * parquet state table (per-batch I/O bounded by touched shards,
    * atomic commit markers, per-shard GC) — and read back with
    * [[LiveKV.readStateTable]], so the gated read path is the on-disk
    * state table itself, not a memory sink. Oracle: the batch replay
    * SQL (the sink folds each micro-batch with
    * [[graft.kv.KVEngine.applyIncrement]], which shares the segment
    * monoid with the batch replay — identical final state by
    * construction). The state table, its commit markers and the
    * checkpoint are torn down after the bounded final read. */
  def stateTableReplay(ops: Dataset[Op], nBatches: Int = 4,
      cacheKey: Option[String] = None): DataFrame = {
    val spark = ops.sparkSession
    import spark.implicits._
    require(nBatches >= 1, "nBatches must be positive")
    // same fixture kind as stateReplay: both stream the deduped
    // bucketed write log (one cached build serves both)
    val (inDir, root) = opFixture(s"oplog-writes-$nBatches", cacheKey)(
      bucketedWriteLog(ops, nBatches, _))
    try {
      val stateDir = root.resolve("state").toString
      val src = spark.readStream
        .schema(spark.read.parquet(s"$inDir/b*").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/b*")
      withShufflePartitions(spark, StatePartitions) {
        val q = LiveKV.stateTableSink(src.as[Op], stateDir,
            root.resolve("ck").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // the RESULT is the on-disk table; localize it before teardown
      // (bounded by the key domain — the same bound as stateReplay)
      val rows = LiveKV.readStateTable(spark, stateDir).collect()
      rows.toSeq.map(r => (r.getString(0), r.getString(1))).toDF("key", "value")
    } finally rmTree(root)
  }
}
