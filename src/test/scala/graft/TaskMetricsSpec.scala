package graft

import graft.tools.TaskMetricsListener
import org.apache.spark.sql.functions._

/** Pins the properties the round-13 machine-independent bench metrics
  * rest on: deltas attribute a query's shuffle/task work to exactly
  * that query (the BusFlush drain works), an idle window deltas to
  * zero, and the CPU canary's workload is the pinned one. */
class TaskMetricsSpec extends SparkSpec {

  test("snapshot deltas attribute shuffle work to the window that did it") {
    val l = TaskMetricsListener.install(spark.sparkContext)
    val m0 = l.snapshot(spark.sparkContext)
    // a groupBy forces a real shuffle exchange
    spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy("event_type").agg(count(lit(1))).count()
    val d1 = l.snapshot(spark.sparkContext) - m0
    assert(d1.tasks > 0, "no tasks attributed to the query window")
    assert(d1.shuffleWrite > 0 && d1.shuffleRead > 0,
      s"groupBy produced no shuffle bytes: $d1")
    // records ride along with bytes (round 14: the work-vs-encoding
    // separator the byte-curve adjudication rests on). Shuffle byte
    // metrics are POST-compression, so lz4 on highly repetitive
    // narrow rows can legitimately dip below one byte per record —
    // the sanity bound is a generous compression ratio, not 1:1
    // (advice r14: the strict bound could flake on codec change)
    assert(d1.records > 0, s"groupBy produced no shuffle records: $d1")
    assert(d1.records <= (d1.shuffleRead + d1.shuffleWrite) * 64,
      s"implausibly many shuffle records for the byte volume: $d1")
    assert(d1.input > 0, "parquet scan produced no input bytes")
    // an idle window must delta to exactly zero — async task-end
    // events may not leak across the flush boundary
    val m1 = l.snapshot(spark.sparkContext)
    val d2 = l.snapshot(spark.sparkContext) - m1
    assert(d2 == TaskMetricsListener.Snap(0, 0, 0, 0, 0),
      s"idle window accumulated metrics: $d2")
  }

  test("snapshot deltas are additive across consecutive windows") {
    val l = TaskMetricsListener.install(spark.sparkContext)
    val m0 = l.snapshot(spark.sparkContext)
    spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy("event_type").count().count()
    val m1 = l.snapshot(spark.sparkContext)
    spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy("lang").count().count()
    val m2 = l.snapshot(spark.sparkContext)
    val whole = m2 - m0
    val parts = (m1 - m0) - (TaskMetricsListener.Snap(0, 0, 0, 0, 0) - (m2 - m1))
    assert(whole == parts, s"window deltas don't tile: $whole vs $parts")
  }

  test("materialize executes the DECLARED plan; count() measures a pruned one") {
    // the round-14 bench-action fix: under count() Catalyst prunes the
    // lag window (its output feeds nothing the count needs) and the
    // declared ORDER BY (EliminateSorts under an aggregate), so the
    // bench was timing a two-phase distinct, not sessionization. The
    // materialized plan must ship the full event rows through the
    // window exchange — strictly more shuffle records than the pruned
    // count plan, and at least one record per input event row.
    val l = TaskMetricsListener.install(spark.sparkContext)
    val q = SparkEntry.queries("ev_sessions")
    val nEvents = spark.read.parquet(s"$sf0001/events.parquet").count()
    val m0 = l.snapshot(spark.sparkContext)
    q(spark, sf0001).count()
    val viaCount = l.snapshot(spark.sparkContext) - m0
    val m1 = l.snapshot(spark.sparkContext)
    val rows = TaskMetricsListener.materialize(q(spark, sf0001))
    val viaFull = l.snapshot(spark.sparkContext) - m1
    assert(rows > 0, "materialize consumed no rows")
    assert(viaFull.records >= nEvents,
      s"window exchange did not ship the event rows: ${viaFull.records} < $nEvents")
    assert(viaFull.records > viaCount.records,
      s"materialize measured no more work than the pruned count: $viaFull vs $viaCount")
  }

  test("CPU canary runs the pinned workload (fold literal matches)") {
    // cpuCanarySec REQUIREs the fold internally — a drifted loop throws
    val sec = TaskMetricsListener.cpuCanarySec()
    assert(sec > 0.01 && sec < 30.0, s"canary time implausible: $sec s")
  }
}
