package graft

import graft.kv.{KVEngine, OpLog}
import graft.operators.{HllSketch, IncrementalAgg, MergeInto}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

/** The round-10 maintenance plane: CDC MERGE, incremental view
  * maintenance, the HLL distinct sketch, and SCD2 time travel. Each
  * test pins the ALGEBRAIC property the operator's 100 TB story
  * rests on (merge == recompute, sketch merges by max, history tiles
  * the seq line), not just a golden output.
  */
class MergeIvmHllSpec extends SparkSpec {
  import spark.implicits._

  private def ops = OpLog.fromEvents(Tables.events(spark, sf0001))

  // ---------------------------------------------------------------- MERGE

  test("MergeInto: insert, update, delete and no-op delete in one batch") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v")
    val changes = Seq(
      (2L, "B", 99L, "U"),  // update
      (4L, "d", 40L, "U"),  // insert
      (3L, "c", 0L, "D"),   // delete
      (9L, "x", 0L, "D"),   // delete of absent key: no-op
    ).toDF("k", "s", "v", "op")
    val out = MergeInto.merge(base, changes, Seq("k")).orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "a", 10L), (2L, "B", 99L), (4L, "d", 40L)))
  }

  test("MergeInto plans a single equi-join, never a nested loop") {
    val cents = floor(col("o_totalprice") * 100).cast("long")
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), cents.as("cents"))
    val base = ord.filter(col("o_orderkey") % 4 =!= 0)
    val changes = Tables.orders(spark, sf0001)
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_custkey"), (cents + 100000L).as("cents"),
        when(col("o_orderkey") % 9 === 0, "D").otherwise("U").as("op"))
    val merged = MergeInto.merge(base, changes, Seq("o_orderkey"))
    merged.collect() // materialize so AQE settles the final plan
    def bnlj(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect { case _: BroadcastNestedLoopJoinExec => 1 }.sum +
        p.collect { case a: AdaptiveSparkPlanExec => bnlj(a.executedPlan) }.sum
    assert(bnlj(merged.queryExecution.executedPlan) === 0)
  }

  test("MergeInto == drop-and-rebuild when changes carry the full truth") {
    // applying (every key as 'U') onto any base must equal the changes
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val base = ord.filter(col("o_orderkey") % 2 === 0)
    val changes = ord.withColumn("cents", col("cents") + 7L).withColumn("op", lit("U"))
    val merged = MergeInto.merge(base, changes, Seq("o_orderkey"))
    assert(merged.exceptAll(changes.drop("op")).isEmpty &&
      changes.drop("op").exceptAll(merged).isEmpty)
  }

  test("MergeInto is idempotent: re-applying the same CDC batch changes nothing") {
    // the property that makes MERGE retry-safe (at-least-once delivery
    // of a change batch must not corrupt the base)
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val base = ord.filter(col("o_orderkey") % 2 === 0)
    val changes = ord.filter(col("o_orderkey") % 3 === 0)
      .withColumn("cents", col("cents") + 5L)
      .withColumn("op", when(col("o_orderkey") % 9 === 0, "D").otherwise("U"))
    val once = MergeInto.merge(base, changes, Seq("o_orderkey")).localCheckpoint(true)
    val twice = MergeInto.merge(once, changes, Seq("o_orderkey"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  // ---------------------------------------------------------------- IVM

  test("IncrementalAgg: merge(partial(a), partial(b)) == partial(a ∪ b), any split") {
    val ev = Tables.events(spark, sf0001)
    for (mod <- Seq(2, 7)) {
      val a = ev.filter(col("event_id") % 10 < mod)
      val b = ev.filter(col("event_id") % 10 >= mod)
      val merged = IncrementalAgg.finalizeView(
        IncrementalAgg.merge(Seq(IncrementalAgg.partial(a), IncrementalAgg.partial(b))))
      val oneShot = IncrementalAgg.finalizeView(IncrementalAgg.partial(ev))
      assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty,
        s"split at $mod diverged from recompute")
    }
  }

  test("IncrementalAgg: folding a delta in twice must NOT equal once (merge is not idempotent)") {
    // guards against a merge that silently dedups — partials are
    // counts, double-folding must double-count
    val ev = Tables.events(spark, sf0001)
    val p = IncrementalAgg.partial(ev)
    val twice = IncrementalAgg.merge(Seq(p, p))
    val n1 = p.agg(sum("n")).as[Long].head()
    val n2 = twice.agg(sum("n")).as[Long].head()
    assert(n2 === 2 * n1)
  }

  // ---------------------------------------------------------------- HLL

  test("HllSketch registers: dense 256 per group, ranks within [0, 41]") {
    val ev = Tables.events(spark, sf0001)
    val regs = HllSketch.registers(ev, "event_type", "user_id")
    val perGroup = regs.groupBy("event_type").agg(
      count(lit(1)).as("n"), min("reg").as("mn"), max("reg").as("mx"))
      .as[(String, Long, Long, Long)].collect()
    val nTypes = ev.select("event_type").distinct().count()
    assert(perGroup.length === nTypes)
    perGroup.foreach { case (t, n, mn, mx) =>
      assert(n === 256, s"$t not dense")
      assert(mn >= 0 && mx <= 41, s"$t rank out of range")
    }
  }

  test("HllSketch registers merge by element-wise max (the 1000-executor fold)") {
    val ev = Tables.events(spark, sf0001)
    val a = HllSketch.registers(ev.filter(col("event_id") % 2 === 0), "event_type", "user_id")
    val b = HllSketch.registers(ev.filter(col("event_id") % 2 =!= 0), "event_type", "user_id")
    val folded = a.unionByName(b)
      .groupBy("event_type", "bucket").agg(max("reg").as("reg"))
    val whole = HllSketch.registers(ev, "event_type", "user_id")
    assert(folded.exceptAll(whole).isEmpty && whole.exceptAll(folded).isEmpty)
  }

  test("IVM x HLL: incrementally merged day sketches == one-shot day sketch") {
    val ev = Tables.events(spark, sf0001)
    val keyed = ev.select(to_date(Tables.eventTime(ev)).as("day"),
      col("user_id"), col("event_id"))
    val a = HllSketch.registers(keyed.filter(col("event_id") % 10 < 8), "day", "user_id")
    val b = HllSketch.registers(keyed.filter(col("event_id") % 10 >= 8), "day", "user_id")
    val merged = a.unionByName(b).groupBy("day", "bucket").agg(max("reg").as("reg"))
    val whole = HllSketch.registers(keyed, "day", "user_id")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("HllSketch estimate lands within 3 sigma (~20%) of exact distinct") {
    val ev = Tables.events(spark, sf0001)
    val est = HllSketch.estimate(HllSketch.registers(ev, "event_type", "user_id"), "event_type")
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("n_exact"))
    val rows = est.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_est"), col("n_exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, e, x) =>
      // p=8 -> se ~ 1.04/sqrt(256) = 6.5%; 3 sigma ~ 19.5%
      assert(math.abs(e - x).toDouble / x <= 0.20, s"$t: est $e vs exact $x")
    }
  }

  // ---------------------------------------------------------------- histogram

  test("HistogramSketch: merged slice histograms == one-shot histogram, any split") {
    val ev = Tables.events(spark, sf0001)
    val c = ev.select(col("event_type"),
      floor(col("value") * 100).cast("long").as("cents"), col("event_id"))
    val (lo, hi) = graft.operators.HistogramSketch.centsRange(c)
    for (mod <- Seq(3, 7)) {
      val a = graft.operators.HistogramSketch.partial(
        c.filter(col("event_id") % 10 < mod), "event_type", lo, hi)
      val b = graft.operators.HistogramSketch.partial(
        c.filter(col("event_id") % 10 >= mod), "event_type", lo, hi)
      val merged = graft.operators.HistogramSketch.merge("event_type", Seq(a, b))
      val whole = graft.operators.HistogramSketch.partial(c, "event_type", lo, hi)
      assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
        s"split at $mod diverged")
    }
  }

  test("HistogramSketch quantile sits within ONE bin below the exact quantile — deterministic bound") {
    val ev = Tables.events(spark, sf0001)
    val c = ev.select(col("event_type"),
      floor(col("value") * 100).cast("long").as("cents"))
    val (lo, hi) = graft.operators.HistogramSketch.centsRange(c)
    val binWidth = (hi - lo + 1) / graft.operators.HistogramSketch.Bins + 1
    val approx = graft.operators.HistogramSketch.quantiles(
      graft.operators.HistogramSketch.partial(c, "event_type", lo, hi),
      "event_type", lo, hi)
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("event_type").orderBy("cents")
    val cdf = c.withColumn("cum", count(lit(1)).over(wc))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
    val exs = Seq(50, 90, 99).map(q =>
      min(when(col("cum") * 100 >= col("n") * q, col("cents"))).as(s"e$q"))
    val exact = cdf.groupBy("event_type").agg(exs.head, exs.tail: _*)
    val rows = approx.join(exact, Seq("event_type"))
      .select(col("event_type"), col("e50") - col("p50"), col("e90") - col("p90"),
        col("e99") - col("p99"))
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, d50, d90, d99) =>
      Seq(d50, d90, d99).foreach { d =>
        assert(d >= 0 && d <= binWidth + 1, s"$t: quantile error $d outside one bin ($binWidth)")
      }
    }
  }

  // ---------------------------------------------------------------- standing tables

  test("StandingTable: persisted delta folds across restarts == one-shot partial (agg, hll, hist)") {
    val ev = Tables.events(spark, sf0001)
    val a = ev.filter(col("event_id") % 10 < 8)
    val b = ev.filter(col("event_id") % 10 >= 8)
    val root = java.nio.file.Files.createTempDirectory("graft_standing_").toString

    // IncrementalAgg partial: two swaps, served view == recompute
    graft.operators.StandingTable.updateAggPartial(s"$root/agg", a)
    graft.operators.StandingTable.updateAggPartial(s"$root/agg", b)
    val servedAgg = IncrementalAgg.finalizeView(spark.read.parquet(s"$root/agg"))
    val oneShotAgg = IncrementalAgg.finalizeView(IncrementalAgg.partial(ev))
    assert(servedAgg.exceptAll(oneShotAgg).isEmpty && oneShotAgg.exceptAll(servedAgg).isEmpty)

    // HLL registers: two swaps == one-shot register table
    graft.operators.StandingTable.updateHllRegisters(s"$root/hll", a, "event_type", "user_id")
    graft.operators.StandingTable.updateHllRegisters(s"$root/hll", b, "event_type", "user_id")
    val servedHll = spark.read.parquet(s"$root/hll")
    val oneShotHll = HllSketch.registers(ev, "event_type", "user_id")
    assert(servedHll.exceptAll(oneShotHll).isEmpty && oneShotHll.exceptAll(servedHll).isEmpty)

    // histogram: two swaps == one-shot bin counts (shared range)
    val c = ev.select(col("event_type"),
      floor(col("value") * 100).cast("long").as("cents"), col("event_id"))
    val (lo, hi) = graft.operators.HistogramSketch.centsRange(c)
    graft.operators.StandingTable.updateHistogram(
      s"$root/hist", c.filter(col("event_id") % 10 < 8), "event_type", lo, hi)
    graft.operators.StandingTable.updateHistogram(
      s"$root/hist", c.filter(col("event_id") % 10 >= 8), "event_type", lo, hi)
    val servedHist = spark.read.parquet(s"$root/hist")
    val oneShotHist = graft.operators.HistogramSketch.partial(c, "event_type", lo, hi)
    assert(servedHist.exceptAll(oneShotHist).isEmpty && oneShotHist.exceptAll(servedHist).isEmpty)
  }

  test("StandingTable.updateScd2: persisted change folds == in-memory scd2Apply chain") {
    val all = ops
    val deduped = KVEngine.dedup(all).toDF.localCheckpoint(true)
    val maxSeq = deduped.agg(max("seq")).as[Long].head()
    val (t1, t2) = (maxSeq / 3, 2 * maxSeq / 3)
    def lwwPuts(loEx: Long, hiIn: Long) = deduped
      .filter(col("seq") > loEx && col("seq") <= hiIn && col("kind") === "put")
      .groupBy("key")
      .agg(max("seq").as("seq"), max_by(col("value"), col("seq")).as("value"))
      .localCheckpoint(true)
    val (c1, c2, c3) = (lwwPuts(-1, t1), lwwPuts(t1, t2), lwwPuts(t2, maxSeq))
    val root = java.nio.file.Files.createTempDirectory("graft_scd2_standing_").toString
    val dir = s"$root/dim"
    graft.operators.StandingTable.updateScd2(dir, c1)
    graft.operators.StandingTable.updateScd2(dir, c2)
    graft.operators.StandingTable.updateScd2(dir, c3)
    val persisted = spark.read.parquet(dir)
    val inMemory = KVEngine.scd2Apply(KVEngine.scd2Apply(
      KVEngine.scd2Apply(persisted.limit(0), c1), c2), c3)
    assert(persisted.exceptAll(inMemory).isEmpty && inMemory.exceptAll(persisted).isEmpty)
    // lifecycle invariants hold on the persisted table too
    val opens = persisted.groupBy("key")
      .agg(sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_open"))
      .filter(col("n_open") =!= 1)
    assert(opens.isEmpty && persisted.count() > 0)
  }

  test("StandingTable recovers the MID-SWAP crash state (live dir missing)") {
    val ev = Tables.events(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft_midswap_").toString
    val dir = s"$root/agg"
    graft.operators.StandingTable.updateAggPartial(dir, ev.filter(col("event_id") % 10 < 5))
    val before = IncrementalAgg.finalizeView(spark.read.parquet(dir)).collect().toSeq

    // crash window A: after move(dir -> .old), before move(.staging -> dir):
    // staging holds the COMPLETE next generation, dir is absent
    graft.operators.StandingTable.updateAggPartial(dir, ev.filter(col("event_id") % 10 === 5))
    val gen2 = spark.read.parquet(dir).collect().toSeq
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".staging"))
    // a reader must promote staging and see generation 2, not emptiness
    val served = graft.operators.StandingTable.readOrEmpty(spark, dir,
      IncrementalAgg.partial(ev)).collect().toSeq
    assert(served.toSet == gen2.toSet && served.nonEmpty)

    // crash window B: dir absent, only .old present (rollback path)
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".old"))
    graft.operators.StandingTable.recover(dir)
    assert(spark.read.parquet(dir).collect().toSet == gen2.toSet)

    // and the next fold over the recovered state stays correct
    graft.operators.StandingTable.updateAggPartial(dir,
      ev.filter(col("event_id") % 10 >= 6))
    val full = IncrementalAgg.finalizeView(spark.read.parquet(dir))
    val oneShot = IncrementalAgg.finalizeView(IncrementalAgg.partial(ev))
    assert(full.exceptAll(oneShot).isEmpty && oneShot.exceptAll(full).isEmpty)
    assert(before.nonEmpty)
  }

  test("StandingTable swap recovers from crash remnants (stale .staging and .old dirs)") {
    val ev = Tables.events(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft_swapcrash_").toString
    val dir = s"$root/agg"
    graft.operators.StandingTable.updateAggPartial(dir, ev.filter(col("event_id") % 10 < 5))
    // simulate a crash that left BOTH remnants behind: a half-written
    // staging generation and a moved-aside old one
    val staging = java.nio.file.Paths.get(dir + ".staging")
    val old = java.nio.file.Paths.get(dir + ".old")
    java.nio.file.Files.createDirectory(staging)
    java.nio.file.Files.write(staging.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    java.nio.file.Files.createDirectory(old)
    // next fold must clear the remnants and land the correct result
    graft.operators.StandingTable.updateAggPartial(dir, ev.filter(col("event_id") % 10 >= 5))
    val served = IncrementalAgg.finalizeView(spark.read.parquet(dir))
    val oneShot = IncrementalAgg.finalizeView(IncrementalAgg.partial(ev))
    assert(served.exceptAll(oneShot).isEmpty && oneShot.exceptAll(served).isEmpty)
    assert(!java.nio.file.Files.exists(staging) && !java.nio.file.Files.exists(old))
  }

  test("StandingTable bootstrap crash: a partial FIRST staging write is discarded, not promoted") {
    // the ADVICE window: no live dir, no .old (first-ever fold), crash
    // mid-staging-write — the partial staging has no _SUCCESS and must
    // NOT be promoted as a generation
    val ev = Tables.events(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft_bootcrash_").toString
    val dir = s"$root/agg"
    val staging = java.nio.file.Paths.get(dir + ".staging")
    java.nio.file.Files.createDirectory(staging)
    java.nio.file.Files.write(staging.resolve("part-partial.parquet"), Array[Byte](1, 2, 3))
    // a reader sees EMPTY (not the junk generation) and the remnant is gone
    val like = IncrementalAgg.partial(ev)
    assert(graft.operators.StandingTable.readOrEmpty(spark, dir, like).isEmpty)
    assert(!java.nio.file.Files.exists(staging))
    // and the first real fold lands the correct generation from empty
    graft.operators.StandingTable.updateAggPartial(dir, ev)
    val served = IncrementalAgg.finalizeView(spark.read.parquet(dir))
    val oneShot = IncrementalAgg.finalizeView(IncrementalAgg.partial(ev))
    assert(served.exceptAll(oneShot).isEmpty && oneShot.exceptAll(served).isEmpty)
  }

  test("StandingTable recover() leaves a LIVE writer's in-flight swap alone") {
    // crash recovery is for DEAD writers: while the lock is held the
    // missing live dir is a swap in progress, and a racing reader's
    // recover() must not promote/rollback under the writer's renames
    val ev = Tables.events(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft_liveswap_").toString
    val dir = s"$root/agg"
    graft.operators.StandingTable.updateAggPartial(dir, ev)
    val gen = spark.read.parquet(dir).collect().toSet
    // simulate mid-swap: live moved to staging (complete), writer holds lock
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".staging"))
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(dir + ".lock"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    val fl = ch.tryLock()
    try {
      graft.operators.StandingTable.recover(dir)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)),
        "recover() promoted a generation under a live writer's lock")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".staging")))
    } finally { fl.release(); ch.close() }
    // writer died (lock released): recovery completes the swap as before
    graft.operators.StandingTable.recover(dir)
    assert(spark.read.parquet(dir).collect().toSet == gen)
  }

  test("StandingTable rejects a concurrent writer (single-writer lockfile)") {
    val ev = Tables.events(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft_lock_").toString
    val dir = s"$root/agg"
    graft.operators.StandingTable.updateAggPartial(dir, ev.filter(col("event_id") % 2 === 0))
    // hold the writer lock as "another ingest loop"...
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(dir + ".lock"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    val fl = ch.tryLock()
    try {
      // ...and a second fold must fail loudly instead of interleaving
      intercept[IllegalStateException] {
        graft.operators.StandingTable.updateAggPartial(dir, ev.filter(col("event_id") % 2 === 1))
      }
    } finally { fl.release(); ch.close() }
    // released: the fold goes through and the state is whole
    graft.operators.StandingTable.updateAggPartial(dir, ev.filter(col("event_id") % 2 === 1))
    val served = IncrementalAgg.finalizeView(spark.read.parquet(dir))
    val oneShot = IncrementalAgg.finalizeView(IncrementalAgg.partial(ev))
    assert(served.exceptAll(oneShot).isEmpty && oneShot.exceptAll(served).isEmpty)
  }

  // ---------------------------------------------------------------- SCD2

  test("SCD2 open rows ARE the live state (replay equivalence)") {
    val hist = KVEngine.scd2(ops)
    val open = hist.filter(col("valid_to").isNull).select("key", "value")
    val live = KVEngine.replay(ops)
    assert(open.exceptAll(live).isEmpty && live.exceptAll(open).isEmpty)
  }

  test("SCD2 snapshot at T == replay of the log truncated at T") {
    val all = ops
    val hist = KVEngine.scd2(all)
    val maxSeq = all.agg(max("seq")).as[Long].head()
    for (t <- Seq(maxSeq / 4, maxSeq / 2, maxSeq)) {
      val snap = KVEngine.snapshotAt(hist, t)
      val truncated = KVEngine.replay(all.filter(col("seq") <= t))
      assert(snap.exceptAll(truncated).isEmpty && truncated.exceptAll(snap).isEmpty,
        s"snapshot at $t diverged from truncated replay")
    }
  }

  test("scd2Apply: merged history still tiles, open rows == LWW overlay") {
    val all = ops
    val deduped = KVEngine.dedup(all)
    val t0 = deduped.agg(max("seq")).as[Long].head() / 2
    val hist = KVEngine.scd2(all.filter(col("seq") <= t0))
    val changes = deduped.toDF
      .filter(col("seq") > t0 && col("kind") === "put")
      .groupBy("key")
      .agg(max("seq").as("seq"), max_by(col("value"), col("seq")).as("value"))
      .localCheckpoint(true)
    val merged = KVEngine.scd2Apply(hist, changes).cache()
    try {
      // tiling: exactly one open row per key, closed rows chain
      val opens = merged.groupBy("key")
        .agg(sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_open"))
        .filter(col("n_open") =!= 1)
      assert(opens.isEmpty)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("key").orderBy("valid_from")
      val gaps = merged
        .withColumn("next_from", lead("valid_from", 1).over(w))
        .filter(col("valid_to").isNotNull && col("valid_to") =!= col("next_from"))
      assert(gaps.isEmpty)
      // open rows = change values where present, else the old opens
      val open = merged.filter(col("valid_to").isNull).select("key", "value")
      val expected = hist.filter(col("valid_to").isNull).select("key", "value")
        .join(changes.select(col("key"), col("value").as("c_value")), Seq("key"), "full_outer")
        .select(col("key"), coalesce(col("c_value"), col("value")).as("value"))
      assert(open.exceptAll(expected).isEmpty && expected.exceptAll(open).isEmpty)
    } finally merged.unpersist()
  }

  test("SCD2 intervals tile each key's seq line: contiguous, non-overlapping, one open row") {
    val hist = KVEngine.scd2(ops).cache()
    try {
      // exactly one open (valid_to IS NULL) row per key
      val opens = hist.groupBy("key")
        .agg(sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_open"))
        .filter(col("n_open") =!= 1)
      assert(opens.isEmpty)
      // every closed row's valid_to is exactly the next row's valid_from
      val w = org.apache.spark.sql.expressions.Window.partitionBy("key").orderBy("valid_from")
      val gaps = hist
        .withColumn("next_from", lead("valid_from", 1).over(w))
        .filter(col("valid_to").isNotNull && col("valid_to") =!= col("next_from"))
      assert(gaps.isEmpty)
    } finally hist.unpersist()
  }
}
