package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Physical-plan regression guards: the 100 TB story lives or dies on
  * these shapes (filters reaching the scan, dimensions broadcast,
  * partial aggregation, bounded shuffle counts). A passing answer with
  * the wrong plan is a regression these tests catch.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan

  private def collectAll[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] = {
    val here = p.collect(f)
    val inner = p.collect {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(f)
      case s: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq.empty[A]
    }.flatten
    here ++ inner
  }

  private def formatted(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("q6_filter: all predicates pushed to the parquet scan, pruned read schema") {
    val s = formatted("q6_filter")
    assert(s.contains("PushedFilters:"))
    assert(s.contains("GreaterThanOrEqual(l_shipdate"), s)
    assert(s.contains("GreaterThanOrEqual(l_discount,0.05)"), s)
    assert(s.contains("LessThan(l_quantity,24.0)"), s)
    // only the 4 needed columns are read
    val read = s.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(Seq("l_quantity", "l_extendedprice", "l_discount", "l_shipdate").forall(read.contains), read)
    assert(!read.contains("l_orderkey"), read)
  }

  test("q3/q5/part_revenue: dims broadcast stats-driven; no hints on linearly-growing tables") {
    Seq("q3_join", "q5_join", "part_revenue").foreach { q =>
      // at test sf every dim fits under the broadcast threshold, so
      // stats must still pick broadcast — but WITHOUT a forced hint on
      // customer/supplier/part (a hint would OOM at 100x; nation and
      // region are the only fixed-size tables allowed one)
      val s = formatted(q)
      assert(s.contains("BroadcastHashJoin"), s"$q lost its broadcast joins")
      assert(!s.contains("SortMergeJoin"), s"$q fell back to SMJ on a dimension")
      val df = SparkEntry.queries(q)(spark, sf0001)
      val hinted = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
        case r: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => r
      }
      // hints may exist only via nation/region (q5); q3/part_revenue
      // must have none at all
      if (q != "q5_join")
        assert(hinted.isEmpty, s"$q carries a join hint on a linearly-growing table:\n${df.queryExecution.analyzed}")
    }
  }

  test("wc_wordcount: partial aggregation before the shuffle") {
    val s = formatted("wc_wordcount")
    // partial + final pair: two HashAggregates around one Exchange
    assert("HashAggregate".r.findAllIn(s).size >= 2, s)
  }

  test("kv_state bounds its shuffles: dedup window + key fold + final sort only") {
    val p = plan("kv_state")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 3, s"kv_state grew to ${shuffles.size} shuffles:\n$p")
  }

  test("shard_routed: config history joined by broadcast, not shuffle") {
    val p = plan("shard_routed")
    val bcasts = collectAll(p) { case e: BroadcastExchangeExec => e }
    assert(bcasts.nonEmpty, s"config history must broadcast:\n$p")
  }

  test("sim_topk: probe side broadcast; corpus is not shuffled pre-join") {
    val s = formatted("sim_topk")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"), s)
  }

  test("ev_top_spenders: TakeOrderedAndProject bounds every window input (no global sort)") {
    val p = plan("ev_top_spenders")
    val topk = collectAll(p) { case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t }
    assert(topk.nonEmpty, s"top-k must plan as TakeOrderedAndProject:\n$p")
    // the rank window is allowed ONLY over the already-limited k rows:
    // a Window with an unlimited input is the global-sort shape r1 had
    val windows = collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    windows.foreach { w =>
      assert(w.find(_.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]).isDefined,
        s"Window over unlimited input (global sort came back):\n$p")
    }
  }

  test("dedup_jaccard: no broadcast hints on O(corpus) joins — sizes stay stats-driven (AQE broadcasts iff small)") {
    val df = SparkEntry.queries("dedup_jaccard")(spark, sf0001)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    // the ONLY permitted hint is the broadcast on the over-cap
    // blacklist anti-join (provably tiny: <= index/MaxShingleDf rows);
    // inner joins (intersection self-join, sizes joins) are O(corpus)
    // on at least one side and must never be force-broadcast
    joins.filter(_.joinType == org.apache.spark.sql.catalyst.plans.Inner).foreach { j =>
      assert(j.hint.leftHint.isEmpty && j.hint.rightHint.isEmpty,
        s"dedup_jaccard grew an inner-join hint (forced O(corpus) broadcast?):\n${df.queryExecution.optimizedPlan}")
    }
    // the df cap must survive optimization: an uncapped shingle index
    // re-opens the d^2/2 stop-shingle blowup
    assert(df.queryExecution.optimizedPlan.toString.contains(pipeline.Dedup.MaxShingleDf.toString),
      "MaxShingleDf cap vanished from the optimized plan")
  }

  test("dedup final plans scan documents exactly ONCE (exchange reuse shares the index/fingerprints)") {
    // the shingle index (jaccard), minhash signatures, and the simhash
    // fingerprint pipeline are each computed once and re-read via
    // ReusedExchange by every consumer (cap counts, both self-join
    // sides); a second FileScan in the FINAL adaptive plan means a
    // branch diverged (e.g. an inferred filter specialized one subtree)
    // and the whole corpus is being re-scanned and re-hashed
    Seq("dedup_jaccard", "dedup_minhash", "dedup_simhash_near").foreach { q =>
      // sf0.01 on purpose: PipelineSpec cache()s the sf0.001 documents
      // table in the shared session, and a cache hit rewrites the scan
      // to InMemoryTableScan with different AQE stats — the invariant
      // under test is the UNCACHED file-scan plan
      val df = SparkEntry.queries(q)(spark, SparkSpec.SF001)
      df.collect() // finalize AQE on THIS queryExecution
      val finalPlan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      if (finalPlan.contains("InMemoryTableScan")) {
        cancel(s"$q plan was cache-substituted by another suite — scan-count not meaningful")
      }
      val scans = "FileScan parquet".r.findAllIn(finalPlan).size
      // 1 = the defining exchange (scan under it) is stitched into the
      // final plan; 0 = it materialized in an EARLIER query stage and
      // every consumer in the final plan is a ReusedExchange reference
      // — even better, but only if the reuse is actually there
      assert(scans <= 1, s"$q reads documents ${scans}x — exchange reuse broken:\n$finalPlan")
      if (scans == 0)
        assert(finalPlan.contains("ReusedExchange"),
          s"$q: no scan and no ReusedExchange in the final plan:\n$finalPlan")
    }
  }

  test("dedup caps are skew-safe: no WindowExec in any dedup plan (two-phase groupBy blacklist)") {
    // a count-over-window on the skewed key itself moves every row of
    // a hot shingle/bucket into ONE task before the cap can drop it —
    // the r3 scale-killer; the cap must come from a partial-aggregating
    // groupBy.count + broadcast anti-join instead
    Seq("dedup_jaccard", "dedup_minhash", "dedup_simhash_near").foreach { q =>
      val p = plan(q)
      val windows = collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(windows.isEmpty, s"$q regressed to a window over the skewed key:\n$p")
    }
  }

  test("dedup_incremental: batch-vs-base joins only; cap is a groupBy blacklist, no window") {
    val p = plan("dedup_incremental")
    // the near tier must never self-join the base: every join in the
    // plan is either hash-membership (exact tier), band (batch->base),
    // the broadcast anti-join blacklist, or the final status assembly.
    // A base-base band join would show as >= 2 extra documents scans.
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("documents")) => f
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.table.name().contains("documents") => b
    }
    // the documented design: base is scanned twice (hash set, band
    // sigs) and batch three times (id list, hashes, band sigs), six
    // bounded passes total — each filter-pushed, so the expensive side
    // (base, at corpus scale) costs exactly its two declared reads. A
    // regressed base-vs-base candidate join would pull the band
    // subtree in twice more and push this count past the bound.
    assert(scans.size <= 6, s"dedup_incremental scans documents ${scans.size}x:\n$p")
    val windows = collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, s"dedup_incremental has a window on a skewed key:\n$p")
    // the base-side mega-bucket blacklist is a broadcast anti-join
    val joins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType.toString == "LeftAnti" => j
    }
    assert(joins.nonEmpty, s"dedup_incremental lost its broadcast anti-join blacklist:\n$p")
  }

  test("dedup_spans: df blacklist is a broadcast anti-join; only window is the doc-pair islands window") {
    val p = plan("dedup_spans")
    // exactly one WindowExec is allowed — the islands row_number over
    // (doc_a, doc_b, diag), whose partitions are bounded by DOCUMENT
    // length; a window keyed on the shingle itself would be the skewed
    // hot-key shape the two-phase blacklist exists to prevent
    val windows = collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size == 1, s"dedup_spans expected exactly the islands window:\n$p")
    assert(windows.head.partitionSpec.size == 3,
      s"islands window must partition by (doc_a, doc_b, diag):\n${windows.head}")
    val df = SparkEntry.queries("dedup_spans")(spark, sf0001)
    val antis = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antis.nonEmpty, s"dedup_spans lost its df blacklist anti-join:\n${df.queryExecution.optimizedPlan}")
    assert(df.queryExecution.optimizedPlan.toString.contains(pipeline.Dedup.MaxShingleDf.toString),
      "MaxShingleDf cap vanished from the optimized plan")
  }

  test("pipeline_keep_best: cluster argmax is an aggregate (max_by), not a window") {
    val p = plan("pipeline_keep_best")
    val windows = collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, s"pipeline_keep_best ranks clusters with a window:\n$p")
  }

  test("sim_ann_pairs: bucket self-join is capped (broadcast anti-join blacklist), no window on the bucket key") {
    // the r4 scale-killer: an UNCAPPED fixed-width bucket self-join is
    // ~N²/2^bits at corpus scale; the cap must be the same two-phase
    // groupBy.count blacklist the text-plane bands use — skew-safe
    // (partial aggregation) and applied BEFORE the self-join shuffle
    Seq("sim_ann_pairs").foreach { q =>
      val p = plan(q)
      val windows = collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(windows.isEmpty, s"$q counts buckets with a window over the skewed key:\n$p")
      val df = SparkEntry.queries(q)(spark, sf0001)
      val antis = df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
      }
      assert(antis.nonEmpty, s"$q lost its over-cap bucket blacklist anti-join:\n${df.queryExecution.optimizedPlan}")
      assert(df.queryExecution.optimizedPlan.toString.contains(pipeline.Dedup.MaxBandBucket.toString),
        s"$q: MaxBandBucket cap vanished from the optimized plan")
    }
    // dedup_embedding now SERVES from the build-once ANN pair table:
    // its plan must read the checkpointed artifact (ExistingRDD) plus
    // the two id-restriction semi-joins — the banding blacklist lives
    // in the sim_ann_pairs build plan pinned above, not here
    val dfServe = SparkEntry.queries("dedup_embedding")(spark, sf0001)
    val serveLogical = dfServe.queryExecution.optimizedPlan
    val rdds = serveLogical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }
    assert(rdds.nonEmpty, s"dedup_embedding must read the cached pair table:\n$serveLogical")
    val semis = serveLogical.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.size == 2, s"dedup_embedding: expected 2 id semi-joins:\n$serveLogical")
  }

  test("round-7 query plans: no stray windows, no cartesian blowups, broadcast where bounded") {
    // text_logprob2: aggregates + equi-joins only — a window on the
    // (zipfian) bigram key would be the hot-key shape the prune avoids
    val lpWindows = collectAll(plan("text_logprob2")) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(lpWindows.isEmpty, "text_logprob2 grew a window")
    // dedup_spans_clean serves from the build-once span index (round
    // 9): the islands window lives in the INDEX build (dedup_spans'
    // train-inline plan keeps it); the serve plan must be windowless —
    // a checkpoint scan + ranges aggregate + one doc_id join, nothing
    // ranked (the rebuild is row-local)
    val scWindows = collectAll(plan("dedup_spans_clean")) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(scWindows.isEmpty,
      s"dedup_spans_clean's serve plan grew a window: ${scWindows.size}")
    val spWindows = collectAll(plan("dedup_spans")) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(spWindows.size == 1,
      s"dedup_spans expected only the islands window, got ${spWindows.size}")
    // sim_ivfpq_topk: the only windows are the two bounded rankings
    // (probe->cell routing over k rows/probe, final top-k); the
    // LUT/codebook joins must not fall back to SMJ of the code table
    val p = plan("sim_ivfpq_topk")
    val ivfWindows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(ivfWindows.size <= 2, s"sim_ivfpq_topk grew windows: ${ivfWindows.size}")
    assert(!p.toString.contains("CartesianProduct"), "sim_ivfpq_topk produced a cartesian join")
  }

  test("text_gopher / graph_triangles: aggregates and equi-joins only — no windows, no cartesian") {
    // text_gopher: the top-word dominance rule must be an aggregate
    // (max over the per-word counts), never a rank window on the
    // zipfian (doc, word) stream
    val g = plan("text_gopher")
    assert(collectAll(g) { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      "text_gopher grew a window")
    assert(!g.toString.contains("CartesianProduct"), "text_gopher produced a cartesian join")
    // graph_triangles: wedge enumeration and closure are EQUI-joins on
    // the oriented edge list (the degree-ordered trick); a cartesian or
    // theta-join here is the O(d^2) hub blowup the orientation exists
    // to prevent, and ranking plays no part in triangle counting
    val t = plan("graph_triangles")
    assert(collectAll(t) { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      "graph_triangles grew a window")
    assert(!t.toString.contains("CartesianProduct"), "graph_triangles produced a cartesian join")
    assert(!t.toString.contains("BroadcastNestedLoopJoin"),
      "graph_triangles fell back to a nested-loop join")
  }

  test("contextChunks is map-only: no exchange of any kind (composes with any downstream partitioning)") {
    val p = graft.pipeline.Curation.contextChunks(Tables.documents(spark, sf0001))
      .queryExecution.executedPlan
    val exchanges = collectAll(p) {
      case e: ShuffleExchangeExec => e
      case e: BroadcastExchangeExec => e
    }
    assert(exchanges.isEmpty, s"contextChunks grew ${exchanges.size} exchange(s)")
  }

  test("text_bm25 / pipeline_dsir: postings semi-join keyed by broadcast terms, no windows, no cartesian") {
    val bm = plan("text_bm25")
    // the tiny query-term table must broadcast (the token stream is
    // pruned BEFORE any aggregate sees the full vocabulary)
    assert(collectAll(bm) { case e: BroadcastExchangeExec => e }.nonEmpty,
      "text_bm25: query terms were not broadcast")
    for (q <- Seq("text_bm25", "pipeline_dsir")) {
      val p = plan(q)
      val ws = collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(ws.isEmpty, s"$q grew a window")
      assert(!p.toString.contains("CartesianProduct"), s"$q produced a cartesian join")
    }
  }

  test("pipeline_shuffle: position window stays shard-partitioned; text_pii is map-only") {
    val p = plan("pipeline_shuffle")
    val windows = collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, s"pipeline_shuffle lost its position window:\n$p")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"epoch-shuffle window lost its shard partitioning (global sort):\n$p")
    }
    // the scrub pass is pure column expressions: nothing may shuffle
    val pii = graft.pipeline.TextAnalysis.scrubPii(Tables.documents(spark, sf0001))
      .queryExecution.executedPlan
    val ex = collectAll(pii) {
      case e: ShuffleExchangeExec => e
      case e: BroadcastExchangeExec => e
    }
    assert(ex.isEmpty, s"text_pii grew ${ex.size} exchange(s)")
  }

  test("text_hybrid / graph_pagerank: no cartesian joins; fusion windows rank only bounded lists") {
    for (q <- Seq("text_hybrid", "graph_pagerank")) {
      val p = plan(q)
      assert(!p.toString.contains("CartesianProduct"), s"$q produced a cartesian join")
    }
    // every unpartitioned window in the fusion ranks a post-limit
    // (constant-size) list, never the corpus: a GlobalLimit must sit
    // below it on the lexical side, and the semantic side's window is
    // probe-partitioned (bruteTopK) — so at most ONE unpartitioned
    // window exists and the plan also carries a global limit
    val p = plan("text_hybrid")
    val unpart = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpart.size <= 1, s"text_hybrid grew ${unpart.size} corpus-wide windows:\n$p")
    assert(p.toString.contains("GlobalLimit") || p.toString.contains("TakeOrdered"),
      s"text_hybrid's lexical candidates are not top-k bounded before ranking:\n$p")
  }

  test("text_tfidf / text_kmv: rank <= k plans as WindowGroupLimit (map-side cap before the shuffle)") {
    for (q <- Seq("text_tfidf", "text_kmv")) {
      val p = plan(q)
      val limits = collectAll(p) {
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
      }
      assert(limits.nonEmpty, s"$q's rank predicate did not plan as WindowGroupLimit:\n$p")
      assert(!p.toString.contains("CartesianProduct"), s"$q produced a cartesian join")
    }
  }

  test("pipeline_source_cap: rank <= N plans as WindowGroupLimit (map-side cap, mega-source safe)") {
    val p = plan("pipeline_source_cap")
    val limits = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    // the PARTIAL group-limit before the shuffle is what keeps a
    // mega-source from flooding one window task with all its rows
    assert(limits.nonEmpty, s"pipeline_source_cap lost its WindowGroupLimit pushdown:\n$p")
  }

  test("pipeline_pack: running-offset window stays bucket-partitioned (no global single-task window)") {
    val p = plan("pipeline_pack")
    val windows = collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, s"pipeline_pack lost its running-offset window:\n$p")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"running-offset window lost its bucket partitioning (global sort):\n$p")
    }
  }

  test("sim_pq_serve / sim_ivfpq_serve: serve from the cached code table, corpus scanned only for probes") {
    // the serve plan must read the checkpointed code artifact (an
    // ExistingRDD scan), never rebuild it, and its only parquet scans
    // are the probe-side lookups with the probe-id filter pushed down
    Seq("sim_pq_serve" -> 1, "sim_ivfpq_serve" -> 2).foreach { case (q, maxScans) =>
      val p = plan(q)
      val rddScans = collectAll(p) {
        case r: org.apache.spark.sql.execution.RDDScanExec => r
      }
      assert(rddScans.nonEmpty, s"$q must read the checkpointed code table, not rebuild it")
      val scans = collectAll(p) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.size <= maxScans, s"$q: ${scans.size} parquet scans, expected <= $maxScans")
      scans.foreach { f =>
        val pushed = f.metadata.getOrElse("PushedFilters", "")
        assert(pushed.contains("In(vec_id"), s"$q probe scan must push the probe-id filter: $pushed")
      }
    }
  }

  test("sim_ivfpq_pruned: the persisted code table scan partition-prunes to probed cells") {
    // the lazy variant: the query surface collects into a
    // LocalRelation (so its routing checkpoint can be freed eagerly —
    // r12 ADVICE), which would hide the scan; the plan evidence lives
    // on the un-collected twin
    val (df, routed) = graft.pipeline.Similarity.ivfPqTopKPrunedLazy(
      Tables.embeddings(spark, sf0001), sf0001, 0L to 9L, 5)
    val rows = df.collect() // populate scan metrics
    assert(rows.nonEmpty)
    // the codes scan must be the cell-partitioned LAYOUT with a
    // planning-time PartitionFilters entry, reading fewer files than
    // the layout holds (only the probed cells' directories)
    def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p.children ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => Seq.empty
    })).flatMap(deep)
    val codeScans = deep(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("ivfpq_cells")) => f
    }
    assert(codeScans.nonEmpty, "pruned serve did not scan the persisted code layout")
    val scan = codeScans.head
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filter on the cell-partitioned code table: ${scan.metadata}")
    val codesDir = new java.io.File(
      scan.relation.location.rootPaths.head.toUri.getPath)
    val totalCells = Option(codesDir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    val numFiles = scan.metrics("numFiles").value
    assert(totalCells > 0 && numFiles < totalCells,
      s"read $numFiles files of a $totalCells-cell layout — cell pruning lost")
    // pruning is a pure scan aid: identical rows to the unpruned serve
    val serve = SparkEntry.queries("sim_ivfpq_serve")(spark, sf0001).collect()
    assert(rows.toSeq == serve.toSeq)
    // the gate-facing wrapper frees the routing checkpoint itself, and
    // returns the same rows — pin that, then drop ours
    assert(SparkEntry.queries("sim_ivfpq_pruned")(spark, sf0001).collect().toSeq == rows.toSeq)
    graft.pipeline.Dedup.freeCheckpoint(routed)
  }

  test("ev_dpp: the fact scan carries a DynamicPruningExpression and reads only qualifying days") {
    val df = SparkEntry.queries("ev_dpp")(spark, sf0001)
    assert(df.count() > 0)
    // the gated query REQUIREs dynamicpruning in-plan before
    // materializing; here we pin WHERE it lands (the fact side's
    // PartitionFilters) and that the runtime file count is a strict
    // subset of the layout's day directories
    val inner = graft.operators.PartitionedTables.dppRollup(spark, sf0001)
    // dppRollup materializes; re-derive the live plan for inspection
    val t = spark.read.parquet(
      graft.operators.PartitionedTables.eventsByDay(spark, sf0001))
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      val dim = t.groupBy("d").agg(sum("cents").as("tot"))
        .filter(col("tot") % 2 === 0).select("d")
      val joined = t.join(dim, "d").groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      joined.collect()
      def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p.children ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      })).flatMap(deep)
      val dppScans = deep(joined.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.exists(_.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])) => f
      }
      assert(dppScans.nonEmpty, "no DynamicPruningExpression on the fact scan")
      val numFiles = dppScans.head.metrics("numFiles").value
      val totalDays = new java.io.File(graft.operators.PartitionedTables
        .eventsByDay(spark, sf0001)).listFiles().count(_.getName.startsWith("d="))
      assert(numFiles < totalDays,
        s"DPP read $numFiles of $totalDays day files — nothing pruned at runtime")
      assert(inner.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    }
  }

  test("dedup_semantic / sim_pq_err: serve from cached artifacts, bounded probe scans") {
    // dedup_semantic reads the checkpointed k-means assignment (an
    // ExistingRDD scan) — never re-runs Lloyd — and touches no parquet
    // at all (the embedding columns ride the assignment artifact)
    val sem = plan("dedup_semantic")
    assert(collectAll(sem) {
      case r: org.apache.spark.sql.execution.RDDScanExec => r
    }.nonEmpty, s"dedup_semantic must read the cached assignment:\n$sem")
    assert(collectAll(sem) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.isEmpty, s"dedup_semantic re-scanned parquet instead of the artifact:\n$sem")
    assert(!sem.toString.contains("CartesianProduct") &&
      !sem.toString.contains("BroadcastNestedLoopJoin"), sem.toString)
    // sim_pq_err reads the checkpointed code table; its parquet scans
    // are the exact-side corpus pass plus the probe lookups, probe
    // filters pushed down
    val err = plan("sim_pq_err")
    assert(collectAll(err) {
      case r: org.apache.spark.sql.execution.RDDScanExec => r
    }.nonEmpty, s"sim_pq_err must read the cached code table:\n$err")
    val probeScans = collectAll(err) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.getOrElse("PushedFilters", "").contains("In(vec_id") => f
    }
    assert(probeScans.nonEmpty, s"sim_pq_err probe scans lost the pushed id filter:\n$err")
  }

  test("sim_ivf_topk: assignment is an aggregate (max_by), ranking is WindowGroupLimit-bounded") {
    val p = plan("sim_ivf_topk")
    val windows = collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size <= 1,
      s"cell assignment regressed to a Window (expected max_by aggregate):\n$p")
    val limits = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.nonEmpty, s"final top-k lost its WindowGroupLimit pushdown:\n$p")
  }

  test("ev_funnel: the four stage windows share ONE user_id shuffle") {
    val p = plan("ev_funnel")
    // every events row is shuffled exactly once (hashpartitioning on
    // user_id); the rest of the plan runs over the 4-row funnel
    val userExchanges = collectAll(p) {
      case e: ShuffleExchangeExec if e.outputPartitioning.toString.contains("user_id") => e
    }
    assert(userExchanges.size == 1,
      s"ev_funnel expected exactly one user_id shuffle, got ${userExchanges.size}:\n$p")
    assert(!p.toString.contains("CartesianProduct"), "ev_funnel produced a cartesian join")
  }

  test("ev_bursts: the banded range join stays an equi-join — no nested-loop, no cartesian") {
    val p = plan("ev_bursts")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), "range join fell back to a cartesian product")
    assert(!s.contains("BroadcastNestedLoopJoin"), "range join fell back to a nested loop")
  }

  test("correlated subqueries q4/q16/q18/q21/q22 decorrelate to hash joins — no nested loop") {
    // the failure mode these guard against: a correlated EXISTS /
    // NOT IN Catalyst fails to decorrelate plans as
    // BroadcastNestedLoopJoin or CartesianProduct — O(n·m) and the
    // first thing a 100× scale-up kills
    val semiAnti = Map(
      "q4_order_priority" -> "LeftSemi",
      "q16_supplier_cnt" -> "LeftAnti",
      "q18_big_orders" -> "LeftSemi",
      "q21_waiting_supplier" -> "LeftAnti",
      "q22_idle_balance" -> "LeftAnti")
    // q18/q21's DECLARED entries snapshot their result under scoped
    // sort-pressure confs (round 17), so their own plan is a
    // LocalRelation — the decorrelation pin reads the un-materialized
    // SQL builders instead
    val rawSql = Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame](
      "q18_big_orders" -> graft.apps.RelationalQueries.q18Sql,
      "q21_waiting_supplier" -> graft.apps.RelationalQueries.q21Sql)
    semiAnti.foreach { case (q, jt) =>
      val p = rawSql.get(q)
        .map(_(spark, sf0001).queryExecution.executedPlan)
        .getOrElse(plan(q))
      val s = p.toString
      assert(!s.contains("BroadcastNestedLoopJoin"),
        s"$q failed to decorrelate — nested loop join:\n$s")
      assert(!s.contains("CartesianProduct"), s"$q produced a cartesian join:\n$s")
      val joins = collectAll(p) {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType.toString
      }
      assert(joins.exists(_.contains(jt)),
        s"$q expected a $jt join from decorrelation, got joins: $joins")
    }
  }

  test("q20: nested correlated IN + correlated scalar agg decorrelates to hash joins") {
    // the shape that historically defeats decorrelators: IN over a
    // derived table whose WHERE holds a correlated scalar aggregate.
    // A give-up plans per-outer-row subquery execution (nested loop);
    // the pinned plan is semi joins + an aggregate-backed outer join
    val p = plan("q20_excess_stock")
    val s = p.toString
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"q20 failed to decorrelate — nested loop join:\n$s")
    assert(!s.contains("CartesianProduct"), s"q20 produced a cartesian join:\n$s")
    val joins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType.toString
    }
    // the two INs decorrelate to semi joins; the correlated scalar
    // agg decorrelates to an aggregate-backed LeftOuter which
    // EliminateOuterJoin then legally reduces to Inner — the
    // `avail_c > 2 * (scalar)` comparison is null-rejecting, so the
    // NULL-on-empty rows are filtered either way (observed plan:
    // Inner + LeftSemi ×3 — strictly better than the textbook outer)
    assert(joins.count(_.contains("LeftSemi")) >= 2,
      s"q20 expected semi joins from the nested IN decorrelation, got: $joins")
    assert(joins.exists(_.contains("Inner")),
      s"q20 expected the scalar-agg join (outer reduced to inner by the " +
        s"null-rejecting comparison), got: $joins")
  }

  test("q8/q9/q12: multi-table join reorder plans stay hash-join-only") {
    Seq("q8_market_share", "q9_profit", "q12_late_lines").foreach { q =>
      val s = plan(q).toString
      assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
        s"$q planned a non-hash join:\n$s")
    }
  }

  test("q19: OR-of-ANDs disjunction pushes per-side filters below the join") {
    // the mixed disjunction must not filter post-join only: Catalyst
    // extracts each side's common disjunct and pushes it into the scan
    val s = formatted("q19_disjunct")
    val scans = s.split("Scan parquet")
    val liScan = scans.find(_.contains("l_quantity")).getOrElse("")
    assert(liScan.contains("PushedFilters:") &&
      liScan.contains("Or(") && liScan.contains("l_quantity"),
      s"lineitem scan lost its pushed OR-range filter:\n$s")
    val pScan = scans.find(_.contains("p_brand")).getOrElse("")
    assert(pScan.contains("Or(") && pScan.contains("p_brand"),
      s"part scan lost its pushed OR-brand filter:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"), s)
  }

  test("q11: scalar HAVING subquery is a one-row broadcast, not a re-scan per group") {
    val p = plan("q11_value_share")
    val s = p.toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"), s)
    // the subquery shows up as a Subquery/scalar-subquery reference in
    // the final aggregate, computed once
    assert(s.contains("Subquery") || s.contains("scalar-subquery"),
      s"q11 lost its scalar subquery shape:\n$s")
  }

  test("ev_retention / dedup_winnow / pipeline_reservoir / sim_ivf_recall plan shapes") {
    // ev_retention: equi-join + aggregates only, no windows at all
    val r = plan("ev_retention")
    assert(collectAll(r) { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      "ev_retention grew a window")
    assert(!r.toString.contains("CartesianProduct"), "ev_retention produced a cartesian join")
    // dedup_winnow: the df blacklist must stay a broadcast anti-join
    // (two-phase groupBy cap), and the only WindowExecs are the
    // doc-partitioned winnow selections (one per self-join branch) —
    // never a window on the fingerprint key
    val w = plan("dedup_winnow")
    val anti = collectAll(w) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(anti.nonEmpty, s"dedup_winnow lost its broadcast anti-join blacklist:\n$w")
    val winnowWindows = collectAll(w) {
      case x: org.apache.spark.sql.execution.window.WindowExec => x
    }
    assert(winnowWindows.forall(_.partitionSpec.exists(_.toString.contains("doc_id"))),
      s"dedup_winnow has a window not partitioned by doc_id:\n$winnowWindows")
    // pipeline_reservoir: top-(k+1) must be a distributed TakeOrdered,
    // never a global sort of the corpus
    val res = plan("pipeline_reservoir")
    assert(res.toString.contains("TakeOrderedAndProject"),
      s"pipeline_reservoir lost its TakeOrderedAndProject:\n$res")
    // sim_ivf_recall: both retrieval sides keep their bounded shapes —
    // probes broadcast, no cartesian of the corpus against itself
    val rec = plan("sim_ivf_recall")
    assert(!rec.toString.contains("CartesianProduct"),
      "sim_ivf_recall produced a cartesian join")
    assert(collectAll(rec) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "sim_ivf_recall lost its probe-side broadcasts")
  }

  test("ev_day_prune: literal day predicate prunes the partitioned scan at planning time") {
    val df = SparkEntry.queries("ev_day_prune")(spark, sf0001)
    df.collect() // populate scan metrics
    // descend through AQE wrappers: QueryStageExec children are not
    // TreeNode children, so plain collect never reaches the scan
    def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p.children ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => Seq.empty
    })).flatMap(deep)
    val scans = deep(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScan in ev_day_prune")
    val scan = scans.head
    // pruning is a PLANNING-time PartitionFilters entry on d, not a
    // post-scan Filter over all 30 days
    assert(scan.partitionFilters.exists(_.toString.contains("d#") ||
      scan.partitionFilters.toString.contains("d#")),
      s"no partition filter on d: ${scan.partitionFilters}")
    // and the scan must READ one day's files, not the whole layout
    // (the build writes repartition(d) -> one file per day, 30 days)
    val numFiles = scan.metrics("numFiles").value
    assert(numFiles >= 1 && numFiles <= 2,
      s"pruned scan read $numFiles files — pruning lost")
  }

  test("rel_merge_pruned: MERGE's base scan prunes to the touched partitions only") {
    val df = SparkEntry.queries("rel_merge_pruned")(spark, sf0001)
    assert(df.count() > 0)
    def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p.children ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => Seq.empty
    })).flatMap(deep)
    df.collect() // populate scan metrics
    val scans = deep(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // both scans of the layout (base side AND change batch) must carry
    // a planning-time PartitionFilters entry on d — the MERGE never
    // lists an untouched day's directory
    assert(scans.nonEmpty, "no FileSourceScan in rel_merge_pruned")
    scans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        s"unpruned layout scan in MERGE: ${s.nodeName}")
      // touched-partition pruning: ≤ 2 of the 30 day-dirs (one file per
      // day by the repartition(d) write shape)
      val numFiles = s.metrics("numFiles").value
      assert(numFiles >= 1 && numFiles <= 2,
        s"MERGE base scan read $numFiles files — touched-partition pruning lost")
    }
    // and no full-outer blowup: the merge stays one key join
    assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "MERGE planned a cartesian join")
  }
}
