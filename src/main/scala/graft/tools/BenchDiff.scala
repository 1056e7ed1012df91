package graft.tools

import scala.jdk.CollectionConverters._

/** BYTE-REGRESSION GATE (round 14): turns the bench's
  * machine-independent per-query metrics (`queries_bytes` —
  * [[TaskMetricsListener]] deltas) from a narrative into a CHECK. The
  * round-13 convention was "bytes moved → the code changed", applied
  * by hand-diffing bench_out.json across rounds; this main applies it
  * mechanically: compare the current run's per-query shuffle / input /
  * task / spill deltas against the committed baseline and exit
  * non-zero on unexplained growth.
  *
  *   runMain graft.tools.BenchDiff <baseline.json> <current.json>
  *
  * Rules (pure function [[diff]], spec-pinned in BenchDiffSpec):
  *  - a metric REGRESSES when current > baseline × [[GrowthTolerance]]
  *    AND the absolute delta clears a noise floor (tiny queries
  *    jitter by a few KB/tasks with AQE statistics; a 500-byte shuffle
  *    doubling is not a plan change);
  *  - ANY new spill is a regression (the sf0.1 bench runs
  *    spill-free by design — spill here means a memory budget broke);
  *  - a query in the baseline but not the current run is a loud MISS
  *    (a bench that silently dropped a query would otherwise "pass");
  *  - new queries are reported, never failed — coverage growth is the
  *    normal case;
  *  - intentional plan changes ride the ALLOWLIST
  *    (`BENCHDIFF_ALLOW.json`: {"query": "reason", ...}, committed
  *    next to the baseline) — an allowed regression prints WITH its
  *    reason and does not fail, and a stale allowlist entry (query no
  *    longer regressing) prints so entries get retired.
  *
  * SHRINKS are reported as improvements, never failed — but they mean
  * the committed baseline should be refreshed (the gate is sharpest
  * when the baseline is the last intentional state). */
object BenchDiff {

  final case class B(shuffle: Long, records: Long, input: Long, tasks: Long, spill: Long)
  final case class Finding(query: String, metric: String, base: Long, cur: Long,
      allowed: Option[String]) {
    def ratio: Double = if (base == 0) Double.PositiveInfinity else cur.toDouble / base
    override def toString: String = {
      val r = if (base == 0) "inf" else f"$ratio%.2f"
      val tag = allowed.map(a => s" ALLOWED ($a)").getOrElse("")
      f"$query%-28s $metric%-8s $base%12d -> $cur%12d  x$r$tag"
    }
  }

  val GrowthTolerance = 1.2
  /** Noise floors per metric: deltas below these never regress. */
  val ShuffleFloor = 1L << 20 // 1 MiB
  val InputFloor = 1L << 20
  val RecordFloor = 50000L
  val TaskFloor = 64L

  /** The run's measured action (`full` / `count`). Pre-r14 artifacts
    * carry no `action` field; they were all count-action, so the
    * absent case reads as "count" — which makes an accidental diff of
    * a pre-r14 baseline against a full-action run fail the action
    * gate instead of silently comparing incomparable byte profiles. */
  def readAction(path: String): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    Option(root.get("action")).map(_.asText("count")).getOrElse("count")
  }

  def readBytes(path: String): Map[String, B] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val qb = root.get("queries_bytes")
    require(qb != null, s"$path has no queries_bytes (pre-r13 bench format?)")
    qb.properties().asScala.map { e =>
      val v = e.getValue
      def l(f: String): Long = Option(v.get(f)).map(_.asLong(0L)).getOrElse(0L)
      e.getKey -> B(l("shuffle_read") + l("shuffle_write"), l("shuffle_records"),
        l("input"), l("tasks"), l("spill"))
    }.toMap
  }

  def readAllow(path: String): Map[String, String] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return Map.empty
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readString(p))
    root.properties().asScala.map(e => e.getKey -> e.getValue.asText("")).toMap
  }

  /** (regressions incl. allowed, missing queries, new queries,
    * improvements, stale allowlist entries). */
  def diff(base: Map[String, B], cur: Map[String, B], allow: Map[String, String])
      : (Seq[Finding], Seq[String], Seq[String], Seq[Finding], Seq[String]) = {
    val findings = Vector.newBuilder[Finding]
    val improved = Vector.newBuilder[Finding]
    for ((q, b) <- base.toSeq.sortBy(_._1); c <- cur.get(q)) {
      def check(metric: String, bv: Long, cv: Long, floor: Long): Unit = {
        if (cv > bv * GrowthTolerance && cv - bv >= floor)
          findings += Finding(q, metric, bv, cv, allow.get(q))
        else if (bv > cv * GrowthTolerance && bv - cv >= floor)
          improved += Finding(q, metric, bv, cv, None)
      }
      check("shuffle", b.shuffle, c.shuffle, ShuffleFloor)
      // a pre-r14 baseline has no shuffle_records field: zero records
      // against nonzero shuffle bytes means UNMEASURED, not zero work
      // — comparing against it would flag every query
      if (b.records > 0 || b.shuffle == 0)
        check("records", b.records, c.records, RecordFloor)
      check("input", b.input, c.input, InputFloor)
      check("tasks", b.tasks, c.tasks, TaskFloor)
      if (c.spill > 0 && b.spill == 0) findings += Finding(q, "spill", 0, c.spill, allow.get(q))
    }
    val fs = findings.result()
    val missing = base.keys.filterNot(cur.contains).toSeq.sorted
    val fresh = cur.keys.filterNot(base.contains).toSeq.sorted
    val stale = allow.keys.filterNot(q => fs.exists(_.query == q))
      .filterNot(missing.contains).toSeq.sorted
    (fs, missing, fresh, improved.result(), stale)
  }

  def main(args: Array[String]): Unit = {
    val Array(basePath, curPath, rest @ _*) = args: @unchecked
    val allowPath = rest.headOption.getOrElse(
      java.nio.file.Paths.get(basePath).toAbsolutePath.getParent
        .resolve("BENCHDIFF_ALLOW.json").toString)
    // count-action and full-action byte profiles are incomparable by
    // construction (count measures Catalyst's count-pruned plans —
    // the round-14 finding that created the action field). A
    // mismatched diff in the shrinking direction would pass silently
    // with every query "improved"; fail it loudly in both directions.
    val (baseAct, curAct) = (readAction(basePath), readAction(curPath))
    if (baseAct != curAct) {
      println(s"[benchdiff] FAIL: action mismatch — baseline=$baseAct current=$curAct " +
        "(byte profiles across actions are incomparable; re-baseline or rerun with " +
        "SPARK_GRAFT_BENCH_ACTION matching the baseline)")
      sys.exit(2)
    }
    val (fs, missing, fresh, improved, stale) =
      diff(readBytes(basePath), readBytes(curPath), readAllow(allowPath))
    improved.foreach(f => println(s"[benchdiff] IMPROVED  $f"))
    fresh.foreach(q => println(s"[benchdiff] NEW       $q"))
    stale.foreach(q => println(s"[benchdiff] STALE-ALLOW $q (no longer regressing — retire the entry)"))
    fs.filter(_.allowed.isDefined).foreach(f => println(s"[benchdiff] GROWN     $f"))
    val hard = fs.filter(_.allowed.isEmpty)
    hard.foreach(f => println(s"[benchdiff] REGRESSED $f"))
    missing.foreach(q => println(s"[benchdiff] MISSING   $q (in baseline, absent from current run)"))
    if (hard.nonEmpty || missing.nonEmpty) {
      println(s"[benchdiff] FAIL: ${hard.size} unexplained regressions, ${missing.size} missing")
      sys.exit(1)
    }
    println(s"[benchdiff] OK: ${fs.size} allowed regressions, ${improved.size} improvements, ${fresh.size} new")
  }
}
