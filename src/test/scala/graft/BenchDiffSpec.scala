package graft

import graft.tools.BenchDiff
import graft.tools.BenchDiff.B
import org.scalatest.funsuite.AnyFunSuite

/** Pins the byte-regression gate's rules (round 14): growth beyond
  * tolerance+floor fails, noise under either threshold doesn't, new
  * spill always fails, the allowlist downgrades with a reason, missing
  * queries are loud, shrinks/new queries never fail. Pure-function
  * tests — the JSON plumbing is exercised once against a real
  * bench_out-shaped file. */
class BenchDiffSpec extends AnyFunSuite {

  private val base = Map(
    "q_flat" -> B(shuffle = 10L << 20, records = 1000000, input = 5L << 20, tasks = 100, spill = 0),
    "q_tiny" -> B(shuffle = 500, records = 10, input = 800, tasks = 6, spill = 0),
    "q_gone" -> B(shuffle = 1L << 20, records = 1000, input = 1L << 20, tasks = 10, spill = 0),
    "q_allowed" -> B(shuffle = 10L << 20, records = 1000000, input = 5L << 20, tasks = 100, spill = 0),
    "q_shrunk" -> B(shuffle = 50L << 20, records = 5000000, input = 5L << 20, tasks = 100, spill = 0))

  test("unexplained shuffle growth past tolerance+floor regresses; jitter under either does not") {
    val cur = (base
      .updated("q_flat", base("q_flat").copy(shuffle = 13L << 20)) // x1.3, +3MiB: regress
      .updated("q_tiny", base("q_tiny").copy(shuffle = 5000)) // x10 but under the 1MiB floor
      -- Seq("q_gone", "q_allowed", "q_shrunk"))
    val (fs, missing, _, _, _) = BenchDiff.diff(base -- Seq("q_gone", "q_allowed", "q_shrunk"), cur, Map.empty)
    assert(fs.map(f => (f.query, f.metric)) == Seq(("q_flat", "shuffle")))
    assert(fs.head.allowed.isEmpty && missing.isEmpty)
  }

  test("growth under tolerance never regresses even when the absolute delta is large") {
    val cur = Map("q_flat" -> base("q_flat").copy(shuffle = (10L << 20) * 115 / 100))
    val (fs, _, _, _, _) = BenchDiff.diff(Map("q_flat" -> base("q_flat")), cur, Map.empty)
    assert(fs.isEmpty, s"x1.15 flagged: $fs")
  }

  test("new spill is a regression regardless of size; pre-existing spill is not re-flagged") {
    val b = Map("q" -> B(1000, 10, 1000, 5, 0), "p" -> B(1000, 10, 1000, 5, 777))
    val c = Map("q" -> B(1000, 10, 1000, 5, 123), "p" -> B(1000, 10, 1000, 5, 777))
    val (fs, _, _, _, _) = BenchDiff.diff(b, c, Map.empty)
    assert(fs.map(f => (f.query, f.metric)) == Seq(("q", "spill")))
  }

  test("allowlist downgrades a regression to allowed-with-reason; stale entries are reported") {
    val cur = base
      .updated("q_allowed", base("q_allowed").copy(tasks = 400))
    val allow = Map("q_allowed" -> "intentional repartition", "q_flat" -> "stale reason")
    val (fs, _, _, _, stale) = BenchDiff.diff(base, cur, allow)
    val hard = fs.filter(_.allowed.isEmpty)
    assert(hard.isEmpty, s"allowed regression failed hard: $hard")
    assert(fs.exists(f => f.query == "q_allowed" && f.allowed.contains("intentional repartition")))
    assert(stale == Seq("q_flat"), s"stale allow entries: $stale")
  }

  test("missing queries are loud; new queries and shrinks are reported, never failed") {
    val cur = (base - "q_gone")
      .updated("q_shrunk", base("q_shrunk").copy(shuffle = 10L << 20, records = 1000000))
      .updated("q_new", B(1, 1, 1, 1, 0))
    val (fs, missing, fresh, improved, _) = BenchDiff.diff(base, cur, Map.empty)
    assert(fs.isEmpty)
    assert(missing == Seq("q_gone"))
    assert(fresh == Seq("q_new"))
    assert(improved.exists(f => f.query == "q_shrunk" && f.metric == "shuffle"))
  }

  test("records growth gates independently of bytes (the work-vs-encoding separator)") {
    // bytes flat, records x2 past the 50k floor: the WORK grew even
    // though compression hid it in bytes — regress
    val b = Map("q" -> B(10L << 20, 1000000, 1L << 20, 50, 0))
    val c = Map("q" -> B(10L << 20, 2000000, 1L << 20, 50, 0))
    val (fs, _, _, _, _) = BenchDiff.diff(b, c, Map.empty)
    assert(fs.map(_.metric) == Seq("records"))
  }

  test("a pre-r14 baseline (no records field) never flags records growth — unmeasured, not zero") {
    val b = Map("q" -> B(10L << 20, 0, 1L << 20, 50, 0)) // shuffle>0, records unmeasured
    val c = Map("q" -> B(10L << 20, 5000000, 1L << 20, 50, 0))
    val (fs, _, _, _, _) = BenchDiff.diff(b, c, Map.empty)
    assert(fs.isEmpty, s"unmeasured baseline records flagged: $fs")
    // but a genuinely-zero baseline (no shuffle at all) still gates
    val b2 = Map("q" -> B(0, 0, 1L << 20, 50, 0))
    val c2 = Map("q" -> B(0, 5000000, 1L << 20, 50, 0))
    val (fs2, _, _, _, _) = BenchDiff.diff(b2, c2, Map.empty)
    assert(fs2.map(_.metric) == Seq("records"))
  }

  test("readBytes parses a bench_out-shaped file (records defaulting to 0 for pre-r14 baselines)") {
    val f = java.nio.file.Files.createTempFile("graft_bd_", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","queries_bytes":{
        |"a":{"shuffle_read":10,"shuffle_write":20,"spill":0,"tasks":3,"input":99},
        |"b":{"shuffle_read":1,"shuffle_write":2,"shuffle_records":7,"spill":5,"tasks":1,"input":4}}}""".stripMargin)
    val m = BenchDiff.readBytes(f.toString)
    assert(m("a") == B(30, 0, 99, 3, 0))
    assert(m("b") == B(3, 7, 4, 1, 5))
    java.nio.file.Files.delete(f)
  }

  test("windowSuspect: spread past 2x with flat gc flags; gc-explained or small spreads don't") {
    import BenchDiff.windowSuspect
    // the r15 driver signature: 23.9 med over a 1.8 min with zero gc
    assert(windowSuspect(23.88, 1.78, 0.0))
    // boundary: spread must EXCEED 2x and clear the 0.5 s floor
    assert(!windowSuspect(1.0, 0.5, 0.0), "exact 2x flagged")
    assert(!windowSuspect(0.7, 0.25, 0.0), "sub-floor delta flagged")
    // the widest healthy spread in the r15 driver artifact (1.72) —
    // calibration pin: healthy queries never flag
    assert(!windowSuspect(1.13, 0.66, 0.0))
    // a memory-pressured sample self-labels via gc and is NOT a window
    assert(!windowSuspect(10.0, 2.0, 4.0), "gc-explained spread flagged as window")
    // ...but trace gc under 20% of the spread still reads as window
    assert(windowSuspect(10.0, 2.0, 1.0))
    // all passes failed (min sentinel) never flags
    assert(!windowSuspect(-1.0, 0.0, 0.0))
  }

  test("wallWindows: wall growth with flat gc and no byte finding is the machine, not the code") {
    import BenchDiff.{wallWindows, Wall}
    val base = Map("q_win" -> Wall(2.0, 1.8, 0.0), "q_code" -> Wall(2.0, 1.8, 0.0),
      "q_flat" -> Wall(2.0, 1.8, 0.0), "q_gcy" -> Wall(2.0, 1.8, 0.0))
    val cur = Map(
      "q_win" -> Wall(3.5, 1.9, 0.0), // x1.75, gc flat, bytes flat -> window
      "q_code" -> Wall(3.5, 3.4, 0.0), // same wall growth but bytes moved
      "q_flat" -> Wall(2.2, 1.9, 0.0), // x1.1 — in-tolerance drift
      "q_gcy" -> Wall(3.5, 1.9, 1.2)) // gc explains the delta
    val ws = wallWindows(base, cur, byteRegressed = Set("q_code"))
    assert(ws.map(_.query) == Seq("q_win"), s"wall windows: $ws")
    // the exit-code contract: wallWindows is adjudication output only —
    // diff() (the function the exit code reads) never sees wall stats,
    // so a suspect-wall-only delta cannot fail the gate by construction
  }

  test("readSuspects: r16 artifacts carry the field; pre-r16 artifacts self-adjudicate from wall stats") {
    val r16 = java.nio.file.Files.createTempFile("graft_bds_", ".json")
    java.nio.file.Files.writeString(r16,
      """{"metric":"total","queries":{"a":9.0,"b":1.0},"queries_min":{"a":1.0,"b":0.9},
        |"queries_gc":{"a":0.0,"b":0.0},"queries_window_suspect":["b"]}""".stripMargin)
    // the emitted field WINS over recomputation (the bench saw
    // per-sample bytes the artifact doesn't carry)
    assert(BenchDiff.readSuspects(r16.toString) == Seq("b"))
    val r15 = java.nio.file.Files.createTempFile("graft_bdo_", ".json")
    java.nio.file.Files.writeString(r15,
      """{"metric":"total","queries":{"a":9.0,"b":1.0},"queries_min":{"a":1.0,"b":0.9},
        |"queries_gc":{"a":0.0,"b":0.0}}""".stripMargin)
    assert(BenchDiff.readSuspects(r15.toString) == Seq("a"),
      "pre-r16 artifact did not self-adjudicate")
    java.nio.file.Files.delete(r16)
    java.nio.file.Files.delete(r15)
  }

  test("readCpus: r16 artifacts carry the core count; older ones read as unknown, never a default") {
    // unlike action (absent = count, a known historical fact), an
    // absent cpus is genuinely UNKNOWN — defaulting it would let a
    // cpus=4-vs-32 diff pass the gate silently, which is exactly the
    // environment delta that produced BENCHDIFF_r15's phantom 4-7×
    // task "improvements"
    val r16 = java.nio.file.Files.createTempFile("graft_bdc_", ".json")
    java.nio.file.Files.writeString(r16,
      """{"metric":"total","action":"full","cpus":"32","queries_bytes":{}}""")
    val old = java.nio.file.Files.createTempFile("graft_bdn_", ".json")
    java.nio.file.Files.writeString(old,
      """{"metric":"total","action":"full","queries_bytes":{}}""")
    assert(BenchDiff.readCpus(r16.toString).contains("32"))
    assert(BenchDiff.readCpus(old.toString).isEmpty)
    java.nio.file.Files.delete(r16)
    java.nio.file.Files.delete(old)
  }

  test("readAction: explicit action is returned; a pre-r14 file (no field) reads as count") {
    // r14 advice (medium): count-action and full-action byte profiles
    // are incomparable — main() exits non-zero when baseline and
    // current actions differ. The absent-field default of "count" is
    // what makes an accidental pre-r14-baseline-vs-full-run diff FAIL
    // the action gate instead of passing silently with every query
    // "improved".
    val full = java.nio.file.Files.createTempFile("graft_bda_", ".json")
    java.nio.file.Files.writeString(full,
      """{"metric":"total","action":"full","queries_bytes":{}}""")
    val legacy = java.nio.file.Files.createTempFile("graft_bdl_", ".json")
    java.nio.file.Files.writeString(legacy,
      """{"metric":"total","queries_bytes":{}}""")
    assert(BenchDiff.readAction(full.toString) == "full")
    assert(BenchDiff.readAction(legacy.toString) == "count")
    java.nio.file.Files.delete(full)
    java.nio.file.Files.delete(legacy)
  }
}
