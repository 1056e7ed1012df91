package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query at
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. A full warm-up pass at
  * sf0.001 first: JVM/JIT, codegen caches and parquet footers are
  * per-process costs, not per-query costs — without it the first timed
  * query absorbs ~10 s of warm-up and the numbers are noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // local-iteration filter: SPARK_GRAFT_ONLY=q1,q2 times just those
    // queries (unset — the driver's mode — times the full set)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case scala.util.control.NonFatal(_) => () }
    }

    // median of 3 in-process runs per query: the median is robust to a
    // one-off page-cache / GC / compilation hiccup in either direction,
    // so round-over-round deltas >= 15% are decidable without a noise
    // argument (min hid regressions' tails; a single pass hid
    // everything). min/max are emitted alongside for spread. A failing
    // query is reported as -1, never as its elapsed-time-to-exception.
    val results = ordered.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case scala.util.control.NonFatal(_) => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val stats = if (times.contains(-1.0)) (-1.0, -1.0, -1.0)
        else (times.sorted.apply(times.size / 2), times.min, times.max)
      name -> stats
    }
    def jmap(f: ((Double, Double, Double)) => Double) =
      results.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val qs = jmap(_._1)
    val qsMin = jmap(_._2)
    val qsMax = jmap(_._3)
    val failed = results.collect { case (k, (-1.0, _, _)) => "\"" + k + "\"" }
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","stat":"median_of_3","queries":$qs,"queries_min":$qsMin,"queries_max":$qsMax,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}"""
    println(line)
    // sbt decorates stdout with [info] prefixes, which broke the
    // driver's JSON parse in round 1 — also write the line to a file
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"bench: could not write $out: $e") }
    spark.stop()
  }
}
