package graft

import graft.apps.RelationalQueries
import org.apache.spark.sql.functions._

/** Events-plane behavior: funnel stage semantics on hand-built event
  * streams (ordering, strict-after, the 72 h conversion window) — the
  * sf oracles only see the aggregate counts, not WHY a user dropped.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // 1 h in µs
  private val W = RelationalQueries.FUNNEL_WINDOW_US

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "tsu")

  private def counts(rows: (Long, String, Long)*): Map[Int, Long] =
    RelationalQueries.funnel(ev(rows: _*))
      .select("stage", "n_users").as[(Int, Long)].collect().toMap

  test("funnel: completing user counts at every stage") {
    val c = counts(
      (1L, "signup", 0L), (1L, "view", H), (1L, "click", 2 * H), (1L, "purchase", 3 * H))
    assert(c == Map(1 -> 1L, 2 -> 1L, 3 -> 1L, 4 -> 1L))
  }

  test("funnel: stage order is enforced — events before the previous stage don't count") {
    // view happens BEFORE signup: user reaches stage 1 only
    val c = counts(
      (1L, "view", 0L), (1L, "signup", H), (1L, "click", 2 * H), (1L, "purchase", 3 * H))
    assert(c(1) == 1L && c(2) == 0L && c(3) == 0L && c(4) == 0L, c.toString)
  }

  test("funnel: a same-timestamp event is not strictly after — excluded") {
    val c = counts((1L, "signup", H), (1L, "view", H))
    assert(c(1) == 1L && c(2) == 0L)
  }

  test("funnel: conversion window — a stage more than 72h later is out") {
    val c = counts(
      (1L, "signup", 0L), (1L, "view", W + 1L),
      (2L, "signup", 0L), (2L, "view", W)) // exactly at the boundary: in
    assert(c(1) == 2L && c(2) == 1L, c.toString)
  }

  test("funnel: min-forward picks the FIRST qualifying event per stage") {
    // two views; the first one (in window) sets t2, so the click 1h
    // after the second view still converts because it is after t2
    val c = counts(
      (1L, "signup", 0L), (1L, "view", H), (1L, "view", 10 * H),
      (1L, "click", 11 * H))
    assert(c(3) == 1L)
    // conversely: if only the LATE view existed and the click came
    // before it, no stage-3 conversion
    val c2 = counts(
      (2L, "signup", 0L), (2L, "view", 10 * H), (2L, "click", 5 * H))
    assert(c2(3) == 0L)
  }

  test("ev_pivot: per-user counts partition the event stream exactly") {
    val r = SparkEntry.queries("ev_pivot")(spark, sf0001)
    val total = r.select((col("click") + col("error") + col("purchase") +
      col("signup") + col("view")).as("s")).agg(sum("s")).first().getLong(0)
    val events = Tables.events(spark, sf0001).count()
    assert(total == events, s"pivot cells must sum to the event count: $total != $events")
  }

  test("ev_anomaly: spike flag discriminates (some spikes, never all)") {
    val r = SparkEntry.queries("ev_anomaly")(spark, sf0001)
      .agg(sum("spike").cast("long"), count(lit(1))).first()
    val (spikes, rows) = (r.getLong(0), r.getLong(1))
    assert(spikes > 0, "z>2 must flag at least one day at sf0.001")
    assert(spikes < rows / 5, s"z>2 flagged $spikes/$rows days — threshold not discriminating")
  }

  test("funnel matches a naive in-memory reference on random event streams") {
    val rnd = new scala.util.Random(42)
    val types = Vector("signup", "view", "click", "purchase", "error")
    val rows = (0 until 2000).map { _ =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(types.size)),
        rnd.nextLong(10 * W)) // spread over ~10 windows so the 72h gate bites
    }
    def naive(): Map[Int, Long] = {
      val byUser = rows.groupBy(_._1)
      def stageT(evs: Seq[(Long, String, Long)], t: String, after: Option[Long]): Option[Long] =
        after.flatMap { a =>
          val c = evs.filter(e => e._2 == t && e._3 > a && e._3 <= a + W).map(_._3)
          if (c.isEmpty) None else Some(c.min)
        }
      val stages = byUser.values.map { evs =>
        val t1 = { val s = evs.filter(_._2 == "signup").map(_._3); if (s.isEmpty) None else Some(s.min) }
        val t2 = stageT(evs, "view", t1)
        val t3 = stageT(evs, "click", t2)
        val t4 = stageT(evs, "purchase", t3)
        (t1, t2, t3, t4)
      }
      Map(1 -> stages.count(_._1.isDefined).toLong,
        2 -> stages.count(_._2.isDefined).toLong,
        3 -> stages.count(_._3.isDefined).toLong,
        4 -> stages.count(_._4.isDefined).toLong)
    }
    val got = RelationalQueries.funnel(rows.toDF("user_id", "event_type", "tsu"))
      .select("stage", "n_users").as[(Int, Long)].collect().toMap
    assert(got == naive(), s"got $got expected ${naive()}")
  }

  test("funnel: conv_bp is stage-over-previous-stage in basis points") {
    val rows = (1L to 4L).flatMap { u =>
      // users 1-4 sign up; 1-2 view; 1 clicks
      Seq((u, "signup", 0L)) ++
        (if (u <= 2) Seq((u, "view", H)) else Nil) ++
        (if (u <= 1) Seq((u, "click", 2 * H)) else Nil)
    }
    val r = RelationalQueries.funnel(rows.toDF("user_id", "event_type", "tsu"))
      .select("stage", "n_users", "conv_bp").as[(Int, Long, Long)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    assert(r(1) == ((4L, 10000L)))
    assert(r(2) == ((2L, 5000L))) // 2/4
    assert(r(3) == ((1L, 5000L))) // 1/2
    assert(r(4) == ((0L, 0L)))    // 0/1
  }

  test("session_window gap boundary is NON-strict: an event at exactly start+gap merges") {
    import spark.implicits._
    // gap 10 s; events at 1 s, exactly 11 s (tie) and 36 s — the tie
    // must merge into the first session (2,1), pinning the rule the
    // ev_session_window oracle's `gap > G` predicate encodes
    val df = Seq(1000L, 11000L, 36000L).toDF("ms")
      .select(timestamp_millis(col("ms")).as("ts"))
    val out = df.groupBy(session_window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("session_window.start")).as("s"), col("n"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1000L, 2L), (36000L, 1L)),
      s"session_window boundary drifted: $out")
  }

  test("built-in session_window == the lag-split sessions on real data") {
    val ev = Tables.events(spark, sf0001)
    val builtIn = ev.select(col("user_id"), Tables.eventTime(ev).as("ts_utc"))
      .groupBy(col("user_id"), session_window(col("ts_utc"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("s_start"),
        col("n_events"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("tsu")
    val lagSplit = ev.select(col("user_id"), Tables.eventMicros(ev).as("tsu"))
      .withColumn("new_s", when(lag("tsu", 1).over(w).isNull ||
        col("tsu") - lag("tsu", 1).over(w) > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(w))
      .groupBy("user_id", "sid")
      .agg(min("tsu").as("s_start"), count(lit(1)).as("n_events"))
      .select("user_id", "s_start", "n_events")
    assert(builtIn.exceptAll(lagSplit).isEmpty && lagSplit.exceptAll(builtIn).isEmpty)
  }
}
