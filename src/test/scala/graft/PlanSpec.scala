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

  test("q3/q5: dimension joins are broadcast, fact side never shuffles for them") {
    Seq("q3_join", "q5_join").foreach { q =>
      val s = formatted(q)
      assert(s.contains("BroadcastHashJoin"), s"$q lost its broadcast joins")
      assert(!s.contains("SortMergeJoin"), s"$q fell back to SMJ on a dimension")
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
}
