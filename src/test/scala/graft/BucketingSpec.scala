package graft

import graft.kv.{Aggregators, KVEngine, OpLog}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale levers that need a persisted layout or a typed-UDAF surface:
  * bucketed co-located joins (no shuffle of either side) and the
  * Aggregator form of the order-sensitive fold.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    Tables.lineitem(spark, sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum("l_quantity").as("q"))

    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] = {
      val here = p.collect { case e: ShuffleExchangeExec => e }
      val inner = p.collect { case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan) }.flatten
      here ++ inner
    }
    // disable broadcast for this check so the join strategy is SMJ;
    // bucketing must remove BOTH join-side shuffles (only the final
    // 3-group agg exchange remains)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val n = shuffles(joined.queryExecution.executedPlan).size
      assert(n <= 1, s"expected co-located join, got $n shuffles")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("AppendFold Aggregator == streaming-sort replay, under any input order") {
    val ops = OpLog.fromEvents(Tables.events(spark, sf0001))
    val viaReplay = KVEngine.replay(ops).as[(String, String)].collect().toMap
    val writes = KVEngine.dedup(ops).filter(col("kind") =!= "get").as[graft.kv.Op]
    val viaAgg = writes
      .orderBy(rand(42)) // adversarial input order
      .groupByKey(_.key)
      .agg(Aggregators.AppendFold.toColumn.name("value"))
      .collect().toMap
    assert(viaAgg == viaReplay)
  }

  test("SumEncoded Aggregator registers via functions.udaf (reference reduceF surface)") {
    val sumEnc = udaf(Aggregators.SumEncoded)
    val got = Seq(("a", "1"), ("a", "2"), ("b", "40")).toDF("key", "value")
      .groupBy("key").agg(sumEnc(col("value")).as("s"))
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "3", "b" -> "40"))
  }
}
