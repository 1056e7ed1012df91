package graft

import graft.kv.OpLog
import org.apache.spark.sql.functions._

/** AQE runtime re-planning — the OTHER skew lever next to the manual
  * salted fold (kv_state_skewed): Spark's adaptive skew-join split,
  * demonstrated on the planted-hot-key op log. Test scale can't reach
  * the 256 MB default trigger, so the thresholds are lowered to fire
  * on the hot partition's real size — the mechanism under test
  * (runtime partition split + mirrored-side duplication) is the one
  * that fires untouched at 100 TB.
  */
class AqeSpec extends SparkSpec {

  test("AQE splits the planted hot key's skewed join partition (skew=true)") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1024",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~70% of ops on key "hot": its hash partition dwarfs the rest.
      // repartition(16) first: AQE splits a skewed partition at MAP-
      // output granularity, and the single-file test scan would
      // otherwise produce ONE mapper — nothing to split (at 100 TB the
      // mapper count is in the thousands for free)
      val ops = OpLog.fromEventsSkewed(Tables.events(spark, sf0001)).toDF
        .repartition(16)
      // materialized: OptimizeSkewedJoin pattern-matches
      // SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — an aggregate
      // between sort and stage (an inline distinct) defeats the rule
      val dim = ops.select("key").distinct()
        .withColumn("tag", length(col("key"))).localCheckpoint(true)
      val joined = ops.join(dim, "key")
        .groupBy("kind").agg(count(lit(1)).as("n"))
      val viaAqe = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew-join did not fire:\n$plan")
      // the split must not change the answer
      val expected = ops.groupBy("kind").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaAqe == expected && viaAqe.nonEmpty)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter: selective dim filter is injected into the fact side") {
    // the third scan-reduction lever next to static partition pruning
    // and zone maps: when a dimension carries a selective filter,
    // InjectRuntimeFilter builds a bloom filter of the surviving join
    // keys and applies might_contain() on the FACT side BEFORE its
    // shuffle — at 100 TB that drops most fact rows at the scan/map
    // stage instead of shuffling them to die in the join. Test scale
    // only needs the application-side size gate lowered (10 GB default
    // — the mechanism is the one that fires untouched in production).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
      val urgent = Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val joined = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(round(sum("l_quantity"), 2).as("qty"))
      val hasBloom = joined.queryExecution.optimizedPlan.exists(_.expressions.exists(
        _.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])))
      assert(hasBloom, s"no BloomFilterMightContain in:\n${joined.queryExecution.optimizedPlan}")
      // the filter is a pure pruning aid — answers must be identical
      val viaBloom = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(round(sum("l_quantity"), 2).as("qty"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(viaBloom == plain && viaBloom.nonEmpty)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
