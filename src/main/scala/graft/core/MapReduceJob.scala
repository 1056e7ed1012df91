package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's universal batch record: string key, string value
  * (reference: src/mapreduce/common.go:29-32).
  */
case class KeyValue(key: String, value: String)

/** Generic MapReduce job with the reference's exact UDF contract
  * (reference: src/mapreduce/common_map.go:20, common_reduce.go:18,
  * worker.go:17-18):
  *
  *   mapF(file, contents) => Seq[KeyValue]          (flatMap-shaped UDTF)
  *   reduceF(key, values) => String                 (UDAF-shaped)
  *
  * The reference runs this as phase-at-a-time task scheduling with
  * materialized M×R JSON intermediates (src/mapreduce/master.go:100-118,
  * schedule.go:6-44). Here the whole job is ONE lazy Dataset plan:
  *
  *   input -> flatMap(mapF) -> repartition(nReduce, key)
  *         -> sortWithinPartitions(key) -> mapPartitions(group+reduceF)
  *
  * Spark's shuffle replaces the intermediate files, the DAG scheduler
  * replaces `schedule()`, task retries replace worker-failure handling.
  * Values for one key arrive contiguously after the partition-local sort,
  * so grouping is a single streaming pass — no per-key hash map, no
  * driver involvement, scales to arbitrary partition counts.
  *
  * Per-reducer key order (reference sorts keys before reducing,
  * common_reduce.go:52-60) is preserved by sortWithinPartitions; use
  * [[MapReduceJob.merged]] for the reference's globally-sorted
  * "key: value" text output (master_splitmerge.go:14-51).
  */
object MapReduceJob {

  /** One input document: (name, contents) — the reference's map input
    * (src/mapreduce/common_map.go:51-56: key=filename, value=contents).
    */
  def run(
      docs: Dataset[(String, String)],
      nReduce: Int,
      mapF: (String, String) => IterableOnce[KeyValue],
      reduceF: (String, Iterator[String]) => String): Dataset[KeyValue] = {
    val spark = docs.sparkSession
    import spark.implicits._

    val mapped: Dataset[KeyValue] = docs.flatMap { case (name, contents) => mapF(name, contents) }

    // Hash-partition by key (reference: ihash(key) % nReduce,
    // common_map.go:92-96 — the observable contract is only "all values
    // of a key land in one partition", which Murmur3 satisfies).
    mapped
      .repartition(nReduce, col("key"))
      .sortWithinPartitions("key")
      .mapPartitions { rows =>
        // rows arrive key-sorted: stream contiguous runs of one key
        // through reduceF without materializing a per-partition map.
        Runs.fold(rows)(_.key)((k, run) => KeyValue(k, reduceF(k, run.map(_.value))))
      }
  }

  /** The reference's merged text sink: global key sort, "key: value"
    * lines (src/mapreduce/master_splitmerge.go:35-47). Returned as a
    * single-column Dataset so callers choose the sink.
    */
  def merged(out: Dataset[KeyValue]): Dataset[String] = {
    val spark = out.sparkSession
    import spark.implicits._
    out.orderBy("key").map(kv => s"${kv.key}: ${kv.value}")
  }
}
