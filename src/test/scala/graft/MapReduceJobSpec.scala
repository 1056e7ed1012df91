package graft

import graft.core.{KeyValue, MapReduceJob}
import org.apache.spark.sql.functions._

/** Framework correctness, mirroring the reference's mapreduce test
  * suite semantics (reference: src/mapreduce/test_test.go:15-19,
  * 98-116): 100,000 records split across M=100 inputs, R=50 reducers,
  * identity map/reduce — merged output must equal the sorted input.
  */
class MapReduceJobSpec extends SparkSpec {
  import spark.implicits._

  test("identity job: 100k records, M=100 inputs, R=50 reducers") {
    // Reference keys are numbers as strings; pad so string sort ==
    // numeric sort (the reference compares against `sort -n` output;
    // padding keeps one deterministic order for both).
    val docs = spark
      .range(100000)
      .repartition(100)
      .mapPartitions { it => // one "file" per partition, as in the reference
        val rows = it.map(n => f"$n%06d").mkString("\n")
        Iterator(("file", rows))
      }

    val out = MapReduceJob.run(
      docs,
      nReduce = 50,
      mapF = (_, contents) => contents.split("\n").iterator.map(KeyValue(_, "")),
      reduceF = (_, _) => "")

    assert(out.rdd.getNumPartitions == 50)
    val keys = out.select("key").as[String].collect()
    assert(keys.length == 100000)
    assert(keys.distinct.length == 100000)
    // per-reducer key order (reference common_reduce.go:52-60)
    val perPartitionSorted = out
      .mapPartitions(it => Iterator(it.map(_.key).toSeq))
      .collect()
      .forall(ks => ks == ks.sorted)
    assert(perPartitionSorted)
    // merged output = globally sorted input (master_splitmerge.go)
    val merged = MapReduceJob.merged(out).collect()
    assert(merged.toSeq == (0 until 100000).map(n => f"$n%06d: "))
  }

  test("wordCount via generic MapReduceJob matches the DataFrame plan") {
    val docsDf = Tables.documents(spark, sf0001)
    val docs = docsDf.select($"doc_id".cast("string"), $"text").as[(String, String)]

    val viaMr = MapReduceJob
      .run(
        docs,
        nReduce = 8,
        mapF = (_, text) =>
          text.split(apps.TextApps.TOKEN_SPLIT).iterator
            .filter(_.nonEmpty).map(KeyValue(_, "1")),
        reduceF = (_, values) => values.map(_.toLong).sum.toString)
      .collect()
      .map(kv => (kv.key, kv.value.toLong))
      .sortBy(_._1)

    val viaDf = apps.TextApps
      .wordCount(docsDf)
      .orderBy("word")
      .as[(String, Long)]
      .collect()

    assert(viaMr.toSeq == viaDf.toSeq)
  }

  test("worker failure: task retries leave the result intact (reference test layer 2)") {
    // the reference kills workers mid-job and asserts completion
    // (src/mapreduce/test_test.go:176-210); Spark's analogue is task
    // retry — fail one task's first attempt, assert identical output
    val docs = spark.range(1000).repartition(8).mapPartitions { it =>
      Iterator(("f", it.map(n => f"$n%04d").mkString("\n")))
    }
    def job() = MapReduceJob.run(
      docs, 4,
      mapF = (_, c) => c.split("\n").iterator.map(KeyValue(_, "1")),
      reduceF = (_, vs) => vs.size.toString)
    val expected = job().collect().map(kv => kv.key -> kv.value).toMap

    val flaky = MapReduceJob.run(
      docs, 4,
      mapF = (_, c) => {
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null && tc.partitionId() == 2 && tc.attemptNumber() == 0)
          throw new RuntimeException("injected worker failure")
        c.split("\n").iterator.map(KeyValue(_, "1"))
      },
      reduceF = (_, vs) => vs.size.toString)
    val got = flaky.collect().map(kv => kv.key -> kv.value).toMap
    assert(got == expected)
  }

  test("merged sink renders reference text format") {
    val kvs = Seq(KeyValue("b", "2"), KeyValue("a", "1")).toDS()
    assert(MapReduceJob.merged(kvs).collect().toSeq == Seq("a: 1", "b: 2"))
  }
}
