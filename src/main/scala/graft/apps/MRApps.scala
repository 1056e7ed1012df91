package graft.apps

import graft.core.{KeyValue, MapReduceJob}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's two applications in their original form — files in,
  * mapF/reduceF closures, merged "key: value" text out (reference:
  * src/main/wc.go:52-59, ii.go:69-76) — over the generic
  * [[MapReduceJob]]. The table-backed TextApps variants are the
  * Spark-first fast path; these exist for app-level API parity.
  */
object MRApps {

  /** S1: whole-file text scan — one (basename, contents) record per
    * file (reference: common_map.go:51-56 reads the entire file as one
    * map input). */
  def wholeText(spark: SparkSession, dir: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read
      .option("wholetext", "true")
      .text(dir)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("doc"),
        col("value"))
      .as[(String, String)]
  }

  private def tokenize(contents: String): Iterator[String] =
    contents.split(TextApps.TOKEN_SPLIT).iterator.filter(_.nonEmpty)

  /** wc.go semantics: mapF emits (word, "1"), reduceF sums. */
  def wordCount(docs: Dataset[(String, String)], nReduce: Int = 3): Dataset[KeyValue] =
    MapReduceJob.run(
      docs,
      nReduce,
      mapF = (_, contents) => tokenize(contents).map(KeyValue(_, "1")),
      reduceF = (_, values) => values.map(_.toLong).sum.toString)

  /** ii.go semantics: mapF emits (word, doc), reduceF renders
    * "<n> d1,d2,..." over the sorted distinct doc list (golden files
    * are sorted — SURVEY §7.4.2). */
  def invertedIndex(docs: Dataset[(String, String)], nReduce: Int = 3): Dataset[KeyValue] =
    MapReduceJob.run(
      docs,
      nReduce,
      mapF = (doc, contents) => tokenize(contents).map(KeyValue(_, doc)),
      reduceF = (_, values) => {
        val ds = values.toSeq.distinct.sorted
        s"${ds.size} ${ds.mkString(",")}"
      })
}
