package graft

import graft.apps.MRApps
import graft.core.MapReduceJob
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** End-to-end acceptance against the reference's ONLY ground truth:
  * the committed golden files over the real 16-book Gutenberg corpus
  * (reference: src/main/test-wc.sh:2-3 diffs the top-10-by-count word
  * counts against mr-testout.txt; test-ii.sh:3 diffs the filtered
  * tail of the inverted index against mr-challenge.txt). Tokenizer
  * parity on real text — SURVEY §7.4.3's named risk — is proven here,
  * not on synthetic fixtures.
  *
  * The shell pipelines are replicated exactly:
  *  - wc: `sort -n -k2 | tail -10` = numeric sort on the count field,
  *    whole-line bytewise last-resort compare, last 10 lines;
  *  - ii: `sort -k1,1 | sort -snk2,2 | grep -v '16' | tail -10` =
  *    sort by word, then STABLE numeric sort by doc count, drop lines
  *    containing the substring "16" (the all-16-docs lines), last 10.
  */
class GoldenCorpusSpec extends SparkSpec {

  private val refMain = "/root/reference/src/main"

  private def golden(name: String): Seq[String] =
    Files.readAllLines(Paths.get(refMain, name)).asScala.toSeq

  // one (basename, contents) row per book, shared by both tests
  private lazy val corpus = MRApps.wholeText(spark, s"$refMain/pg-*.txt").cache()

  test("wordCount over the Gutenberg corpus matches mr-testout.txt (test-wc.sh)") {
    val lines = MapReduceJob.merged(MRApps.wordCount(corpus)).collect().toSeq
    val top10 = lines
      .sortBy(l => (l.split(" ")(1).toLong, l))
      .takeRight(10)
    assert(top10 == golden("mr-testout.txt"))
  }

  test("invertedIndex over the Gutenberg corpus matches mr-challenge.txt (test-ii.sh)") {
    val lines = MapReduceJob.merged(MRApps.invertedIndex(corpus)).collect().toSeq
    val top10 = lines
      .sortBy(_.split(" ")(0)) // sort -k1,1 (field includes the colon)
      .sortBy(_.split(" ")(1).toLong) // sort -snk2,2 — sortBy is stable
      .filterNot(_.contains("16")) // grep -v '16'
      .takeRight(10)
    assert(top10 == golden("mr-challenge.txt"))
  }
}
