package graft

import graft.apps.MRApps
import graft.core.MapReduceJob
import java.nio.file.Files

/** App-level parity for the reference's wc/ii binaries: real files in,
  * golden "key: value" lines out (reference harness: test-wc.sh /
  * test-ii.sh diff against committed golden files).
  */
class MRAppsSpec extends SparkSpec {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_corpus")
    Files.writeString(d.resolve("pg-a.txt"), "the cat and the hat")
    Files.writeString(d.resolve("pg-b.txt"), "the cat sat! on... a mat")
    Files.writeString(d.resolve("pg-c.txt"), "hat mat bat")
    d.toString
  }

  test("wordCount over wholetext files matches hand-computed golden output") {
    val out = MapReduceJob.merged(MRApps.wordCount(MRApps.wholeText(spark, dir))).collect()
    assert(out.toSeq == Seq(
      "a: 1", "and: 1", "bat: 1", "cat: 2", "hat: 2",
      "mat: 2", "on: 1", "sat: 1", "the: 3"))
  }

  test("invertedIndex over wholetext files renders sorted posting lists") {
    val out = MapReduceJob.merged(MRApps.invertedIndex(MRApps.wholeText(spark, dir))).collect()
    assert(out.contains("the: 2 pg-a.txt,pg-b.txt"))
    assert(out.contains("hat: 2 pg-a.txt,pg-c.txt"))
    assert(out.contains("bat: 1 pg-c.txt"))
    // tokenizer parity: punctuation split (sat! / on...) must not leak
    assert(out.exists(_.startsWith("sat: 1")) && out.exists(_.startsWith("on: 1")))
    assert(!out.exists(_.contains("!")))
  }
}
