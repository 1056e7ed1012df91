package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data
  * pipeline actually runs — exact-dedup to one representative per
  * content group, then language and quality gates — emitting the kept
  * document set with its scores. One query proves the operators
  * compose (shared doc_id join keys, no operator-private shuffles
  * fighting each other), not just work in isolation.
  *
  * Scale shape: every join is an equi-join on doc_id; the dedup
  * representative set is a single md5 groupBy (partial-aggregating);
  * language ID's stopword table is a genuine broadcast. Nothing here
  * is O(corpus) on the driver or in a broadcast.
  */
object Curation {

  /** Documents that survive curation: the content-group representative
    * (min doc_id per md5(text)), predicted language in `langs`, and
    * quality >= `minQuality`. Output: (doc_id, pred_lang, quality). */
  def trainingSet(docs: DataFrame, langs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5): DataFrame = {
    // keep-one exact dedup: the representative is the smallest doc_id
    // of each content group (same convention as Dedup.exactGroups)
    val reps = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    TextAnalysis.quality(docs)
      .select(col("doc_id"), col("quality"))
      .join(reps, Seq("doc_id"), "left_semi")
      .join(TextAnalysis.langId(docs).select(col("doc_id"), col("pred_lang")), Seq("doc_id"))
      .filter(col("pred_lang").isin(langs: _*) && col("quality") >= minQuality)
      .select(col("doc_id"), col("pred_lang"), col("quality"))
  }
}
