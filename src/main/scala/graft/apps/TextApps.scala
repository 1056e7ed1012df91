package graft.apps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's two analytics applications — word count
  * (reference: src/main/wc.go) and inverted index (src/main/ii.go) —
  * re-expressed as declarative DataFrame plans so Catalyst handles
  * partial aggregation, shuffle placement and codegen.
  */
object TextApps {

  /** Tokenizer (reference P1: src/main/wc.go:16-28, ii.go:17-31).
    * Go splits on runes failing unicode.IsLetter/IsNumber; the Java
    * regex classes \p{L}\p{N} are the same contract (note: underscore
    * is NOT a word char here, unlike \w).
    */
  val TOKEN_SPLIT = "[^\\p{L}\\p{N}]+"

  /** documents(doc_id, text, ...) -> one row per token occurrence.
    * explode(split(...)) is codegen'd end-to-end; only doc_id + text
    * are read from parquet (column pruning).
    */
  def tokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), TOKEN_SPLIT)).as("word"))
      .filter(length(col("word")) > 0)

  /** Word count (reference A2: wc.go:34-42 — map emits (word,"1"),
    * reduce sums). groupBy+count gets map-side partial aggregation
    * from Catalyst, i.e. the combiner the reference never had.
    */
  def wordCount(docs: DataFrame): DataFrame =
    tokens(docs)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Top-k most frequent words (reference T3: test-wc.sh sorts by
    * count and takes the last 10; ties broken by word text).
    * Catalyst plans this as TakeOrderedAndProject — no global sort.
    */
  def topWords(docs: DataFrame, k: Int = 10): DataFrame =
    wordCount(docs)
      .orderBy(desc("cnt"), asc("word"))
      .limit(k)

  /** Inverted index (reference A3/T5: ii.go:36-60 — per word: distinct
    * doc list + count, rendered "<n> d1,d2,...").  Golden-file order is
    * sorted (SURVEY §7.4.2), so we sort the posting list numerically.
    */
  def invertedIndex(docs: DataFrame): DataFrame =
    tokens(docs)
      .groupBy("word")
      .agg(
        size(collect_set(col("doc_id"))).cast("long").as("n_docs"),
        array_join(
          transform(array_sort(collect_set(col("doc_id"))), _.cast("string")),
          ",").as("docs"))

  /** Distributed grep — classic MapReduce companion app; a pure
    * pushed-down filter in Spark. */
  def grep(docs: DataFrame, pattern: String): DataFrame =
    docs
      .filter(col("text").rlike(pattern))
      .select(col("doc_id"), col("lang"), col("n_chars"))
}
