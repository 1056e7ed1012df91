package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token stats,
  * quality scoring, n-gram language ID, and winnowing-style document
  * fingerprints. Everything is built from codegen'd built-ins and uses
  * only portable arithmetic + md5, so each operator has an exact
  * DuckDB oracle.
  *
  * These generalize the reference's text plane: tokenization (P1),
  * term statistics (A2) and dedup-flavored set ops (A3/T5) — see
  * SURVEY §2.9.
  */
object TextAnalysis {

  /** BPE-ish token pattern: letter runs, digit runs, or single
    * non-space symbols — a cheap proxy for subword token counts. */
  val BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** docs -> (doc_id, toks array). The documents table is lowercase
    * space-separated; split(' ') is the exact tokenizer. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))

  /** Per-document token statistics: counts, type/token ratio, mean
    * token length, BPE-ish subword count. */
  def tokenStats(docs: DataFrame): DataFrame =
    tokens(docs)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("n_tok_chars"))
      .withColumn("ttr", round(col("n_types").cast("double") / col("n_tokens"), 4))
      .withColumn("mean_tok_len", round(col("n_tok_chars").cast("double") / col("n_tokens"), 4))

  /** BPE-ish token counts per language (aggregate view). */
  def bpeCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit(BPE_PATTERN)).cast("long").as("bpe_tokens"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("ws_tokens"),
        sum("bpe_tokens").as("bpe_tokens"))

  /** Tiny per-language stopword lists for the n-gram/stopword language
    * ID heuristic. Small by design (broadcast join). */
  val stopwords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "of", "en" -> "and", "en" -> "in", "en" -> "is",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "ist", "de" -> "von",
    "fr" -> "le", "fr" -> "la", "fr" -> "les", "fr" -> "et", "fr" -> "dans",
    "es" -> "el", "es" -> "los", "es" -> "que", "es" -> "una", "es" -> "es")

  /** Language ID: score = stopword hits per language; winner by
    * (score desc, lang asc). Degenerates honestly on the synthetic
    * corpus (scores are what they are); the operator shape is the
    * point: explode -> broadcast join -> argmax.
    *
    * The argmax is a min_by hash AGGREGATE over struct(-hits, lang)
    * (lexicographic struct order == hits DESC, lang ASC exactly), not
    * a row_number window: the aggregate gets map-side partial
    * combining and needs no per-partition sort — at corpus scale the
    * per-doc window was pure overhead. */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sw = broadcast(stopwords.toDF("cand_lang", "word"))
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val langs = broadcast(stopwords.map(_._1).distinct.sorted.toDF("cand_lang"))
    val docLang = docs.select(col("doc_id")).crossJoin(langs)
    val scores = toks
      .join(sw, Seq("word"))
      .groupBy("doc_id", "cand_lang")
      .agg(count(lit(1)).as("hits"))
    val full = docLang.join(scores, Seq("doc_id", "cand_lang"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
    full
      .groupBy("doc_id")
      .agg(min_by(
        struct(col("cand_lang"), col("hits")),
        struct((-col("hits")).as("nh"), col("cand_lang"))).as("best"))
      .select(col("doc_id"), col("best.cand_lang").as("pred_lang"), col("best.hits").as("score"))
  }

  /** Quality score in [0,1]: length component + stopword-density
    * component, capped. Deterministic arithmetic only. */
  def quality(docs: DataFrame): DataFrame = {
    val enStop = stopwords.filter(_._1 == "en").map(_._2)
    val toks = tokens(docs)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_hits",
        size(filter(col("toks"), t => t.isin(enStop: _*))).cast("long"))
    toks.select(
      col("doc_id"),
      col("n_tokens"),
      col("stop_hits"),
      round(
        least(
          lit(1.0),
          lit(0.5) * least(col("n_tokens").cast("double") / 50.0, lit(1.0)) +
            lit(0.5) * least(col("stop_hits").cast("double") * 4.0 / col("n_tokens"), lit(1.0))),
        4).as("quality"))
  }

  /** Positional k-gram shingles: (doc_id, pos, shingle) for pos in
    * 1..n-k+1 (1-based, matching DuckDB list slicing). */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame =
    tokens(docs)
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .filter(col("n") >= k)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), col("n") - (k - 1))).as("pos"))
      .select(col("doc_id"), col("pos"),
        array_join(slice(col("toks"), col("pos"), lit(k)), " ").as("shingle"))

  /** Winnowing-style fingerprint: min md5 over a doc's k-gram window
    * hashes — equal fingerprints flag heavy overlap. */
  def fingerprint(docs: DataFrame, k: Int = 5): DataFrame =
    shingles(docs, k)
      .groupBy("doc_id")
      .agg(
        min(md5(col("shingle"))).as("fp"),
        count(lit(1)).cast("long").as("n_shingles"))

  /** Intra-document repetition score — the boilerplate/looped-text
    * detector (a doc whose k-grams repeat heavily is template output,
    * scraper residue, or a generation loop): rep_ratio = 1 −
    * distinct/total over the doc's positional k-grams. One groupBy on
    * doc_id; both counts come from the same shuffled rows. */
  def repetition(docs: DataFrame, k: Int = 3): DataFrame =
    shingles(docs, k)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        countDistinct(col("shingle")).as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 4))
}
