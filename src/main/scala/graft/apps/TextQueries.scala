package graft.apps

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-checkable queries for the MapReduce text plane
  * (reference apps wc.go / ii.go, SURVEY §2.2-2.4).
  */
object TextQueries extends QueryPack {

  // Same token contract as TextApps.TOKEN_SPLIT, RE2 spelling for DuckDB.
  private val SPLIT_SQL = "[^\\p{L}\\p{N}]+"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wc_wordcount" -> ((s, dir) =>
      TextApps.wordCount(Tables.documents(s, dir)).orderBy("word")),
    "wc_top10" -> ((s, dir) =>
      TextApps.topWords(Tables.documents(s, dir), 10)),
    "ii_postings" -> ((s, dir) =>
      TextApps.invertedIndex(Tables.documents(s, dir)).orderBy("word")),
    "mr_grep" -> ((s, dir) =>
      TextApps.grep(Tables.documents(s, dir), "stream").orderBy("doc_id")),
    // Reference T4 (test-ii.sh): drop posting lines containing "16",
    // take the 10 heaviest postings (stable by word).
    "ii_top10" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      TextApps.invertedIndex(Tables.documents(s, dir))
        .filter(!concat(col("n_docs").cast("string"), lit(" "), col("docs")).contains("16"))
        .orderBy(desc("n_docs"), desc("word"))
        .limit(10)
    },
  )

  def oracleSql: Map[String, String] = Map(
    "wc_wordcount" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(regexp_split_to_array(text, '$SPLIT_SQL')) AS word
         |      FROM documents)
         |WHERE word <> ''
         |GROUP BY word ORDER BY word""".stripMargin,
    "wc_top10" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(regexp_split_to_array(text, '$SPLIT_SQL')) AS word
         |      FROM documents)
         |WHERE word <> ''
         |GROUP BY word ORDER BY cnt DESC, word LIMIT 10""".stripMargin,
    "ii_postings" ->
      s"""SELECT word, count(*) AS n_docs,
         |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs
         |FROM (SELECT DISTINCT doc_id, word
         |      FROM (SELECT doc_id,
         |                   unnest(regexp_split_to_array(text, '$SPLIT_SQL')) AS word
         |            FROM documents)
         |      WHERE word <> '')
         |GROUP BY word ORDER BY word""".stripMargin,
    "mr_grep" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE regexp_matches(text, 'stream') ORDER BY doc_id""".stripMargin,
    "ii_top10" ->
      s"""SELECT word, n_docs, docs FROM (
         |  SELECT word, count(*) AS n_docs,
         |         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs
         |  FROM (SELECT DISTINCT doc_id, word
         |        FROM (SELECT doc_id,
         |                     unnest(regexp_split_to_array(text, '$SPLIT_SQL')) AS word
         |              FROM documents)
         |        WHERE word <> '')
         |  GROUP BY word)
         |WHERE NOT contains(CAST(n_docs AS VARCHAR) || ' ' || docs, '16')
         |ORDER BY n_docs DESC, word DESC LIMIT 10""".stripMargin,
  )
}
