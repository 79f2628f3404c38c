package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Oracle-checked text-analysis queries over `documents` (training-data
  * pipeline surface): language-ID, quality scoring, token counting,
  * fingerprinting. Every query is a single narrow projection (+ the final
  * deterministic sort for comparison).
  */
object TextQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "tx1_langid" -> { (s, dir) =>
      Tables.t(s, dir, "documents")
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), langIdFromTokens(col("toks")).as("pred_lang"))
        .orderBy("doc_id")
    },
    "tx2_quality" -> { (s, dir) =>
      Tables.t(s, dir, "documents")
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"),
          qualityScoreFromTokens(col("toks"), col("text")).as("quality"))
        .orderBy("doc_id")
    },
    "tx3_token_counts" -> { (s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_ws_tokens"),
          bpeUnitCount(col("text")).cast("long").as("n_bpe_units"))
        .orderBy("doc_id")
    },
    "tx4_fingerprint" -> { (s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          fingerprintMd5(col("text")).as("fp"))
        .orderBy("doc_id")
    },
    // search-index dual fields: raw columns untouched + analyzed __tokens
    // arrays per SearchIndexSchema (tokenize-by-default, overrides opt out)
    "tx5_tokenized_fields" -> { (s, dir) =>
      val schema = graft.model.SearchIndexSchema(
        tokenizeByDefault = true,
        typeOverride = Map("lang" -> "STRING", "source" -> "STRING"))
      graft.store.SearchIndexer.withAnalyzedFields(
          Tables.t(s, dir, "documents"), schema)
        .select(col("doc_id"), col("lang"),
          size(col("text__tokens")).as("n_tokens"),
          array_join(slice(col("text__tokens"), 1, 5), " ").as("head_tokens"))
        .orderBy("doc_id")
    }
  )

  /** langid score SQL fragment for one language (occurrences of markers in
    * the whitespace token list). */
  private def scoreSql(markers: Seq[String]): String =
    markers.map(m => s"len(list_filter(string_split(text,' '), t -> t = '$m'))")
      .mkString(" + ")

  private val langCase: String = {
    // same nested CASE as TextFunctions.langId: lang_i wins on >= max of later
    val scored = LangMarkers.map { case (l, ms) => (l, s"(${scoreSql(ms)})") }
    def pick(rest: Seq[(String, String)]): String = rest match {
      case (l, _) +: Nil => s"'$l'"
      case (l, sc) +: tail =>
        val maxTail = tail.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
        s"CASE WHEN $sc >= $maxTail THEN '$l' ELSE ${pick(tail)} END"
      case _ => "NULL"
    }
    pick(scored)
  }

  val oracle: Map[String, String] = Map(
    "tx1_langid" ->
      s"SELECT doc_id, $langCase AS pred_lang FROM documents ORDER BY doc_id",
    "tx2_quality" -> {
      val stop = scoreSql(LangMarkers.head._2)
      // mirror TextFunctions.qualityScore arithmetic order exactly
      "SELECT doc_id, " +
        s"(CAST(($stop) AS DOUBLE) / nTok) * 0.25 " +
        "+ least(((nChar - (nTok - 1.0)) / nTok) / 10.0, 1.0) * 0.25 " +
        "+ least(nTok / 100.0, 1.0) * 0.5 AS quality FROM " +
        "(SELECT doc_id, text, " +
        "CAST(len(string_split(text,' ')) AS DOUBLE) AS nTok, " +
        "CAST(length(text) AS DOUBLE) AS nChar FROM documents) " +
        "ORDER BY doc_id"
    },
    "tx3_token_counts" ->
      ("SELECT doc_id, len(string_split(text,' ')) AS n_ws_tokens, " +
        s"len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_units " +
        "FROM documents ORDER BY doc_id"),
    "tx4_fingerprint" ->
      ("SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp " +
        "FROM documents ORDER BY doc_id"),
    "tx5_tokenized_fields" ->
      ("SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens, " +
        "array_to_string(string_split(text, ' ')[1:5], ' ') AS head_tokens " +
        "FROM documents ORDER BY doc_id")
  )
}
