package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Url

/** Web-corpus URL hygiene — the curation steps between WARC ingestion
  * (s10) and content dedup that operate on the URL alone: canonicalization
  * (collapse case / default-port / fragment / tracking-param / trailing-
  * slash spellings of the same resource) and registrable-domain suffix
  * blocklisting (one rule bans a domain AND every subdomain, the Public
  * Suffix List mechanism — pp6's exact-host filter can't express it).
  *
  * The documents table has no URL column, so both engines derive the SAME
  * messy URL deterministically from (doc_id, source) — the approx4-probes
  * pattern: the fixture is part of the query, the oracle re-derives it.
  *
  * Reference analog: none (ingest keeps URLs verbatim, SURVEY §2 S4);
  * LLM-data extension surface alongside tx24/pp6.
  */
object WebQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Deterministic messy-URL fixture: scheme case flips on doc_id%2, a
    * default :443 port appears on %3, a trailing slash on %4, a fragment
    * on %5; every URL carries a utm_ tracking param and unsorted params. */
  private[queries] def messyUrl = concat(
    when(col("doc_id") % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
    lit("://WWW."), col("source"), lit(".Example.COM"),
    when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
    lit("/Doc/"), (col("doc_id") % 40).cast("string"),
    when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
    lit("?utm_source=feed&b=2&a="), (col("doc_id") % 3).cast("string"),
    when(col("doc_id") % 5 === 0, lit("#top")).otherwise(lit("")))

  val queries: Map[String, Q] = Map(
    // ---- url1: URL canonicalization + variant collapse — every rule of
    // Url.canonicalize is exercised by the fixture (case, :443, fragment,
    // utm_ param, param order, trailing slash), and distinct spellings of
    // the same resource collapse to one group. Scale shape: the canonical
    // form is a narrow codegen regexp/array projection riding the scan;
    // the collapse is one hash groupBy on the canonical key — the cheapest
    // dedup class, run BEFORE any content similarity machinery ------------
    "url1_canonicalize" -> { (s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), messyUrl.as("url"))
        .withColumn("canonical_url", Url.canonicalize(col("url")))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_doc"),
          countDistinct(col("url")).as("n_spellings"))
        .orderBy("canonical_url")
    },
    // ---- url2: registrable-domain suffix blocklist — one rule bans the
    // domain and all subdomains; the LONGEST matching rule wins (so a
    // narrow subdomain rule overrides nothing broader here, but the
    // precedence is pinned). Scale shape: a host with L labels explodes
    // into L suffix keys (L ≤ ~10) equi-joined against the BROADCAST rule
    // table — O(hosts × labels) work for any blocklist size, never a
    // hosts × rules regex product. The oracle takes the opposite, small-N
    // plan (a LIKE per rule) — same answer from a different shape is the
    // point of the check --------------------------------------------------
    // ---- st18: the SAME Url module inside Structured Streaming — the
    // ST4 batch-module-reuse contract for web hygiene: a document stream
    // gets canonical_url + blocked_by as a pure STATELESS projection
    // (blockedByLiteral is a codegen filter+fold over label suffixes — no
    // join, no aggregation, so append mode needs no watermark/state at
    // all). The oracle recomputes both columns per doc in SQL ------------
    "st18_stream_url_hygiene" -> { (s, dir) =>
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val raw = graft.streaming.Streams.parquetStream(
        s, s"$dir/documents.parquet", schema)
      graft.streaming.Streams.runToParquet(raw, st =>
          st.select(col("doc_id"), messyUrl.as("url"))
            .withColumn("canonical_url", Url.canonicalize(col("url")))
            .withColumn("blocked_by", Url.blockedByLiteral(
              Url.host(col("url")),
              Seq("src3.example.com", "src7.example.com")))
            .select(col("doc_id"), col("canonical_url"), col("blocked_by"),
              (col("blocked_by") =!= "").cast("int").as("blocked")))
        .orderBy("doc_id")
    },
    "url2_suffix_blocklist" -> { (s, dir) =>
      val hosts = Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(col("source"), lit(".example.com")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("a"), (col("doc_id") % 2).cast("string"), lit("."),
              col("source"), lit(".example.com")))
          .otherwise(concat(lit("cdn.media."), col("source"),
            lit(".example.com"))).as("host"))
      Url.blockBySuffix(hosts, "host",
          Seq("src3.example.com", "media.src5.example.com",
            "a1.src7.example.com"), Seq("doc_id"))
        .select(col("doc_id"), col("host"), col("blocked_by"),
          (col("blocked_by") =!= "").cast("int").as("blocked"))
        .orderBy("doc_id")
    }
  )

  // shared canonicalization replica: identical regexes ((?s) fragment
  // strip, userinfo '.*@' strip), identical list algebra — COALESCE
  // guards DuckDB's NULL on regexp no-match (Spark returns '' there)
  private val canonSql =
    "regexp_replace(url, '(?s)#.*', '') AS base, " +
      "lower(COALESCE(regexp_extract(regexp_replace(url, '(?s)#.*', ''), " +
      "'^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme, " +
      "regexp_replace(lower(COALESCE(regexp_extract(regexp_replace(url, '(?s)#.*', ''), " +
      "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1), '')), '.*@', '') AS hp"

  val oracle: Map[String, String] = Map(
    "url1_canonicalize" ->
      ("WITH u AS (SELECT doc_id, " +
        "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://WWW.' || " +
        "source || '.Example.COM' || " +
        "(CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END) || " +
        "'/Doc/' || (doc_id % 40) || " +
        "(CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) || " +
        "'?utm_source=feed&b=2&a=' || (doc_id % 3) || " +
        "(CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END) AS url FROM documents), " +
        "p AS (SELECT doc_id, url, " + canonSql + " FROM u), " +
        "c AS (SELECT doc_id, url, CASE WHEN scheme = '' THEN NULL ELSE scheme || '://' || " +
        "(CASE WHEN scheme = 'https' THEN regexp_replace(hp, ':443$', '') " +
        "WHEN scheme = 'http' THEN regexp_replace(hp, ':80$', '') ELSE hp END) || " +
        "regexp_replace(COALESCE(regexp_extract(base, " +
        "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), ''), '/+$', '') || " +
        "(CASE WHEN q <> '' THEN '?' || q ELSE '' END) END AS canonical_url FROM " +
        "(SELECT *, array_to_string(list_sort(list_filter(string_split(" +
        "COALESCE(regexp_extract(base, '\\?([^#]*)', 1), ''), '&'), " +
        "p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS q FROM p)) " +
        "SELECT canonical_url, count(*) AS n_variants, min(doc_id) AS first_doc, " +
        "count(DISTINCT url) AS n_spellings FROM c GROUP BY 1 ORDER BY 1"),
    // per-doc canonical + host + blocklist verdict — the same fixture and
    // canonicalization replica as url1, ungrouped; host replicates
    // Url.host (lowered authority, ANY trailing :port stripped)
    "st18_stream_url_hygiene" ->
      ("WITH u AS (SELECT doc_id, " +
        "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://WWW.' || " +
        "source || '.Example.COM' || " +
        "(CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END) || " +
        "'/Doc/' || (doc_id % 40) || " +
        "(CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) || " +
        "'?utm_source=feed&b=2&a=' || (doc_id % 3) || " +
        "(CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END) AS url FROM documents), " +
        "p AS (SELECT doc_id, url, " + canonSql + " FROM u), " +
        "c AS (SELECT doc_id, CASE WHEN scheme = '' THEN NULL ELSE scheme || '://' || " +
        "(CASE WHEN scheme = 'https' THEN regexp_replace(hp, ':443$', '') " +
        "WHEN scheme = 'http' THEN regexp_replace(hp, ':80$', '') ELSE hp END) || " +
        "regexp_replace(COALESCE(regexp_extract(base, " +
        "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), ''), '/+$', '') || " +
        "(CASE WHEN q <> '' THEN '?' || q ELSE '' END) END AS canonical_url, " +
        "regexp_replace(hp, ':[0-9]+$', '') AS host FROM " +
        "(SELECT *, array_to_string(list_sort(list_filter(string_split(" +
        "COALESCE(regexp_extract(base, '\\?([^#]*)', 1), ''), '&'), " +
        "p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS q FROM p)), " +
        "m AS (SELECT doc_id, canonical_url, " +
        "CASE WHEN host = 'src3.example.com' OR host LIKE '%.src3.example.com' " +
        "THEN 'src3.example.com' " +
        "WHEN host = 'src7.example.com' OR host LIKE '%.src7.example.com' " +
        "THEN 'src7.example.com' ELSE '' END AS blocked_by FROM c) " +
        "SELECT doc_id, canonical_url, blocked_by, " +
        "CAST(blocked_by <> '' AS INT) AS blocked FROM m ORDER BY doc_id"),
    // longest-rule-first CASE (22 > 19 > 16 chars) mirrors the engine's
    // max-length winner; a rule matches its exact host or any '.'-boundary
    // subdomain, never a label fragment
    "url2_suffix_blocklist" ->
      ("WITH h AS (SELECT doc_id, " +
        "CASE WHEN doc_id % 3 = 0 THEN source || '.example.com' " +
        "WHEN doc_id % 3 = 1 THEN 'a' || (doc_id % 2) || '.' || source || '.example.com' " +
        "ELSE 'cdn.media.' || source || '.example.com' END AS host FROM documents), " +
        "m AS (SELECT doc_id, host, " +
        "CASE WHEN host = 'media.src5.example.com' OR host LIKE '%.media.src5.example.com' " +
        "THEN 'media.src5.example.com' " +
        "WHEN host = 'a1.src7.example.com' OR host LIKE '%.a1.src7.example.com' " +
        "THEN 'a1.src7.example.com' " +
        "WHEN host = 'src3.example.com' OR host LIKE '%.src3.example.com' " +
        "THEN 'src3.example.com' ELSE '' END AS blocked_by FROM h) " +
        "SELECT doc_id, host, blocked_by, CAST(blocked_by <> '' AS INT) AS blocked " +
        "FROM m ORDER BY doc_id")
  )
}
