package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.TextFunctions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * after cleaning and before packing: statistical-LM quality scoring
  * (the CCNet-style perplexity filter), temperature-based domain
  * re-balancing, and exact stratified sampling. All oracle-checked; no
  * reference analog (its pipeline stops at enrichment — SURVEY §2 A/X),
  * these belong to the LLM-data extension surface like tx20/tx21.
  */
object CurationQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** doc → exploded (doc_id, w1, w2) bigram rows; `slice` keeps docs with
    * < 2 tokens out (empty array) without a separate filter. */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(expr(
        "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
          "(w, i) -> struct(w AS w1, toks[i + 1] AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  val queries: Map[String, Q] = Map(
    // ---- tx25: bigram-LM quality scoring (CCNet's perplexity filter,
    // Wenzek et al. 2020, with an add-one-smoothed 2-gram LM instead of
    // KenLM): train on the src0 slice, score every document by its mean
    // negative log-likelihood per bigram — high nll = far from the clean
    // reference distribution. Scale shape: the model IS two co-keyed agg
    // tables (unigram and bigram counts — vocab-sized, joined back on the
    // gram key, never collected; min-count pruning would shrink them
    // further at real scale) plus a 1-row vocab-size broadcast; scoring is
    // one explode + two equi-joins + one map-side-combinable avg. The
    // DECIMAL(18,6) round absorbs ln()'s last-ulp libm differences and the
    // cross-partition summation order inside avg (same slack bm25/g15
    // document) ----------------------------------------------------------
    "tx25_bigram_lm" -> { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      val ref = docs.filter(col("source") === "src0")
      val uc = ref.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cu"))
      val vsz = uc.agg(count(lit(1)).as("vsz"))
      val bc = bigrams(ref).groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      bigrams(docs)
        .join(bc, Seq("w1", "w2"), "left")
        .join(uc.withColumnRenamed("w", "w1"), Seq("w1"), "left")
        .crossJoin(broadcast(vsz))
        // P(w2|w1) = (C(w1,w2)+1) / (C(w1)+V); unseen w1 → uniform 1/V
        .select(col("doc_id"), (-log((coalesce(col("cb"), lit(0L)) + lit(1.0)) /
          (coalesce(col("cu"), lit(0L)) + col("vsz")))).as("term"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), avg(col("term")).as("raw"))
        .select(col("doc_id"), col("n_bigrams"),
          col("raw").cast(DecimalType(18, 6)).cast("double").as("nll"))
        .orderBy("doc_id")
    },
    // ---- pp4: temperature-based domain re-balancing (the multilingual /
    // multi-source mixing rule, Conneau & Lample 2019 §3.1): sampling
    // weight ∝ count^α with α = 0.5, converted to a per-stratum keep-rate
    // capped at 1, applied as the same deterministic md5 threshold tx10 /
    // pp1 use (RNG-free → reproducible shards). Determinism chain: sqrt
    // and float division are correctly-rounded IEEE ops, and the one
    // order-sensitive step — the Σ√c normalizer — is summed in
    // DECIMAL(28,12) (exact, order-free), so both engines floor the SAME
    // double at the threshold; no epsilon anywhere. Scale shape: stratum
    // stats are a |strata|-row aggregate broadcast back; the filter is a
    // narrow projection ---------------------------------------------------
    "pp4_temperature_sample" -> { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      val cs = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      val tot = cs.agg(sum(col("c")).as("n"),
        sum(sqrt(col("c").cast("double")).cast(DecimalType(28, 12)))
          .cast("double").as("z"))
      val rates = cs.crossJoin(broadcast(tot))
        .select(col("lang"), least(lit(1.0),
          sqrt(col("c").cast("double")) / col("z") *
            col("n").cast("double") / col("c").cast("double")).as("r"))
      docs.join(broadcast(rates), "lang")
        .filter(graft.dedup.TextDedup.md5Int(col("doc_id").cast("string"))
          % 1000000 < floor(col("r") * 1000000).cast("long"))
        .select(col("doc_id"), col("lang"),
          col("r").cast(DecimalType(18, 6)).cast("double").as("keep_rate"))
        .orderBy("doc_id")
    },
    // ---- pp6: domain blocklist + per-domain cap — the C4-style web-corpus
    // hygiene step between WARC ingestion (s10) and text curation: parse
    // the host out of each document's URL, drop blocklisted domains, and
    // keep at most 10 docs per surviving domain (md5 order, deterministic —
    // over-crawled hosts can't dominate the mix). Scale shape: host
    // extraction is a narrow regexp projection, the blocklist is a literal
    // broadcast predicate, and the cap is one window sort PER DOMAIN (the
    // partition key), never a global sort -------------------------------
    "pp6_domain_cap" -> { (s, dir) =>
      val blocked = Seq("src3.example.com", "src7.example.com")
      val docs = Tables.t(s, dir, "documents")
        .withColumn("url", concat(lit("http://"), col("source"),
          lit(".example.com/doc/"), col("doc_id")))
      docs
        .withColumn("host", regexp_extract(col("url"), "^https?://([^/]+)/", 1))
        .filter(!col("host").isin(blocked: _*))
        .withColumn("rn", row_number().over(
          Window.partitionBy("host")
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        .filter(col("rn") <= 10)
        .select(col("doc_id"), col("host"), col("rn"))
        .orderBy("host", "rn")
    },
    // ---- pp7: dataset card — the per-source datasheet every corpus
    // release ships (docs, token volume, language mix, exact-dup rate) in
    // ONE plan: a narrow token-count projection, one global fingerprint
    // count (co-keyed on the md5, the dd1 mechanism) re-joined to tag
    // duplicated docs, then a single per-source aggregate. The dup ratio
    // is an exact integer pair; avg tokens is DECIMAL-rounded (the one
    // division) ----------------------------------------------------------
    "pp7_dataset_card" -> { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          md5(col("text")).as("fp"))
      val fpCounts = docs.groupBy("fp").agg(count(lit(1)).as("fp_n"))
      docs.join(fpCounts, "fp")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          sum((col("fp_n") > 1).cast("long")).as("n_dup_docs"))
        .withColumn("avg_tokens",
          (col("total_tokens").cast("double") / col("n_docs"))
            .cast(DecimalType(18, 6)).cast("double"))
        .select("source", "n_docs", "total_tokens", "avg_tokens", "n_langs",
          "n_dup_docs")
        .orderBy("source")
    },
    // ---- pp5: exact stratified sample — precisely k docs per stratum,
    // chosen by md5 order (deterministic, uniform, stable under corpus
    // growth ONLY for the retained prefix — unlike pp4's rate filter this
    // trades stability for an exact count). One window sort per stratum;
    // strata are the partition key so the sort never sees the whole
    // corpus in one task ------------------------------------------------
    "pp5_stratified_sample" -> { (s, dir) =>
      Tables.t(s, dir, "documents")
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy(col("h"), col("doc_id"))))
        .filter(col("rn") <= 5)
        .select(col("doc_id"), col("source"), col("rn"))
        .orderBy("source", "rn")
    }
  )

  private def md5IntSql(x: String): String = DedupQueries.md5IntSql(x)

  val oracle: Map[String, String] = Map(
    // same smoothing, same DECIMAL(18,6) post-avg round; bigrams via the
    // 1-based list index (toks[i], toks[i+1]) mirroring the engine's
    // transform-with-index
    "tx25_bigram_lm" ->
      ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "ru AS (SELECT unnest(toks) AS w FROM d JOIN documents USING (doc_id) WHERE source = 'src0'), " +
        "uc AS (SELECT w, count(*) AS cu FROM ru GROUP BY w), " +
        "v AS (SELECT count(*) AS vsz FROM uc), " +
        "bc AS (SELECT w1, w2, count(*) AS cb FROM " +
        "(SELECT toks[i] AS w1, toks[i+1] AS w2 FROM d JOIN documents USING (doc_id), " +
        "unnest(generate_series(1, len(toks) - 1)) AS g(i) WHERE source = 'src0') GROUP BY w1, w2), " +
        "db AS (SELECT d.doc_id, toks[i] AS w1, toks[i+1] AS w2 FROM d, " +
        "unnest(generate_series(1, len(toks) - 1)) AS g(i)), " +
        "sc AS (SELECT doc_id, COALESCE(cb, 0) AS cb, COALESCE(cu, 0) AS cu " +
        "FROM db LEFT JOIN bc USING (w1, w2) LEFT JOIN uc ON db.w1 = uc.w) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "CAST(CAST(avg(-ln((cb + 1.0) / (cu + vsz))) AS DECIMAL(18,6)) AS DOUBLE) AS nll " +
        "FROM sc CROSS JOIN v GROUP BY doc_id ORDER BY doc_id"),
    // identical arithmetic: DECIMAL(28,12)-summed normalizer, correctly-
    // rounded sqrt/divide, shared md5 threshold
    "pp4_temperature_sample" ->
      ("WITH cs AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang), " +
        "tot AS (SELECT sum(c) AS n, " +
        "CAST(sum(CAST(sqrt(CAST(c AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS z FROM cs), " +
        "rates AS (SELECT lang, least(CAST(1.0 AS DOUBLE), " +
        "sqrt(CAST(c AS DOUBLE)) / z * CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) AS r " +
        "FROM cs CROSS JOIN tot) " +
        "SELECT d.doc_id, d.lang, CAST(CAST(r AS DECIMAL(18,6)) AS DOUBLE) AS keep_rate " +
        "FROM documents d JOIN rates USING (lang) " +
        "WHERE " + md5IntSql("CAST(doc_id AS VARCHAR)") +
        " % 1000000 < CAST(floor(r * 1000000) AS BIGINT) ORDER BY doc_id"),
    // same regexp host parse (identical RE2-compatible pattern), same md5
    // cap order
    "pp6_domain_cap" ->
      ("WITH u AS (SELECT doc_id, 'http://' || source || '.example.com/doc/' || doc_id AS url " +
        "FROM documents), " +
        "h AS (SELECT doc_id, regexp_extract(url, '^https?://([^/]+)/', 1) AS host FROM u " +
        "WHERE regexp_extract(url, '^https?://([^/]+)/', 1) " +
        "NOT IN ('src3.example.com', 'src7.example.com')) " +
        "SELECT doc_id, host, CAST(rn AS INT) AS rn FROM (" +
        "SELECT doc_id, host, row_number() OVER (PARTITION BY host " +
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM h) " +
        "WHERE rn <= 10 ORDER BY host, rn"),
    "pp7_dataset_card" ->
      ("WITH d AS (SELECT doc_id, source, lang, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "md5(text) AS fp FROM documents), " +
        "fc AS (SELECT fp, count(*) AS fp_n FROM d GROUP BY fp) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, " +
        "CAST(CAST(CAST(sum(n_tokens) AS DOUBLE) / count(*) AS DECIMAL(18,6)) AS DOUBLE) AS avg_tokens, " +
        "count(DISTINCT lang) AS n_langs, " +
        "CAST(sum(CASE WHEN fp_n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs " +
        "FROM d JOIN fc USING (fp) GROUP BY source ORDER BY source"),
    "pp5_stratified_sample" ->
      ("SELECT doc_id, source, CAST(rn AS INT) AS rn FROM (" +
        "SELECT doc_id, source, row_number() OVER (PARTITION BY source " +
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM documents) " +
        "WHERE rn <= 5 ORDER BY source, rn")
  )
}
