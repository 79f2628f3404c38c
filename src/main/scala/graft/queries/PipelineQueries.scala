package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, from_json, length, struct, to_json}
import org.apache.spark.sql.types._

import graft.Tables
import graft.pipeline._

/** Sample enrichment modules (the analog of the reference's test modules,
  * e.g. `SampleReduceEnrichmentModule.java`) + oracle-checked pipeline
  * queries for SURVEY §2.4 A1-A5 / §2.9 X1-X2-X6.
  */
object PipelineQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** A1/X1: narrow flatMap-shaped stage — filter + derive a column. */
  class DocFilterEnrichStage extends EnrichStage {
    override def outputSchema(in: StructType): StructType =
      in.add(StructField("lang_uc", StringType))
    def onObjectBatch(batch: Seq[Row], groupKey: Option[Row]): Iterator[Row] =
      batch.iterator
        .filter(r => r.getAs[Long]("n_chars") >= 200L)
        .map(r => Row.fromSeq(r.toSeq :+ r.getAs[String]("lang").toUpperCase))
  }

  /** A3/X2: grouped reduce — one output row per (lang, source) group. */
  class DocGroupReduceStage extends EnrichStage {
    override def outputSchema(in: StructType): StructType = StructType(Seq(
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("total_chars", LongType),
      StructField("n_docs", LongType)))
    def onObjectBatch(batch: Seq[Row], groupKey: Option[Row]): Iterator[Row] = {
      val k = groupKey.get // fields in sorted order: lang, source
      Iterator(Row(k.get(0), k.get(1),
        batch.map(_.getAs[Long]("n_chars")).sum, batch.size.toLong))
    }
  }

  /** A4: combiner-eligible (re-entrant, schema-preserving) sum module:
    * collapses a group to one row carrying (min doc_id, sum n_chars).
    * Associative: run on partials, sums of sums. */
  class CombinableSumStage extends EnrichStage {
    override def combinable: Boolean = true
    def onObjectBatch(batch: Seq[Row], groupKey: Option[Row]): Iterator[Row] = {
      val lang = batch.head.getAs[String]("lang")
      Iterator(Row(batch.map(_.getAs[Long]("doc_id")).min, "", lang, "",
        batch.map(_.getAs[Long]("n_chars")).sum))
    }
  }

  /** A5: second-job reduce — rolls (lang, source) partials up to lang.
    * Chained as its own pipeline: the reference's one-grouping-per-job rule
    * means multi-level grouping = a CHAIN of jobs, each reshuffling the
    * previous job's output. */
  class LangRollupStage extends EnrichStage {
    override def outputSchema(in: StructType): StructType = StructType(Seq(
      StructField("lang", StringType),
      StructField("total_chars", LongType),
      StructField("n_sources", LongType)))
    def onObjectBatch(batch: Seq[Row], groupKey: Option[Row]): Iterator[Row] =
      Iterator(Row(groupKey.get.get(0),
        batch.map(_.getAs[Long]("total_chars")).sum, batch.size.toLong))
  }

  private def docs(s: SparkSession, dir: String) =
    Tables.t(s, dir, "documents")

  /** Record-bridge JSON options: emit explicit nulls — to_json's default
    * DROPS null fields, so a NULL text/lang would reach a user script as
    * `undefined` and e.g. doc.text.split would throw instead of hitting
    * the scripts' `=== null` guards (the oracle's SQL NULL semantics). */
  private val jsonOpts = Map("ignoreNullFields" -> "false")

  val queries: Map[String, Q] = Map(
    // A1: batch stage chain in mapPartitions (passthrough + map stage)
    "a1_pipeline_map" -> { (s, dir) =>
      Pipeline.run(docs(s, dir), Seq(
          PipelineStage(new PassthroughStage, StageConfig("pass")),
          PipelineStage(new DocFilterEnrichStage, StageConfig("filter", batchSize = 32))))
        .orderBy("doc_id")
    },
    // A2+A3: dot-path key extraction + shuffle + grouped reduce
    "a3_grouped_reduce" -> { (s, dir) =>
      Pipeline.run(docs(s, dir), Seq(
          PipelineStage(new DocGroupReduceStage,
            StageConfig("reduce", groupingFields = Seq("lang", "source")))))
        .orderBy("lang", "source")
    },
    // A4: combiner on — result must equal combiner off (associativity)
    "a4_combiner_sum" -> { (s, dir) =>
      Pipeline.run(docs(s, dir), Seq(
          PipelineStage(new CombinableSumStage,
            StageConfig("csum", groupingFields = Seq("lang"), useCombiner = true))))
        .select("doc_id", "lang", "n_chars")
        .orderBy("lang")
    },
    // A5: chained group jobs — pipeline 2 reduces pipeline 1's grouped
    // output on a coarser key (two shuffles, one per job, like the
    // reference's chained MR jobs)
    "a5_chained_groups" -> { (s, dir) =>
      val perSource = Pipeline.run(docs(s, dir), Seq(
        PipelineStage(new DocGroupReduceStage,
          StageConfig("reduce1", groupingFields = Seq("lang", "source")))))
      Pipeline.run(perSource, Seq(
          PipelineStage(new LangRollupStage,
            StageConfig("reduce2", groupingFields = Seq("lang")))))
        .orderBy("lang")
    },
    // X1×X4: mixed chain — a script (expression) stage filters, a module
    // stage group-reduces, a final script stage reshapes; the script stages
    // stay declarative so the filter still reaches the scan
    "a6_mixed_chain" -> { (s, dir) =>
      Pipeline.runChain(docs(s, dir), Seq(
          ScriptStage(ExprStage(
            emits = Seq(Emit(Seq("doc_id", "text", "lang", "source", "n_chars"))),
            where = Some("n_chars >= 200"))),
          ModuleStage(PipelineStage(new DocGroupReduceStage,
            StageConfig("reduce", groupingFields = Seq("lang", "source")))),
          ScriptStage(ExprStage(emits = Seq(Emit(Seq(
            "lang", "source", "total_chars div n_docs AS avg_chars")))))))
        .orderBy("lang", "source")
    },
    // X4 analog: runtime-authored SQL-expression "script" stage — stage
    // WHERE, two emit call-sites (the second conditionally guarded), exactly
    // the JS emit-callback contract but codegen'd
    "x4_expr_stage" -> { (s, dir) =>
      ExprStage(
        emits = Seq(
          Emit(Seq("doc_id", "'all' AS tag", "n_chars AS v")),
          Emit(Seq("doc_id", "'long' AS tag", "n_chars * 2 AS v"),
            where = Some("n_chars >= 400"))),
        where = Some("lang <> 'de'"))
        .run(docs(s, dir))
        .orderBy("tag", "doc_id")
    },
    // ---- X4 script stage, the imperative half: USER-AUTHORED JAVA SOURCE
    // compiled at runtime (javax.tools — the JVM-native answer to the
    // reference's Nashorn stage, which Java 17 removed) and run as a
    // record mapper inside mapPartitions. The source below is genuinely
    // imperative (loop + StringBuilder + helper call), compiled on the
    // driver, shipped as class bytes; the oracle replays its semantics in
    // SQL. A compile error would fail at plan time with javac diagnostics
    "x8_java_stage" -> { (s, dir) =>
      javaReverse(docs(s, dir)).orderBy("doc_id")
    },
    // ---- st24: the SAME user-Java map stage inside Structured Streaming —
    // the ST4 module-reuse contract for compiled user code (st21 is its JS
    // twin): class bytes broadcast once, stateless narrow mapPartitions,
    // append mode, zero state; the batch oracle is the whole-table truth --
    "st24_stream_java" -> { (s, dir) =>
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val raw = graft.streaming.Streams.parquetStream(
        s, s"$dir/documents.parquet", schema)
      graft.streaming.Streams.runToParquet(raw, javaReverse)
        .orderBy("doc_id")
    },
    // ---- x13: the FILTER form of the user-Java contract (x11's quality
    // gate authored in Java instead of JS — the map/filter/reduce ×
    // Java/JS matrix is now complete): an imperative predicate (split,
    // loop, max) compiled at runtime, rows failing it dropped -------------
    "x13_java_filter" -> { (s, dir) =>
      val src =
        """public class QualityGate
          |    implements java.util.function.Predicate<String> {
          |  public boolean test(String s) {
          |    // limit -1: KEEP trailing empties (string_split semantics)
          |    String[] w = s.split(" ", -1);
          |    if (w.length < 40) return false;
          |    int mx = 0;
          |    for (String t : w) if (t.length() > mx) mx = t.length();
          |    return mx >= 8;
          |  }
          |}""".stripMargin
      graft.pipeline.JavaStage.filterStage(
          docs(s, dir).select("doc_id", "n_chars", "text"),
          inCol = "text", className = "QualityGate", source = src)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    },
    // ---- x9: the REDUCE half of the user-code contract (X2's grouped
    // combine the way x8 is X4's map) — user Java BinaryOperator compiled
    // at runtime, class bytes broadcast, folded per key via reduceGroups
    // (map-side partial merges: the user function IS the combiner, so the
    // A4 associative+commutative gate applies). The fixture fn is a total-
    // order max (longer wins, tie → lexicographically greater), so the
    // fold is order/partitioning-invariant and the oracle is an argmax --
    "x9_java_reduce" -> { (s, dir) =>
      val src =
        """public class LongestDoc
          |    implements java.util.function.BinaryOperator<String> {
          |  public String apply(String a, String b) {
          |    if (a.length() != b.length())
          |      return a.length() > b.length() ? a : b;
          |    return a.compareTo(b) >= 0 ? a : b;
          |  }
          |}""".stripMargin
      graft.pipeline.JavaStage.reduceStage(
          docs(s, dir).select("source", "text"),
          keyCol = "source", valCol = "text",
          className = "LongestDoc", source = src)
        .withColumnRenamed("text", "winner")
        .withColumn("winner_len", length(col("winner")))
        .orderBy("source")
    },
    // ---- x10: the JS-LANGUAGE half of the script contract, for real —
    // user-authored JavaScript (loop, helper function, object literal,
    // string/array methods) parsed ONCE on the driver and run per record
    // by graft.js.Js, the engine's own deterministic ES5-subset
    // interpreter (the reference's Nashorn stage without Nashorn). The
    // record bridge is JSON both ways (to_json → handle(doc) → from_json);
    // an empty text returns null → SQL NULL through the skip sentinel.
    // The oracle replays the script's semantics in SQL ------------------
    "x10_js_stage" -> { (s, dir) =>
      jsTransform(docs(s, dir)).orderBy("doc_id")
    },
    // ---- st21: the SAME JS script + stage inside Structured Streaming —
    // the ST4 module-reuse contract for user scripts (the reference's JS
    // ran in streaming enrichment exactly like batch): a stateless narrow
    // mapPartitions projection, so it drops into append mode with zero
    // state; the batch oracle is the whole-table truth ------------------
    "st21_stream_js" -> { (s, dir) =>
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val raw = graft.streaming.Streams.parquetStream(
        s, s"$dir/documents.parquet", schema)
      graft.streaming.Streams.runToParquet(raw, jsTransform)
        .orderBy("doc_id")
    },
    // ---- x11: the FILTER form of the JS stage — user-authored predicate
    // scripts (the reference's JS quality gates): keep docs that are ≥30
    // tokens AND mention 'spark' at least twice; JS truthiness decides ---
    "x11_js_filter" -> { (s, dir) =>
      jsFilter(docs(s, dir).select(col("doc_id"), col("n_chars"),
          to_json(struct(col("doc_id"), col("text")), jsonOpts).as("rec")))
        .orderBy("doc_id")
    },
    // ---- st22: the SAME JS predicate inside Structured Streaming — the
    // second half of the ST4 module-reuse story for user scripts (st21 is
    // the map form): a stateless filter, zero state, append mode ---------
    "st22_stream_js_filter" -> { (s, dir) =>
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val raw = graft.streaming.Streams.parquetStream(
        s, s"$dir/documents.parquet", schema)
      graft.streaming.Streams.runToParquet(raw, st =>
          jsFilter(st.select(col("doc_id"), col("n_chars"),
            to_json(struct(col("doc_id"), col("text")), jsonOpts).as("rec"))))
        .orderBy("doc_id")
    },
    // ---- x12: a REGEX-bearing user script — the construct real
    // Nashorn-era reference scripts leaned on hardest, now first-class in
    // the interpreter (java.util.regex-backed literals + try/catch). The
    // script extracts the first j-word via the match-then-index idiom
    // (no-match → null → the index throws → catch maps it to null — the
    // TypeError-as-control-flow pattern real scripts use), counts s-token
    // substrings with a global match, strips vowels with a global
    // replace, and tokenizes on a regex split; the oracle replays all
    // four in DuckDB's RE2 (patterns chosen inside the Java∩RE2 common
    // subset; DuckDB regexp_extract's ''-on-no-match is NULLIF'd to the
    // script's null) ------------------------------------------------------
    "x12_js_regex" -> { (s, dir) =>
      val script =
        """function handle(doc) {
          |  if (doc.text === null) return null;
          |  var first;
          |  try { first = doc.text.match(/j[a-z]+/)[0]; }
          |  catch (e) { first = null; }
          |  return {
          |    doc_id: doc.doc_id,
          |    first_j: first,
          |    n_s: (doc.text.match(/s[a-z]+/g) || []).length,
          |    vowlen: doc.text.replace(/[aeiou]/g, '').length,
          |    n_tok: doc.text.split(/ +/).length
          |  };
          |}""".stripMargin
      val in = docs(s, dir).select(col("doc_id"),
        to_json(struct(col("doc_id"), col("text")), jsonOpts).as("rec"))
      graft.pipeline.JsStage.stage(in, "rec", "out", script)
        .select(col("doc_id"), from_json(col("out"),
          "doc_id BIGINT, first_j STRING, n_s BIGINT, vowlen BIGINT, n_tok BIGINT",
          Map.empty[String, String]).as("o"))
        .select(col("doc_id"), col("o.first_j").as("first_j"),
          col("o.n_s").as("n_s"), col("o.vowlen").as("vowlen"),
          col("o.n_tok").as("n_tok"))
        .orderBy("doc_id")
    },
    // ---- x14: a DATE-bearing user script — the deterministic UTC Date
    // subset (new Date(ms), getUTC*, toISOString) that replaced the
    // engine's former blanket Date ban: timestamp bucketing is what
    // reference-era enrichment scripts actually did with Date. The stage
    // receives epoch millis AS DATA (floored from the event timestamp —
    // wall-clock constructors stay refused), classifies weekday/weekend
    // off getUTCDay, and re-emits the ISO instant; the oracle replays
    // day/hour/ISO formatting in DuckDB over the same floored millis ----
    "x14_js_date" -> { (s, dir) =>
      val script =
        """function handle(e) {
          |  if (e.ms === null) return null;
          |  var d = new Date(e.ms);
          |  var dow = d.getUTCDay();
          |  return {
          |    event_id: e.event_id,
          |    day: dow,
          |    hour: d.getUTCHours(),
          |    iso: d.toISOString(),
          |    week_part: (dow === 0 || dow === 6) ? 'weekend' : 'weekday'
          |  };
          |}""".stripMargin
      val in = Tables.t(s, dir, "events")
        .select(col("event_id"),
          org.apache.spark.sql.functions.expr("unix_micros(ts) div 1000").as("ms"))
        // NULL-ts rows drop HERE, mirroring the oracle's WHERE — the
        // script's own null guard would emit a null-padded row instead
        // (JsStage's map form keeps rows whose script returns null)
        .filter(col("ms").isNotNull)
        .select(col("event_id"),
          to_json(struct(col("event_id"), col("ms")), jsonOpts).as("rec"))
      graft.pipeline.JsStage.stage(in, "rec", "out", script)
        .select(col("event_id"), from_json(col("out"),
          "event_id BIGINT, day BIGINT, hour BIGINT, iso STRING, week_part STRING",
          Map.empty[String, String]).as("o"))
        .select(col("event_id"), col("o.day").as("day"),
          col("o.hour").as("hour"), col("o.iso").as("iso"),
          col("o.week_part").as("week_part"))
        .orderBy("event_id")
    }
  )

  /** THE x8/st24 user-Java map stage — one definition, two drivers (batch
    * and micro-batch), the same sharing jsTransform gives x10/st21. */
  private def javaReverse(df: DataFrame): DataFrame = {
    val src =
      """public class ReverseWords
        |    implements java.util.function.Function<String, String> {
        |  private static String join(String[] w) {
        |    StringBuilder b = new StringBuilder();
        |    for (int i = w.length - 1; i >= 0; i--) {
        |      b.append(w[i]);
        |      if (i > 0) b.append(' ');
        |    }
        |    return b.toString();
        |  }
        |  public String apply(String s) {
        |    // limit -1: KEEP trailing empty strings, matching both the
        |    // oracle's string_split and Spark's own split() semantics
        |    String[] w = s.split(" ", -1);
        |    return join(w) + "|" + w.length;
        |  }
        |}""".stripMargin
    graft.pipeline.JavaStage.stage(
        df.select("doc_id", "text"),
        inCol = "text", outCol = "mapped",
        className = "ReverseWords", source = src)
      .select("doc_id", "mapped")
  }

  /** THE x11/st22 predicate + projection — one definition per engine. */
  private def jsFilter(in: DataFrame): DataFrame = {
    val script =
      """function handle(doc) {
        |  if (doc.text === null) return false;  // NULL predicate excludes, like SQL WHERE
        |  var toks = doc.text.split(' ');
        |  if (toks.length < 30) return false;
        |  var n = 0;
        |  for (var i = 0; i < toks.length; i++) {
        |    if (toks[i] === 'spark') n++;
        |  }
        |  return n >= 2;
        |}""".stripMargin
    graft.pipeline.JsStage.filterStage(in, "rec", script)
      .select("doc_id", "n_chars")
  }

  /** THE user JS script + record bridge shared by x10 (batch) and st21
    * (the same stage inside Structured Streaming) — one definition per
    * engine, the st14/ts3 module-reuse pattern applied to user scripts. */
  private val jsScript =
    """function longish(toks) {
      |  var n = 0;
      |  for (var i = 0; i < toks.length; i++) {
      |    if (toks[i].length > 4) n++;
      |  }
      |  return n;
      |}
      |function handle(doc) {
      |  if (doc.text === null || doc.text === '') return null;
      |  var toks = doc.text.split(' ');
      |  return {
      |    id: doc.doc_id,
      |    longish: longish(toks),
      |    head: toks.slice(0, 3).join('_'),
      |    shout: doc.lang === null ? null : doc.lang.toUpperCase()
      |  };
      |}""".stripMargin

  /** to_json → JsStage(handle) → from_json typed projection. */
  private def jsTransform(df: DataFrame): DataFrame = {
    val in = df.select(col("doc_id"),
      to_json(struct(col("doc_id"), col("text"), col("lang")), jsonOpts)
        .as("rec"))
    graft.pipeline.JsStage.stage(in, "rec", "out", jsScript)
      .select(col("doc_id"), from_json(col("out"),
        "id BIGINT, longish BIGINT, head STRING, shout STRING",
        Map.empty[String, String]).as("o"))
      .select(col("doc_id"), col("o.id").as("id"),
        col("o.longish").as("longish"), col("o.head").as("head"),
        col("o.shout").as("shout"))
  }

  val oracle: Map[String, String] = Map(
    "a1_pipeline_map" ->
      ("SELECT doc_id, text, lang, source, n_chars, upper(lang) AS lang_uc " +
        "FROM documents WHERE n_chars >= 200 ORDER BY doc_id"),
    "a3_grouped_reduce" ->
      ("SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs " +
        "FROM documents GROUP BY lang, source ORDER BY lang, source"),
    "a4_combiner_sum" ->
      ("SELECT min(doc_id) AS doc_id, lang, CAST(sum(n_chars) AS BIGINT) AS n_chars " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "a5_chained_groups" ->
      ("SELECT lang, CAST(sum(total_chars) AS BIGINT) AS total_chars, " +
        "CAST(count(*) AS BIGINT) AS n_sources FROM " +
        "(SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS total_chars " +
        "FROM documents GROUP BY lang, source) " +
        "GROUP BY lang ORDER BY lang"),
    "a6_mixed_chain" ->
      ("SELECT lang, source, total_chars // n_docs AS avg_chars FROM " +
        "(SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "CAST(count(*) AS BIGINT) AS n_docs FROM documents WHERE n_chars >= 200 " +
        "GROUP BY lang, source) ORDER BY lang, source"),
    "x4_expr_stage" ->
      ("SELECT doc_id, tag, v FROM (" +
        "SELECT doc_id, 'all' AS tag, n_chars AS v FROM documents WHERE lang <> 'de' " +
        "UNION ALL " +
        "SELECT doc_id, 'long' AS tag, n_chars * 2 AS v FROM documents " +
        "WHERE lang <> 'de' AND n_chars >= 400" +
        ") ORDER BY tag, doc_id"),
    "x8_java_stage" ->
      ("SELECT doc_id, array_to_string(list_reverse(string_split(text, ' ')), ' ') " +
        "|| '|' || len(string_split(text, ' ')) AS mapped " +
        "FROM documents ORDER BY doc_id"),
    // st24 runs the SAME compiled user class in streaming → same SQL
    "st24_stream_java" ->
      ("SELECT doc_id, array_to_string(list_reverse(string_split(text, ' ')), ' ') " +
        "|| '|' || len(string_split(text, ' ')) AS mapped " +
        "FROM documents ORDER BY doc_id"),
    // the Java predicate restated as a WHERE clause (string_split keeps
    // trailing empties, matching the split(" ", -1) in the user class)
    "x13_java_filter" ->
      ("SELECT doc_id, n_chars FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 40 AND " +
        "list_max(list_transform(string_split(text, ' '), t -> length(t))) >= 8 " +
        "ORDER BY doc_id"),
    // the fold of a total-order max is the argmax regardless of fold
    // order/partitioning — exactly why the reducer contract demands an
    // associative+commutative operator
    "x9_java_reduce" ->
      ("SELECT source, text AS winner, CAST(length(text) AS INT) AS winner_len " +
        "FROM (SELECT source, text, row_number() OVER (PARTITION BY source " +
        "ORDER BY length(text) DESC, text DESC) AS rn FROM documents) " +
        "WHERE rn = 1 ORDER BY source"),
    // the user script's semantics restated declaratively: long-token count,
    // first-3-token head, uppercased lang; '' text → all NULLs (the skip).
    // st21 runs the SAME script in streaming over the same table → same SQL
    "x10_js_stage" -> jsOracleSql,
    "st21_stream_js" -> jsOracleSql,
    // the predicate restated as a WHERE clause; st22 runs the same script
    // in streaming over the same table → same SQL
    "x11_js_filter" -> jsFilterOracleSql,
    "st22_stream_js_filter" -> jsFilterOracleSql,
    // NULL-text rows stay (the script's null return keeps the row with
    // NULL fields through JsStage's skip sentinel), fields NULLed — the
    // same row-preserving NULL semantics as the x10 oracle
    "x12_js_regex" ->
      ("SELECT doc_id, " +
        "CASE WHEN text IS NULL THEN NULL ELSE NULLIF(regexp_extract(text, 'j[a-z]+'), '') END AS first_j, " +
        "CASE WHEN text IS NULL THEN NULL ELSE len(regexp_extract_all(text, 's[a-z]+')) END AS n_s, " +
        "CASE WHEN text IS NULL THEN NULL ELSE length(regexp_replace(text, '[aeiou]', '', 'g')) END AS vowlen, " +
        "CASE WHEN text IS NULL THEN NULL ELSE len(string_split_regex(text, ' +')) END AS n_tok " +
        "FROM documents ORDER BY doc_id"),
    // same floored-millis instant; DuckDB dayofweek is 0=Sunday = JS
    // getUTCDay; %g = zero-padded milliseconds (the toISOString shape)
    "x14_js_date" ->
      ("WITH e AS (SELECT event_id, epoch_ms(epoch_us(ts) // 1000) AS t " +
        "FROM events WHERE ts IS NOT NULL) " +
        "SELECT event_id, CAST(dayofweek(t) AS BIGINT) AS day, " +
        "CAST(hour(t) AS BIGINT) AS hour, " +
        "strftime(t, '%Y-%m-%dT%H:%M:%S.%gZ') AS iso, " +
        "CASE WHEN dayofweek(t) IN (0, 6) THEN 'weekend' ELSE 'weekday' END AS week_part " +
        "FROM e ORDER BY event_id")
  )

  /** The ONE declarative restatement of [[jsFilter]]'s predicate. */
  private def jsFilterOracleSql: String =
    ("SELECT doc_id, n_chars FROM documents " +
      "WHERE len(string_split(text, ' ')) >= 30 " +
      "AND len(list_filter(string_split(text, ' '), t -> t = 'spark')) >= 2 " +
      "ORDER BY doc_id")

  /** The ONE declarative restatement of [[jsScript]], shared by the
    * x10/st21 oracles (a def: the oracle map initializes eagerly, and a
    * val declared below it would still be null at that point). */
  private def jsOracleSql: String =
    ("SELECT doc_id, " +
      "CASE WHEN text IS NULL OR text = '' THEN NULL ELSE doc_id END AS id, " +
      "CASE WHEN text IS NULL OR text = '' THEN NULL ELSE " +
      "CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS BIGINT) END AS longish, " +
      "CASE WHEN text IS NULL OR text = '' THEN NULL ELSE " +
      "array_to_string(string_split(text, ' ')[1:3], '_') END AS head, " +
      "CASE WHEN text IS NULL OR text = '' THEN NULL ELSE upper(lang) END AS shout " +
      "FROM documents ORDER BY doc_id")
}
