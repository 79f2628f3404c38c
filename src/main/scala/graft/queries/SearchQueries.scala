package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.tokens

/** Search-index construction and query execution — the operator family the
  * reference delegates wholesale to its Elasticsearch backend
  * (`aleph2_crud_service_elasticsearch/.../ElasticsearchCrudService.java`:
  * every `*_SearchIndexService` bucket gets a full-text index built for it).
  * A Spark-native engine has to build that index as a JOB, so the family is
  * expressed as oracle-checked dataframe plans: posting construction (idx1),
  * positional phrase execution (idx2), conjunctive boolean retrieval (idx3),
  * and the blocking/scoring record-linkage workload (rl1) that
  * entity-resolution on such an index feeds.
  *
  * Scale shapes (100 TB): every query keys its one shuffle on the token (or
  * the block key) — never on raw text; posting heads are bounded by a
  * rank-window (sort-based, spills) instead of an in-memory `collect_set` of
  * a stop-word's full posting list; phrase/boolean execution pre-filters
  * positions to the query terms BEFORE any join, so only the query terms'
  * postings ever shuffle — the classic term-at-a-time engine shape.
  */
object SearchQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** The ONE deterministic dirty-master fixture shared by rl1/rl2: every
    * custkey%3==0 record drops its name's 10th char (the first zero-pad
    * digit) and re-ids into a disjoint +1000000 namespace. The last-4
    * suffix block key survives the char-drop because the deletion shifts
    * only the prefix. */
  private def dirtyCustomers(cust: DataFrame): DataFrame =
    cust.filter(col("c_custkey") % 3 === 0)
      .select((col("c_custkey") + 1000000).as("d_id"),
        concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 9))
          .as("d_name"),
        col("c_nationkey").as("d_nationkey"),
        col("c_acctbal").as("d_acctbal"))

  /** DuckDB twin of [[dirtyCustomers]] (defines `dirty`). */
  private val dirtySql: String =
    "dirty AS (SELECT c_custkey + 1000000 AS d_id, " +
      "substr(c_name, 1, 9) || substr(c_name, 11, 9) AS d_name, " +
      "c_nationkey AS d_nationkey, c_acctbal AS d_acctbal " +
      "FROM customer WHERE c_custkey % 3 = 0)"

  /** (doc_id, token, tf) term-frequency grid — the map phase of every
    * index build; partial-aggregates map-side before its single shuffle. */
  private def tfGrid(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))

  /** The canonical 3-term query — the ONE terms list bm25Sql interpolates
    * and both bm25 callers (tx15/idx7) pass; a caller with different
    * terms must supply its own oracle fragment. */
  private[queries] val Bm25Terms: Seq[String] = Seq("spark", "join", "vector")

  /** THE BM25 scoring definition (k1=1.2, b=0.75) — one formula shared by
    * tx15 (per-doc scores) and idx7 (ranked retrieval), so the two can
    * never drift. Returns (doc_id, bm25_raw) UNROUNDED; callers apply the
    * DECIMAL(18,6) round. Scale shape: the term filter prunes the explode
    * before the one (doc, term) shuffle; df and the corpus stats ride
    * broadcasts. */
  private[queries] def bm25Raw(docs0: DataFrame,
      terms: Seq[String] = Bm25Terms): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val docs = docs0
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(
        tf.groupBy("token").agg(count_distinct(col("doc_id")).as("df"))),
        "token")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(
        (col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("score", col("idf") * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(sum(col("score")).as("bm25_raw"))
  }

  /** DuckDB twin of [[bm25Raw]]: CTEs ending in
    * `scores(doc_id, bm25_raw)` — splice after WITH. */
  private[queries] val bm25Sql: String =
    "d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
      "dd AS (SELECT doc_id, toks, len(toks) AS dl FROM d), " +
      "st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dd), " +
      "tf AS (SELECT doc_id, dl, t AS token, count(*) AS tf FROM " +
      "(SELECT doc_id, dl, unnest(toks) AS t FROM dd) " +
      s"WHERE t IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")}) " +
      "GROUP BY doc_id, dl, t), " +
      "dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token), " +
      "scores AS (SELECT doc_id, sum(" +
      "ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + CAST(0.5 AS DOUBLE)) + 1.0) * " +
      "(tf * CAST(2.2 AS DOUBLE)) / " +
      "(tf + 1.2 * (CAST(0.25 AS DOUBLE) + 0.75 * dl / avgdl))" +
      ") AS bm25_raw " +
      "FROM tf JOIN dfq USING (token) CROSS JOIN st GROUP BY doc_id)"

  val queries: Map[String, Q] = Map(
    // ---- idx1: inverted-index construction — per-token dictionary stats
    // (df, total tf) plus the first-10 postings head. The head is taken
    // with a rank window over the (token, doc_id) grid (sort-based, spills
    // to disk) and only THEN collected — a stop-word token never holds its
    // full posting list in one aggregation buffer, which a naive
    // sort_array(collect_list(...)) would. Dictionary and head join
    // co-keyed on token (one exchange reused) --------------------------
    "idx1_inverted_index" -> { (s, dir) =>
      val tf = tfGrid(Tables.t(s, dir, "documents"))
      val dict = tf.groupBy("token")
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
      val head = tf
        .withColumn("rn",
          row_number().over(Window.partitionBy("token").orderBy("doc_id")))
        .filter(col("rn") <= 10)
        .groupBy("token")
        .agg(concat_ws(",",
          transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string"))).as("head_postings"))
      dict.join(head, "token")
        .select(col("token"), col("df"), col("tf_total"), col("head_postings"))
        .orderBy("token")
    },
    // ---- idx2: positional phrase query ("fast table") — exactly how an
    // engine executes a phrase over positional postings: posexplode to
    // (doc_id, pos, token), FILTER to the two phrase terms (so only those
    // terms' position postings survive the scan — predicate runs before
    // the shuffle), then join term-1 positions to term-2 positions on
    // (doc_id, pos+1). The join keys on doc_id; both sides are
    // query-term-sized, not corpus-sized ------------------------------
    "idx2_phrase_search" -> { (s, dir) =>
      val Seq(t1, t2) = Seq("fast", "table")
      val pos = Tables.t(s, dir, "documents")
        .select(col("doc_id"), posexplode(tokens(col("text"))))
        .toDF("doc_id", "pos", "token")
      val p1 = pos.filter(col("token") === t1).select(col("doc_id"), col("pos"))
      val p2 = pos.filter(col("token") === t2)
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      p1.join(p2, Seq("doc_id", "pos"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
        .orderBy("doc_id")
    },
    // ---- idx8: proximity query (spark NEAR/5 join) — idx2's positional
    // machinery with the equality on pos relaxed to a ±5 window: both
    // sides are still single-term position postings FILTERED before the
    // doc_id equi-join (the range predicate runs on the joined pairs, a
    // per-doc term-frequency-sized set — never corpus-sized), then one
    // agg for the pair count and the tightest gap -------------------------
    "idx8_proximity" -> { (s, dir) =>
      val Seq(t1, t2) = Seq("spark", "join")
      val pos = Tables.t(s, dir, "documents")
        .select(col("doc_id"), posexplode(tokens(col("text"))))
        .toDF("doc_id", "pos", "token")
      val p1 = pos.filter(col("token") === t1)
        .select(col("doc_id"), col("pos").as("p1"))
      val p2 = pos.filter(col("token") === t2)
        .select(col("doc_id"), col("pos").as("p2"))
      p1.join(p2, Seq("doc_id"))
        .filter(abs(col("p1") - col("p2")) <= 5)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pairs"),
          min(abs(col("p1") - col("p2"))).as("min_gap"))
        .orderBy("doc_id")
    },
    // ---- idx3: conjunctive (AND) boolean retrieval — docs containing ALL
    // of {spark, join, vector}, with the summed within-doc tf as a crude
    // rank key. No join at all: the term filter pushes to the scan, the
    // surviving postings aggregate once on doc_id, and HAVING
    // count(distinct token) = |terms| is the intersection. (A term-at-a-
    // time engine would intersect df-ascending; the one-agg form is the
    // same work without materializing intermediate lists.) -------------
    "idx3_bool_retrieval" -> { (s, dir) =>
      val terms = Seq("spark", "join", "vector")
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .filter(col("token").isin(terms: _*))
        .groupBy("doc_id")
        .agg(count_distinct(col("token")).as("n_terms"),
          count(lit(1)).as("total_tf"))
        .filter(col("n_terms") === terms.size)
        .select(col("doc_id"), col("total_tf"))
        .orderBy("doc_id")
    },
    // ---- rl1: blocked record linkage (entity resolution) — the classic
    // dirty-master match. The dirty side is synthesized DETERMINISTICALLY
    // (same construction in the oracle, the mm12/tx22 injection pattern):
    // every custkey%3==0 record drops its name's 10th char (the first
    // zero-pad digit). Candidate generation is a BLOCK equi-join on
    // (last-4-of-name, nationkey) — never all-pairs; the suffix block key
    // survives the char-drop because the deletion shifts only the prefix.
    // Each candidate is scored Fellegi–Sunter-style with integer agreement
    // weights (4·exact-name + 2·lev==1 + 1·balance-agree), and the winner
    // per dirty record is one max(struct(...)) agg — the d1 winner-pick
    // shape, co-keyed on the dirty id --------------------------------
    "rl1_record_linkage" -> { (s, dir) =>
      val cust = Tables.t(s, dir, "customer")
      val dirty = dirtyCustomers(cust)
        .withColumn("blk", substring(col("d_name"), -4, 4))
      val master = cust
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), substring(col("c_name"), -4, 4).as("blk"))
      val scored = dirty.join(master,
          dirty("blk") === master("blk") &&
            dirty("d_nationkey") === master("c_nationkey"))
        .withColumn("lev", levenshtein(col("d_name"), col("c_name")))
        .filter(col("lev") <= 1)
        .withColumn("w",
          when(col("lev") === 0, 4).otherwise(0) +
            when(col("lev") === 1, 2).otherwise(0) +
            when(abs(col("d_acctbal") - col("c_acctbal")) < 0.005, 1)
              .otherwise(0))
      scored.groupBy("d_id")
        .agg(max(struct(col("w"), (-col("c_custkey")).as("nk"))).as("win"),
          count(lit(1)).as("n_candidates"))
        .select(col("d_id"), (-col("win.nk")).as("matched_custkey"),
          col("win.w").as("match_weight"), col("n_candidates"))
        .orderBy("d_id")
    },
    // ---- idx4: "did you mean" spelling correction — the search-UX step
    // over the idx1 dictionary: for each misspelled query term, the
    // lev<=1 dictionary token with the highest document frequency (tie →
    // lexicographically greatest, one max(struct) agg). Candidates come
    // from a LENGTH-BAND equi-join (each probe explodes into len-1..len+1
    // keys; a lev<=1 neighbor cannot differ in length by more) — the
    // dictionary is corpus-vocab-sized and never crossed with itself;
    // the probe side is a broadcast-small query batch ------------------
    "idx4_spell_correct" -> { (s, dir) =>
      val probes = Seq("spak", "joinx", "vectr", "tablee")
      val dict = Tables.t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count_distinct(col("doc_id")).as("df"))
        .withColumn("len", length(col("tok")))
      val pr = s.createDataFrame(probes.map(Tuple1(_))).toDF("q")
        .select(col("q"), explode(array(length(col("q")) - 1,
          length(col("q")), length(col("q")) + 1)).as("len"))
      broadcast(pr).join(dict, "len")
        .filter(levenshtein(col("q"), col("tok")) <= 1)
        .groupBy("q")
        .agg(max(struct(col("df"), col("tok"))).as("w"),
          count(lit(1)).as("n_candidates"))
        .select(col("q"), col("w.tok").as("suggestion"),
          col("w.df").as("df"), col("n_candidates"))
        .orderBy("q")
    },
    // ---- rl2: golden-record build (survivorship) — the step after rl1's
    // pairwise matching: ALL lev<=1 candidate pairs (not just winners)
    // become edges of a bipartite dirty↔master graph, transitive
    // closure via the SAME connected-components machinery as dd6 (two
    // dirty records sharing a master merge into one entity), then one
    // survivorship agg per cluster (member counts + max balance — the
    // MDM "pick the best attribute" rule). Scale shape: block equi-join
    // candidates, co-keyed CC rounds, one map-side-combined agg; nothing
    // corpus-sized is broadcast -----------------------------------------
    "rl2_golden_record" -> { (s, dir) =>
      val cust = Tables.t(s, dir, "customer")
      val dirty = dirtyCustomers(cust)
        .withColumn("blk", substring(col("d_name"), -4, 4))
      val master = cust
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), substring(col("c_name"), -4, 4).as("blk"))
      val edges = dirty.join(master,
          dirty("blk") === master("blk") &&
            dirty("d_nationkey") === master("c_nationkey"))
        .filter(levenshtein(col("d_name"), col("c_name")) <= 1)
        .select(col("d_id").as("s"), col("c_custkey").as("d"))
      val nodes = edges.select(col("s").as("node"))
        .unionByName(edges.select(col("d").as("node"))).distinct()
      val comp = graft.dedup.Clustering
        .connectedComponents(edges, nodes).toDF("node", "cluster")
      val bal = cust.select(col("c_custkey").as("node"), col("c_acctbal"))
        .unionByName(dirtyCustomers(cust)
          .select(col("d_id").as("node"), col("d_acctbal").as("c_acctbal")))
      comp.join(bal, "node")
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"),
          sum((col("node") >= 1000000).cast("long")).as("n_dirty"),
          max(col("c_acctbal")).as("golden_acctbal"))
        .orderBy("cluster")
    },
    // ---- idx5: query-likelihood ranked retrieval with Dirichlet
    // smoothing (μ=100) — the language-modeling alternative to tx15's
    // BM25: score(d,q) = Σ_t ln((tf + μ·ctf_t/|C|)/(dl + μ)), summed over
    // ALL query terms (zero-tf terms contribute the smoothed collection
    // probability) for every doc matching ≥1 term. Scale shape: candidates
    // are bounded by the query terms' postings (the term filter runs
    // before any shuffle); the per-term stats (ctf, |C|) are a 3-row and a
    // 1-row broadcast; the candidate×term grid is |candidates|·|q| rows,
    // never corpus×vocab. Float: per-term DECIMAL(28,12) makes the 3-term
    // ln sum order-free, one DECIMAL(18,6) round -------------------------
    "idx5_query_likelihood" -> { (s, dir) =>
      val terms = Seq("spark", "join", "vector")
      val mu = 100.0
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val D28 = org.apache.spark.sql.types.DecimalType(28, 12)
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("dl", size(col("toks")))
      val toks = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      val cl = docs.agg(sum(col("dl").cast("long")).cast("double").as("cl"))
      val qtoks = toks.filter(col("token").isin(terms: _*))
      val tf = qtoks.groupBy("doc_id", "dl", "token")
        .agg(count(lit(1)).as("tf"))
      val ctf = qtoks.groupBy("token").agg(count(lit(1)).as("ctf"))
      tf.select("doc_id", "dl").distinct()
        .crossJoin(broadcast(ctf))
        .join(tf, Seq("doc_id", "dl", "token"), "left")
        .withColumn("tf", coalesce(col("tf"), lit(0L)))
        .crossJoin(broadcast(cl))
        .withColumn("term_ll", log(
          (col("tf").cast("double") +
            lit(mu) * col("ctf").cast("double") / col("cl")) /
            (col("dl").cast("double") + lit(mu))))
        .groupBy("doc_id")
        .agg(sum(col("term_ll").cast(D28)).cast("double").as("ll"))
        .select(col("doc_id"), col("ll").cast(D6).cast("double").as("ql_score"))
        .orderBy("doc_id")
    },
    // ---- idx7: ranked retrieval — the top-5 documents by BM25 for the
    // canonical 3-term query, THE one scoring definition shared with tx15
    // ([[bm25Raw]]). Ranking orders by the DECIMAL(18,6)-rounded score
    // (then doc_id): raw doubles could differ in the last ulp across
    // engines' ln, and a near-tie must not flip ranks. The rank window
    // runs over the CANDIDATES (docs matching ≥1 term), not the corpus --
    "idx7_bm25_topk" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val scored = bm25Raw(Tables.t(s, dir, "documents"))
        .select(col("doc_id"),
          col("bm25_raw").cast(D6).cast("double").as("bm25"))
      // distributed take-ordered (orderBy+limit), NOT a global rank
      // window — the candidate set is corpus-fraction-sized at scale and
      // must never funnel through one partition; the rank window then
      // runs over exactly 5 rows
      val top = scored.orderBy(col("bm25").desc, col("doc_id")).limit(5)
      top.withColumn("rank",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
        .select(col("rank"), col("doc_id"), col("bm25"))
        .orderBy("rank")
    },
    // ---- idx6: KWIC snippet generation — the search-results UX step: for
    // every doc containing the query term, the ±3-token window around its
    // FIRST occurrence. The term filter prunes the posexplode before the
    // one (doc_id)-keyed min-agg; the snippet slice is a narrow projection
    // on the re-joined token array — no corpus-sized window, no collect.
    // Exact string output, hash-matches unrounded -------------------------
    "idx6_kwic_snippets" -> { (s, dir) =>
      val term = "spark"
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
      val first = docs
        .select(col("doc_id"), posexplode(col("toks")))
        .toDF("doc_id", "pos", "token")
        .filter(col("token") === term)
        .groupBy("doc_id").agg(min(col("pos")).as("p"))
      docs.join(first, "doc_id")
        .withColumn("start", greatest(col("p") - 3, lit(0)))
        .withColumn("fin", least(col("p") + 3, size(col("toks")) - 1))
        .select(col("doc_id"), col("p").cast("long").as("first_pos"),
          concat_ws(" ", slice(col("toks"), col("start") + 1,
            col("fin") - col("start") + 1)).as("snippet"))
        .orderBy("doc_id")
    },
    // ---- idx9: hybrid retrieval via Reciprocal Rank Fusion — the
    // keyword+vector fusion every RAG/search stack runs (ES's `rrf`
    // retriever; score = Σ 1/(60+rank) over the two top-20 lists). Each
    // leg is a distributed take-ordered (orderBy+limit, never a corpus
    // window); rank windows then run over exactly 20 rows. The vector leg
    // broadcasts the 1-row query embedding; the fuse is a 20×20-bounded
    // full outer join on doc_id (= vec_id, the fixture's 1:1 key) --------
    "idx9_rrf_hybrid" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val K = 20
      val kwTop = bm25Raw(Tables.t(s, dir, "documents"))
        .select(col("doc_id"), col("bm25_raw").cast(D6).cast("double").as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(K)
      val kw = kwTop.withColumn("kw_rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
      val emb = Tables.t(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val vecTop = emb.crossJoin(broadcast(qv))
        .select(col("vec_id"),
          graft.functions.VectorFunctions.cosine(col("embedding"), col("q_emb"))
            .cast(D6).cast("double").as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(K)
      val vec = vecTop.withColumn("vec_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id"))))
      kw.select(col("doc_id"), col("kw_rank"))
        .join(vec.select(col("vec_id").as("doc_id"), col("vec_rank")),
          Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          (coalesce(lit(1.0) / (lit(60) + col("kw_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)))
            .cast(D6).cast("double"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), col("kw_rank"), col("vec_rank"), col("rrf"))
    },
    // ---- idx10: significant-terms aggregation — ES's foreground-vs-
    // background term analytics (JLH score = (fg% − bg%) · fg%/bg%), the
    // "what is characteristic of this slice" op the reference's alert
    // buckets surfaced through their search backend. One distinct over the
    // (doc, token) presence grid, one token-keyed agg; corpus totals ride
    // a broadcast 1-row aggregate -----------------------------------------
    "idx10_significant_terms" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val docs = Tables.t(s, dir, "documents")
      val grid = docs
        .select(col("doc_id"), (col("lang") === "zh").as("fg"),
          explode(tokens(col("text"))).as("token"))
        .distinct()
      val tot = docs.agg(count(lit(1)).as("n_all"),
        sum(when(col("lang") === "zh", 1L).otherwise(0L)).as("n_fg"))
      grid.groupBy("token")
        .agg(count(lit(1)).as("bg_df"),
          sum(when(col("fg"), 1L).otherwise(0L)).as("fg_df"))
        .filter(col("fg_df") >= 3)
        .crossJoin(broadcast(tot))
        .withColumn("fg_rate", col("fg_df").cast("double") / col("n_fg"))
        .withColumn("bg_rate", col("bg_df").cast("double") / col("n_all"))
        .withColumn("score", ((col("fg_rate") - col("bg_rate")) *
          (col("fg_rate") / col("bg_rate"))).cast(D6).cast("double"))
        .select(col("token"), col("fg_df"), col("bg_df"), col("score"))
        .orderBy(col("score").desc, col("token")).limit(15)
    },
    // ---- idx12: deep pagination via search_after (keyset) — ES's
    // scroll/search_after contract: page N+1 filters strictly-after the
    // last hit of page N on the (score, doc_id) total order, then takes
    // its page with a distributed take-ordered. O(page) work per page —
    // no rank window over the candidate set, no offset re-scan; the
    // oracle IS the offset formulation (rank 11..15), so keyset ≡ offset
    // is the checked contract ---------------------------------------------
    "idx12_search_after" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val scored = bm25Raw(Tables.t(s, dir, "documents"))
        .select(col("doc_id"),
          col("bm25_raw").cast(D6).cast("double").as("bm25"))
      // the cursor: last hit of page 2 (rows 1-10) — a 10-row take-ordered
      // then a 1-row take-ordered, both distributed, both tiny
      val cursor = scored.orderBy(col("bm25").desc, col("doc_id")).limit(10)
        .orderBy(col("bm25").asc, col("doc_id").desc).limit(1)
        .select(col("bm25").as("c_bm25"), col("doc_id").as("c_doc"))
      val page3 = scored.crossJoin(broadcast(cursor))
        .filter(col("bm25") < col("c_bm25") ||
          (col("bm25") === col("c_bm25") && col("doc_id") > col("c_doc")))
        .orderBy(col("bm25").desc, col("doc_id")).limit(5)
      page3.withColumn("rank", (row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))) + 10).cast("int"))
        .select(col("rank"), col("doc_id"), col("bm25"))
        .orderBy("rank")
    },
    // ---- idx14: faceted search — ES's terms-aggregation-under-a-query
    // surface: for the docs matching ≥1 seed term (the idx3 candidate
    // set), per-(facet, value) doc counts and the candidates' mean BM25
    // (D6), for the lang and source facets in one pass (a facet-tagged
    // union of two |values|-bounded aggregates; the scored candidate set
    // computes once) -----------------------------------------------------
    "idx14_faceted_search" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val docs = Tables.t(s, dir, "documents")
      val scored = bm25Raw(docs)
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
      def facet(c: String) = scored
        .groupBy(col(c).as("value")).agg(count(lit(1)).as("n_docs"),
          avg(col("bm25_raw")).cast(D6).cast("double").as("mean_bm25"))
        .select(lit(c).as("facet"), col("value"), col("n_docs"),
          col("mean_bm25"))
      facet("lang").unionByName(facet("source"))
        .orderBy("facet", "value")
    },
    // ---- idx13: pseudo-relevance feedback (Rocchio-lite) — the classic
    // two-pass retrieval: BM25 top-3 docs for the seed query, expand the
    // query with those docs' top-3 tf·idf terms (seed terms excluded),
    // re-run BM25 with the 6-term query. The 3 expansion terms are the
    // only driver-side state (3 strings — the bounded model/control
    // pattern, same class as a stored-query registry); both passes are
    // the ONE bm25Raw definition. The oracle replays term selection and
    // the second pass entirely in SQL -------------------------------------
    "idx13_prf_expansion" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val docs = Tables.t(s, dir, "documents")
      val first = bm25Raw(docs)
        .select(col("doc_id"),
          col("bm25_raw").cast(D6).cast("double").as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(3)
      val tf = tfGrid(docs)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val expTerms = tf
        .join(broadcast(first.select("doc_id")), "doc_id")
        .filter(!col("token").isin(Bm25Terms: _*))
        .groupBy("token").agg(sum("tf").as("tfsum"))
        .join(dfq, "token").crossJoin(broadcast(nDocs))
        .withColumn("escore", (col("tfsum").cast("double") *
          log(col("n_docs").cast("double") / col("df")))
          .cast(D6).cast("double"))
        .orderBy(col("escore").desc, col("token")).limit(3)
        .select("token").collect().map(_.getString(0)).toSeq
      val scored = bm25Raw(docs, Bm25Terms ++ expTerms)
        .select(col("doc_id"),
          col("bm25_raw").cast(D6).cast("double").as("bm25"))
      val top = scored.orderBy(col("bm25").desc, col("doc_id")).limit(10)
      top.withColumn("rank", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))))
        .select(col("rank"), col("doc_id"), col("bm25"))
        .orderBy("rank")
    },
    // ---- idx11: more-like-this — ES's MLT query: pick the seed doc's
    // top-5 tf·idf terms, score every other doc by Σ tf·idf over the
    // shared terms. The seed's term table and the 5 selected terms ride
    // broadcasts; only the 5 terms' postings ever shuffle (term-at-a-time,
    // the idx2/idx3 shape); per-doc sums are order-free DECIMAL(28,12) ----
    "idx11_more_like_this" -> { (s, dir) =>
      val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
      val D28 = org.apache.spark.sql.types.DecimalType(28, 12)
      val docs = Tables.t(s, dir, "documents")
      val tf = tfGrid(docs)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val seedTerms = tf.filter(col("doc_id") === 0)
        .join(dfq, "token").crossJoin(broadcast(nDocs))
        .withColumn("tscore", (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df")))
          .cast(D6).cast("double"))
        .orderBy(col("tscore").desc, col("token")).limit(5)
        .select(col("token"), col("df"))
      tf.join(broadcast(seedTerms), "token")
        .filter(col("doc_id") =!= 0)
        .crossJoin(broadcast(nDocs))
        .withColumn("contrib", (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df"))).cast(D28))
        .groupBy("doc_id")
        .agg(sum(col("contrib")).cast("double").as("raw"))
        .select(col("doc_id"), col("raw").cast(D6).cast("double").as("mlt_score"))
        .orderBy(col("mlt_score").desc, col("doc_id")).limit(10)
    })

  val oracle: Map[String, String] = Map(
    "idx1_inverted_index" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "tf AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2), " +
        "dict AS (SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total " +
        "FROM tf GROUP BY token), " +
        "r AS (SELECT token, doc_id, row_number() OVER " +
        "(PARTITION BY token ORDER BY doc_id) AS rn FROM tf), " +
        "h AS (SELECT token, array_to_string(list_sort(list(doc_id)), ',') " +
        "AS head_postings FROM r WHERE rn <= 10 GROUP BY token) " +
        "SELECT dict.token AS token, df, tf_total, head_postings " +
        "FROM dict JOIN h ON dict.token = h.token ORDER BY token"),
    "idx2_phrase_search" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "p AS (SELECT doc_id, unnest(toks) AS token, " +
        "generate_subscripts(toks, 1) - 1 AS pos FROM t), " +
        "p1 AS (SELECT doc_id, pos FROM p WHERE token = 'fast'), " +
        "p2 AS (SELECT doc_id, pos - 1 AS pos FROM p WHERE token = 'table') " +
        "SELECT p1.doc_id AS doc_id, count(*) AS n_matches " +
        "FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p1.pos = p2.pos " +
        "GROUP BY p1.doc_id ORDER BY doc_id"),
    // same positional postings, |p1 − p2| ≤ 5 window, INT-cast gap
    "idx8_proximity" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "p AS (SELECT doc_id, unnest(toks) AS token, " +
        "generate_subscripts(toks, 1) - 1 AS pos FROM t), " +
        "p1 AS (SELECT doc_id, pos AS p1 FROM p WHERE token = 'spark'), " +
        "p2 AS (SELECT doc_id, pos AS p2 FROM p WHERE token = 'join') " +
        "SELECT p1.doc_id AS doc_id, count(*) AS n_pairs, " +
        "CAST(min(abs(p1 - p2)) AS INT) AS min_gap " +
        "FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND abs(p1 - p2) <= 5 " +
        "GROUP BY p1.doc_id ORDER BY doc_id"),
    "idx3_bool_retrieval" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) " +
        "SELECT doc_id, count(*) AS total_tf FROM tok " +
        "WHERE token IN ('spark', 'join', 'vector') " +
        "GROUP BY doc_id HAVING count(DISTINCT token) = 3 ORDER BY doc_id"),
    "rl1_record_linkage" ->
      ("WITH " + dirtySql + ", " +
        "cand AS (SELECT d.d_id, m.c_custkey, " +
        "levenshtein(d.d_name, m.c_name) AS lev, d.d_acctbal, m.c_acctbal " +
        "FROM dirty d JOIN customer m " +
        "ON substr(d.d_name, -4) = substr(m.c_name, -4) " +
        "AND d.d_nationkey = m.c_nationkey " +
        "WHERE levenshtein(d.d_name, m.c_name) <= 1), " +
        "scored AS (SELECT d_id, c_custkey, " +
        "CASE WHEN lev = 0 THEN 4 ELSE 0 END + " +
        "CASE WHEN lev = 1 THEN 2 ELSE 0 END + " +
        "CASE WHEN abs(d_acctbal - c_acctbal) < 0.005 THEN 1 ELSE 0 END AS w " +
        "FROM cand), " +
        "win AS (SELECT d_id, max(struct_pack(w := w, nk := -c_custkey)) AS win, " +
        "count(*) AS n_candidates FROM scored GROUP BY d_id) " +
        "SELECT d_id, -win.nk AS matched_custkey, win.w AS match_weight, " +
        "n_candidates FROM win ORDER BY d_id"),
    // same length-band blocking expressed as a non-equi |Δlen|<=1 (the
    // engine's exploded equi-keys cover exactly that band); struct max
    // orders by (df, tok) on both engines
    "idx4_spell_correct" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents), " +
        "dict AS (SELECT t AS tok, count(DISTINCT doc_id) AS df, length(t) AS len " +
        "FROM tok GROUP BY t), " +
        "probes(q) AS (VALUES ('spak'), ('joinx'), ('vectr'), ('tablee')), " +
        "cand AS (SELECT q, tok, df FROM probes JOIN dict " +
        "ON abs(length(q) - len) <= 1 WHERE levenshtein(q, tok) <= 1), " +
        "w AS (SELECT q, max(struct_pack(df := df, tok := tok)) AS w, " +
        "count(*) AS n_candidates FROM cand GROUP BY q) " +
        "SELECT q, w.tok AS suggestion, w.df AS df, n_candidates " +
        "FROM w ORDER BY q"),
    // closure over the SAME bipartite candidate edges; cluster id = min
    // node id of the component (the engine's CC label convention)
    "rl2_golden_record" ->
      ("WITH RECURSIVE " + dirtySql + ", " +
        "cand AS (SELECT d.d_id, m.c_custkey FROM dirty d JOIN customer m " +
        "ON substr(d.d_name, -4) = substr(m.c_name, -4) " +
        "AND d.d_nationkey = m.c_nationkey " +
        "WHERE levenshtein(d.d_name, m.c_name) <= 1), " +
        "e AS (SELECT d_id AS s, c_custkey AS d FROM cand " +
        "UNION SELECT c_custkey, d_id FROM cand), " +
        "n AS (SELECT DISTINCT s AS node FROM e), " +
        "reach(node, r) AS (SELECT node, node FROM n " +
        "UNION SELECT e.s, reach.r FROM e JOIN reach ON e.d = reach.node), " +
        "comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node), " +
        "bal AS (SELECT c_custkey AS node, c_acctbal FROM customer " +
        "UNION ALL SELECT d_id, d_acctbal FROM dirty) " +
        "SELECT cluster, count(*) AS n_members, " +
        "CAST(sum(CASE WHEN node >= 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_dirty, " +
        "max(c_acctbal) AS golden_acctbal " +
        "FROM comp JOIN bal USING (node) GROUP BY cluster ORDER BY cluster"),
    // same candidate×term grid with zero-tf smoothing; |C| = the exploded
    // token count (≡ the engine's sum(dl)); per-term DECIMAL(28,12) sum
    "idx5_query_likelihood" ->
      ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "dd AS (SELECT doc_id, len(toks) AS dl, toks FROM d), " +
        "tk AS (SELECT doc_id, dl, unnest(toks) AS token FROM dd), " +
        "cl AS (SELECT CAST(count(*) AS DOUBLE) AS cl FROM tk), " +
        "ft AS (SELECT doc_id, dl, token, count(*) AS tf FROM tk " +
        "WHERE token IN ('spark', 'join', 'vector') GROUP BY 1, 2, 3), " +
        "ctf AS (SELECT token, count(*) AS ctf FROM tk " +
        "WHERE token IN ('spark', 'join', 'vector') GROUP BY 1), " +
        "cand AS (SELECT DISTINCT doc_id, dl FROM ft), " +
        "grid AS (SELECT c.doc_id, c.dl, t.token, t.ctf, coalesce(f.tf, 0) AS tf " +
        "FROM cand c CROSS JOIN ctf t " +
        "LEFT JOIN ft f ON f.doc_id = c.doc_id AND f.token = t.token), " +
        "sc AS (SELECT doc_id, ln((CAST(tf AS DOUBLE) + " +
        "100.0 * CAST(ctf AS DOUBLE) / (SELECT cl FROM cl)) / " +
        "(CAST(dl AS DOUBLE) + 100.0)) AS term_ll FROM grid) " +
        "SELECT doc_id, CAST(CAST(CAST(sum(CAST(term_ll AS DECIMAL(28,12))) " +
        "AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS ql_score " +
        "FROM sc GROUP BY doc_id ORDER BY doc_id"),
    // the ONE scoring fragment; ranking on the rounded score, rank INT
    "idx7_bm25_topk" ->
      ("WITH " + bm25Sql + ", " +
        "r AS (SELECT doc_id, CAST(CAST(bm25_raw AS DECIMAL(18,6)) AS DOUBLE) AS bm25 FROM scores) " +
        "SELECT CAST(rank AS INTEGER) AS rank, doc_id, bm25 FROM (" +
        "SELECT doc_id, bm25, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM r) " +
        "WHERE rank <= 5 ORDER BY rank"),
    // same 0-based first-occurrence + clamped ±3 window; DuckDB's 1-based
    // inclusive slice [a+1 : b+1] ≡ the engine's slice(start+1, b-a+1)
    "idx6_kwic_snippets" ->
      ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "u AS (SELECT doc_id, unnest(toks) AS token, " +
        "generate_subscripts(toks, 1) - 1 AS pos FROM d), " +
        "f AS (SELECT doc_id, min(pos) AS p FROM u WHERE token = 'spark' GROUP BY doc_id) " +
        "SELECT d.doc_id AS doc_id, CAST(p AS BIGINT) AS first_pos, " +
        "array_to_string(toks[greatest(p - 3, 0) + 1 : least(p + 3, len(toks) - 1) + 1], ' ') AS snippet " +
        "FROM d JOIN f ON d.doc_id = f.doc_id ORDER BY doc_id"),
    // RRF over the two top-20 legs; ranks on DECIMAL(18,6)-rounded scores
    // (the idx7 convention), fused score = Σ 1/(60+rank), absent leg = 0
    "idx9_rrf_hybrid" ->
      ("WITH " + bm25Sql + ", " +
        "kwr AS (SELECT doc_id, CAST(CAST(bm25_raw AS DECIMAL(18,6)) AS DOUBLE) AS bm25 FROM scores), " +
        "kw AS (SELECT doc_id, kw_rank FROM (SELECT doc_id, " +
        "row_number() OVER (ORDER BY bm25 DESC, doc_id) AS kw_rank FROM kwr) " +
        "WHERE kw_rank <= 20), " +
        "qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0), " +
        "cs AS (SELECT vec_id, CAST(CAST(" +
        "list_dot_product(embedding::DOUBLE[], q_emb::DOUBLE[]) / " +
        "(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * " +
        "sqrt(list_dot_product(q_emb::DOUBLE[], q_emb::DOUBLE[])))" +
        " AS DECIMAL(18,6)) AS DOUBLE) AS cos FROM embeddings CROSS JOIN qv), " +
        "vec AS (SELECT vec_id, vec_rank FROM (SELECT vec_id, " +
        "row_number() OVER (ORDER BY cos DESC, vec_id) AS vec_rank FROM cs) " +
        "WHERE vec_rank <= 20), " +
        "f AS (SELECT coalesce(kw.doc_id, vec.vec_id) AS doc_id, kw_rank, vec_rank " +
        "FROM kw FULL JOIN vec ON kw.doc_id = vec.vec_id) " +
        "SELECT doc_id, CAST(kw_rank AS INTEGER) AS kw_rank, " +
        "CAST(vec_rank AS INTEGER) AS vec_rank, " +
        "CAST(CAST(coalesce(CAST(1 AS DOUBLE) / (60 + kw_rank), CAST(0 AS DOUBLE)) + " +
        "coalesce(CAST(1 AS DOUBLE) / (60 + vec_rank), CAST(0 AS DOUBLE)) " +
        "AS DECIMAL(18,6)) AS DOUBLE) AS rrf " +
        "FROM f ORDER BY rrf DESC, doc_id LIMIT 10"),
    // the shared bm25 candidate set, two facet rollups unioned; D6 round
    // absorbs avg's summation order (the tx25 slack)
    "idx14_faceted_search" ->
      ("WITH " + bm25Sql + " " +
        "SELECT facet, value, n_docs, mean_bm25 FROM (" +
        "SELECT 'lang' AS facet, lang AS value, count(*) AS n_docs, " +
        "CAST(CAST(avg(bm25_raw) AS DECIMAL(18,6)) AS DOUBLE) AS mean_bm25 " +
        "FROM scores JOIN documents USING (doc_id) GROUP BY lang " +
        "UNION ALL " +
        "SELECT 'source', source, count(*), " +
        "CAST(CAST(avg(bm25_raw) AS DECIMAL(18,6)) AS DOUBLE) " +
        "FROM scores JOIN documents USING (doc_id) GROUP BY source) " +
        "ORDER BY facet, value"),
    // first pass = the shared bm25Sql fragment; expansion-term pick and
    // the 6-term second pass replayed entirely in SQL (the engine's only
    // driver state is the 3 expansion strings)
    "idx13_prf_expansion" ->
      ("WITH " + bm25Sql + ", " +
        "r1 AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER " +
        "(ORDER BY CAST(CAST(bm25_raw AS DECIMAL(18,6)) AS DOUBLE) DESC, doc_id) AS rk " +
        "FROM scores) WHERE rk <= 3), " +
        "tokall AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "tfall AS (SELECT token, doc_id, count(*) AS tf FROM tokall GROUP BY 1, 2), " +
        "dfall AS (SELECT token, count(*) AS df FROM tfall GROUP BY token), " +
        "nd AS (SELECT count(*) AS n_docs FROM documents), " +
        "expt AS (SELECT token FROM (" +
        "SELECT t.token AS token, CAST(CAST(CAST(sum(t.tf) AS DOUBLE) * " +
        "ln(CAST(nd.n_docs AS DOUBLE) / df) AS DECIMAL(18,6)) AS DOUBLE) AS escore " +
        "FROM tfall t JOIN r1 ON t.doc_id = r1.doc_id " +
        "JOIN dfall USING (token) CROSS JOIN nd " +
        s"WHERE t.token NOT IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")}) " +
        "GROUP BY t.token, df, nd.n_docs) " +
        "ORDER BY escore DESC, token LIMIT 3), " +
        s"qt AS (${Bm25Terms.map(t => s"SELECT '$t' AS term").mkString(" UNION ALL ")} " +
        "UNION ALL SELECT token FROM expt), " +
        "tf2 AS (SELECT doc_id, dl, t AS token, count(*) AS tf FROM " +
        "(SELECT doc_id, dl, unnest(toks) AS t FROM dd) " +
        "WHERE t IN (SELECT term FROM qt) GROUP BY doc_id, dl, t), " +
        "dfq2 AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf2 GROUP BY token), " +
        "sc2 AS (SELECT doc_id, sum(" +
        "ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + CAST(0.5 AS DOUBLE)) + 1.0) * " +
        "(tf * CAST(2.2 AS DOUBLE)) / " +
        "(tf + 1.2 * (CAST(0.25 AS DOUBLE) + 0.75 * dl / avgdl))" +
        ") AS bm25_raw FROM tf2 JOIN dfq2 USING (token) CROSS JOIN st GROUP BY doc_id) " +
        "SELECT CAST(rank AS INTEGER) AS rank, doc_id, bm25 FROM (" +
        "SELECT doc_id, CAST(CAST(bm25_raw AS DECIMAL(18,6)) AS DOUBLE) AS bm25, " +
        "row_number() OVER (ORDER BY CAST(CAST(bm25_raw AS DECIMAL(18,6)) AS DOUBLE) DESC, doc_id) AS rank " +
        "FROM sc2) WHERE rank <= 10 ORDER BY rank"),
    // same presence grid / totals split; JLH on double rates, D6-rounded
    "idx10_significant_terms" ->
      ("WITH g AS (SELECT DISTINCT doc_id, fg, token FROM " +
        "(SELECT doc_id, lang = 'zh' AS fg, unnest(string_split(text, ' ')) AS token FROM documents)), " +
        "tot AS (SELECT count(*) AS n_all, " +
        "CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_fg FROM documents), " +
        "bt AS (SELECT token, count(*) AS bg_df, " +
        "CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS fg_df FROM g GROUP BY token) " +
        "SELECT token, fg_df, bg_df, CAST(CAST(" +
        "(CAST(fg_df AS DOUBLE) / n_fg - CAST(bg_df AS DOUBLE) / n_all) * " +
        "((CAST(fg_df AS DOUBLE) / n_fg) / (CAST(bg_df AS DOUBLE) / n_all)) " +
        "AS DECIMAL(18,6)) AS DOUBLE) AS score " +
        "FROM bt CROSS JOIN tot WHERE fg_df >= 3 " +
        "ORDER BY score DESC, token LIMIT 15"),
    // the OFFSET formulation of the same page: global rank 11..15 — keyset
    // pagination must be indistinguishable from it
    "idx12_search_after" ->
      ("WITH " + bm25Sql + ", " +
        "r AS (SELECT doc_id, CAST(CAST(bm25_raw AS DECIMAL(18,6)) AS DOUBLE) AS bm25 FROM scores) " +
        "SELECT CAST(rank AS INTEGER) AS rank, doc_id, bm25 FROM (" +
        "SELECT doc_id, bm25, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM r) " +
        "WHERE rank BETWEEN 11 AND 15 ORDER BY rank"),
    // same top-5 seed-term pick (D6-rounded tf·idf, token tiebreak), same
    // DECIMAL(28,12) order-free per-doc sum
    "idx11_more_like_this" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "tf AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2), " +
        "nd AS (SELECT count(*) AS n_docs FROM documents), " +
        "dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token), " +
        "st AS (SELECT token, df FROM (" +
        "SELECT t.token AS token, dfq.df AS df, " +
        "CAST(CAST(CAST(t.tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / dfq.df) " +
        "AS DECIMAL(18,6)) AS DOUBLE) AS tscore " +
        "FROM tf t JOIN dfq USING (token) CROSS JOIN nd WHERE t.doc_id = 0) " +
        "ORDER BY tscore DESC, token LIMIT 5), " +
        "sc AS (SELECT t.doc_id, CAST(CAST(t.tf AS DOUBLE) * " +
        "ln(CAST(n_docs AS DOUBLE) / st.df) AS DECIMAL(28,12)) AS contrib " +
        "FROM tf t JOIN st USING (token) CROSS JOIN nd WHERE t.doc_id <> 0) " +
        "SELECT doc_id, CAST(CAST(CAST(sum(contrib) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS mlt_score " +
        "FROM sc GROUP BY doc_id ORDER BY mlt_score DESC, doc_id LIMIT 10")
  )
}
