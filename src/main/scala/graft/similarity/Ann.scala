package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus, rank per query via window row_number (a
  *    per-query sort; fine while |queries|·|corpus| rows fit a shuffle —
  *    the LSH/IVF variants below are the scale path past that).
  *  - [[lshTopK]]: sign-random-projection LSH — bucket corpus and queries by
  *    hyperplane sign bits, rerank exactly *within* matching buckets. The
  *    scale path: the corpus-side shuffle is on small bucket keys, the
  *    cross-product is bounded per bucket, and recall/probing is tunable via
  *    `planes` (fewer bits → bigger buckets → higher recall).
  *  - [[ivfTopK]]: IVF-style coarse quantization — assign every vector to its
  *    nearest centroid, search only matching cells (with `nprobe` cells per
  *    query).
  *
  * All distance math is the bit-reproducible sequential fold from
  * [[graft.functions.VectorFunctions]].
  */
object Ann {

  /** Per-pair cosine over pre-computed per-row norms — the hot-path form
    * of [[graft.functions.VectorFunctions.cosine]]: `dot(a,b) /
    * (norm(a) * norm(b))` with the two `sqrt(dot(v,v))` folds hoisted out
    * of the pair loop to one evaluation per ROW (they depend only on the
    * row's own vector). Bit-identical to the inline form — the identical
    * IEEE expression tree, just evaluated earlier — but a candidate join
    * producing P pairs from n rows walks each vector once per PAIR for the
    * cross dot instead of three times (2 of 3 array folds eliminated). */
  private def cosinePre(dotAB: Column, nrmA: Column, nrmB: Column): Column =
    dotAB / (nrmA * nrmB)

  /** Per-query top-k over scored (q_id, c_id, sim) candidates by
    * (sim desc, c_id asc), emitted with rank 1..k — the bounded-heap form
    * of the `row_number` rank window (identical rows, identical
    * tie-break, [[graft.functions.TopKAgg]] with the knnJoin key shape):
    * candidates are consumed by a map-side partial heap in the SAME stage
    * that scores them, so the candidate set never crosses a shuffle —
    * only n_q·k ranked rows do (the window shuffled EVERY candidate by
    * q_id and sorted). Requires a numeric c_id (the heap key negates it
    * for the ascending tie-break) — every serve surface here keys on
    * integral vec ids. */
  private[similarity] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import graft.functions.GraftFunctions.top_k
    // the heap's ascending tie-break negates the id, so the id must be a
    // numeric type — fail with an actionable message instead of a Catalyst
    // analysis error on e.g. string ids (ADVICE r15). Long.MinValue would
    // negate to itself (two's complement) and silently invert its
    // tie-break rank; no serve surface mints that id.
    require(scored.schema("c_id").dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType],
      s"rankTopK requires a numeric c_id for its ascending tie-break " +
        s"(got ${scored.schema("c_id").dataType.simpleString}); map " +
        "non-numeric ids to a dense numeric key before serving")
    scored
      .groupBy("q_id")
      .agg(top_k(struct(col("sim").as("sim"), (-col("c_id")).as("ncid"),
        col("c_id").as("c_id")), k).as("topk"))
      .select(col("q_id"), posexplode(col("topk")))
      .select(col("q_id"), col("col.c_id").as("c_id"), col("col.sim").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Exact top-k by cosine: queries × corpus → rank ≤ k.
    * `queries` is expected to be small (broadcast); ties broken by corpus id
    * for determinism. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"),
      norm(col(qVec)).as("q_nrm"))
    val c = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"),
      norm(col(cVec)).as("c_nrm"))
    val scored = c.join(broadcast(q))
      .withColumn("sim",
        cosinePre(dot(col("q_vec"), col("c_vec")), col("q_nrm"), col("c_nrm")))
    rankTopK(scored.select("q_id", "c_id", "sim"), k)
  }

  /** Exact cosine RADIUS search: every corpus item with `sim >= minSim`
    * per query — the retrieval primitive top-k can't express ("all near
    * neighbors", result count unbounded and data-dependent). Same
    * broadcast-queries shape as [[bruteForceTopK]], but radius search
    * needs no window and no per-query sort at all — the threshold is the
    * whole operator, so the plan is scan → broadcast product → filter,
    * fully codegen.
    *
    * `excludeSelf` drops id-equal pairs — correct ONLY when queries and
    * corpus share an id space (the self-sweep case). Pass false when the
    * two sides are different tables whose ids coincidentally overlap
    * (e.g. both numbered from 0), or real matches at equal ids vanish;
    * note [[bruteForceTopK]] never excludes, so the default here is the
    * self-sweep convention, not an invariant of the file. */
  def rangeSearch(queries: DataFrame, corpus: DataFrame, minSim: Double,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"),
      norm(col(qVec)).as("q_nrm"))
    val c = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"),
      norm(col(cVec)).as("c_nrm"))
    c.join(broadcast(q),
        if (excludeSelf) col("q_id") =!= col("c_id") else lit(true))
      .withColumn("sim",
        cosinePre(dot(col("q_vec"), col("c_vec")), col("q_nrm"), col("c_nrm")))
      .filter(col("sim") >= minSim)
      .select("q_id", "c_id", "sim")
  }

  /** Hard-negative mining for contrastive training: per query, the k most
    * cosine-similar corpus items with a DIFFERENT label (the classic
    * in-batch-negatives upgrade — near neighbors that the label says are
    * wrong). Same broadcast-queries shape as [[bruteForceTopK]] with the
    * label-inequality predicate fused into the join, so excluded
    * same-label pairs never materialize a row. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "vec_id", qVec: String = "embedding",
      qLabel: String = "label", cId: String = "vec_id",
      cVec: String = "embedding", cLabel: String = "label"): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"),
      col(qLabel).as("q_label"), norm(col(qVec)).as("q_nrm"))
    val c = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"),
      col(cLabel).as("c_label"), norm(col(cVec)).as("c_nrm"))
    val scored = c.join(broadcast(q), col("c_label") =!= col("q_label"))
      .withColumn("sim",
        cosinePre(dot(col("q_vec"), col("c_vec")), col("q_nrm"), col("c_nrm")))
    rankTopK(scored.select("q_id", "c_id", "sim"), k)
  }

  /** Sign bits under `planes` deterministic pseudo-random hyperplanes →
    * bucket id (long); coef(p, d) = ((p*31 + d)*2654435761 mod 2^31) / 2^31
    * - 0.5, reproducible in SQL. Computed by the native codegen'd
    * [[graft.functions.SignLshBucket]] — one pass over the vector instead
    * of `planes` interpreted lambda folds (bit-identical results). */
  def lshBucket(vec: Column, planes: Int): Column =
    graft.functions.VectorExprFunctions.sign_lsh_bucket(vec, planes)

  /** LSH-bucketed top-k: exact rerank within matching sign buckets.
    * Recall < 1 by construction; `planes` trades recall vs bucket size. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 8,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"),
      lshBucket(col(qVec), planes).as("bucket"), norm(col(qVec)).as("q_nrm"))
    val c = corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec"),
      lshBucket(col(cVec), planes).as("bucket"), norm(col(cVec)).as("c_nrm"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("sim",
        cosinePre(dot(col("q_vec"), col("c_vec")), col("q_nrm"), col("c_nrm")))
    rankTopK(scored.select("q_id", "c_id", "sim"), k)
  }

  /** Corpus×corpus batched kNN join: EVERY vector's top-k cosine neighbors
    * against the whole corpus (self excluded) — the op that powers
    * SemDeDup-style semantic dedup and corpus clustering, where the "query
    * side" IS the corpus and none of the broadcast-the-queries shapes above
    * apply. Three rules keep it off the two scale cliffs:
    *
    *  1. **No corpus-sized broadcast**: both sides of the candidate join
    *     are corpus-sized, so they meet in a co-keyed equi-join on the IVF
    *     cell id (shuffle keyed by cell) — never `broadcast()`, never a
    *     cartesian.
    *  2. **No corpus-sized window — and no assignment shuffle at all**:
    *     cell assignment and probing are per-ROW argmin / top-nprobe
    *     expressions over the broadcast cells row
    *     ([[graft.functions.NearestCell]]/[[graft.functions.ProbeCellsExpr]]
    *     — narrow projections; the corpus is never re-keyed just to
    *     assign it), and the final per-vector ranking is the bounded-heap
    *     [[graft.functions.TopKAgg]] with k = k — candidate rows are
    *     consumed by a map-side partial heap in the SAME stage as the
    *     join, so the |candidates| product NEVER crosses a shuffle (only
    *     n·k ranked rows do).
    *  3. **Candidates are cell-bounded**: a corpus vector lives in exactly
    *     one cell, so a (q, c) pair is generated at most once (no
    *     distinct) and |candidates| = Σ_q Σ_{probed cells} |cell| ≈
    *     n²·nprobe/C — pick C ∝ √n (the classic IVF sizing) and the
    *     candidate volume grows as n^1.5, never n².
    *
    * `nprobe = |centroids|` probes every cell — exhaustive, so the result
    * provably equals the exact per-vector top-k (the oracle config, the
    * [[ivfTopK]]/ann4 pattern); smaller `nprobe` is the approximate scale
    * path whose recall DedupAnnSpec pins. Scores are exact cosine on every
    * candidate (the "rerank" is built in — no quantization here), ties
    * broken by ascending corpus id. Output: (q_id, c_id, sim, rank). */
  def knnJoin(corpus: DataFrame, centroids: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centId: String = "cent_id", centVec: String = "cent_vec"): DataFrame = {
    import graft.functions.GraftFunctions.top_k
    require(k >= 1, s"knnJoin: k must be >= 1, got $k")
    require(nprobe >= 1, s"knnJoin: nprobe must be >= 1, got $nprobe")
    val (assigned, probes) =
      cellJoinSides(corpus, centroids, nprobe, idCol, vecCol, centId, centVec)
    // candidates: co-keyed equi-join on the cell; scored exactly; ranked
    // by a second bounded heap — the join product feeds the partial
    // aggregate inside one stage, so it never shuffles. Norms are hoisted
    // to one per ROW before the join (see cosinePre): the ~n²·nprobe/C
    // candidate pairs each cost ONE vector fold, not three.
    assigned.withColumn("c_nrm", norm(col("c_vec")))
      .join(probes.withColumn("q_nrm", norm(col("q_vec"))), Seq("cent"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosinePre(dot(col("q_vec"), col("c_vec")),
          col("q_nrm"), col("c_nrm")).as("sim"))
      .groupBy("q_id")
      .agg(top_k(struct(col("sim").as("sim"), (-col("c_id")).as("ncid"),
        col("c_id").as("c_id")), k).as("topk"))
      .select(col("q_id"), posexplode(col("topk")))
      .select(col("q_id"), col("col.c_id").as("c_id"), col("col.sim").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** The candidate-pair count of [[knnJoin]]'s cell join — the quantity
    * whose growth governs the join's scaling (every candidate costs one
    * cosine), exposed for the sf0.1↔sf1 scale gate exactly like
    * [[graft.dedup.OverlapJoin.candidates]]. */
  def knnJoinCandidates(corpus: DataFrame, centroids: DataFrame,
      nprobe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding",
      centId: String = "cent_id", centVec: String = "cent_vec"): DataFrame = {
    // the SAME sides the real join builds (vector payloads included, so
    // the counter models the actual join's shuffle, and the assignment /
    // probe tie-breaks can never drift from it)
    val (assigned, probes) =
      cellJoinSides(corpus, centroids, nprobe, idCol, vecCol, centId, centVec)
    assigned.join(probes, Seq("cent"))
      .filter(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id")
  }

  /** The (assigned corpus side, probe side) pair of the corpus×corpus
    * cell join — ONE builder shared by [[knnJoin]] and
    * [[knnJoinCandidates]] (the OverlapJoin.buildCandidates convention),
    * so the argmin/probe tie-breaks cannot fork. Corpus side: nearest
    * cell per vector via min_by over the (d2, cent) total order, the
    * vector riding in the payload struct so no second join re-attaches
    * it. Probe side: the nprobe nearest cells via the bounded heap over
    * NEGATED (d2, cent) — "k largest" becomes "nprobe nearest, ties to
    * the smaller cell id". */
  private def cellJoinSides(corpus: DataFrame, centroids: DataFrame,
      nprobe: Int, idCol: String, vecCol: String,
      centId: String, centVec: String): (DataFrame, DataFrame) = {
    import graft.functions.VectorExprFunctions.{nearest_cell, probe_cells}
    // per-row argmin / top-nprobe over the broadcast 1-row cells array
    // (see [[centsRow]]) — same (d2, cent) total order the join+aggregate
    // formulation minimized, with NO corpus shuffle on either side
    val cs = broadcast(centsRow(centroids, centId, centVec))
    val assigned = corpus
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
      .crossJoin(cs)
      .select(col("c_id"),
        nearest_cell(col("c_vec"), col("__cs")).getField("cent").as("cent"),
        col("c_vec"))
    val probes = corpus
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(cs)
      .select(col("q_id"),
        explode(probe_cells(col("q_vec"), col("__cs"), nprobe)).as("p"),
        col("q_vec"))
      .select(col("q_id"), col("p.cent").as("cent"), col("q_vec"))
    (assigned, probes)
  }

  /** The k cells as ONE broadcastable row — `sort_array(collect_list(
    * struct(cent, cv)))`, cent-ascending so the per-row argmin scan order
    * IS the (d2, cent) tie-break order. Model-sized by contract (k·dim
    * doubles), the same payload the old per-site `broadcast(cent)` join
    * side carried. */
  private[similarity] def centsRow(centroids: DataFrame,
      centId: String, centVec: String): DataFrame =
    centroids.agg(sort_array(collect_list(struct(
      col(centId).as("cent"), col(centVec).as("cv")))).as("__cs"))

  /** Nearest-cell assignment — THE index-build step shared by the
    * persisted-IVF path (q:ann13) and its spec: a per-row argmin over the
    * (d2, cell) total order (deterministic ties) against the broadcast
    * cells row — a narrow projection; no join, no shuffle, no window. */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centId: String = "cent_id", centVec: String = "cent_vec",
      cellCol: String = "cell"): DataFrame =
    assignCellsWithDist(corpus, centroids, idCol, vecCol, centId, centVec,
      cellCol).drop("d2")

  /** [[assignCells]] keeping the squared distance TO the winning cell as a
    * `d2` column — the per-vector quantization error [[IvfIndex]] persists
    * so quantizer-drift detection (batch mean d2 vs train-time mean d2)
    * never re-scores the corpus. Same argmin, same tie-break, one extra
    * double per row. */
  def assignCellsWithDist(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centId: String = "cent_id", centVec: String = "cent_vec",
      cellCol: String = "cell"): DataFrame = {
    import graft.functions.VectorExprFunctions.nearest_cell
    // per-row argmin over the broadcast cells row — the same (d2, cent)
    // winner the broadcast-join + min_by aggregate produced, with no
    // corpus shuffle (see [[centsRow]])
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(centsRow(centroids, centId, centVec)))
      .select(col(idCol), col(vecCol),
        nearest_cell(col(vecCol), col("__cs")).as("__nc"))
      // empty-centroids contract (ADVICE r15): the old broadcast inner
      // join emitted zero rows for an empty centroid frame; centsRow's
      // agg always yields one row with an empty array and nearest_cell
      // then returns null — drop those rows so the contract is preserved
      // (a no-op narrow filter when centroids exist: __nc is non-null for
      // every fixed-dim vector then)
      .filter(col("__nc").isNotNull)
      .select(col(idCol), col(vecCol),
        col("__nc.cent").as(cellCol), col("__nc.d2").as("d2"))
  }

  /** Serving path over a PERSISTED IVF index: `stored` is the corpus
    * written `partitionBy(cellCol)` (the index IS the physical layout —
    * one directory per coarse cell), so the probe filter below reaches the
    * reader as a partition-directory prune: a query batch probing p of C
    * cells READS p/C of the corpus, no row-level filtering needed. This is
    * the 100 TB serving story — at C ∝ √n with bounded nprobe, a query
    * touches O(√n) vectors of storage, and st27-style streaming serving
    * gets the same layout for free.
    *
    * The probe union is collected to the driver — bounded control state
    * (≤ nprobe × |queries| ints, never data-sized). Per-query correctness
    * rides the (cell) equi-join against the broadcast probe set; the
    * `isin` filter is the scan-level superset prune. `nprobe = |cells|`
    * probes everything (provably exact — the oracle config, the ann4
    * pattern); bounded nprobe is the approximate path whose recall and
    * pruned-scan shape IvfPrunedSpec pins. */
  def ivfTopKPruned(stored: DataFrame, queries: DataFrame,
      centroids: DataFrame, k: Int, nprobe: Int = 2,
      cellCol: String = "cell",
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding",
      centId: String = "cent_id", centVec: String = "cent_vec"): DataFrame = {
    require(k >= 1 && nprobe >= 1, s"k/nprobe must be >= 1: $k/$nprobe")
    // ONE execution of the assignment pipeline: the collected rows feed
    // both the driver-side probe-cell list AND (as a local relation) the
    // broadcast join side — the query batch is broadcast-sized by
    // contract, so materializing it on the driver costs what the
    // broadcast costs anyway
    val (probeRows, probeSchema) =
      collectProbes(queries, centroids, nprobe, qId, qVec, centId, centVec)
    rankOverProbes(stored, probeRows, probeSchema, k, cellCol, cId, cVec)
  }

  /** The collected probe side of a pruned IVF serve: per query, its
    * `nprobe` nearest cells — (q_id, q_vec, cent) rows plus their schema.
    * Bounded driver state by the broadcast-query contract (≤ nprobe ×
    * |queries| rows). ONE derivation shared by [[ivfTopKPruned]] and
    * [[IvfIndex.serve]], so the cells the store-side partition prune reads
    * and the cells the candidate join matches can never fork. */
  private[similarity] def collectProbes(queries: DataFrame,
      centroids: DataFrame, nprobe: Int, qId: String, qVec: String,
      centId: String, centVec: String)
      : (Array[org.apache.spark.sql.Row],
         org.apache.spark.sql.types.StructType) = {
    import graft.functions.VectorExprFunctions.probe_cells
    // per-row top-nprobe over the broadcast cells row — same (d2, cent)
    // rank order as the window formulation, no shuffle (see [[centsRow]])
    val probesDf = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
      .crossJoin(broadcast(centsRow(centroids, centId, centVec)))
      .select(col("q_id"), col("q_vec"),
        explode(probe_cells(col("q_vec"), col("__cs"), nprobe)
          .getField("cent")).as("cent"))
    (probesDf.collect(), probesDf.schema)
  }

  /** Candidate join + exact rerank over an already-collected probe side:
    * row-filter the stored corpus to the probed cells (the scan-level
    * prune — a partition-directory prune when `stored` is cell-partitioned
    * parquet), equi-join the broadcast probe set on the cell, exact cosine,
    * per-query window top-k. */
  private[similarity] def rankOverProbes(stored: DataFrame,
      probeRows: Array[org.apache.spark.sql.Row],
      probeSchema: org.apache.spark.sql.types.StructType, k: Int,
      cellCol: String, cId: String, cVec: String): DataFrame = {
    val cand = scoreOverProbes(stored, probeRows, probeSchema,
      cellCol, cId, cVec)
    rankTopK(cand, k)
  }

  /** The scored-candidate half of a probed serve, shared by the ranked
    * ([[rankOverProbes]]) and threshold ([[IvfIndex.neighborsWithin]])
    * consumers: prune the stored corpus to the probed cells, equi-join the
    * broadcast probe set on the cell key, exact cosine per (query,
    * candidate) — `(q_id, c_id, sim)`. */
  private[similarity] def scoreOverProbes(stored: DataFrame,
      probeRows: Array[org.apache.spark.sql.Row],
      probeSchema: org.apache.spark.sql.types.StructType,
      cellCol: String, cId: String, cVec: String): DataFrame = {
    val spark = stored.sparkSession
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probeSchema)
    // probe literals take the PARTITION column's own type (string or a
    // narrower integer than the centroid ids) — a mismatch would wrap the
    // partition column in a CAST, and a cast-wrapped IN can land as a
    // post-scan row filter instead of PartitionFilters: silently correct,
    // silently unpruned
    val cellType = stored.schema(cellCol).dataType
    val probes = probeCells(probeRows, cellType)
    stored
      .filter(col(cellCol).isInCollection(probes)) // partition-dir prune
      .withColumn("__c_nrm", norm(col(cVec)))
      .join(broadcast(probesLocal.select(col("q_id"), col("q_vec"),
        norm(col("q_vec")).as("__q_nrm"),
        col("cent").cast(cellType).as(cellCol))), Seq(cellCol))
      .select(col("q_id"), col(cId).as("c_id"),
        cosinePre(dot(col("q_vec"), col(cVec)),
          col("__q_nrm"), col("__c_nrm")).as("sim"))
  }

  /** Distinct probed cells, coerced to the stored cell column's exact
    * type (see the CAST note in [[rankOverProbes]]). */
  private[similarity] def probeCells(
      probeRows: Array[org.apache.spark.sql.Row],
      cellType: org.apache.spark.sql.types.DataType): Seq[Any] = {
    val probesRaw = probeRows.map(_.getAs[Any]("cent")).distinct
    import org.apache.spark.sql.types._
    (cellType match {
      case StringType => probesRaw.map(String.valueOf)
      case IntegerType => probesRaw.map(_.asInstanceOf[Number].intValue)
      case LongType => probesRaw.map(_.asInstanceOf[Number].longValue)
      case ShortType => probesRaw.map(_.asInstanceOf[Number].shortValue)
      case _ => probesRaw
    }).toSeq
  }

  /** IVF-style: `centroids` (small, broadcast) define cells; every corpus
    * vector is assigned to its nearest centroid once (narrow projection +
    * small broadcast join); queries probe their `nprobe` nearest cells. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 2,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding",
      centId: String = "cent_id", centVec: String = "cent_vec"): DataFrame = {
    import graft.functions.VectorExprFunctions.probe_cells
    // per-row top-keep cells over the broadcast cells row — same
    // (d2, cent) rank order as the window formulation, no shuffle
    val cs = broadcast(centsRow(centroids, centId, centVec))
    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame =
      df.crossJoin(cs)
        .select(df.columns.map(col) :+
          explode(probe_cells(col(vec), col("__cs"), keep)
            .getField("cent")).as("cent"): _*)
    val c = assign(corpus.select(col(cId).as("c_id"), col(cVec).as("c_vec")),
      "c_id", "c_vec", 1)
    val q = assign(queries.select(col(qId).as("q_id"), col(qVec).as("q_vec")),
      "q_id", "q_vec", nprobe)
    val scored = c.withColumn("c_nrm", norm(col("c_vec")))
      .join(broadcast(q.withColumn("q_nrm", norm(col("q_vec")))), Seq("cent"))
      .withColumn("sim",
        cosinePre(dot(col("q_vec"), col("c_vec")), col("q_nrm"), col("c_nrm")))
    rankTopK(scored.select("q_id", "c_id", "sim"), k)
  }
}
