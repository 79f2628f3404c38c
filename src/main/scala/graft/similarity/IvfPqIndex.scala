package graft.similarity

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

import graft.store.PartitionedStore

/** The PQ-CODED maintained index — [[IvfIndex]]'s layout with product-
  * quantized residual codes stored alongside each vector, which is what
  * production IVF serving deploys at 100 TB (FAISS IndexIVFPQ; the static
  * composition is q:ann11 / [[IvfPq]], this is its MAINTAINED shape): the
  * serving scan reads (cell, id, code) — a few bytes per vector, column-
  * pruned out of the parquet so the raw vectors never move — and only the
  * `rerank` ADC survivors per query fetch their raw vector for the exact
  * re-score, from the same probed partitions, AFTER the cut. The reference
  * analog remains the time-sliced index maintenance lifecycle
  * (`aleph2_search_index_service_elasticsearch/.../services/
  * ElasticsearchIndexService.java:335-391`).
  *
  * Frozen-model doctrine (identical to [[IvfIndex]], extended to the
  * codebooks): build() freezes BOTH the coarse quantizer (caller-supplied
  * centroids) and the residual codebooks it trains, persists the codebooks
  * next to the store (`pq_codebooks.parquet` — m·k rows of bounded model
  * state) and the drift baseline in `ivfpq_meta.json` (the build's commit
  * point: deleted before the new corpus lands, written after, so a crash
  * mid-build reads as "not built", never a stale baseline). append()
  * drift-checks against the baseline and encodes under the FROZEN
  * codebooks — that is what makes appends O(batch) — and fails loudly
  * past `maxDriftRatio` (the retrain signal; [[RotatingIvfIndex]] is the
  * no-blackout rebuild lever). Same fused pre-commit aggregate, same
  * write-lineage replay guard, same O(batch) append commit and same
  * crash/rollback contract as [[IvfIndex]] — all inherited from
  * [[PartitionedStore]].
  *
  * Serving: ONE probe derivation feeds the partition-directory prune and
  * the per-(query, probed-cell) residual ADC tables (asymmetric distance:
  * the query's residual against THAT cell, mirroring the corpus-side
  * residual encode), so they can never fork. `nprobe = |cells|` with
  * `rerank = Int.MaxValue` degenerates to exact brute-force ranking — the
  * oracle config (q:ann16) pinning build→append→append→ADC→rerank end to
  * end; IvfPqIndexSpec pins recall for genuinely-approximate settings.
  */
final class IvfPqIndex(val spark: SparkSession, val root: String,
    val nPartitions: Int, val m: Int, val k: Int,
    val idCol: String = "vec_id", val vecCol: String = "embedding",
    val cellCol: String = "cell", val centId: String = "cent_id",
    val centVec: String = "cent_vec") {
  require(m >= 1 && k >= 2, s"m/k must be >= 1/2: $m/$k")

  val store = new PartitionedStore(spark, root, Seq(cellCol), nPartitions)

  private def metaPath = Paths.get(root, "ivfpq_meta.json")
  private def codebooksPath = Paths.get(root, "pq_codebooks.parquet")

  private def metaField(name: String): Double = {
    require(Files.exists(metaPath), s"IVF-PQ index at $root not built")
    val body = new String(Files.readAllBytes(metaPath), "UTF-8")
    ("\"" + name + "\"\\s*:\\s*([-0-9.eE]+)").r.findFirstMatchIn(body)
      .getOrElse(throw new IllegalStateException(
        s"malformed ivfpq_meta.json at $root: $body")).group(1).toDouble
  }

  /** Train-time mean squared coarse-assignment distance — the drift
    * baseline, same statistic as [[IvfIndex.trainMeanD2]]. */
  def trainMeanD2: Double = metaField("train_mean_d2")

  private def subDim: Int = metaField("sub_dim").toInt

  /** The FROZEN residual codebooks, reconstructed from the persisted
    * parquet — m·k rows of bounded model state, never data-sized. */
  def codebooks(): Pq.Codebooks = {
    val d = subDim
    val rows = spark.read.parquet(codebooksPath.toString).collect()
    require(rows.length == m * k,
      s"codebooks at $root hold ${rows.length} entries, expected ${m * k}")
    val arr = Array.fill(m, k)(Seq.empty[Double])
    rows.foreach(r => arr(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2))
    Pq.Codebooks(m, k, d, arr.map(_.toIndexedSeq).toIndexedSeq)
  }

  /** Coarse-assign + residual: (id, vec, cell, d2, __res). The residual is
    * against the ASSIGNED cell's centroid — the corpus side of the
    * asymmetric distance. */
  private def assignWithResidual(df: DataFrame,
      centroids: DataFrame): DataFrame = {
    val assigned = Ann.assignCellsWithDist(df, centroids,
      idCol, vecCol, centId, centVec, cellCol)
    val cent = centroids.select(col(centId).as(cellCol),
      col(centVec).cast("array<double>").as("__cv"))
    assigned.join(broadcast(cent), Seq(cellCol))
      .withColumn("__res", zip_with(col(vecCol).cast("array<double>"),
        col("__cv"), (a, b) => a - b))
      .drop("__cv")
  }

  private def storedCols = Seq(col(idCol), col(vecCol), col(cellCol),
    col("d2"), col("code"))

  /** Build: assign + residual-encode the corpus under codebooks trained on
    * ITS residuals, persist per-cell, freeze everything. Overwrites any
    * existing index; the meta swap at the end is the commit point. */
  def build(corpus: DataFrame, centroids: DataFrame): Unit = {
    // invalidate the previous build's baseline/codebook pairing BEFORE any
    // new state lands — the IvfIndex crash-window doctrine
    Files.deleteIfExists(metaPath)
    val res = assignWithResidual(corpus, centroids)
    val books = Pq.train(res.select(col(idCol), col("__res")),
      idCol, "__res", m, k, iters = 2)
    writeCodebooks(books)
    store.init(Pq.encode(res, "__res", books).select(storedCols: _*))
    val meanRow = store.read().agg(avg(col("d2"))).collect()(0)
    require(!meanRow.isNullAt(0),
      s"IVF-PQ build corpus is empty — an index at $root needs at least one vector")
    val body = String.format(java.util.Locale.ROOT,
      """{"train_mean_d2":%s,"m":%d,"k":%d,"sub_dim":%d,"n_partitions":%d}""",
      java.lang.Double.toString(meanRow.getDouble(0)), Int.box(m), Int.box(k),
      Int.box(books.subDim), Int.box(nPartitions))
    val tmp = Paths.get(root, s".meta_tmp${System.nanoTime()}")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, metaPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeCodebooks(books: Pq.Codebooks): Unit = {
    val rows = for {
      (cb, s) <- books.cents.zipWithIndex
      (v, c) <- cb.zipWithIndex
    } yield Row(s, c, v)
    spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        StructType(Seq(
          StructField("sub", IntegerType, nullable = false),
          StructField("cent", IntegerType, nullable = false),
          StructField("cv", ArrayType(DoubleType), nullable = false))))
      .coalesce(1).write.mode("overwrite").parquet(codebooksPath.toString)
  }

  /** Append a batch under the FROZEN coarse quantizer AND codebooks:
    * assign, drift-check BEFORE any write, encode, commit O(batch) through
    * the store's append (replay guard fused into the write lineage, same
    * as [[IvfIndex.append]]). Returns the measured drift ratio. */
  def append(batch: DataFrame, centroids: DataFrame,
      maxDriftRatio: Double = Double.MaxValue): Double = {
    val baseline = trainMeanD2
    val books = codebooks()
    val res = assignWithResidual(batch, centroids)
    val pre = res.agg(avg(col("d2")).as("mean"),
      collect_set(store.partitionId).as("touched")).collect()(0)
    require(!pre.isNullAt(0), "append batch is empty")
    val mean = pre.getDouble(0)
    val touched = pre.getSeq[Int](1).sorted
    val ratio =
      if (baseline > 0) mean / baseline
      else if (mean == 0) 1.0
      else Double.PositiveInfinity
    if (ratio > maxDriftRatio)
      throw new IllegalStateException(
        f"quantizer drift: batch mean d2 $mean%.6f is $ratio%.2fx the " +
          f"train-time mean $baseline%.6f (max $maxDriftRatio%.2f) — " +
          "re-train and rebuild (RotatingIvfIndex.rebuild swaps a fresh " +
          "build in without a serving blackout)")
    val existing = store.readPartitions(touched)
      .select(col(idCol), lit(1).as("__dup"))
    val guarded = Pq.encode(res, "__res", books)
      .join(existing, Seq(idCol), "left")
      .withColumn(idCol,
        when(col("__dup").isNull, col(idCol))
          .otherwise(raise_error(concat(
            lit("append batch replays an id already in the index: "),
            col(idCol).cast("string")))))
      .select(storedCols: _*)
    store.append(touched, guarded)
    ratio
  }

  /** Erasure, [[IvfIndex.remove]]'s contract: victims re-derive their cell
    * under the frozen quantizer, only touched partitions rewrite, one
    * id-column-pruned statistics pass. Returns rows removed. */
  def remove(victims: DataFrame, centroids: DataFrame,
      requirePresent: Boolean = true): Long = {
    val assigned = Ann.assignCellsWithDist(victims, centroids,
      idCol, vecCol, centId, centVec, cellCol)
    val touched = store.touchedBy(assigned)
    if (touched.isEmpty) return 0L
    val current = store.readPartitions(touched)
    val victimIds = assigned.select(col(idCol))
    val stats = current.select(col(idCol)).withColumn("__c", lit(1))
      .join(victimIds.distinct().withColumn("__v", lit(1)), Seq(idCol), "full")
      .agg(
        sum(when(col("__c").isNotNull && col("__v").isNotNull, 1L)
          .otherwise(0L)).as("removed"),
        sum(when(col("__c").isNull, 1L).otherwise(0L)).as("missing"))
      .collect()(0)
    val removed = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val missing = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    if (requirePresent && missing > 0) {
      val sample = victimIds
        .join(current.select(col(idCol)), Seq(idCol), "left_anti")
        .limit(5).collect().map(_.get(0))
      throw new IllegalArgumentException(
        s"remove batch names $missing ids not in the index: " +
          sample.mkString(", "))
    }
    store.refresh(touched,
      current.join(victimIds, Seq(idCol), "left_anti").select(storedCols: _*))
    removed
  }

  /** Compact fragmented partitions, [[IvfIndex.compact]]'s contract. */
  def compact(maxDirs: Int = 1): Seq[Int] = {
    require(maxDirs >= 1, s"maxDirs must be >= 1: $maxDirs")
    val frag = store.dirCounts().collect {
      case (i, n) if n > maxDirs => i
    }.toSeq.sorted
    if (frag.nonEmpty) store.refresh(frag, store.readPartitions(frag))
    frag
  }

  /** Partition-pruned ADC serving: derive probes ONCE (feeding both the
    * directory prune and the candidate join), score only the probed
    * partitions' (cell, id, code) columns against broadcast per-(query,
    * cell) residual distance tables, keep `rerank` candidates per query by
    * quantized distance, exact-rerank those by true cosine with raw
    * vectors fetched from the same probed partitions AFTER the cut. */
  def serve(queries: DataFrame, centroids: DataFrame, kTop: Int,
      nprobe: Int, rerank: Int): DataFrame = {
    require(kTop >= 1 && nprobe >= 1 && rerank >= kTop,
      s"need kTop >= 1, nprobe >= 1, rerank >= kTop: $kTop/$nprobe/$rerank")
    val books = codebooks()
    val (probeRows, probeSchema) = Ann.collectProbes(
      queries, centroids, nprobe, idCol, vecCol, centId, centVec)
    val cellType = store.schema(cellCol).dataType
    val cells = Ann.probeCells(probeRows, cellType)
    val cellRows = cells.map(c => Row(c))
    val cellsDf = spark.createDataFrame(
      java.util.Arrays.asList(cellRows: _*),
      StructType(Seq(StructField(cellCol, cellType, nullable = false))))
    val ids = if (cells.isEmpty) Seq(0) else store.touchedBy(cellsDf)
    val pruned = store.readPartitions(ids)
    // probe side: per (query, probed cell), the query's residual against
    // THAT cell -> one m×k ADC table (the asymmetric-distance counterpart
    // of the corpus-side residual encode)
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probeSchema)
    val cent = centroids.select(col(centId).as("cent"),
      col(centVec).cast("array<double>").as("__cv"))
    val probes = probesLocal.join(broadcast(cent), Seq("cent"))
      .withColumn("__qres", zip_with(col("q_vec").cast("array<double>"),
        col("__cv"), (a, b) => a - b))
      .select(col("q_id"), col("cent").cast(cellType).as(cellCol),
        Pq.distanceTable(col("__qres"), books).as("__dtab"))
    // ADC scan: ONLY (cell, id, code) of the probed partitions — the
    // parquet reader prunes the raw-vector column out of this stage
    val scored = pruned.select(col(cellCol), col(idCol).as("c_id"), col("code"))
      .join(broadcast(probes), Seq(cellCol))
      .withColumn("__adc", aggregate(
        zip_with(col("code"), col("__dtab"),
          (cd, row) => element_at(row, cd + 1)),
        lit(0.0), (acc, x) => acc + x))
    val wAdc = Window.partitionBy("q_id").orderBy(col("__adc"), col("c_id"))
    val candidates = scored
      .withColumn("__cr", row_number().over(wAdc))
      .filter(col("__cr") <= rerank)
      .select("q_id", "c_id")
    // exact rerank: |queries|·rerank raw vectors, equi-joined from the
    // probed partitions after the cut
    val qVecs = probesLocal.select(col("q_id"),
      col("q_vec").cast("array<double>").as("q_vec"))
      .dropDuplicates("q_id")
    val wSim = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    candidates
      .join(pruned.select(col(idCol).as("c_id"),
        col(vecCol).cast("array<double>").as("__cvec")), Seq("c_id"))
      .join(broadcast(qVecs), Seq("q_id"))
      .withColumn("sim", graft.functions.VectorFunctions.cosine(
        col("q_vec"), col("__cvec")))
      .withColumn("rank", row_number().over(wSim))
      .filter(col("rank") <= kTop)
      .select(col("q_id"), col("c_id"), col("sim"), col("rank"))
  }
}
