package graft.similarity

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.PartitionedStore

/** A PERSISTED, incrementally-maintained IVF index — the op a real serving
  * pipeline runs daily: append a new embedding batch into the persisted
  * index WITHOUT rebuilding it. Composes the two components built for each
  * other: [[Ann.assignCellsWithDist]] routes vectors to coarse cells, and
  * [[PartitionedStore.append]] commits each batch as ONE added data dir
  * per touched cell partition behind one atomic manifest swap — O(batch)
  * write I/O, crash-safe, time-travelable, version-CAS write-guarded (all
  * inherited, spec'd contracts).
  * The reference's analog is the time-sliced index append + rollover
  * lifecycle (`aleph2_search_index_service_elasticsearch/.../services/
  * ElasticsearchIndexService.java:335-391`), re-expressed as a lakehouse
  * layout instead of an ES alias dance.
  *
  * Layout: the store is keyed by `cell`, so a partition holds whole cells
  * (`pmod(xxhash64(cell), nPartitions)` — at nPartitions ≈ |cells|, about
  * one cell per directory). Serving prunes at the partition-directory
  * level: a query batch probing p of C cells reads ~p/C of the corpus —
  * the same 100 TB story as the static ann13 layout, plus O(batch)
  * maintenance I/O per append instead of O(n) rebuild I/O; a periodic
  * [[PartitionedStore.refresh]] compacts a partition's accumulated append
  * dirs back to one.
  *
  * Quantizer drift: the centroids are FROZEN at build time (that is what
  * makes appends cheap), so each append measures the batch's mean squared
  * assignment distance against the train-time mean persisted in
  * `ivf_meta.json`. A batch whose distribution moved away from the trained
  * cells assigns measurably farther (ratio >> 1); [[append]] returns the
  * ratio and fails loudly — BEFORE any write — when it exceeds
  * `maxDriftRatio`, the signal to re-train and [[build]] fresh. Every row
  * also persists its own `d2`, so a post-hoc drift audit never re-scores
  * the corpus.
  *
  * Id contract: appended ids are expected new. A replayed batch (same id,
  * same vector → same cell) is caught by a bounded guard over the touched
  * partitions only; a duplicate id arriving with a DIFFERENT vector that
  * lands in another cell is the caller's uniqueness contract, same as any
  * keyed sink here.
  */
final class IvfIndex(val spark: SparkSession, val root: String,
    val nPartitions: Int, val idCol: String = "vec_id",
    val vecCol: String = "embedding", val cellCol: String = "cell",
    val centId: String = "cent_id", val centVec: String = "cent_vec") {

  val store = new PartitionedStore(spark, root, Seq(cellCol), nPartitions)

  /** Test-only fault-injection seam: invoked after [[build]]'s ordered
    * steps (`metaInvalidated`, `storeInit`) so FaultInjectionSpec can
    * snapshot the state a crash at that point would leave. No-op in
    * production. */
  private[graft] var onStep: String => Unit = _ => ()

  private def metaPath = Paths.get(root, "ivf_meta.json")

  /** Train-time mean squared assignment distance (the drift baseline). */
  def trainMeanD2: Double = IvfCommon.metaField(metaPath, "train_mean_d2",
    s"IVF index at $root not built")

  /** Build the index: assign every corpus vector to its nearest (frozen)
    * centroid, persist per-cell via the store's init, and record the
    * train-time mean d2 as the drift baseline. The baseline read-back
    * scans ONLY the d2 column of the just-written parquet (column-pruned),
    * not the vectors. Overwrites any existing index. */
  def build(corpus: DataFrame, centroids: DataFrame): Unit = {
    // validate BEFORE invalidating anything: an empty rebuild corpus (an
    // upstream filter bug) must fail HERE, while the previous index's data
    // and baseline are still fully intact — not after the overwrite
    require(!corpus.isEmpty,
      s"IVF build corpus is empty — an index at $root needs at least one vector")
    val assigned = Ann.assignCellsWithDist(corpus, centroids,
      idCol, vecCol, centId, centVec, cellCol)
    // invalidate the PREVIOUS build's drift baseline BEFORE the new corpus
    // commits: a crash between store.init and the new meta swap must leave
    // "index not built" (trainMeanD2 fails loudly), never a fresh index
    // silently drift-checking appends against a stale baseline
    Files.deleteIfExists(metaPath)
    onStep("metaInvalidated")
    // the drift baseline rides the init write as an observed metric
    // (guide §1: one action) — the separate read-back job was a full
    // d2-column scan of the just-written index at ANY corpus scale
    val obs = org.apache.spark.sql.Observation()
    store.init(assigned.observe(obs, avg(col("d2")).as("mean_d2")))
    onStep("storeInit")
    val meanOpt = obs.get.get("mean_d2").flatMap(Option(_))
    require(meanOpt.isDefined,
      s"IVF build corpus yielded no assignment distances (null embeddings?) " +
        s"— the index at $root has no drift baseline")
    val mean = meanOpt.get.asInstanceOf[Double]
    val body = String.format(java.util.Locale.ROOT,
      """{"train_mean_d2":%s,"n_partitions":%d}""",
      java.lang.Double.toString(mean), Int.box(nPartitions))
    val tmp = Paths.get(root, s".meta_tmp${System.nanoTime()}")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, metaPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append a batch under the FROZEN quantizer: assign, drift-check, and
    * commit per-cell through the store's APPEND commit — write I/O is
    * O(|batch|) (one new dir per touched partition, existing dirs
    * untouched — a uniform batch spreading over every cell still appends
    * in O(batch), where a full-content refresh would rewrite the store),
    * and a failure at any point (drift, replay, a poisoned batch) leaves
    * the index byte-identical at its previous version (the store's commit
    * contract). The replay guard reads only the touched partitions' id
    * COLUMN (a pruned scan). Returns the measured drift ratio (batch mean
    * d2 over the train-time mean). */
  def append(batch: DataFrame, centroids: DataFrame,
      maxDriftRatio: Double = Double.MaxValue): Double = {
    val baseline = trainMeanD2
    val assigned = Ann.assignCellsWithDist(batch, centroids,
      idCol, vecCol, centId, centVec, cellCol)
    // ONE pre-commit job: the drift statistic and the touched-partition
    // set ride the same aggregate (an append is latency-sensitive — a
    // separate action per statistic hands the win to the rebuild on pure
    // job-submission overhead, which the ann14_append_scale gate measures)
    val pre = assigned.agg(avg(col("d2")).as("mean"),
      collect_set(store.partitionId).as("touched")).collect()(0)
    require(!pre.isNullAt(0), "append batch is empty")
    val mean = pre.getDouble(0)
    val touched = pre.getSeq[Int](1).sorted
    val ratio = IvfCommon.driftRatio(mean, baseline, maxDriftRatio,
      remediation = "RotatingIvfIndex.rebuild")
    // replay guard, bounded to the touched partitions (where a same-vector
    // duplicate MUST land — same vector → same cell → same partition) and
    // FUSED into the commit's own write job
    val guarded = IvfCommon
      .guardReplays(assigned, store.readPartitions(touched), idCol)
      .select(col(idCol), col(vecCol), col(cellCol), col("d2"))
    store.append(touched, guarded)
    ratio
  }

  /** Delete vectors from the maintained index — the GDPR/right-to-erasure
    * op a persisted embedding store must support. `victims` carries the
    * SAME columns as an append batch (id + vector): the vector is what
    * localizes the delete — it re-derives the victim's cell under the
    * frozen quantizer (same argmin ⇒ same cell ⇒ same partition as when
    * it was indexed), so only the touched partitions are read,
    * anti-joined, and rewritten (a refresh commit — deletes are rewrites
    * here exactly as in every lakehouse). An id with no stored vector is
    * a loud error by default (`requirePresent`): a curation pipeline
    * deleting a doc that was never indexed usually indicates an id-space
    * bug, and silently "deleting" nothing would mask it. Returns the
    * count of rows actually removed. */
  def remove(victims: DataFrame, centroids: DataFrame,
      requirePresent: Boolean = true): Long =
    IvfCommon.removeFrom(store,
      Ann.assignCellsWithDist(victims, centroids,
        idCol, vecCol, centId, centVec, cellCol),
      idCol, Seq(col(idCol), col(vecCol), col(cellCol), col("d2")),
      requirePresent)

  /** Compact every partition whose dir list grew past `maxDirs` appends:
    * one refresh (full-content rewrite of exactly those partitions)
    * collapses each list back to a single dir. This is the lever that
    * bounds append-path read amplification — run it on whatever cadence
    * the append:serve ratio justifies (the Delta OPTIMIZE shape). Returns
    * the compacted partition ids (empty = nothing fragmented, no commit,
    * no version bump). */
  def compact(maxDirs: Int = 1): Seq[Int] =
    IvfCommon.compactStore(store, maxDirs)

  /** Partition-pruned serving over the maintained index — ONE probe
    * derivation feeds both the store-level directory prune (which
    * manifest partitions to read at all) and the candidate cell join, so
    * they can never fork. `nprobe = |cells|` probes everything (provably
    * exact, the oracle config); bounded nprobe reads ~nprobe/C of the
    * index. */
  def serve(queries: DataFrame, centroids: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    require(k >= 1 && nprobe >= 1, s"k/nprobe must be >= 1: $k/$nprobe")
    // bounded-heap rank (Ann.rankTopK): candidates never cross a shuffle
    Ann.rankTopK(scoredCandidates(queries, centroids, nprobe), k)
  }

  /** Threshold (radius) neighbor join against the maintained index — the
    * SEMANTIC-DEDUP serving shape (dd8/dd17's question asked of a
    * persisted index instead of a one-shot corpus self-join): every stored
    * vector within cosine >= `minSim` of a batch vector, as
    * `(corpus_id, new_id, sim)`. Same probe machinery as [[serve]] — ONE
    * probe derivation feeds both the store-level directory prune and the
    * candidate cell join — but the cut is a similarity threshold, not a
    * rank: `nprobe = |cells|` examines every (batch, stored) pair through
    * the cell join (provably exact, the oracle config); bounded nprobe
    * reads ~nprobe/C of the index (the scale path; a true neighbor hiding
    * in an unprobed cell is the documented IVF recall trade, spec-pinned).
    * Identity pairs (same id) are excluded so the streaming
    * append-then-query service doesn't report each row as its own
    * duplicate. */
  def neighborsWithin(batch: DataFrame, centroids: DataFrame,
      minSim: Double, nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    scoredCandidates(batch, centroids, nprobe)
      .filter(col("sim") >= minSim && col("c_id") =!= col("q_id"))
      .select(col("c_id").as("corpus_id"), col("q_id").as("new_id"),
        col("sim"))
  }

  /** Probe + prune + score, shared by [[serve]] and [[neighborsWithin]]:
    * derive each query's `nprobe` nearest cells ONCE, route them through
    * the store's own partitioning expression to a directory-level prune,
    * and exact-cosine the pruned candidates — `(q_id, c_id, sim)`. */
  private def scoredCandidates(queries: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val (probeRows, probeSchema) = Ann.collectProbes(
      queries, centroids, nprobe, idCol, vecCol, centId, centVec)
    // cell type from the PINNED schema (two small files), never from a
    // read() plan — building a file index over every data dir of a large
    // appended store per serve would be O(store) driver metadata I/O
    val cellType = store.schema(cellCol).dataType
    val cells = Ann.probeCells(probeRows, cellType)
    // route the probed cells through the store's OWN partitioning
    // expression (touchedBy) — the cell column must carry the stored
    // type exactly, or xxhash64 would route to different partitions.
    // An EMPTY query batch (an idle streaming micro-batch) probes no
    // cells: read one partition anyway so the empty result keeps the
    // full output schema instead of readPartitions failing loudly
    import org.apache.spark.sql.types.{StructField, StructType}
    val cellRows = cells.map(c => org.apache.spark.sql.Row(c))
    val cellsDf = spark.createDataFrame(
      java.util.Arrays.asList(cellRows: _*),
      StructType(Seq(StructField(cellCol, cellType, nullable = false))))
    val ids = if (cells.isEmpty) Seq(0) else store.touchedBy(cellsDf)
    val pruned = store.readPartitions(ids).drop("d2")
    Ann.scoreOverProbes(pruned, probeRows, probeSchema, cellCol,
      idCol, vecCol)
  }
}
