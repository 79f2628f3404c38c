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

  private def metaPath = Paths.get(root, "ivf_meta.json")

  /** Train-time mean squared assignment distance (the drift baseline). */
  def trainMeanD2: Double = {
    require(Files.exists(metaPath), s"IVF index at $root not built")
    val body = new String(Files.readAllBytes(metaPath), "UTF-8")
    val m = """"train_mean_d2"\s*:\s*([-0-9.eE]+)""".r
      .findFirstMatchIn(body)
      .getOrElse(throw new IllegalStateException(
        s"malformed ivf_meta.json at $root: $body"))
    m.group(1).toDouble
  }

  /** Build the index: assign every corpus vector to its nearest (frozen)
    * centroid, persist per-cell via the store's init, and record the
    * train-time mean d2 as the drift baseline. The baseline read-back
    * scans ONLY the d2 column of the just-written parquet (column-pruned),
    * not the vectors. Overwrites any existing index. */
  def build(corpus: DataFrame, centroids: DataFrame): Unit = {
    val assigned = Ann.assignCellsWithDist(corpus, centroids,
      idCol, vecCol, centId, centVec, cellCol)
    // invalidate the PREVIOUS build's drift baseline BEFORE the new corpus
    // commits: a crash between store.init and the new meta swap must leave
    // "index not built" (trainMeanD2 fails loudly), never a fresh index
    // silently drift-checking appends against a stale baseline
    Files.deleteIfExists(metaPath)
    store.init(assigned)
    val meanRow = store.read().agg(avg(col("d2"))).collect()(0)
    require(!meanRow.isNullAt(0),
      s"IVF build corpus is empty — an index at $root needs at least one vector")
    val mean = meanRow.getDouble(0)
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
    // a zero baseline (every training vector ON its centroid) with a
    // zero-distance batch is NO drift, not infinite drift — only a
    // positive batch mean over a zero baseline is genuinely unbounded
    val ratio =
      if (baseline > 0) mean / baseline
      else if (mean == 0) 1.0
      else Double.PositiveInfinity
    if (ratio > maxDriftRatio)
      throw new IllegalStateException(
        f"quantizer drift: batch mean d2 $mean%.6f is $ratio%.2fx the " +
          f"train-time mean $baseline%.6f (max $maxDriftRatio%.2f) — " +
          "re-train the centroids and rebuild the index " +
          "(RotatingIvfIndex.rebuild swaps a fresh build in without a " +
          "serving blackout)")
    // replay guard, bounded to the touched partitions (where a same-vector
    // duplicate MUST land — same vector → same cell → same partition) and
    // FUSED into the commit's own write job: the existing-id column scan
    // left-joins onto the batch inside the append lineage, so a replayed
    // id fails the write loudly (store tears the partial down) without a
    // separate pre-pass over the index
    val existing = store.readPartitions(touched)
      .select(col(idCol), lit(1).as("__dup"))
    val guarded = assigned.join(existing, Seq(idCol), "left")
      .withColumn(idCol,
        when(col("__dup").isNull, col(idCol))
          .otherwise(raise_error(concat(
            lit("append batch replays an id already in the index: "),
            col(idCol).cast("string")))))
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
      requirePresent: Boolean = true): Long = {
    val assigned = Ann.assignCellsWithDist(victims, centroids,
      idCol, vecCol, centId, centVec, cellCol)
    val touched = store.touchedBy(assigned)
    // an empty erasure batch is a normal no-op (a curation day with no
    // deletions), not a misleading "no partitions requested" failure
    if (touched.isEmpty) return 0L
    val current = store.readPartitions(touched)
    val victimIds = assigned.select(col(idCol))
    // ONE id-column-pruned pass computes BOTH pre-commit statistics — the
    // removed count (matched store rows) and the missing-victim count —
    // via a full-outer id join; the only full read of the touched
    // partitions is then the refresh write itself (previously: a full
    // count, a full anti-join count, AND the refresh — 3 full passes)
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
      // error path only: re-derive a small sample of the absent ids so the
      // failure names them (the happy path never runs this job)
      val sample = victimIds
        .join(current.select(col(idCol)), Seq(idCol), "left_anti")
        .limit(5).collect().map(_.get(0))
      throw new IllegalArgumentException(
        s"remove batch names $missing ids not in the index: " +
          sample.mkString(", "))
    }
    val kept = current.join(victimIds, Seq(idCol), "left_anti")
      .select(col(idCol), col(vecCol), col(cellCol), col("d2"))
    store.refresh(touched, kept)
    removed
  }

  /** Compact every partition whose dir list grew past `maxDirs` appends:
    * one refresh (full-content rewrite of exactly those partitions)
    * collapses each list back to a single dir. This is the lever that
    * bounds append-path read amplification — run it on whatever cadence
    * the append:serve ratio justifies (the Delta OPTIMIZE shape). Returns
    * the compacted partition ids (empty = nothing fragmented, no commit,
    * no version bump). */
  def compact(maxDirs: Int = 1): Seq[Int] = {
    require(maxDirs >= 1, s"maxDirs must be >= 1: $maxDirs")
    // fragmentation via the store's OWN accessor — the manifest entry
    // encoding stays private to PartitionedStore
    val frag = store.dirCounts().collect {
      case (i, n) if n > maxDirs => i
    }.toSeq.sorted
    if (frag.nonEmpty) store.refresh(frag, store.readPartitions(frag))
    frag
  }

  /** Partition-pruned serving over the maintained index — ONE probe
    * derivation feeds both the store-level directory prune (which
    * manifest partitions to read at all) and the candidate cell join, so
    * they can never fork. `nprobe = |cells|` probes everything (provably
    * exact, the oracle config); bounded nprobe reads ~nprobe/C of the
    * index. */
  def serve(queries: DataFrame, centroids: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    require(k >= 1 && nprobe >= 1, s"k/nprobe must be >= 1: $k/$nprobe")
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
    Ann.rankOverProbes(pruned, probeRows, probeSchema, k, cellCol,
      idCol, vecCol)
  }
}
