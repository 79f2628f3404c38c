package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [[RotatingIvfIndex]]'s PQ-coded sibling — online rebuild with serving
  * continuity for [[IvfPqIndex]], completing the family matrix (static
  * ann11 / maintained ann16 / rotating ann18, mirroring ann13/ann14/ann17
  * for raw vectors): a retrain re-freezes BOTH the coarse quantizer and
  * the residual codebooks inside a fresh generation directory (its
  * centroids persisted beside it, its codebooks persisted by the build
  * itself), promoted by [[GenRotator]]'s atomic pointer rename. Serves
  * resolve the pointer per call, so a racing reader gets one generation's
  * centroids + codebooks + codes end to end — never PQ tables from one
  * quantizer over codes from another. This is the remediation
  * [[IvfPqIndex]]'s drift error names.
  *
  * Writer contract: identical to [[RotatingIvfIndex]]'s — mutations
  * serialize on the per-root monitor, one writer process is the supported
  * deployment, and a cross-process promote mid-write fails the write
  * loudly via [[GenRotator.guardedWrite]]'s pointer re-check instead of
  * silently stranding the batch. Serves never take the lock. */
final class RotatingIvfPqIndex(val spark: SparkSession, val root: String,
    val nPartitions: Int, val m: Int, val k: Int,
    val idCol: String = "vec_id", val vecCol: String = "embedding",
    val centId: String = "cent_id", val centVec: String = "cent_vec") {

  private[graft] val rotator = new GenRotator(spark, root)

  /** The live generation's directory name (pointer read). */
  def currentGen(): String = rotator.currentGen()

  private def genIndex(gen: String): IvfPqIndex = new IvfPqIndex(spark,
    rotator.genDir(gen).toString, nPartitions, m, k, idCol, vecCol,
    "cell", centId, centVec)

  /** The live generation as an [[IvfPqIndex]] plus its frozen centroids. */
  def current(): (IvfPqIndex, DataFrame) = {
    val g = currentGen()
    (genIndex(g), rotator.genCentroids(g))
  }

  /** First build — a rebuild with nothing to retain. */
  def build(corpus: DataFrame, centroids: DataFrame): Unit =
    rebuild(corpus, centroids)

  /** Retrain-and-swap: coarse quantizer AND residual codebooks re-freeze
    * in the fresh generation while the live one keeps serving. */
  def rebuild(corpus: DataFrame, centroids: DataFrame): Unit =
    rotator.rotate(centroids) { (dir, frozen) =>
      new IvfPqIndex(spark, dir, nPartitions, m, k, idCol, vecCol,
        "cell", centId, centVec).build(corpus, frozen)
    }

  /** O(batch) append into the live generation under its frozen quantizer
    * and codebooks (serialized against rebuilds — class writer contract);
    * drift past the ceiling names [[rebuild]]. */
  def append(batch: DataFrame, maxDriftRatio: Double = Double.MaxValue): Double =
    rotator.guardedWrite("append") { gen =>
      genIndex(gen).append(batch, rotator.genCentroids(gen), maxDriftRatio)
    }

  /** Erasure against the live generation ([[IvfPqIndex.remove]],
    * serialized against rebuilds); the retained predecessor holds the
    * victims until the next rebuild or its reclaim — same caveat as
    * [[RotatingIvfIndex.remove]]. */
  def remove(victims: DataFrame, requirePresent: Boolean = true): Long =
    rotator.guardedWrite("remove") { gen =>
      genIndex(gen).remove(victims, rotator.genCentroids(gen), requirePresent)
    }

  /** Compaction lever on the live generation (serialized against
    * rebuilds). */
  def compact(maxDirs: Int = 1): Seq[Int] =
    rotator.guardedWrite("compact") { gen => genIndex(gen).compact(maxDirs) }

  /** Partition-pruned ADC serve over the live generation — pointer,
    * centroids, codebooks and codes resolved together per call. */
  def serve(queries: DataFrame, kTop: Int, nprobe: Int,
      rerank: Int): DataFrame = {
    val (idx, cents) = current()
    idx.serve(queries, cents, kTop, nprobe, rerank)
  }

  /** Threshold (radius) serve through the live generation — resolves the
    * pointer per call exactly like [[serve]], no blackout, never a mixed
    * codebook/data read. Semantics are [[IvfPqIndex.neighborsWithin]]'s
    * (ADC cut + exact rerank verifying the threshold). */
  def neighborsWithin(batch: DataFrame, minSim: Double, nprobe: Int,
      rerank: Int): DataFrame = {
    val (idx, cents) = current()
    idx.neighborsWithin(batch, cents, minSim, nprobe, rerank)
  }
}
