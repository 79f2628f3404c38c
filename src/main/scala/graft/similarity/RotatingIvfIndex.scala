package graft.similarity

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Drift-triggered ONLINE rebuild for the maintained IVF index — serving
  * continuity across a retrain. [[IvfIndex]]'s drift guard says "re-train
  * and rebuild", but a rebuild IN PLACE would black out serving for the
  * whole build; this wraps the index in one more level of pointer
  * indirection (the [[graft.store.BucketStore]] secondary-buffer promote
  * generalized to a whole index): each build lands in a fresh GENERATION
  * directory — its frozen centroids persisted beside it, so a generation
  * is self-consistent by construction — and a small `current` pointer file
  * swaps atomically to the new generation once it is fully built. Serves
  * resolve the pointer PER CALL: a serve that started before the swap
  * reads the old generation end to end, one after reads the new — never a
  * mix of quantizer and data (RotatingIvfSpec races a serve loop against
  * a live rebuild to pin exactly that). The reference analog is the
  * secondary-buffer primary swap
  * (`aleph2_search_index_service_elasticsearch/.../utils/
  * ElasticsearchIndexUtils.java:68-87` and the alias rollover in
  * `.../services/ElasticsearchIndexService.java:335-391`).
  *
  * Retention: the PREVIOUS generation outlives the swap (an in-flight
  * serve may still be reading it — the same bounded reader-grace contract
  * as BucketStore.bufferAndPromote); older generations and crash-orphaned
  * never-promoted builds are reclaimed at the next rebuild.
  *
  * Centroids ownership: callers hand centroids to [[build]]/[[rebuild]]
  * ONCE; [[append]]/[[remove]]/[[serve]] read the live generation's
  * persisted copy, so a caller can never pair gen-N queries with gen-M
  * data — the failure mode a bare IvfIndex + external centroid frame
  * leaves open across a retrain.
  */
final class RotatingIvfIndex(val spark: SparkSession, val root: String,
    val nPartitions: Int, val idCol: String = "vec_id",
    val vecCol: String = "embedding", val centId: String = "cent_id",
    val centVec: String = "cent_vec") {

  private def rootPath: Path = Paths.get(root)
  private def pointerPath: Path = rootPath.resolve("current")

  /** The live generation's directory name (pointer read — two small
    * files' worth of metadata, resolved fresh on every operation). */
  def currentGen(): String = {
    require(Files.exists(pointerPath), s"rotating index at $root not built")
    new String(Files.readAllBytes(pointerPath), "UTF-8").trim
  }

  private def genDir(gen: String): Path = rootPath.resolve(gen)

  private def genIndex(gen: String): IvfIndex = new IvfIndex(spark,
    genDir(gen).toString, nPartitions, idCol, vecCol, "cell", centId, centVec)

  private def genCentroids(gen: String): DataFrame =
    spark.read.parquet(genDir(gen).resolve("centroids.parquet").toString)

  /** The live generation as an [[IvfIndex]] plus its frozen centroids —
    * resolved together, so every composed operation is self-consistent. */
  def current(): (IvfIndex, DataFrame) = {
    val g = currentGen()
    (genIndex(g), genCentroids(g))
  }

  /** First build — same mechanics as [[rebuild]] (a rebuild with nothing
    * to retain). */
  def build(corpus: DataFrame, centroids: DataFrame): Unit =
    rebuild(corpus, centroids)

  /** Retrain-and-swap: build the new quantizer's index into a FRESH
    * generation directory while the live one keeps serving, then promote
    * it with one atomic pointer rename. The previous generation is
    * retained for in-flight serves; everything older (including crash
    * orphans of never-promoted builds) is reclaimed. */
  def rebuild(corpus: DataFrame, centroids: DataFrame): Unit = {
    Files.createDirectories(rootPath)
    val prev = if (Files.exists(pointerPath)) Some(currentGen()) else None
    val gen = s"gen${System.nanoTime()}"
    centroids.write.mode("overwrite")
      .parquet(genDir(gen).resolve("centroids.parquet").toString)
    // build against the JUST-PERSISTED copy, not the caller's frame: a
    // lazy centroids plan would otherwise re-execute here, and a plan
    // that isn't replay-stable would persist quantizer X while assigning
    // the data under quantizer Y — self-consistency must be structural,
    // not an assumption about the caller's lineage
    genIndex(gen).build(corpus, genCentroids(gen))
    // the promote: readers resolve old-or-new, never a mix
    val tmp = rootPath.resolve(s".ptr${System.nanoTime()}")
    Files.write(tmp, gen.getBytes("UTF-8"))
    Files.move(tmp, pointerPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // reclaim all generations except the new one and its predecessor,
    // plus any crash-orphaned pointer tmp files
    val keep = Set(gen) ++ prev
    import scala.jdk.CollectionConverters._
    val s = Files.list(rootPath)
    val stale = try s.iterator().asScala.filter { p =>
      val name = p.getFileName.toString
      (Files.isDirectory(p) && name.startsWith("gen") &&
        !keep.contains(name)) || name.startsWith(".ptr")
    }.toSeq finally s.close()
    stale.foreach(graft.util.Scratch.deleteRecursive)
  }

  /** O(batch) append into the LIVE generation under its frozen quantizer;
    * past `maxDriftRatio` this fails loudly — and [[rebuild]] is the
    * remediation the message names. */
  def append(batch: DataFrame, maxDriftRatio: Double = Double.MaxValue): Double = {
    val (idx, cents) = current()
    idx.append(batch, cents, maxDriftRatio)
  }

  /** Erasure against the live generation ([[IvfIndex.remove]]). NOTE: a
    * retained PREVIOUS generation still holds the victims until the next
    * rebuild or its reclaim — right-to-erasure pipelines should follow a
    * remove with a [[rebuild]] (or delete the previous generation) once
    * in-flight serves drain. */
  def remove(victims: DataFrame, requirePresent: Boolean = true): Long = {
    val (idx, cents) = current()
    idx.remove(victims, cents, requirePresent)
  }

  /** Compaction lever on the live generation ([[IvfIndex.compact]]). */
  def compact(maxDirs: Int = 1): Seq[Int] = {
    val (idx, _) = current()
    idx.compact(maxDirs)
  }

  /** Partition-pruned serve over the live generation — pointer, index and
    * centroids resolved together per call. */
  def serve(queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val (idx, cents) = current()
    idx.serve(queries, cents, k, nprobe)
  }
}
