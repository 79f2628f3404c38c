package graft.similarity

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The generation/pointer machinery behind online index rebuilds — ONE
  * definition shared by [[RotatingIvfIndex]] (raw vectors) and
  * [[RotatingIvfPqIndex]] (PQ codes): each build lands in a fresh
  * generation directory with its frozen centroids persisted beside it (a
  * generation is self-consistent by construction), a small `current`
  * pointer file promotes it in one atomic rename, readers resolve the
  * pointer per call, the predecessor generation outlives the swap for
  * in-flight readers, and older/orphaned generations (plus crashed
  * writers' pointer tmp files) are reclaimed at the next promote. */
private[similarity] final class GenRotator(val spark: SparkSession,
    val root: String) {

  private def rootPath: Path = Paths.get(root)
  private def pointerPath: Path = rootPath.resolve("current")

  /** The live generation's directory name (one small file read). */
  def currentGen(): String = {
    require(Files.exists(pointerPath), s"rotating index at $root not built")
    new String(Files.readAllBytes(pointerPath), "UTF-8").trim
  }

  def genDir(gen: String): Path = rootPath.resolve(gen)

  /** The generation's FROZEN centroids — always read from the persisted
    * copy, never a caller-held frame, so quantizer and data can't fork. */
  def genCentroids(gen: String): DataFrame =
    spark.read.parquet(genDir(gen).resolve("centroids.parquet").toString)

  /** Run one rebuild: persist the centroids into a fresh generation dir,
    * let `build` construct the index there AGAINST THE PERSISTED COPY,
    * promote with one atomic pointer rename, then reclaim everything but
    * the new generation and its predecessor. */
  def rotate(centroids: DataFrame)(build: (String, DataFrame) => Unit): Unit = {
    Files.createDirectories(rootPath)
    val prev = if (Files.exists(pointerPath)) Some(currentGen()) else None
    val gen = s"gen${System.nanoTime()}"
    centroids.write.mode("overwrite")
      .parquet(genDir(gen).resolve("centroids.parquet").toString)
    // build against the JUST-PERSISTED copy, not the caller's frame: a
    // lazy centroids plan would otherwise re-execute here, and a plan
    // that isn't replay-stable would persist quantizer X while assigning
    // the data under quantizer Y — self-consistency must be structural
    build(genDir(gen).toString, genCentroids(gen))
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
}
