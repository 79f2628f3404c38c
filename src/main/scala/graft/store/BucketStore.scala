package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** Bucket storage service: partitioned-Parquet layout per bucket with the
  * reference's storage semantics re-expressed Spark-first —
  *
  *  - three stages `raw/ json/ processed/` per bucket
  *    (`HfdsDataWriteService.java:688-710` STORED_DATA_SUFFIX_*),
  *  - time-partitioned writes: the temporal schema's time field is extracted
  *    per record at write time into a partition column `p_time`
  *    (`HfdsDataWriteService.java:509-525` dir routing), giving Catalyst
  *    partition pruning on time predicates — the Spark-native replacement
  *    for time-sliced index enumeration
  *    (`ElasticsearchContextUtils.java:50-132`),
  *  - secondary "ping-pong" buffers with atomic promote-to-primary
  *    (`ElasticsearchIndexService.java:335-391`; HDFS analog
  *    `HdfsStorageService.java:458-542`),
  *  - retention/age-out by partition (`HdfsStorageService.java:593-601`).
  *
  * At cluster scale the layout is a plain object-store prefix per bucket;
  * nothing here is driver-local except directory renames (metadata ops).
  */
final class BucketStore(spark: SparkSession, rootDir: String) {
  import BucketStore._

  /** Test-only fault-injection seam: invoked after each ordered step of a
    * buffer/promote commit (`bufferWritten`, `bufMoved`,
    * `currentSwitched`, `bufferRepointed`) so FaultInjectionSpec can
    * snapshot the exact state a crash at that point would leave. No-op in
    * production. */
  private[graft] var onStep: String => Unit = _ => ()

  private def bucketRoot(b: Bucket): Path = Paths.get(rootDir, b.signature)
  private def stageRoot(b: Bucket, stage: String): Path =
    bucketRoot(b).resolve(stage)

  // ---- pointer-file indirection -----------------------------------------
  // A stage's primary ("current") and each named buffer resolve through a
  // small `_PTR_<role>` file naming the physical data dir. Data dirs are
  // NEVER renamed while addressable — promote swaps the two pointer files,
  // each replaced by an atomic rename, so a concurrent reader resolves
  // either the old dir or the new dir, never a half-swapped state and never
  // a missing path (the old two-directory-rename swap had a window with no
  // `current` at all). The same discipline is what holds on an object
  // store, where directory renames are O(files) copies and not atomic, but
  // a single small pointer object CAN be replaced atomically.
  // Legacy layout (no pointer file) falls back to the literal dir name.

  private def roleName(buffer: Option[String]): String =
    buffer.map("buffer_" + _).getOrElse("current")

  private def readPointer(root: Path, role: String): Option[String] = {
    val p = root.resolve("_PTR_" + role)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  private def writePointer(root: Path, role: String, target: String): Unit = {
    Files.createDirectories(root)
    val tmp = root.resolve("_PTR_" + role + ".tmp" + System.nanoTime())
    Files.write(tmp, target.getBytes("UTF-8"))
    Files.move(tmp, root.resolve("_PTR_" + role),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def stageDir(b: Bucket, stage: String, buffer: Option[String]): Path = {
    val root = stageRoot(b, stage)
    val role = roleName(buffer)
    root.resolve(readPointer(root, role).getOrElse(role))
  }

  /** Derive the partition column from the temporal schema. Lexicographic
    * partition values == chronological order, so time-range predicates prune.
    * Records with a null/missing time land in partition value
    * `__unknown__` (the reference shunts these to an "unknown" dir). */
  private[graft] def withTimePartition(b: Bucket, df: DataFrame): DataFrame =
    b.dataSchema.temporal match {
      case Some(TemporalSchema(tf, period)) if df.columns.contains(tf) =>
        df.withColumn(PartitionCol,
          coalesce(period.partitionValue(col(tf)), lit("__unknown__")))
      case _ => df
    }

  /** Write a batch into a bucket stage. Partitioned by derived time column
    * when a temporal schema is declared; codec from the storage schema. */
  def write(b: Bucket, df: DataFrame, stage: String = "processed",
      buffer: Option[String] = None, mode: SaveMode = SaveMode.Append,
      extraOptions: Map[String, String] = Map.empty): Unit = {
    val out = withTimePartition(b, df)
    val codec = b.dataSchema.storage.flatMap(_.codec).getOrElse("snappy")
    var w = out.write.mode(mode).option("compression", normalizeCodec(codec))
      .options(extraOptions)
    if (out.columns.contains(PartitionCol)) w = w.partitionBy(PartitionCol)
    w.parquet(stageDir(b, stage, buffer).toString)
  }

  /** Hash-bucketed write registered in the session catalog — the co-located
    * join layout: two tables bucketed on the same key with the same bucket
    * count join with NO shuffle exchange (each bucket pair meets on one
    * task), and `sortBy` pre-sorts within buckets so sort-merge join skips
    * its sort too. This is the storage-level answer to the repeated
    * merge-by-key jobs (J1/J3/U9): pay the partitioning once at write time,
    * reuse it every join.
    *
    * Lands in a dedicated `bucketed` dir, NOT the stage's `current`:
    * `rewrite`/`promote` manage `current` with plain parquet files, and a
    * CRUD rewrite must not silently invalidate a catalog table that still
    * declares a bucket spec. Honors the declared codec and keeps the
    * time-partition column. Returns the catalog table name. */
  def writeBucketed(b: Bucket, df: DataFrame, bucketCols: Seq[String],
      numBuckets: Int, stage: String = "processed"): String = {
    val table = s"${b.signature}_${stage}_bucketed"
    val out = withTimePartition(b, df)
    val codec = b.dataSchema.storage.flatMap(_.codec).getOrElse("snappy")
    var w = out.write.mode(SaveMode.Overwrite).format("parquet")
      .option("compression", normalizeCodec(codec))
      .option("path", bucketRoot(b).resolve(stage).resolve("bucketed").toString)
    if (out.columns.contains(PartitionCol)) w = w.partitionBy(PartitionCol)
    w.bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
    table
  }

  /** Z-order clustered write: re-layout the stage on a Morton curve over
    * N columns ([[ZOrder.clustered]]) so every parquet file carries a
    * tight min/max bounding box on ALL of them — file/row-group stats then
    * prune scans filtered on any subset. One file per z-range; the
    * multi-column sibling of [[writeBucketed]]'s single-key co-location.
    *
    * Writes to a fresh buffer and promotes (same commit discipline as
    * [[rewrite]]/[[compact]]): `df` may therefore originate from the target
    * stage itself (re-layout in place), and concurrent readers see the old
    * snapshot until the atomic promote. */
  def writeZOrdered(b: Bucket, df: DataFrame, cols: Seq[String],
      numFiles: Int, stage: String): Unit =
    bufferAndPromote(b, stage, "zorder_")(
      write(b, ZOrder.clustered(df, cols, numFiles), stage, _,
        SaveMode.Overwrite))

  /** Two-column [[writeZOrdered]] (compat signature). */
  def writeZOrdered(b: Bucket, df: DataFrame, colA: String, colB: String,
      numFiles: Int = 32, stage: String = "processed"): Unit =
    writeZOrdered(b, df, Seq(colA, colB), numFiles, stage)

  /** Read a stage; the partition column stays available for explicit
    * time-slice predicates (partition pruning shows in the scan). */
  def read(b: Bucket, stage: String = "processed",
      buffer: Option[String] = None): DataFrame =
    spark.read.parquet(stageDir(b, stage, buffer).toString)

  /** Storage path of a stage's current dir — the cross-process handle the
    * python bridge manifests by signature (X5,
    * [[graft.sql.SqlSurface.writePythonManifest]]): a separate PySpark
    * process can't see this session's temp views, but it can read the
    * bucket's parquet directly. */
  def stagePath(b: Bucket, stage: String = "processed"): String =
    stageDir(b, stage, None).toAbsolutePath.toString

  /** F12 read path: apply a DSL query to a stage with the query's implied
    * date range turned into a PARTITION predicate first. [[graft.dsl.TimeSlice]]
    * extracts a sound time interval from the query tree; truncating its ends
    * with the bucket's grouping period gives partition-value bounds
    * (lexicographic order == chronological for every period format), so
    * Catalyst prunes whole partition directories before the row predicate
    * runs — the Spark-native form of the reference's query-driven index
    * enumeration (`ElasticsearchContext.java:199-236`). Records with a null
    * time (the `__unknown__` partition) can never satisfy a time-bounded
    * query, so pruning them when a hi bound exists is sound; with only a lo
    * bound the string compare keeps `__unknown__` and the row filter drops
    * its rows. */
  def readForQuery(b: Bucket, q: graft.dsl.QueryComponent,
      stage: String = "processed", buffer: Option[String] = None): DataFrame = {
    val base = read(b, stage, buffer)
    val sliced = b.dataSchema.temporal match {
      case Some(TemporalSchema(tf, period)) if base.columns.contains(PartitionCol) =>
        graft.dsl.TimeSlice.bounds(q, tf) match {
          case (None, None) => base
          case (lo, hi) =>
            val preds = lo.map(i => col(PartitionCol) >= lit(period.truncate(i))) ++
              hi.map(i => col(PartitionCol) <= lit(period.truncate(i)))
            base.filter(preds.reduce(_ && _))
        }
      case _ => base
    }
    graft.dsl.QueryCompiler.run(sliced, q)
  }

  def exists(b: Bucket, stage: String = "processed",
      buffer: Option[String] = None): Boolean =
    Files.exists(stageDir(b, stage, buffer))

  /** Columnar view of a stage: the bucket's declared include/exclude policy
    * resolved against the stored schema as a projection. The reference's
    * columnar schema chose which fields get doc_values
    * (`ElasticsearchIndexUtils.java:416-437`); over Parquet every stored
    * column is already columnar, so the policy's runtime meaning is "which
    * column chunks a columnar consumer reads" — this projection prunes the
    * scan's ReadSchema to exactly that set. */
  def readColumnar(b: Bucket, stage: String = "processed"): DataFrame = {
    val df = read(b, stage)
    b.dataSchema.columnar match {
      case Some(cs) =>
        val keep = cs.resolve(df.columns.toSeq)
        df.select(keep.map(org.apache.spark.sql.functions.col): _*)
      case None => df
    }
  }

  /** Atomic promote of a secondary buffer to primary — the ping-pong swap
    * (`ElasticsearchIndexService.java:495-520`): after it, `current`
    * resolves to the buffer's data and `buffer_<name>` to the old primary's.
    * Readers are never broken mid-swap: the buffer's physical dir first
    * gets a stable versioned name (legal — a buffer is a staging area, no
    * reader addresses it during its own promote), then the `current`
    * pointer is replaced in ONE atomic rename (the visibility switch), then
    * the buffer pointer is re-aimed at the demoted dir. A reader that
    * resolved `current` just before the switch keeps reading the old dir,
    * which nothing here renames or deletes — StoreCrudSpec's concurrent
    * promote test runs this race for real.
    *
    * In-process promotes of one stage serialize on a per-root JVM monitor
    * (the PartitionedStore doctrine; cross-process, one writer process is
    * the supported deployment), which makes the closing ORPHAN SWEEP safe:
    * a crash between the ordered steps strands a `v_*` dir no pointer
    * references (and possibly a `_PTR_*.tmp*` file) — unreachable, since
    * v_ dirs are only ever addressed through pointers — and the next
    * promote of the stage reclaims them, so crashes never leak data-sized
    * dirs (FaultInjectionSpec executes each window). */
  def promote(b: Bucket, stage: String, buffer: String): Unit = {
    val root = stageRoot(b, stage)
    BucketStore.promoteLock(root).synchronized {
      val curName = readPointer(root, "current").getOrElse("current")
      val bufRole = roleName(Some(buffer))
      val bufName = readPointer(root, bufRole).getOrElse(bufRole)
      val buf = root.resolve(bufName)
      require(Files.exists(buf), s"no such buffer: $buf")
      val newName =
        if (bufName.startsWith("v_")) bufName
        else {
          val v = "v_" + System.nanoTime()
          Files.move(buf, root.resolve(v), StandardCopyOption.ATOMIC_MOVE)
          v
        }
      onStep("bufMoved")
      writePointer(root, "current", newName) // the atomic visibility switch
      onStep("currentSwitched")
      writePointer(root, bufRole, curName)
      onStep("bufferRepointed")
      sweepOrphans(root)
    }
  }

  /** Reclaim crash debris under `root`: `v_*` dirs referenced by NO
    * pointer file (a crash between a promote's rename and its pointer
    * write strands exactly one), pointer tmp files (a crash inside
    * writePointer's two steps), and INTERNAL transient buffers — the
    * `buffer_rewrite_/zorder_/compact_` dirs and pointers bufferAndPromote
    * always deletes on completion, so any survivor not in the JVM-wide
    * in-flight registry is a crashed commit's leftovers (same
    * registry-vs-sweep shape as PartitionedStore's in-flight stamps; a
    * registry lost with a crashed PROCESS just defers the reclaim to the
    * next process's promote). Runs under the promote lock; never touches
    * literal-named dirs (legacy layout), USER-named buffers (ping-pong
    * parking is long-lived by design), or anything a live pointer
    * references. */
  private def sweepOrphans(root: Path): Unit = {
    if (!Files.exists(root)) return
    val entries = {
      val s = Files.list(root)
      try s.iterator().asScala.toList finally s.close()
    }
    def internal(n: String) = BucketStore.InternalBufferPrefixes.exists(n.startsWith)
    def inFlight(n: String) = BucketStore.inFlightBuffers
      .contains(root.toAbsolutePath.normalize.toString + "/" + n)
    // stale internal buffer pointers first: each names the demoted dir a
    // crashed bufferAndPromote would have deleted — drop the pointer so
    // the dir pass below sees that dir unreferenced
    val stalePtrs = entries.filter { p =>
      val n = p.getFileName.toString
      n.startsWith("_PTR_") && !n.contains(".tmp") &&
        internal(n.stripPrefix("_PTR_")) && !inFlight(n.stripPrefix("_PTR_"))
    }
    stalePtrs.foreach(Files.deleteIfExists(_))
    val referenced = entries
      .filter(_.getFileName.toString.startsWith("_PTR_"))
      .filterNot(_.getFileName.toString.contains(".tmp"))
      .diff(stalePtrs)
      .map(p => new String(Files.readAllBytes(p), "UTF-8").trim).toSet
    entries.foreach { p =>
      val name = p.getFileName.toString
      if (name.contains("_PTR_") && name.contains(".tmp"))
        Files.deleteIfExists(p)
      else if (Files.isDirectory(p) && !referenced.contains(name) &&
          (name.startsWith("v_") || (internal(name) && !inFlight(name))))
        deleteDir(p)
    }
  }

  /** Tear a buffer down: its resolved data dir AND its pointer (a dangling
    * pointer would make the next buffer write and read resolve to
    * different dirs). */
  private def deleteBuffer(b: Bucket, stage: String, buffer: String): Unit = {
    val root = stageRoot(b, stage)
    deleteDir(stageDir(b, stage, Some(buffer)))
    Files.deleteIfExists(root.resolve("_PTR_" + roleName(Some(buffer))))
  }

  /** Rewrite a stage in place with writer/reader atomicity: write the new
    * content to a fresh buffer, then promote. This is the engine's
    * update/delete commit path (SURVEY §7 hard-part 2). */
  def rewrite(b: Bucket, stage: String)(f: DataFrame => DataFrame): Unit =
    bufferAndPromote(b, stage, "rewrite_")(buf =>
      write(b, f(read(b, stage)), stage, buf, SaveMode.Overwrite))

  /** Commit discipline shared by [[rewrite]]/[[writeZOrdered]]/[[compact]]:
    * run the buffer write, promote only if it succeeded, and tear the
    * partial buffer down if it failed — a throwing write job (bad source
    * row, merge cardinality violation, executor loss) must leave the
    * current stage byte-identical AND not accumulate orphan buffer dirs. */
  private def bufferAndPromote(b: Bucket, stage: String, prefix: String)(
      writeBuf: Option[String] => Unit): Unit = {
    val buf = prefix + System.nanoTime()
    // register as in-flight BEFORE any data lands: a concurrent promote's
    // orphan sweep must not reclaim this commit's live buffer as crash
    // debris (the PartitionedStore in-flight-stamp shape)
    val key = stageRoot(b, stage).toAbsolutePath.normalize.toString +
      "/" + roleName(Some(buf))
    BucketStore.inFlightBuffers.add(key)
    try {
      try writeBuf(Some(buf))
      catch {
        case e: Throwable =>
          deleteBuffer(b, stage, buf) // promote never ran
          throw e
      }
      onStep("bufferWritten")
      promote(b, stage, buf)
      // reclaim the superseded primary immediately (post-promote, the buffer
      // role resolves to it). In-flight jobs that resolved the OLD current
      // before the switch race only with this deletion — the same window the
      // reference has between alias swap and old-index delete; a deployment
      // wanting zero-race long readers defers this to a retention sweep.
      deleteBuffer(b, stage, buf)
    } finally BucketStore.inFlightBuffers.remove(key)
  }

  /** Small-file compaction: rewrite a stage so each time partition lands in
    * as few files as its data needs. Micro-batch/streaming appends
    * accumulate thousands of tiny parquet files per partition, and at
    * 100 TB a scan over them is a metadata storm (one footer read + task
    * per file). The rewrite hashes rows to `shufflePartitions` tasks BY THE
    * TIME-PARTITION VALUE — so each partition value's rows co-locate and
    * emit one file (plain `repartition(n)` would do the opposite: every
    * task touches every partition value, multiplying files) — while
    * `maxRecordsPerFile` still splits oversized partitions. Buffer+promote
    * keeps concurrent readers atomic. Returns parquet files before/after.
    *
    * `preserveZOrder`: a plain compaction re-packs by partition value and
    * DESTROYS any z-clustered layout ([[writeZOrdered]]) — the repacked
    * files' bounding boxes go back to ~the full domain and skipping dies.
    * Passing the z-order columns re-clusters on the Morton curve inside the
    * same rewrite, so compaction and skipping compose. */
  def compact(b: Bucket, stage: String = "processed",
      shufflePartitions: Int = 32,
      maxRecordsPerFile: Long = 5000000L,
      preserveZOrder: Option[Seq[String]] = None): (Long, Long) = {
    val before = parquetFileCount(b, stage)
    val cur = read(b, stage)
    val packed = preserveZOrder match {
      case Some(zCols) => ZOrder.clustered(cur, zCols, shufflePartitions)
      case None if cur.columns.contains(PartitionCol) =>
        cur.repartition(shufflePartitions, col(PartitionCol))
      case None => cur.repartition(shufflePartitions)
    }
    bufferAndPromote(b, stage, "compact_")(
      write(b, packed, stage, _, SaveMode.Overwrite,
        Map("maxRecordsPerFile" -> maxRecordsPerFile.toString)))
    (before, parquetFileCount(b, stage))
  }

  /** Count of parquet data files in a stage (diagnostic for compaction). */
  def parquetFileCount(b: Bucket, stage: String): Long = {
    val dir = stageDir(b, stage, None)
    if (!Files.exists(dir)) 0L
    else {
      val s = Files.walk(dir)
      try s.iterator().asScala
        .count(p => p.getFileName.toString.endsWith(".parquet"))
      finally s.close() // Files.walk holds directory fds until closed
    }
  }

  /** Retention: drop whole time partitions older than `existAgeMax`
    * (partition-level delete — no data rewrite, like dir-level age-out). */
  def ageOut(b: Bucket, stage: String, now: java.time.Instant): Int = {
    (b.dataSchema.temporal, b.dataSchema.storage.flatMap(_.existAgeMax)) match {
      case (Some(TemporalSchema(_, period)), Some(maxAge)) =>
        val cutoff = period.truncate(now.minus(maxAge))
        val dir = stageDir(b, stage, None)
        if (!Files.exists(dir)) return 0
        val ls = Files.list(dir)
        val entries = try ls.iterator().asScala.toSeq finally ls.close()
        val doomed = entries.filter { p =>
          val n = p.getFileName.toString
          n.startsWith(PartitionCol + "=") &&
            n.stripPrefix(PartitionCol + "=") < cutoff
        }
        doomed.foreach(deleteDir)
        doomed.size
      case _ => 0
    }
  }

  /** U12 deleteDatastore — drop the whole bucket dir. */
  def deleteDatastore(b: Bucket): Unit = deleteDir(bucketRoot(b))

  private def deleteDir(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
      finally s.close()
    }

  private implicit class IterAsScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}

object BucketStore {
  /** Name of the derived time-partition column. */
  val PartitionCol = "p_time"

  // one promote monitor per normalized stage root, JVM-wide (the
  // PartitionedStore.commitLock shape): concurrent promotes of one stage
  // serialize, making the post-promote orphan sweep race-free in-process.
  // Bounded by the number of stage roots the driver opens; never reclaimed.
  private val promoteLocks =
    new java.util.concurrent.ConcurrentHashMap[Path, Object]()
  private[store] def promoteLock(root: Path): Object =
    promoteLocks.computeIfAbsent(root.toAbsolutePath.normalize, _ => new Object)

  /** The TRANSIENT buffer prefixes bufferAndPromote creates and always
    * deletes on completion — the only buffer names the orphan sweep may
    * reclaim. User-named buffers (ping-pong parking) are never touched. */
  private[store] val InternalBufferPrefixes =
    Seq("buffer_rewrite_", "buffer_zorder_", "buffer_compact_")

  // root-qualified role names of buffer commits between first write and
  // end-of-delete: the orphan sweep skips these (see bufferAndPromote)
  private[store] val inFlightBuffers: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Reference codecs gzip/snappy/framed-snappy
    * (`HfdsDataWriteService.java:642-660`) → parquet compression codecs. */
  def normalizeCodec(c: String): String = c.toLowerCase match {
    case "gz" | "gzip" => "gzip"
    case "sz" | "snappy" | "fr.sz" => "snappy"
    case "zstd" => "zstd"
    case other => other
  }
}
