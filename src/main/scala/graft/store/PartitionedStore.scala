package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-committed, hash-partitioned keyed state — the partitioned-
  * rewrite upgrade path SCALE.md §5 names for maintained aggregates/views
  * whose key space outgrows copy-on-write whole-table refresh
  * ([[BucketStore.rewrite]] is O(all keys) WRITE I/O per refresh; this is
  * O(touched partitions)).
  *
  * Layout: `root/manifest` is one small text file mapping partition id →
  * its physical data dirs (`<id> <dir>[;<dir>…]` per line, plus a header
  * row naming the partition count). Data dirs are NEVER renamed or mutated
  * while addressable — a refresh writes NEW dirs for the touched
  * partitions only (replacing their lists), an [[append]] ADDS one dir per
  * touched partition (O(delta) write I/O; the next refresh compacts), and
  * either replaces the manifest in ONE atomic rename. That single
  * rename is the all-partitions-at-once visibility switch: a concurrent
  * reader resolves either the old manifest (all old dirs) or the new one
  * (old untouched dirs + new touched dirs) — never a mix of view
  * versions, never a missing path. The same discipline holds on an object
  * store (big dir renames are O(files) copies, one small manifest object
  * CAN be swapped atomically) — this is exactly [[BucketStore]]'s pointer
  * indirection generalized from one pointer to a partition map, the
  * "manifest-file indirection — one more small pointer level, same
  * discipline" SCALE.md sketches. One caveat: the cross-process commit
  * arbiter below is a hard link (local/NFS/HDFS-style filesystems); an
  * object-store port would express the same exactly-one-creates semantics
  * as a conditional PUT (If-None-Match / precondition-failed — the Delta
  * on S3 commit shape). A filesystem with NEITHER primitive cannot host
  * multi-process writers safely; there the link fails loudly rather than
  * silently degrading to last-write-wins.
  *
  * Partitioning: `pmod(xxhash64(key columns), nPartitions)` — computable
  * as a Catalyst expression on both the state and the delta, so the
  * refresh derives its touched-partition set from the delta WITHOUT
  * scanning state, and each refresh job shuffles only delta + touched
  * partitions' rows.
  *
  * Failure: a refresh that throws before commit deletes its partial new
  * dirs and leaves the manifest byte-identical — readers never see a
  * half-refresh (PartitionedRollupSpec poisons a refresh to pin this).
  *
  * Time travel (AS OF): every commit also writes an IMMUTABLE
  * `manifest.v<N>` copy before swapping the current pointer, so
  * [[readAsOf]] resolves any retained version's exact partition map — the
  * lakehouse feature that makes a snapshot diff consumable without keeping
  * both tables around (diff(asOf n, asOf n+1) IS the committed changeset;
  * the spec pins that against the cdc-style anti-join). `retainVersions`
  * bounds the lineage: data dirs referenced by any retained manifest are
  * never reclaimed; older manifests and their unshared dirs are deleted at
  * the next commit (retainVersions = 1 reproduces the old eager-reclaim
  * behavior exactly). Reading a vacuumed version fails loudly.
  *
  * Schema evolution ([[evolve]]): additive only — new columns append
  * NULLABLE, committed like a refresh; untouched partitions' parquet is
  * never rewritten (the explicit read schema fills missing columns with
  * NULL), and per-evolution `schema.v<n>.json` files keep every retained
  * version decodable with the schema in force at its commit.
  *
  * Writer guard: commits carry a version CAS — each commit records the
  * manifest version it read, and re-checks it under a per-root JVM lock
  * immediately before the atomic swap. Two racing commits therefore
  * resolve exactly-one-wins: the loser throws
  * `ConcurrentModificationException` naming both versions, its partial
  * dirs are torn down, and the store stays readable at the winner's
  * version (the loser must re-derive its delta against the new version
  * and retry — optimistic concurrency, the Delta/Iceberg commit shape).
  * Writers in DIFFERENT processes are outside the lock's reach; for them
  * the CREATION of `manifest.v<N>` is the arbiter (an atomic hard-link —
  * exactly one writer of a given version can create it, the other fails
  * with the same ConcurrentModificationException before its pointer
  * swap), so cross-process racers also resolve exactly-one-wins. The
  * arbiter alone only holds while the contested version's file is still
  * on disk: a writer stalled for >= retainVersions commits could re-link
  * an ALREADY-SWEPT `manifest.v<N>` and then last-write-win the pointer
  * BACKWARDS over reclaimed dirs — so every commit re-reads the pointer
  * version again AFTER its link (once the link holds the name, no other
  * process can advance past it, making that re-read race-free) and
  * aborts if the store moved, closing the stale-writer window for any
  * retention setting. The recommended deployment remains one writer
  * process (a cross-process loser cannot distinguish a concurrent winner
  * from a crashed writer's orphan — the error message explains both)
  * plus unlimited readers.
  */
final class PartitionedStore(val spark: SparkSession, val root: String,
    val keyCols: Seq[String], val nPartitions: Int,
    val retainVersions: Int = 2) {
  require(nPartitions > 0, "nPartitions must be positive")
  require(keyCols.nonEmpty, "at least one key column")
  require(retainVersions >= 1, "retainVersions must be >= 1")

  /** Reserved partition-id column used inside refresh jobs. */
  val PartCol = "__kp"

  /** Test-only fault-injection seam: invoked after each ordered step of a
    * commit (`dataWritten`, `casChecked`, `linkedManifest`, `schemaStep`,
    * `pointerSwapped`) so FaultInjectionSpec can snapshot the exact
    * on-disk state a crash at that point would leave — or throw, to
    * exercise the graceful-teardown path at that step. No-op in
    * production. */
  private[graft] var onStep: String => Unit = _ => ()

  private def rootPath: Path = Paths.get(root)
  private def manifestPath: Path = rootPath.resolve("manifest")
  private def schemaPath: Path = rootPath.resolve("schema.json")

  private def readSchemaFile(p: Path): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType
      .fromJson(new String(Files.readAllBytes(p), "UTF-8"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  /** Small-file write with the same atomicity discipline as the manifest:
    * tmp + ATOMIC_MOVE, so a racing reader sees the old bytes or the new
    * bytes, never a truncated file. */
  private def writeFileAtomic(p: Path, body: Array[Byte]): Unit = {
    val tmp = rootPath.resolve(s".tmp${System.nanoTime()}")
    Files.write(tmp, body)
    Files.move(tmp, p,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** State schema as persisted at init. Every read supplies it explicitly:
    * whether Spark emits a schema-bearing parquet file for an EMPTY write
    * varies with the plan shape (an empty LocalRelation writes one, an
    * empty aggregate may write none), so schema inference over a fresh or
    * sparsely-populated store would be flaky — and a pinned schema also
    * freezes the contract against inference drift across refreshes.
    *
    * Once a manifest exists, the AUTHORITATIVE source is the newest
    * `schema.v<m>.json` with m ≤ the committed version, NOT the
    * `schema.json` pointer: [[evolve]] writes the versioned schema BEFORE
    * its manifest swap and the pointer after, so a crash in that window
    * must not leave a committed evolution invisible to read()/refresh()
    * while readAsOf(version()) already resolves it. `schema.json` remains
    * the bootstrap/compat source for a store with no versioned files. */
  private def storedSchema: org.apache.spark.sql.types.StructType = {
    require(Files.exists(schemaPath), s"store at $root not initialized")
    if (Files.exists(manifestPath)) schemaAsOf(parseManifest(manifestPath)._1)
    else readSchemaFile(schemaPath)
  }

  /** The partition id of a row, as a Catalyst column — same expression for
    * state and delta, so both sides agree on routing by construction. */
  def partitionId: org.apache.spark.sql.Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(nPartitions.toLong)).cast("int")

  // ---- manifest ---------------------------------------------------------

  private def versionedManifestPath(n: Int): Path =
    rootPath.resolve(s"manifest.v$n")

  private def versionedSchemaPath(n: Int): Path =
    rootPath.resolve(s"schema.v$n.json")

  /** Root entries whose name matches `pattern` — the ONE listing loop
    * behind the versioned-manifest, versioned-schema and stamp-dir scans
    * (stream closed either way; missing root = empty). */
  private def listRoot(pattern: String, dirsOnly: Boolean = false): Seq[Path] = {
    if (!Files.exists(rootPath)) return Nil
    val s = Files.list(rootPath)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p =>
        p.getFileName.toString.matches(pattern) &&
          (!dirsOnly || Files.isDirectory(p))).toSeq
    } finally s.close()
  }

  private def listVersionedSchemas(): Seq[Path] =
    listRoot("schema\\.v\\d+\\.json")

  /** The schema in force at `version`: the newest `schema.v<m>.json` with
    * m ≤ version ([[evolve]] writes one per evolution; [[refresh]] writes
    * none, so versions between evolutions resolve to the last one).
    * Schema files are a few hundred bytes × evolution count — never
    * data-sized — so they are retained for the store's whole lifetime
    * and every retained manifest version stays decodable. */
  private def schemaAsOf(version: Int): org.apache.spark.sql.types.StructType = {
    val m = listVersionedSchemas()
      .map(_.getFileName.toString.stripPrefix("schema.v").stripSuffix(".json").toInt)
      .filter(_ <= version)
    if (m.isEmpty) readSchemaFile(schemaPath) // pre-versioning store
    else readSchemaFile(versionedSchemaPath(m.max))
  }

  private def manifestBody(entries: Map[Int, String], version: Int): String =
    (Seq(s"nPartitions $nPartitions", s"version $version") ++
      entries.toSeq.sortBy(_._1).map { case (i, d) => s"$i $d" })
      .mkString("", "\n", "\n")

  /** Create the IMMUTABLE `manifest.v<N>` copy — and with it, ARBITRATE
    * the commit across processes: the tmp file is hard-linked into place
    * (link(2) fails atomically with EEXIST if the name is taken; a
    * rename-based move cannot arbitrate — POSIX rename silently replaces
    * even under ATOMIC_MOVE), so of two writer PROCESSES racing the same
    * version, exactly one creates `manifest.v<N>` and the other fails
    * HERE, loudly, before it can touch the version's schema file or
    * last-write-win the pointer swap. A crash between this link and the
    * pointer swap leaves an orphan `manifest.v<N>` that version() (read
    * from the pointer) never acknowledges and that BLOCKS the next commit
    * at this version with the same loud error (its message names the
    * remediation: delete the unacknowledged orphan). */
  private def linkVersionedManifest(body: String, version: Int): Unit = {
    val tmpV = rootPath.resolve(s"manifest.vtmp${System.nanoTime()}")
    Files.write(tmpV, body.getBytes("UTF-8"))
    try Files.createLink(versionedManifestPath(version), tmpV)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"commit arbiter: manifest.v$version already exists at $root — " +
            "either a writer in another process committed this version " +
            "concurrently (this commit loses; re-derive the delta against " +
            "the current version and retry), or an earlier writer crashed " +
            "between its versioned-manifest write and its pointer swap " +
            "(version() does not acknowledge the file; delete it to recover)")
    } finally Files.deleteIfExists(tmpV)
  }

  /** Swap the current-manifest pointer — the one atomic visibility switch
    * every reader resolves. */
  private def swapPointer(body: String): Unit = {
    val tmp = rootPath.resolve(s"manifest.tmp${System.nanoTime()}")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, manifestPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeManifest(entries: Map[Int, String], version: Int): Unit = {
    Files.createDirectories(rootPath)
    val body = manifestBody(entries, version)
    linkVersionedManifest(body, version)
    swapPointer(body)
  }

  /** A manifest entry is a ';'-joined list of data dirs — one for a
    * partition last written by init/refresh (which REPLACE content), one
    * per append since ([[append]] ADDS a dir, O(delta) write I/O; the next
    * refresh of the partition compacts the list back to one). */
  private def entryDirs(entry: String): Seq[String] =
    entry.split(";").toSeq

  private def parseManifest(p: Path): (Int, Map[Int, String]) = {
    val lines = new String(Files.readAllBytes(p), "UTF-8")
      .split("\n").filter(_.nonEmpty)
    require(lines.head == s"nPartitions $nPartitions",
      s"manifest header '${lines.head}' does not match nPartitions=$nPartitions " +
        "— the store was initialized with a different partition count")
    val (verLines, entryLines) = lines.tail.partition(_.startsWith("version "))
    val ver = verLines.headOption.map(_.substring("version ".length).toInt)
      .getOrElse(0)
    (ver, entryLines.map { l =>
      val sp = l.indexOf(' ')
      l.substring(0, sp).toInt -> l.substring(sp + 1)
    }.toMap)
  }

  /** Current partition → data-dir map (empty before [[init]]). */
  def manifest(): Map[Int, String] =
    if (!Files.exists(manifestPath)) Map.empty
    else parseManifest(manifestPath)._2

  /** Per-partition data-dir count — the fragmentation metric an [[append]]
    * grows and a [[refresh]] collapses back to 1. Exposed so compaction
    * policy (e.g. [[graft.similarity.IvfIndex.compact]]) never re-parses
    * the manifest's private entry encoding: a change to the ';'-joined
    * dir-list format stays inside this class. */
  def dirCounts(): Map[Int, Int] =
    manifest().map { case (i, e) => i -> entryDirs(e).size }

  /** The current committed version — 1 after [[init]], +1 per [[refresh]]. */
  def version(): Int = {
    require(Files.exists(manifestPath), s"store at $root not initialized")
    parseManifest(manifestPath)._1
  }

  /** The pinned schema currently in force — the cheap metadata accessor
    * (two small files) for callers that need column types WITHOUT
    * planning a read over every data dir ([[graft.similarity.IvfIndex]]
    * resolves its cell type per serve through this). */
  def schema: org.apache.spark.sql.types.StructType = storedSchema

  private def dirFor(entry: String): String =
    rootPath.resolve(entry).toString

  // ---- read -------------------------------------------------------------

  /** The whole maintained state (union of every partition's dir).
    * Distinct dirs only: empty partitions SHARE one schema-carrying empty
    * dir, and listing a shared dir once per partition would duplicate any
    * rows it held. */
  def read(): DataFrame = {
    val m = manifest()
    require(m.nonEmpty, s"store at $root not initialized")
    spark.read.schema(storedSchema)
      .parquet(m.values.toSeq.flatMap(entryDirs)
        .distinct.sorted.map(dirFor): _*)
  }

  /** Time-travel read: the store EXACTLY as committed at `version` — the
    * immutable `manifest.v<n>` resolves that commit's partition map, whose
    * data dirs the retention policy guarantees still exist for the last
    * `retainVersions` versions. A version outside the retention window (or
    * never committed) fails loudly; so does an orphaned versioned file
    * from a crash between the two manifest writes (it is newer than the
    * current pointer acknowledges). */
  def readAsOf(version: Int): DataFrame = {
    val p = versionedManifestPath(version)
    require(Files.exists(p),
      s"version $version of the store at $root is not readable — never " +
        s"committed, or reclaimed by the retainVersions=$retainVersions policy")
    require(version <= this.version(),
      s"version $version was never committed (current: ${this.version()})")
    val (_, m) = parseManifest(p)
    spark.read.schema(schemaAsOf(version))
      .parquet(m.values.toSeq.flatMap(entryDirs)
        .distinct.sorted.map(dirFor): _*)
  }

  /** The requested partitions' rows (refresh-side helper; empty
    * partitions read as empty frames via the shared schema-carrying empty
    * dir written by init). */
  def readPartitions(ids: Seq[Int]): DataFrame = {
    val m = manifest()
    require(ids.forall(m.contains), s"unknown partition ids: ${ids.filterNot(m.contains)}")
    require(ids.nonEmpty, "no partitions requested")
    spark.read.schema(storedSchema)
      .parquet(ids.flatMap(i => entryDirs(m(i)))
        .distinct.sorted.map(dirFor): _*)
  }

  // ---- write ------------------------------------------------------------

  /** Initialize: route every row to its partition, one data dir per
    * partition id (all ids present, so later refreshes can address any
    * partition). Overwrites any existing state. */
  def init(df: DataFrame): Unit = {
    require(keyCols.forall(df.columns.contains),
      s"state must carry the key columns $keyCols")
    require(!df.columns.contains(PartCol), s"$PartCol is reserved")
    val stamp = s"init${System.nanoTime()}"
    Files.createDirectories(rootPath)
    writeFileAtomic(schemaPath, df.schema.json.getBytes("UTF-8"))
    val routed = df.withColumn(PartCol, partitionId)
    // one job: repartition BY the id so each partition value lands
    // co-located and emits its own file set under <stamp>/__kp=<i>
    routed.repartition(math.min(nPartitions, 200), col(PartCol))
      .write.mode("overwrite").partitionBy(PartCol)
      .parquet(rootPath.resolve(stamp).toString)
    // partitions with no rows get no subdir from Spark; point them at a
    // shared empty dir carrying the schema so readPartitions stays total
    val emptyDir = s"$stamp/__empty"
    df.limit(0).write.mode("overwrite").parquet(dirFor(emptyDir))
    val written = (0 until nPartitions).map { i =>
      val sub = s"$stamp/$PartCol=$i"
      i -> (if (Files.exists(rootPath.resolve(sub))) sub else emptyDir)
    }.toMap
    // overwrite semantics: a re-init starts the lineage over at v1, so any
    // versioned manifests/schemas from a previous life must not resolve
    listVersionedManifests().foreach(Files.deleteIfExists)
    listVersionedSchemas().foreach(Files.deleteIfExists)
    writeFileAtomic(versionedSchemaPath(1), df.schema.json.getBytes("UTF-8"))
    writeManifest(written, version = 1)
  }

  private def listVersionedManifests(): Seq[Path] =
    listRoot("manifest\\.v\\d+")

  /** Partitioned refresh: `newState` carries the FULL new content of the
    * `touched` partitions (and only those — rows are re-routed and checked
    * against the declared set); untouched partitions keep their existing
    * data dirs, untouched bytes. Commit = one atomic manifest rename.
    *
    * I/O: write O(|touched partitions' rows|); nothing else moves. */
  def refresh(touched: Seq[Int], newState: DataFrame): Unit = {
    // schema drift check BEFORE any write: a refresh whose frame decayed
    // (e.g. a lost DECIMAL cast → DOUBLE) would otherwise COMMIT parquet
    // the pinned-schema read path can never decode again — persistent
    // corruption behind an "atomic" switch
    require(newState.schema.map(f => (f.name, f.dataType)) ==
      storedSchema.map(f => (f.name, f.dataType)),
      s"refresh schema ${newState.schema.simpleString} does not match the " +
        s"store's pinned schema ${storedSchema.simpleString} " +
        "(adding columns is evolve()'s job)")
    commitTouched(touched, newState, evolvedTo = None, appendMode = false)
  }

  /** APPEND commit: `delta` carries ONLY NEW rows for the `touched`
    * partitions — each touched partition's manifest entry gains one more
    * data dir (the Delta-style "add file" commit), existing dirs untouched,
    * so write I/O is O(|delta|) regardless of how large the touched
    * partitions already are. That is the maintenance primitive for
    * append-mostly state ([[graft.similarity.IvfIndex]]'s daily embedding
    * batches): a batch spread uniformly over every partition appends in
    * O(batch), where [[refresh]] — whose contract is FULL new content —
    * would rewrite the whole store. The next [[refresh]]/[[evolve]] of a
    * partition compacts its dir list back to one. Key semantics are the
    * caller's (append does not dedup against existing rows); same atomic
    * manifest swap, version CAS, retention and crash behavior as refresh. */
  def append(touched: Seq[Int], delta: DataFrame): Unit = {
    require(delta.schema.map(f => (f.name, f.dataType)) ==
      storedSchema.map(f => (f.name, f.dataType)),
      s"append schema ${delta.schema.simpleString} does not match the " +
        s"store's pinned schema ${storedSchema.simpleString}")
    commitTouched(touched, delta, evolvedTo = None, appendMode = true)
  }

  /** ADDITIVE schema evolution: commit the `touched` partitions (full new
    * content, [[refresh]] semantics) under a WIDENED schema — every
    * existing column kept at its exact type, new columns appended
    * NULLABLE. Untouched partitions' parquet is not rewritten: the read
    * path supplies the evolved schema explicitly, and the parquet reader
    * fills columns missing from a file with NULL — so old data dirs decode
    * as "new column = NULL" at zero write cost, the lakehouse additive-
    * evolution contract. [[readAsOf]] earlier versions keeps decoding with
    * the schema in force AT that commit (`schema.v<n>.json`, written per
    * evolution), so time travel never shows a column before it existed.
    *
    * Commit order: the immutable versioned schema lands BEFORE the
    * manifest swap (a reader that sees the new manifest can always
    * resolve its schema); the current-schema pointer updates after. The
    * only transient a racing reader can observe is the OLD schema over
    * the new manifest — old columns of new dirs, a column-pruned view,
    * never a decode error. */
  def evolve(touched: Seq[Int], newState: DataFrame): Unit = {
    val old = storedSchema
    val byName = newState.schema.map(f => f.name -> f).toMap
    old.foreach { f =>
      val nf = byName.getOrElse(f.name, throw new IllegalArgumentException(
        s"evolve drops column '${f.name}' — evolution is additive only"))
      require(nf.dataType == f.dataType,
        s"evolve changes column '${f.name}': ${f.dataType.sql} -> ${nf.dataType.sql}")
    }
    val added = newState.schema.filterNot(f => old.fieldNames.contains(f.name))
    require(added.nonEmpty, "evolve with no added columns — use refresh()")
    added.foreach(f => require(f.nullable,
      s"added column '${f.name}' must be nullable — rows committed before " +
        "the evolution read it as NULL"))
    commitTouched(touched, newState, evolvedTo = Some(newState.schema),
      appendMode = false)
  }

  private def commitTouched(touched: Seq[Int], newState: DataFrame,
      evolvedTo: Option[org.apache.spark.sql.types.StructType],
      appendMode: Boolean): Unit = {
    require(touched.nonEmpty, "refresh with no touched partitions")
    require(touched.distinct == touched, "duplicate touched ids")
    require(Files.exists(manifestPath), s"store at $root not initialized")
    val (oldVersion, old) = parseManifest(manifestPath)
    require(old.nonEmpty, s"store at $root not initialized")
    require(touched.forall(old.contains), "touched ids outside the store")
    val stamp = s"refresh${System.nanoTime()}"
    var schemaWrittenAt: Option[Int] = None
    var linkedVersion: Option[Int] = None
    // register the stamp as in-flight BEFORE any data lands: a concurrent
    // winner's retention sweep must not reclaim this commit's
    // written-but-not-yet-committed dirs as "unreferenced garbage"
    PartitionedStore.inFlightStamps.add(stampKey(stamp))
    try {
      val routed = newState.withColumn(PartCol, partitionId)
      val touchedSet = touched.toSet
      // loud misroute check INSIDE the job: a new-state row hashing to an
      // undeclared partition would silently vanish from the view otherwise
      val guarded = routed.withColumn(PartCol,
        when(col(PartCol).isInCollection(touchedSet),
          col(PartCol))
          .otherwise(raise_error(concat(
            lit("refresh row routed to undeclared partition "),
            col(PartCol).cast("string")))))
      guarded.repartition(math.min(touched.size, 200), col(PartCol))
        .write.mode("overwrite").partitionBy(PartCol)
        .parquet(rootPath.resolve(stamp).toString)
      val emptyDir = s"$stamp/__empty"
      if (!appendMode)
        newState.limit(0).write.mode("overwrite").parquet(dirFor(emptyDir))
      onStep("dataWritten")
      val entries = old ++ touched.flatMap { i =>
        val sub = s"$stamp/$PartCol=$i"
        val wrote = Files.exists(rootPath.resolve(sub))
        if (!appendMode) Some(i -> (if (wrote) sub else emptyDir))
        else if (!wrote) None // empty delta slice: partition unchanged
        else {
          // ADD the new dir to the partition's list; a schema-carrying
          // shared empty placeholder is superseded by real data
          val prev = entryDirs(old(i)).filterNot(_.endsWith("/__empty"))
          Some(i -> (prev :+ sub).mkString(";"))
        }
      }.toMap
      // writer guard (version CAS): serialize the visibility switch per
      // store root within this JVM, and re-read the manifest version
      // UNDER the lock — a concurrent commit that landed since this one
      // read `oldVersion` fails HERE, loudly, before it can last-write-win
      // the manifest (and before the sweep below could reclaim the
      // winner's dirs). In-process racers are therefore strictly
      // exactly-one-wins; a cross-process racer that slips past the
      // re-read is caught by writeManifest's hard-link arbiter (exactly
      // one process can CREATE manifest.v<N+1>), closing the
      // check-to-rename window the re-read alone would leave. The schema
      // step sits
      // INSIDE the lock, after the check: a CAS loser must never
      // overwrite (evolve) or orphan-clear (refresh) the winner's
      // just-committed schema.v<N+1>.json.
      PartitionedStore.commitLock(rootPath).synchronized {
        val nowVersion = parseManifest(manifestPath)._1
        if (nowVersion != oldVersion)
          throw new java.util.ConcurrentModificationException(
            s"concurrent commit detected on store at $root: read version " +
              s"$oldVersion but the manifest is now at $nowVersion — this " +
              "refresh loses; re-derive the delta against the current " +
              "version and retry")
        onStep("casChecked")
        // the versioned-manifest link is BOTH the immutable copy and the
        // cross-process arbiter — it lands BEFORE the schema step so a
        // cross-process racer that slipped past the re-read dies before it
        // can overwrite (evolve) or orphan-clear (refresh) the winner's
        // just-committed schema.v<N+1>.json. The link is reader-invisible
        // until the pointer swap (readAsOf refuses versions beyond the
        // pointer), so the swap below stays the one visibility switch.
        val body = manifestBody(entries, oldVersion + 1)
        linkVersionedManifest(body, oldVersion + 1)
        linkedVersion = Some(oldVersion + 1)
        // stale-writer guard (cross-process): the arbiter only arbitrates
        // names still ON DISK — a writer in another process stalled since
        // its CAS re-read for >= retainVersions commits can re-link an
        // already-swept manifest.v<N+1> and would then swap the pointer
        // BACKWARDS over reclaimed dirs. Re-read the pointer AFTER the
        // link: once this commit holds the v<N+1> name no other process
        // can commit any further version (each must link its own next
        // version, whose number passes THROUGH N+1), so this re-read is
        // race-free — a moved pointer proves this writer stalled past the
        // retention window and must abort (teardown removes only its own
        // re-created link, which the sweep had already reclaimed).
        val postLink = parseManifest(manifestPath)._1
        if (postLink != oldVersion)
          throw new java.util.ConcurrentModificationException(
            s"stale writer on store at $root: read version $oldVersion " +
              s"but the manifest advanced to $postLink before this " +
              "commit's versioned-manifest link — the arbiter file for " +
              s"version ${oldVersion + 1} was already swept (retention), " +
              "so this commit would have rolled the pointer backwards; " +
              "it loses — re-derive the delta against the current " +
              "version and retry")
        onStep("linkedManifest")
        // an evolution's versioned schema is resolvable BEFORE any reader
        // can see the manifest that needs it; a non-evolve commit clears
        // any orphan at its version (a crash between an evolution's schema
        // write and its manifest swap leaves one, which would otherwise
        // mis-type this commit's time-travel reads)
        evolvedTo match {
          case Some(sc) =>
            // a store initialized by pre-versioning code has no
            // schema.v1.json; snapshot the current pointer as v1 BEFORE
            // the first evolution's versioned schema lands, or readAsOf
            // of pre-evolution versions would fall through schemaAsOf's
            // pointer fallback and resolve the EVOLVED schema — showing
            // the added column (as NULL) before it existed
            if (listVersionedSchemas().isEmpty)
              writeFileAtomic(versionedSchemaPath(1),
                Files.readAllBytes(schemaPath))
            schemaWrittenAt = Some(oldVersion + 1)
            writeFileAtomic(
              versionedSchemaPath(oldVersion + 1), sc.json.getBytes("UTF-8"))
          case None =>
            Files.deleteIfExists(versionedSchemaPath(oldVersion + 1)); ()
        }
        onStep("schemaStep")
        swapPointer(body) // the single atomic visibility switch
      }
    } catch {
      case e: Throwable =>
        // commit never became visible (the pointer swap is the try's last
        // act): tear the partial refresh dirs down, plus the versioned
        // manifest and schema IF THIS COMMIT created them — the link
        // arbiter guarantees they are ours, and a CAS/arbiter loser that
        // never linked must not delete a winner's files. Manifest pointer
        // (and so every reader) stays on the old view.
        deleteDirQuiet(rootPath.resolve(stamp))
        linkedVersion.foreach(v =>
          Files.deleteIfExists(versionedManifestPath(v)))
        schemaWrittenAt.foreach(v =>
          Files.deleteIfExists(versionedSchemaPath(v)))
        PartitionedStore.inFlightStamps.remove(stampKey(stamp))
        throw e
    }
    // POST-commit maintenance. The commit stands from here on — nothing
    // below may surface as a commit failure to the caller (a thrown sweep
    // after the swap would report a SUCCESSFUL refresh as failed, and a
    // caller's retry of an append would double-apply its delta), so the
    // whole block is best-effort: errors are logged and left for the next
    // commit's sweep to retry. It ALSO re-takes the commit lock: two
    // successful back-to-back commits from different threads would
    // otherwise race their sweeps (one deleting a manifest.v file between
    // the other's list and parse).
    try PartitionedStore.commitLock(rootPath).synchronized {
      // seam sits in the BEST-EFFORT block, not the commit try: the commit
      // is already visible, so even a throwing hook must never trigger the
      // teardown above (which would delete a committed version's files)
      onStep("pointerSwapped")
      // current-schema pointer: once the manifest swapped, the evolution
      // is committed and must never be rolled back by the catch above. A
      // reader between the two swaps sees the old schema over the new
      // manifest — pruned columns, never a decode error.
      evolvedTo.foreach(sc =>
        writeFileAtomic(schemaPath, sc.json.getBytes("UTF-8")))
      // retention sweep (same bounded race with in-flight readers as
      // BucketStore.bufferAndPromote): versions older than the last
      // `retainVersions` lose their manifest.v file, then any stamp dir
      // referenced by NO retained manifest is reclaimed — so readAsOf
      // stays total over exactly the retained window. retainVersions = 1
      // keeps only the new commit: the old behavior, eager reclaim.
      val newVersion = oldVersion + 1
      val keepFrom = math.max(1, newVersion - retainVersions + 1)
      listVersionedManifests().foreach { p =>
        val v = p.getFileName.toString.stripPrefix("manifest.v").toInt
        if (v < keepFrom) Files.deleteIfExists(p)
      }
      val keep = listVersionedManifests()
        .flatMap(p => parseManifest(p)._2.values)
        .flatMap(entryDirs).map(e => e.split("/")(0)).toSet
      // reclaim candidates = EVERY stamp dir on disk, not just the
      // previous manifest's (whose dirs are still retained at
      // retainVersions >= 2 — sweeping only from `old` left the dirs of
      // the version FALLING OUT of the window unreclaimed forever, a
      // per-refresh disk leak) — EXCEPT stamps a concurrent commit
      // registered as in-flight: its data may be written while its
      // manifest is not yet swapped, and reclaiming it here would hand
      // the racer a committed manifest over deleted dirs. A stamp left
      // in-flight by a crashed PROCESS dies with that process's registry,
      // so the next process's sweep still reclaims it (no leak
      // regression); within the supported one-writer-process contract the
      // registry is authoritative.
      listStampDirs().filterNot(d => keep.contains(d.getFileName.toString))
        .filterNot(d => PartitionedStore.inFlightStamps
          .contains(stampKey(d.getFileName.toString)))
        .foreach(deleteDirQuiet)
    } catch {
      case e: Exception => System.err.println(
        s"[PartitionedStore] post-commit maintenance at $root failed " +
          s"(commit v${oldVersion + 1} stands; next commit retries the " +
          s"sweep): $e")
    } finally
      // deregister LAST: once committed the stamp is manifest-referenced
      // (the keep set protects it), so even a swallowed sweep failure
      // leaves no reclaim hazard — only garbage the next sweep collects
      PartitionedStore.inFlightStamps.remove(stampKey(stamp))
  }

  /** Root-qualified stamp identity for the JVM-wide in-flight registry —
    * two stores over different roots never mask each other's sweeps. */
  private def stampKey(stamp: String): String =
    rootPath.toAbsolutePath.normalize.toString + "/" + stamp

  private def listStampDirs(): Seq[Path] =
    listRoot("(init|refresh)\\d+", dirsOnly = true)

  /** Touched-partition ids of a delta, derived WITHOUT touching state —
    * bounded by nPartitions, so the driver-side collect is a few ints. */
  def touchedBy(delta: DataFrame): Seq[Int] = {
    require(keyCols.forall(delta.columns.contains),
      s"delta must carry the key columns $keyCols")
    delta.select(partitionId.as(PartCol)).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
  }

  // the shared walk-and-delete (fd-safe, IOException-swallowing — a
  // teardown's cleanup failure must never mask the commit error it is
  // cleaning up after)
  private def deleteDirQuiet(p: Path): Unit =
    graft.util.Scratch.deleteRecursive(p)
}

object PartitionedStore {
  // one commit monitor per normalized store root, JVM-wide: two
  // PartitionedStore instances over the same directory (the realistic
  // in-process race — e.g. two scheduled refreshes of one maintained view)
  // serialize their visibility switches on the SAME object, making the
  // version CAS in commitTouched exactly-one-wins rather than
  // best-effort. Entries are a Path + Object per distinct store root —
  // bounded by the number of stores the driver ever opens, never reclaimed
  // (reclaiming would reintroduce the race it exists to close).
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[Path, Object]()
  private[store] def commitLock(root: Path): Object =
    commitLocks.computeIfAbsent(root.toAbsolutePath.normalize, _ => new Object)

  // root-qualified stamp names of commits between first-data-write and
  // end-of-sweep: the retention sweep skips these, so a winner can never
  // reclaim a concurrent racer's not-yet-committed dirs (see commitTouched)
  private[store] val inFlightStamps: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
