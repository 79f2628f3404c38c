package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{Ann, IvfIndex, KMeans, RotatingIvfIndex}
import graft.store.PartitionedStore

/** Crash-point injection over the commit protocols: every documented
  * crash window in [[PartitionedStore]] commits (orphan `manifest.v<N>`,
  * link-before-schema ordering, sweep-after-visibility), [[IvfIndex]]
  * build (meta-invalidated-before-init) and
  * [[graft.similarity.GenRotator]] rotate (build-before-swap,
  * pointer-tmp, promote-before-reclaim) is EXECUTED, not just reasoned
  * about in comments. Mechanism: the production classes expose a no-op
  * `onStep` seam after each ordered commit step; the spec's hook copies
  * the store root at the target step — the copy IS the exact on-disk
  * state a `kill -9` at that point leaves (the commit then finishes
  * normally on the original root) — and a fresh instance is reopened
  * over the copy to assert: readers still resolve the old view, the
  * version pointer never acknowledges orphans, the documented remediation
  * unblocks the next commit, and recovery sweeps never reclaim the
  * survivor's files. Throwing hooks separately pin the GRACEFUL failure
  * path: teardown removes only the failing commit's own files and the
  * next commit needs no manual remediation. The reference analog is the
  * temp→final atomic-rename crash story in
  * `aleph2_analytic_services_hadoop/.../services/HfdsDataWriteService
  * .java:537-560`, which trusts the same
  * nothing-visible-until-the-last-rename discipline this spec executes
  * window by window. */
class FaultInjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import java.{util => ju}

  // ---- harness -----------------------------------------------------------

  /** Byte-copy `src` into a fresh temp dir — the simulated crash image. */
  private def crashImage(src: String, tag: String): Path = {
    val dst = Files.createTempDirectory(s"graft_crash_$tag")
    import scala.jdk.CollectionConverters._
    val srcP = Paths.get(src)
    val w = Files.walk(srcP)
    try w.iterator().asScala.foreach { p =>
      val t = dst.resolve(srcP.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    } finally w.close()
    dst
  }

  private def kv(n: Long, mul: Long) =
    spark.range(n).select(col("id").as("k"), (col("id") * mul).as("v"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def newStore(root: String, retain: Int = 2) =
    new PartitionedStore(spark, root, Seq("k"), 4, retainVersions = retain)

  private def listNames(root: String, prefix: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(root))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith(prefix)).toSet finally s.close()
  }

  // ---- PartitionedStore commit windows ------------------------------------

  test("store commit killed after EACH ordered step: old view resolves, " +
      "orphans are never acknowledged, the documented remediation unblocks, " +
      "recovery sweeps spare the survivor's files") {
    val root = Files.createTempDirectory("graft_fault_store").toString
    val store = newStore(root)
    store.init(kv(40, 1))               // v1
    store.refresh(0 until 4, kv(40, 2)) // v2
    store.refresh(0 until 4, kv(40, 3)) // v3  (v3's sweep reclaims manifest.v1)
    val c3 = rows(store.read())
    // one instrumented commit (→ v4), crash images at three ordered steps
    val snaps = scala.collection.mutable.Map[String, Path]()
    store.onStep = s =>
      if (Set("dataWritten", "linkedManifest", "pointerSwapped")(s))
        snaps.getOrElseUpdate(s, crashImage(root, s))
    store.refresh(0 until 4, kv(40, 4)) // v4 commits normally on the original
    store.onStep = _ => ()
    val c4 = rows(store.read())
    assert(snaps.keySet === Set("dataWritten", "linkedManifest", "pointerSwapped"))

    // -- killed after the data write, before the arbiter link --------------
    locally {
      val s = newStore(snaps("dataWritten").toString)
      assert(s.version() === 3, "uncommitted data must not advance the version")
      assert(rows(s.read()) === c3, "readers must resolve the old view")
      intercept[IllegalArgumentException] { s.readAsOf(4) } // never acknowledged
      val orphanStamps = listNames(s.root, "refresh")
      // recovery needs NO remediation: the next commit wins version 4 and
      // its sweep reclaims the crashed commit's unreferenced stamp dir
      s.refresh(0 until 4, kv(40, 9))
      assert(s.version() === 4 && rows(s.read()) === rows(kv(40, 9)))
      val survivors = listNames(s.root, "refresh")
      assert(orphanStamps.diff(survivors).nonEmpty,
        s"crashed stamp dirs were never swept: $survivors")
      assert(rows(s.readAsOf(3)) === c3, "sweep reclaimed the survivor's dirs")
    }

    // -- killed after the manifest.v4 hard link, before the pointer swap ---
    locally {
      val s = newStore(snaps("linkedManifest").toString)
      assert(s.version() === 3, "version() acknowledged an orphan manifest.v4")
      assert(rows(s.read()) === c3)
      // the orphan is on disk but time travel refuses it loudly
      assert(Files.exists(Paths.get(s.root, "manifest.v4")))
      val e0 = intercept[IllegalArgumentException] { s.readAsOf(4) }
      assert(e0.getMessage.contains("never committed"), e0.getMessage)
      // the next commit at version 4 is BLOCKED by the arbiter, loudly,
      // and the error names the remediation
      val e = intercept[ju.ConcurrentModificationException] {
        s.refresh(0 until 4, kv(40, 9))
      }
      assert(e.getMessage.contains("commit arbiter") &&
        e.getMessage.contains("delete it to recover"), e.getMessage)
      assert(s.version() === 3 && rows(s.read()) === c3,
        "blocked commit disturbed the store")
      // the documented remediation actually unblocks
      Files.delete(Paths.get(s.root, "manifest.v4"))
      s.refresh(0 until 4, kv(40, 9))
      assert(s.version() === 4 && rows(s.read()) === rows(kv(40, 9)))
      assert(rows(s.readAsOf(3)) === c3, "remediated commit lost the survivor")
    }

    // -- killed after the pointer swap, before the retention sweep ---------
    locally {
      val s = newStore(snaps("pointerSwapped").toString)
      // the commit IS visible — the swap is the one visibility switch
      assert(s.version() === 4)
      assert(rows(s.read()) === c4)
      assert(rows(s.readAsOf(3)) === c3)
      // the crash skipped the sweep: stale manifest.v2 lingers beyond the
      // retainVersions=2 window; the NEXT commit's sweep retries it
      assert(Files.exists(Paths.get(s.root, "manifest.v2")),
        "fixture: expected the stale manifest the crashed sweep left")
      s.refresh(0 until 4, kv(40, 9)) // v5
      assert(!Files.exists(Paths.get(s.root, "manifest.v2")) &&
        !Files.exists(Paths.get(s.root, "manifest.v3")),
        "recovery sweep did not reclaim beyond the retention window")
      assert(s.version() === 5 && rows(s.read()) === rows(kv(40, 9)))
      assert(rows(s.readAsOf(4)) === c4, "sweep reclaimed a RETAINED version")
      intercept[IllegalArgumentException] { s.readAsOf(3) } // now vacuumed
    }
  }

  test("evolve killed between its versioned-schema write and the pointer " +
      "swap: no phantom column, the orphan schema is cleared by recovery") {
    val root = Files.createTempDirectory("graft_fault_evolve").toString
    val store = newStore(root)
    store.init(kv(40, 1)) // v1
    val c1 = rows(store.read())
    var snap: Path = null
    store.onStep = s =>
      if (s == "schemaStep" && snap == null) snap = crashImage(root, "evolve")
    store.evolve(0 until 4,
      kv(40, 2).withColumn("extra", lit(null).cast("long"))) // v2 commits
    store.onStep = _ => ()
    assert(snap != null)

    val s = newStore(snap.toString)
    assert(s.version() === 1)
    // the schema in force is the PRE-evolution one — a reader must never
    // see the added column before the manifest that carries it
    assert(s.schema.fieldNames.toSeq === Seq("k", "v"),
      s"phantom column: ${s.schema.simpleString}")
    assert(rows(s.read()) === c1)
    assert(Files.exists(Paths.get(s.root, "schema.v2.json")) &&
      Files.exists(Paths.get(s.root, "manifest.v2")),
      "fixture: expected the crashed evolve's orphan pair")
    // remediation (delete the orphan manifest), then a PLAIN refresh at
    // version 2 must clear the crashed evolution's orphan schema — or
    // this commit's time-travel reads would be mis-typed
    Files.delete(Paths.get(s.root, "manifest.v2"))
    s.refresh(0 until 4, kv(40, 5))
    assert(s.version() === 2)
    assert(!Files.exists(Paths.get(s.root, "schema.v2.json")),
      "recovery left the crashed evolution's schema.v2 to mis-type readAsOf(2)")
    assert(s.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(s.readAsOf(2).schema.fieldNames.toSeq === Seq("k", "v"))
    assert(rows(s.readAsOf(2)) === rows(kv(40, 5)))
  }

  test("GRACEFUL failure at each step (hook throws): teardown removes only " +
      "the failing commit's own files and the next commit needs no manual " +
      "remediation — unlike a crash") {
    for (step <- Seq("dataWritten", "casChecked", "linkedManifest")) {
      val root = Files.createTempDirectory(s"graft_fault_grace").toString
      val store = newStore(root)
      store.init(kv(40, 1))
      val c1 = rows(store.read())
      store.onStep = s =>
        if (s == step) throw new RuntimeException(s"planted@$step")
      val e = intercept[RuntimeException] { store.refresh(0 until 4, kv(40, 2)) }
      assert(e.getMessage === s"planted@$step")
      store.onStep = _ => ()
      // teardown: the store is byte-identically at v1, the failing
      // commit's stamp dirs AND its arbiter link are gone
      assert(store.version() === 1 && rows(store.read()) === c1)
      assert(!Files.exists(Paths.get(root, "manifest.v2")),
        s"graceful failure at $step left an orphan arbiter link")
      assert(listNames(root, "refresh").isEmpty,
        s"graceful failure at $step left stamp dirs")
      // and — the contrast with the crash cases above — the retry commits
      // with no remediation at all
      store.refresh(0 until 4, kv(40, 3))
      assert(store.version() === 2 && rows(store.read()) === rows(kv(40, 3)))
    }
  }

  // ---- BucketStore buffer/promote windows ----------------------------------

  test("BucketStore rewrite killed after EACH ordered step: readers resolve " +
      "a whole generation (old until the pointer switch, new after), and the " +
      "next promote's orphan sweep reclaims every crash leftover") {
    import graft.model.Bucket
    import graft.store.BucketStore
    val rootDir = Files.createTempDirectory("graft_fault_bucket").toString
    val store = new BucketStore(spark, rootDir)
    val b = Bucket("/test/fault")
    def gen(tag: Int) =
      spark.range(100).select(lit(tag).as("g"), col("id"))
    def tagOf(s: BucketStore): (Int, Long) = {
      val rows = s.read(b).groupBy("g").count().collect()
      assert(rows.length === 1, s"mixed generations: ${rows.mkString(", ")}")
      (rows(0).getInt(0), rows(0).getLong(1))
    }
    def names(root: String, pred: String => Boolean): Set[String] = {
      val stage = Paths.get(root, b.signature, "processed")
      if (!Files.exists(stage)) return Set.empty
      import scala.jdk.CollectionConverters._
      val s = Files.list(stage)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(pred).toSet finally s.close()
    }
    store.write(b, gen(0))
    store.rewrite(b, "processed")(_ => gen(1)) // current now a v_* dir
    assert(tagOf(store) === ((1, 100L)))
    val snaps = scala.collection.mutable.Map[String, Path]()
    store.onStep = s =>
      if (Set("bufferWritten", "bufMoved", "currentSwitched",
          "bufferRepointed")(s))
        snaps.getOrElseUpdate(s, crashImage(rootDir, s))
    store.rewrite(b, "processed")(_ => gen(2)) // completes on the original
    store.onStep = _ => ()
    assert(snaps.keySet.size === 4)

    for ((step, snap) <- snaps) {
      val s = new BucketStore(spark, snap.toString)
      // visibility contract: the pointer switch is the ONE boundary
      val expectedTag =
        if (step == "bufferWritten" || step == "bufMoved") 1 else 2
      assert(tagOf(s) === ((expectedTag, 100L)),
        s"$step: reader did not resolve a whole generation")
      // the crash left exactly the debris the step implies
      if (step == "bufferWritten")
        assert(names(snap.toString, _.startsWith("buffer_rewrite_")).nonEmpty,
          s"$step fixture: expected the stranded buffer dir")
      if (step == "bufMoved")
        assert(names(snap.toString, _.startsWith("v_")).size === 2,
          s"$step fixture: expected the orphan moved buffer")
      if (step == "bufferRepointed")
        assert(names(snap.toString, _.startsWith("_PTR_buffer_rewrite_")).nonEmpty,
          s"$step fixture: expected the stale internal pointer")
      // recovery: one more rewrite both commits AND sweeps the debris
      s.rewrite(b, "processed")(_ => gen(9))
      assert(tagOf(s) === ((9, 100L)), s"$step: recovery rewrite wrong")
      assert(names(snap.toString, _.startsWith("v_")).size === 1,
        s"$step: crash debris v_ dirs survived the recovery sweep: " +
          names(snap.toString, _.startsWith("v_")))
      assert(names(snap.toString, n => n.startsWith("buffer_rewrite_") ||
          n.startsWith("_PTR_buffer_rewrite_")).isEmpty,
        s"$step: internal buffer debris survived the recovery sweep")
      assert(names(snap.toString, _.contains(".tmp")).isEmpty,
        s"$step: pointer tmp debris survived")
    }
    // the original (uncrashed) store ends clean too
    assert(tagOf(store) === ((2, 100L)))
    assert(names(rootDir, n => n.startsWith("buffer_rewrite_") ||
      n.startsWith("_PTR_buffer_rewrite_")).isEmpty)
  }

  // ---- IvfIndex build window (meta invalidated before init) ---------------

  test("IvfIndex rebuild killed around store.init: the drift baseline reads " +
      "loud 'not built' (never stale), the data still resolves, and a fresh " +
      "build recovers") {
    val emb = Tables.t(spark, TestSession.sf, "embeddings").cache()
    val base = emb.filter(col("vec_id") % 2 === 0)
    val cents = KMeans.train(base, "vec_id", "embedding", k = 4, iters = 2)
    val root = Files.createTempDirectory("graft_fault_ivf").toString
    val idx = new IvfIndex(spark, root, 4)
    idx.build(base, cents)
    val baseCount = idx.store.read().count()
    val snaps = scala.collection.mutable.Map[String, Path]()
    idx.onStep = s =>
      if (Set("metaInvalidated", "storeInit")(s))
        snaps.getOrElseUpdate(s, crashImage(root, s))
    idx.build(emb, cents) // the instrumented rebuild, completes normally
    idx.onStep = _ => ()
    assert(snaps.keySet === Set("metaInvalidated", "storeInit"))

    for ((step, snap) <- snaps) {
      val s = new IvfIndex(spark, snap.toString, 4)
      // the window's whole point: NEVER a stale baseline silently
      // drift-checking the next life's appends — loud "not built"
      val e = intercept[IllegalArgumentException] { s.trainMeanD2 }
      assert(e.getMessage.contains("not built"), s"$step: ${e.getMessage}")
      intercept[IllegalArgumentException] {
        s.append(emb.limit(3), cents)
      }
      // the data itself still resolves (old corpus before init, new after)
      val n = s.store.read().count()
      assert(if (step == "metaInvalidated") n == baseCount
        else n == emb.count(), s"$step: unexpected corpus size $n")
      // recovery: a fresh build restores the full contract
      s.build(base, cents)
      assert(s.trainMeanD2 > 0.0)
      val q = emb.filter(col("vec_id") < 4)
      val got = s.serve(q, cents, k = 3, nprobe = 4)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = Ann.bruteForceTopK(q, base, k = 3)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"$step: recovered index serves wrong")
    }
  }

  // ---- IvfPqIndex build windows (meta gates the data↔codebook pairing) ----

  test("IvfPqIndex rebuild killed around codebook/store writes: every " +
      "model-dependent read fails loud 'not built' — a crash that leaves " +
      "NEW codebooks beside OLD-codebook codes can never ADC-serve the " +
      "mismatched pairing — and a fresh build recovers") {
    val emb = Tables.t(spark, TestSession.sf, "embeddings").cache()
    val base = emb.filter(col("vec_id") % 2 === 0)
    val cents = KMeans.train(base, "vec_id", "embedding", k = 4, iters = 2)
    val root = Files.createTempDirectory("graft_fault_ivfpq").toString
    val idx = new graft.similarity.IvfPqIndex(spark, root, 4, m = 8, k = 16)
    idx.build(base, cents)
    val baseCount = idx.store.read().count()
    val snaps = scala.collection.mutable.Map[String, Path]()
    idx.onStep = s =>
      if (Set("metaInvalidated", "codebooksWritten", "storeInit")(s))
        snaps.getOrElseUpdate(s, crashImage(root, s))
    idx.build(emb, cents) // the instrumented rebuild, completes normally
    idx.onStep = _ => ()
    assert(snaps.keySet ===
      Set("metaInvalidated", "codebooksWritten", "storeInit"))

    val q = emb.filter(col("vec_id") < 4)
    for ((step, snap) <- snaps) {
      val s = new graft.similarity.IvfPqIndex(spark, snap.toString, 4,
        m = 8, k = 16)
      // the window's whole point: the meta file is the ONLY path to the
      // codebook pairing (subDim rides it), so after `codebooksWritten` —
      // new codebooks on disk, stored codes still from the OLD books —
      // every model-dependent surface is loudly unreachable rather than
      // silently serving mismatched ADC distances
      val e = intercept[IllegalArgumentException] { s.trainMeanD2 }
      assert(e.getMessage.contains("not built"), s"$step: ${e.getMessage}")
      intercept[IllegalArgumentException] { s.codebooks() }
      intercept[IllegalArgumentException] {
        s.serve(q, cents, kTop = 3, nprobe = 4, rerank = Int.MaxValue)
      }
      intercept[IllegalArgumentException] {
        s.neighborsWithin(q, cents, minSim = 0.30, nprobe = 4,
          rerank = Int.MaxValue)
      }
      intercept[IllegalArgumentException] { s.append(emb.limit(3), cents) }
      // the data itself still resolves (old corpus before init, new after)
      val n = s.store.read().count()
      assert(if (step == "storeInit") n == emb.count() else n == baseCount,
        s"$step: unexpected corpus size $n")
      // recovery: a fresh build restores the full contract, exactly
      s.build(base, cents)
      assert(s.trainMeanD2 > 0.0)
      val got = s.serve(q, cents, kTop = 3, nprobe = 4,
          rerank = Int.MaxValue)
        .select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = Ann.bruteForceTopK(q, base, k = 3)
        .select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"$step: recovered index serves wrong")
    }
  }

  // ---- GenRotator rotate windows ------------------------------------------

  test("rotate killed after EACH ordered step: the pointer resolves a " +
      "whole generation (old before the swap, new after), orphan builds " +
      "and pointer tmps are reclaimed by the next rotate") {
    val emb = Tables.t(spark, TestSession.sf, "embeddings").cache()
    def cents(df: org.apache.spark.sql.DataFrame) =
      KMeans.train(df, "vec_id", "embedding", k = 4, iters = 2)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val q = emb.filter(col("vec_id") < 4)
    val corp1 = emb.filter(col("vec_id") % 2 === 0)
    val root = Files.createTempDirectory("graft_fault_rot").toString
    val rot = new RotatingIvfIndex(spark, root, nPartitions = 4)
    rot.build(corp1, cents(corp1))
    val g1 = rot.currentGen()
    rot.rebuild(emb, cents(emb))
    val g2 = rot.currentGen()
    val exact2 = pairs(Ann.bruteForceTopK(q, emb, k = 3))
    // instrumented third rotate over a disjoint half-corpus, so pre- and
    // post-swap views are DISTINGUISHABLE at every crash point
    val corp3 = emb.filter(col("vec_id") % 2 === 1)
    val exact3 = pairs(Ann.bruteForceTopK(q, corp3, k = 3))
    assert(exact2 !== exact3, "fixture degenerate: corpora rank equal")
    val snaps = scala.collection.mutable.Map[String, Path]()
    rot.rotator.onStep = s =>
      if (Set("genBuilt", "ptrWritten", "promoted")(s))
        snaps.getOrElseUpdate(s, crashImage(root, s))
    rot.rebuild(corp3, cents(corp3))
    rot.rotator.onStep = _ => ()
    val g3 = rot.currentGen()
    assert(snaps.keySet === Set("genBuilt", "ptrWritten", "promoted"))
    def gens(r: String) = listNames(r, "gen")

    // -- killed after the new generation is built, before the swap ---------
    for (step <- Seq("genBuilt", "ptrWritten")) {
      val s = new RotatingIvfIndex(spark, snaps(step).toString, 4)
      assert(s.currentGen() === g2, s"$step: pointer moved before the swap")
      assert(pairs(s.serve(q, k = 3, nprobe = 4)) === exact2,
        s"$step: old view does not serve end to end")
      assert(gens(s.root) === Set(g1, g2, g3), s"$step fixture")
      if (step == "ptrWritten")
        assert(listNames(s.root, ".ptr").nonEmpty, "fixture: no pointer tmp")
      // the next rotate promotes atop the CURRENT generation and reclaims
      // the crashed orphan build (and any pointer tmp) in one pass
      s.rebuild(emb, cents(emb))
      val g4 = s.currentGen()
      assert(gens(s.root) === Set(g2, g4),
        s"$step: orphan build survived the recovery rotate: ${gens(s.root)}")
      assert(listNames(s.root, ".ptr").isEmpty, s"$step: pointer tmp leaked")
      assert(pairs(s.serve(q, k = 3, nprobe = 4)) === exact2)
    }

    // -- killed after the swap, before the reclaim --------------------------
    locally {
      val s = new RotatingIvfIndex(spark, snaps("promoted").toString, 4)
      assert(s.currentGen() === g3, "the swap IS the promote")
      assert(pairs(s.serve(q, k = 3, nprobe = 4)) === exact3)
      assert(gens(s.root) === Set(g1, g2, g3),
        "fixture: expected the generations the crashed reclaim left")
      s.rebuild(emb, cents(emb))
      assert(gens(s.root) === Set(g3, s.currentGen()),
        s"recovery rotate did not reclaim the stale generations: ${gens(s.root)}")
      assert(pairs(s.serve(q, k = 3, nprobe = 4)) === exact2)
    }
    // the original (uncrashed) root kept its own contract throughout
    assert(pairs(rot.serve(q, k = 3, nprobe = 4)) === exact3)
    assert((g1 !== g2) && (g2 !== g3))
  }
}
