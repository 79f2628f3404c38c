package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for large-scale corpus curation: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design:
  *  - signatures (minhash/simhash/fingerprints) are pure per-row expression
  *    projections — codegen'd, narrow, no UDFs, no shuffle;
  *  - candidate generation shuffles on *band buckets* (LSH), never on raw
  *    text, so the join keys are small and the pair space is bounded by
  *    bucket collisions rather than |corpus|²;
  *  - exact dedup is one hash-groupBy on a fingerprint (map-side partial
  *    aggregation applies);
  *  - everything composes as DataFrames — at 100 TB these run as ordinary
  *    shuffles with AQE handling skewed buckets.
  *
  * Hash choice: the md5-prefix integer (`md5Int`) is used in oracle-checked
  * paths because the DuckDB oracle can reproduce it; the codegen'd
  * [[graft.functions.PolyHash]] is the cheaper production default
  * (`useMd5 = false`).
  */
object TextDedup {

  /** Guard against CollapseProject inlining a staged expensive column into a
    * higher-order-function lambda body (HOFs are interpreted — an inlined
    * subtree is re-evaluated per element/iteration). Referencing the staged
    * column a second time in the consuming projection keeps the projections
    * separate, so the column is computed once per row. */
  def pinned(staged: Column, body: Column): Column =
    when(size(staged) === -1, null).otherwise(body)

  /** First 8 hex chars of md5 as an unsigned 32-bit int (cross-engine
    * reproducible base hash) — the native codegen'd
    * [[graft.functions.Md5IntExpr]]: the digest's first 4 bytes read
    * big-endian, the exact value of the
    * `conv(substring(md5(c), 1, 8), 16, 10)` composition it replaces
    * (which allocated a 32-char hex string and parsed it back per hash). */
  def md5Int(c: Column): Column =
    graft.functions.TextHashFunctions.md5_int(c.cast("string"))

  def baseHash(c: Column, useMd5: Boolean): Column =
    if (useMd5) md5Int(c) else graft.functions.GraftFunctions.poly_hash(c)

  /** THE deterministic 80/10/10 train/val/test split (md5-mod-100 of the
    * id) — one definition, shared by tx16 (the split itself) and dq7 (the
    * leakage audit over it); a drifted copy of the thresholds is exactly
    * the bug class dq7 exists to catch. SQL twin:
    * [[graft.queries.DedupQueries.splitSql]]. */
  def trainValTestSplit(id: Column): Column = {
    val h = md5Int(id.cast("string")) % 100
    when(h < 80, "train").when(h < 90, "val").otherwise("test")
  }

  /** Word n-gram shingles (distinct) from a token array:
    * shingle_i = tokens[i..i+n-1] joined by space. Documents with fewer than
    * n tokens yield an empty set — `sequence` with stop < start would count
    * DOWN (and `slice` with start 0 throws), so the short case is guarded
    * explicitly, matching the oracle's empty `generate_series`. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      graft.functions.TextHashFunctions.word_shingles(toks, n))
      .otherwise(array().cast("array<string>"))

  /** Per-shingle base hashes in one native pass
    * ([[graft.functions.ShingleHashesExpr]]) — same per-element hash
    * (md5Int / poly_hash), same null propagation as the interpreted
    * `transform` lambda it replaces. */
  def shingleHashes(shingles: Column, useMd5: Boolean = true): Column =
    graft.functions.TextHashFunctions.shingle_hashes(shingles, useMd5)

  /** MinHash signature from pre-staged shingle hashes: numPerm permutations
    * under (a_i·h + b_i) mod p, a_i = 2i+1, b_i = 7i+13, p = 1e9+7.
    * Computed by the native codegen'd [[graft.functions.MinHashSig]]
    * expression — one pass over the hash array instead of numPerm
    * interpreted lambda traversals (bit-identical results). */
  def minhashFromHashes(hs: Column, numPerm: Int): Column =
    graft.functions.SketchFunctions.min_hash_sig(hs, numPerm)

  /** LSH band hashes: split the signature into `bands` slices of `rowsPerBand`
    * and hash each slice; docs sharing any (band index, band hash) are
    * candidates. One native pass ([[graft.functions.BandHashesExpr]]) —
    * per band the identical `md5(concat_ws(",", long casts))`
    * lowercase-hex the nested interpreted `transform` lambdas computed. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    graft.functions.TextHashFunctions.band_hashes(sig, bands, rowsPerBand)

  /** Exact dedup: group by content fingerprint; representative = min id.
    * One hash-aggregate (partial agg map-side). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__fp", TextFunctions.fingerprintMd5(col(textCol)))
      .groupBy(col("__fp").as("fingerprint"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_dups"))

  /** Banded LSH buckets for every document: (doc, band, bh) rows — the
    * shared front half of self-join and cross-corpus candidate generation.
    * All signature math is narrow staged projections (see the staging
    * comments above); only the exploded small (band, hash) keys ever reach
    * a shuffle. */
  private def bandedBuckets(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int, numPerm: Int, bands: Int, useMd5: Boolean): DataFrame = {
    val rowsPerBand = numPerm / bands
    df.withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("__sh", wordShingles(col("__toks"), shingleLen))
      .withColumn("__hs", shingleHashes(col("__sh"), useMd5))
      .withColumn("__sig", pinned(col("__hs"), minhashFromHashes(col("__hs"), numPerm)))
      .select(col(idCol).as("doc"),
        pinned(col("__sig"), bandHashes(col("__sig"), bands, rowsPerBand)).as("bands"))
      .select(col("doc"), posexplode(col("bands")).as(Seq("band", "bh")))
  }

  /** MinHash-LSH candidate pairs: shingle → sign → band → bucket self-join.
    * Returns distinct (a, b) with a < b sharing ≥1 band bucket. The shuffle
    * key is (band index, 32-hex band hash) — small and uniform unless the
    * corpus is pathologically self-similar; AQE skew handling covers the
    * rest. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numPerm: Int = 16, bands: Int = 4,
      useMd5: Boolean = true): DataFrame =
    candidatesFromBuckets(
      bandedBuckets(df, idCol, textCol, shingleLen, numPerm, bands, useMd5))

  /** Public buckets entry — precompute (and persist) ONE (doc, band, bh)
    * frame per side when several candidate joins share it (e.g. dd15's
    * incremental CC runs prior-self, prior×batch, and batch-self joins:
    * without sharing, each join would redo the shingle+signature work). */
  def buckets(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numPerm: Int = 16, bands: Int = 4,
      useMd5: Boolean = true): DataFrame =
    bandedBuckets(df, idCol, textCol, shingleLen, numPerm, bands, useMd5)

  /** Self-join candidates from precomputed [[buckets]]. */
  def candidatesFromBuckets(exploded: DataFrame): DataFrame =
    exploded.as("l").join(exploded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
      .distinct()

  /** Incremental-ingestion dedup: which NEW documents collide with the
    * EXISTING corpus — the shape every continuously-fed training pipeline
    * runs on each batch. Same banded LSH as [[minhashCandidates]] but a
    * two-sided (band, hash) equi-join: the corpus shuffles once on the
    * small band keys and the (typically much smaller) batch co-partitions
    * against it — never a corpus×batch cross product, and no corpus
    * self-pairs are generated at all. Returns distinct
    * (corpus_doc, new_doc) bucket collisions; feed them to [[jaccard]] /
    * exact comparison for the confirm stage. */
  def minhashCandidatesAgainst(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String,
      shingleLen: Int = 3, numPerm: Int = 16, bands: Int = 4,
      useMd5: Boolean = true): DataFrame = {
    val c = bandedBuckets(corpus, idCol, textCol, shingleLen, numPerm, bands, useMd5)
    val b = bandedBuckets(batch, idCol, textCol, shingleLen, numPerm, bands, useMd5)
    crossCandidatesFromBuckets(c, b)
  }

  /** Two-sided cross candidates from precomputed [[buckets]]. */
  def crossCandidatesFromBuckets(corpusBuckets: DataFrame,
      batchBuckets: DataFrame): DataFrame =
    corpusBuckets.as("l").join(batchBuckets.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh"))
      .select(col("l.doc").as("corpus_doc"), col("r.doc").as("new_doc"))
      .distinct()

  /** SimHash (32-bit) from pre-staged token hashes (`shingleHashes` over
    * whole tokens): per bit j, sum ±1 over the hashes' j-th bit; bit set iff
    * the sum is positive. Computed by the native codegen'd
    * [[graft.functions.SimHash32]] expression — one pass over the hashes
    * instead of 32 interpreted aggregate folds (bit-identical results). */
  def simhash(hs: Column): Column =
    graft.functions.SketchFunctions.sim_hash(hs)

  /** Exact Hamming near-duplicate pairs over a hash column (simhash,
    * perceptual image hash) WITHOUT an all-pairs join: pigeonhole banding.
    * Split the `bits`-bit hash into `maxDist + 1` contiguous bands — any
    * pair within distance `maxDist` must agree EXACTLY on at least one
    * band — equi-join on the small (band, band-bits) key, then keep true
    * pairs with the exact popcount filter. Unlike minhash LSH banding this
    * is exact: no recall loss, the bands only bound the candidate space.
    *
    * Scale note: expected bucket size is n / 2^bandWidth per band value, so
    * pick hash width so bandWidth = bits/(maxDist+1) stays ≥ ~16 at corpus
    * scale (64-bit simhash for billions of docs); the 32-bit hash here is
    * the oracle-reproducible test configuration. */
  def hammingCandidates(df: DataFrame, idCol: String, hashCol: String,
      maxDist: Int, bits: Int = 32): DataFrame = {
    val nBands = maxDist + 1
    require(nBands <= bits, s"maxDist $maxDist needs more bands than $bits bits")
    val base = bits / nBands
    val bandCols = (0 until nBands).map { i =>
      val off = i * base
      val w = if (i == nBands - 1) bits - off else base // last band absorbs remainder
      // 1L << 64 wraps to 1 (mask 0 → every row in ONE bucket → silent
      // all-pairs join); a 64-bit band keeps the whole hash
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      shiftright(col(hashCol), off).bitwiseAND(lit(mask))
    }
    val ext = df.select(col(idCol).as("doc"), col(hashCol).as("h"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bv")))
    ext.as("l").join(ext.as("r"),
        col("l.band") === col("r.band") && col("l.bv") === col("r.bv") &&
          col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"),
        bit_count(col("l.h").bitwiseXOR(col("r.h"))).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** n-gram Jaccard similarity between two shingle-set columns
    * (inclusion-exclusion on distinct sizes — stable across engines that
    * order set results differently). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val union = size(da).cast("double") + size(db).cast("double") - inter
    when(union === 0.0, lit(1.0)).otherwise(inter / union)
  }

  /** Embedding-cosine near-duplicate flag for a pair of vectors. */
  def cosineNearDup(a: Column, b: Column, threshold: Double): Column =
    graft.functions.VectorFunctions.cosine(a, b) >= threshold
}
