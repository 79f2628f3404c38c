package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join on overlap: all document pairs sharing at least
  * `minOverlap` distinct set elements — with PPJoin-style prefix filtering
  * so candidate generation never goes all-pairs.
  *
  * Prefix-filter lemma: fix any global total order over elements and let
  * each set index only its first `|S| - T + 1` elements (its "prefix"). If
  * `|A ∩ B| >= T`, the prefixes of A and B must share an element — A can
  * exclude at most `|A| - (|A|-T+1) = T-1` of the shared elements from its
  * prefix and likewise B, but the shared elements number at least T, so one
  * survives in both prefixes. Ordering elements rarest-first (ascending
  * document frequency) makes the indexed elements the most selective ones,
  * which is what keeps the candidate join small on skewed element
  * distributions. The same family of blocking as
  * [[EditDistanceJoin]]'s d·q+1 rarest-gram index — there the pigeonhole
  * bound comes from edit operations destroying q-gram windows, here from
  * the overlap threshold itself.
  *
  * Scale: one explode (narrow), one df aggregation (map-side combined), a
  * window rank per document (shuffle on doc id), a candidate equi-join on
  * the element (shuffle on element, bounded by prefix sizes), and a verify
  * restricted to candidates: two co-keyed joins carry each pair's SORTED
  * element arrays onto the candidate row, and a codegen'd merge
  * intersection ([[graft.functions.SortedOverlap]]) counts the overlap in
  * one primitive loop with early reject — the verify shuffle is |cand|
  * thin rows + one pass of the set table per side, never the
  * Σ|set|-per-candidate explode of a join/aggregate verify. Exact — no
  * LSH recall loss; the candidate set provably contains every qualifying
  * pair.
  */
object OverlapJoin {
  import graft.functions.OverlapExprFunctions.sorted_overlap

  /** @param docs       input frame
    * @param idCol      integral unique id
    * @param setCol     array column (the set; duplicates are collapsed)
    * @param minOverlap T: emit pairs with at least this many shared
    *                   distinct elements (must be >= 1)
    * @return (id_a, id_b, overlap) with id_a < id_b — one row per
    *         qualifying pair, overlap = exact |A ∩ B| */
  def join(docs: DataFrame, idCol: String, setCol: String,
      minOverlap: Int, assumeDistinct: Boolean = false): DataFrame = {
    val (sets, cand) = buildCandidates(docs, idCol, setCol, minOverlap,
      assumeDistinct)

    // verify: exact intersection size, computed only for candidates —
    // sorted arrays ride onto the pair via two co-keyed joins, one merge
    // loop per pair (early-rejecting at < minOverlap, exact at >=)
    val sorted = sets.select(col("__id"), array_sort(col("__set")).as("__set"))
    cand
      .join(sorted.select(col("__id").as("id_a"), col("__set").as("__sa")),
        "id_a")
      .join(sorted.select(col("__id").as("id_b"), col("__set").as("__sb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        sorted_overlap(col("__sa"), col("__sb"), lit(minOverlap))
          .cast("long").as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** The candidate stage of [[join]] alone — (id_a, id_b) pairs sharing a
    * prefix element, BEFORE exact verification. This is the quantity whose
    * growth governs the join's scaling (the verify work is proportional to
    * it), so the scale gate counts it at sf0.1 vs sf1 directly. */
  def candidates(docs: DataFrame, idCol: String, setCol: String,
      minOverlap: Int): DataFrame =
    buildCandidates(docs, idCol, setCol, minOverlap)._2

  /** @return (sets, cand): the normalized (__id, __set) frame — distinct
    *         elements, size >= minOverlap — and the candidate pairs. */
  /** The merge-intersection verify reads UTF8 strings — a non-string
    * element type must fail AT PLAN TIME, not as an executor cast error
    * mid-verify (the join/aggregate verify it replaced was type-agnostic,
    * so this is a narrowed, now-loud contract). */
  private def requireStringSets(docs: DataFrame, setCol: String): Unit =
    docs.schema(setCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => ()
      case other => throw new IllegalArgumentException(
        s"set-similarity joins need array<string> sets; '$setCol' is $other")
    }

  private def buildCandidates(docs: DataFrame, idCol: String, setCol: String,
      minOverlap: Int, assumeDistinct: Boolean = false): (DataFrame, DataFrame) = {
    require(minOverlap >= 1, s"minOverlap must be >= 1: $minOverlap")
    requireStringSets(docs, setCol)

    // one row per (doc, distinct element); sets smaller than T can never
    // qualify and are dropped before they cost anything. `assumeDistinct`
    // skips the O(|set|) normalization when the caller already collapsed
    // duplicates (containmentJoin's size stage) — duplicate elements
    // under assumeDistinct=true would inflate overlap counts, so it is
    // a contract, not a hint
    val sets = docs
      .select(col(idCol).as("__id"),
        (if (assumeDistinct) col(setCol) else array_distinct(col(setCol)))
          .as("__set"))
      .filter(size(col("__set")) >= minOverlap)
    val elems = sets
      .select(col("__id"), size(col("__set")).as("__sz"),
        explode(col("__set")).as("__e"))

    // global rarest-first order: (document frequency, element) is total
    val df = elems.groupBy("__e").agg(count(lit(1)).as("__df"))
    val byRarity = Window.partitionBy("__id").orderBy(col("__df"), col("__e"))
    val prefix = elems.join(df, "__e")
      .withColumn("__rn", row_number().over(byRarity))
      .filter(col("__rn") <= col("__sz") - minOverlap + 1)
      .select("__id", "__e", "__rn", "__sz")

    // candidates: pairs sharing an indexed (prefix) element. NOTE: the
    // classic PPJoin position filter (1 + min(|A|-pa, |B|-pb) >= T) is a
    // NO-OP under an absolute overlap threshold — it is algebraically the
    // prefix condition rn <= sz-T+1 already enforced on both inputs. It
    // only prunes for similarity-RELATIVE thresholds (Jaccard/cosine),
    // where the required overlap grows with the partner's size; don't
    // "add" it here expecting a candidate reduction
    def side(s: String) = prefix.select(col("__id").as(s"id_$s"), col("__e"))
    val cand = side("a").join(side("b"), "__e")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    (sets, cand)
  }

  /** Exact Jaccard set-similarity join: all pairs with
    * `|A ∩ B| / |A ∪ B| >= minJaccard` — the similarity-relative variant of
    * [[join]] (AllPairs-style; Bayardo et al., WWW'07 — public algorithm).
    *
    * Prefix bound: J(A,B) >= t implies `|A ∩ B| >= t·|A ∪ B| >= t·|A|`, so
    * with prefix length `|A| - ceil(t·|A|) + 1` the set can exclude at most
    * `ceil(t·|A|) - 1 < |A ∩ B|` shared elements — some shared element
    * survives in A's prefix, and symmetrically in B's. Candidates = pairs
    * sharing a rarest-first-indexed element in BOTH prefixes (lossless);
    * a size filter (`t·|A| <= |B| <= |A|/t`) prunes incompatible lengths
    * before the distinct. Verification computes the exact Jaccard as a
    * double division of the integer intersection/union sizes — the same
    * IEEE operation a SQL engine runs, so results are bit-identical
    * cross-engine.
    *
    * Scale shape is [[join]]'s: explode → map-side-combined df agg →
    * per-doc window rank → candidate equi-join bounded by prefix sizes →
    * verify on candidates only. Never all-pairs.
    */
  def jaccardJoin(docs: DataFrame, idCol: String, setCol: String,
      minJaccard: Double): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0, 1]: $minJaccard")
    requireStringSets(docs, setCol)

    val sets = docs
      .select(col(idCol).as("__id"), array_distinct(col(setCol)).as("__set"))
      .filter(size(col("__set")) >= 1)
    val elems = sets
      .select(col("__id"), size(col("__set")).as("__sz"),
        explode(col("__set")).as("__e"))

    // prefix length |S| - ceil(t·|S|) + 1; the epsilon can only shrink the
    // ceil, i.e. LENGTHEN the prefix — float error widens candidates (safe)
    // rather than dropping a qualifying pair (wrong). The epsilon is
    // RELATIVE (×(1-1e-12)), not absolute: the double product's rounding
    // error is relative (~1e-16), so an absolute 1e-9 stops covering it
    // once t·|S| reaches ~1e7 — a relative shift dominates the error at
    // every magnitude
    val pfxLen = col("__sz") -
      ceil(lit(minJaccard) * col("__sz") * lit(1.0 - 1e-12)) + 1

    val df = elems.groupBy("__e").agg(count(lit(1)).as("__df"))
    val byRarity = Window.partitionBy("__id").orderBy(col("__df"), col("__e"))
    val prefix = elems.join(df, "__e")
      .withColumn("__rn", row_number().over(byRarity))
      .filter(col("__rn") <= pfxLen)
      .select("__id", "__e", "__sz")

    def side(s: String) = prefix.select(
      col("__id").as(s"id_$s"), col("__sz").as(s"sz_$s"), col("__e"))
    val cand = side("a").join(side("b"), "__e")
      .filter(col("id_a") < col("id_b"))
      // length filter: J >= t forces t·|A| <= |B| (and symmetrically);
      // the relative epsilon again errs toward keeping the pair
      .filter(
        col("sz_b") >= lit(minJaccard) * col("sz_a") * lit(1.0 - 1e-12) &&
        col("sz_a") >= lit(minJaccard) * col("sz_b") * lit(1.0 - 1e-12))
      .select("id_a", "id_b").distinct()

    // verify candidates with the exact Jaccard: sorted arrays ride onto
    // the pair, one merge loop each; union via inclusion-exclusion from
    // the array sizes. The merge's early-reject threshold is the pair's
    // minimum qualifying overlap ceil(t·(|A|+|B|)/(1+t)) (J >= t ⟺
    // ov·(1+t) >= t·(|A|+|B|)), RELATIVE-epsilon-lowered (×(1-1e-12),
    // which dominates the ~1e-16 relative double rounding at any set-size
    // sum — an absolute 1e-9 stops covering it past sums of ~1e7) so
    // float error can only soften the reject — a qualifying pair never
    // takes the reject branch and keeps its exact count
    val sorted = sets.select(col("__id"), array_sort(col("__set")).as("__set"))
    val withSets = cand
      .join(sorted.select(col("__id").as("id_a"), col("__set").as("__sa")),
        "id_a")
      .join(sorted.select(col("__id").as("id_b"), col("__set").as("__sb")),
        "id_b")
      .withColumn("__sza", size(col("__sa")))
      .withColumn("__szb", size(col("__sb")))
    withSets
      .withColumn("__req", ceil(lit(minJaccard) * (col("__sza") + col("__szb"))
        / lit(1.0 + minJaccard) * lit(1.0 - 1e-12)).cast("int"))
      .withColumn("__ov",
        sorted_overlap(col("__sa"), col("__sb"), col("__req")).cast("long"))
      .withColumn("jacc", col("__ov").cast("double") /
        (col("__sza") + col("__szb") - col("__ov")))
      .filter(col("jacc") >= minJaccard)
      .select("id_a", "id_b", "jacc")
  }

  /** Directed containment join: pairs with `|src ∩ dst| / |src| >=
    * minContainPct/100` — the ASYMMETRIC near-dup class Jaccard misses
    * (a short document quoted inside a long one scores near-zero Jaccard
    * but containment ~1). Only sets with at least `minSize` distinct
    * elements participate: containment's required overlap `ceil(t·|src|)`
    * shrinks with the source, so a corpus-wide candidate floor needs a
    * size floor — `T = ceil(t·minSize)` is then a valid absolute overlap
    * bound for EVERY qualifying pair, and [[join]]'s prefix filter applies
    * unchanged (lossless). The threshold is integer cross-multiplied
    * (`overlap·100 >= pct·|src|`) — an exact rational compare, no float
    * epsilon on the accept/reject edge.
    *
    * Scale shape: [[join]] at `T` plus one co-keyed size re-join; the
    * direction split is a union of two projections of the same pair table.
    */
  def containmentJoin(docs: DataFrame, idCol: String, setCol: String,
      minContainPct: Int, minSize: Int): DataFrame = {
    require(minContainPct >= 1 && minContainPct <= 100,
      s"minContainPct must be in [1, 100]: $minContainPct")
    require(minSize >= 1, s"minSize must be >= 1: $minSize")
    val t = math.max(1, math.ceil(minContainPct * minSize / 100.0).toInt)

    val sets = docs
      .select(col(idCol).as("__cid"), array_distinct(col(setCol)).as("__cset"))
      .filter(size(col("__cset")) >= minSize)
    val sizes = sets.select(col("__cid"), size(col("__cset")).as("__csz"))
    // assumeDistinct: sets is already normalized above — join must not
    // re-run array_distinct over every set
    val pairs = join(sets, "__cid", "__cset", t, assumeDistinct = true)
    val directed = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"), col("overlap"))
      .unionByName(pairs
        .select(col("id_b").as("src"), col("id_a").as("dst"), col("overlap")))
    directed
      .join(sizes.select(col("__cid").as("src"), col("__csz").as("src_sz")),
        "src")
      .filter(col("overlap") * 100 >= col("src_sz") * minContainPct)
      .select(col("src"), col("dst"), col("overlap"),
        col("src_sz").cast("long").as("src_sz"),
        (col("overlap").cast("double") / col("src_sz")).as("containment"))
  }
}
