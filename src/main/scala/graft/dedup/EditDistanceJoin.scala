package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity self-join (all pairs within Levenshtein
  * `maxDist`) without the all-pairs product — the string-metric sibling of
  * the MinHash/SimHash candidate generators in [[TextDedup]]: fuzzy titles,
  * near-identical names, OCR'd variants.
  *
  * Blocking is q-gram prefix filtering (the Ed-Join/PassJoin family of
  * exact filters, both published):
  *
  *  1. every length-q window an edit touches is destroyed, one edit
  *     touches ≤ q windows, so two strings within distance d share
  *     `max(|A|,|B|) − d·q` distinct q-grams (A/B = the strings' distinct
  *     q-gram sets) — and at least ONE, provided the strings have ≥
  *     q·(d+1) characters (pigeonhole over windows);
  *  2. under any global total order on grams, sets overlapping in ≥ t
  *     elements must meet within their first `|set| − t + 1` elements —
  *     so each row only indexes its `d·q + 1` RAREST grams (rarity =
  *     corpus frequency, ties by gram) and no qualifying pair is lost,
  *     while the frequent grams that would dominate the inverted index's
  *     skew never enter the join.
  *
  * Shape at scale: one gram-frequency aggregate, a per-row top-(d·q+1)
  * window (partitioned by row key — tiny partitions), an equi-join on the
  * gram, then the exact Levenshtein verify on candidates only. No
  * cartesian anywhere (PlanSpec pins it); the verify uses Spark's
  * thresholded `levenshtein`, which abandons a pair as soon as the running
  * distance exceeds `maxDist`.
  */
object EditDistanceJoin {

  /** All pairs (key_a < key_b) whose strings are within `maxDist` edits,
    * with the exact distance. Rows with fewer than q·(maxDist+1)
    * characters are excluded from the universe (below the pigeonhole
    * bound no blocking scheme is exact); filter-match the oracle/caller. */
  def selfJoin(df: DataFrame, keyCol: String, strCol: String,
      maxDist: Int, q: Int = 4): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 2, "q-gram width must be >= 2")
    val minLen = q * (maxDist + 1)
    val keep = q * maxDist + 1

    val base = df.select(col(keyCol).as("k"), col(strCol).as("s"))
      .filter(length(col("s")) >= minLen)
    // native one-pass distinct q-gram extraction — same grams in the same
    // first-occurrence order as the interpreted
    // array_distinct(transform(sequence, substring)) lambda, whose
    // per-position substring re-walked the string (O(len²) chars per row)
    val grams = base.select(col("k"), col("s"),
      explode(graft.functions.TextHashFunctions.char_grams(col("s"), q))
        .as("g"))
    val freq = grams.groupBy("g").agg(count(lit(1)).as("gf"))
    // per-row rarest-gram prefix; (gf, g) is a total order so the kept set
    // is deterministic
    val pruned = grams.join(freq, "g")
      .withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("gf"), col("g"))))
      .filter(col("rn") <= keep)
      .select(col("g"), col("k"), col("s"))

    val cand = pruned.as("a").join(pruned.as("b"),
        col("a.g") === col("b.g") && col("a.k") < col("b.k") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= maxDist)
      .select(col("a.k").as("key_a"), col("a.s").as("s_a"),
        col("b.k").as("key_b"), col("b.s").as("s_b"))
      .distinct()

    cand
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0) // thresholded levenshtein returns -1 past maxDist
      .select("key_a", "key_b", "dist")
  }
}
