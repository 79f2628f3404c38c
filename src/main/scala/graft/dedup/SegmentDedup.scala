package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level duplicate-segment removal — the C4/RefinedWeb boilerplate
  * pass (Raffel et al. 2020 §2.2 "three-sentence span" rule) for corpora
  * whose unit of repetition is a short token window: split every document
  * into consecutive n-token segments, count each segment string across the
  * WHOLE corpus, drop segments above the frequency ceiling, and reassemble
  * the survivors in order.
  *
  * Scale shape: the only corpus-wide state is the segment-count hash-agg,
  * co-keyed on the segment string (map-side partial counts first), and the
  * drop decision re-joins on the same key — the tx18/gram-co-keyed regime,
  * so the duplicate table is never collected or broadcast and the pass
  * holds when the boilerplate set itself is terabytes. Reassembly is a
  * per-doc sort of its own surviving segments (bounded by document length).
  *
  * The reference has no counterpart (its enrichment modules are
  * row-at-a-time); this is part of the LLM-pipeline surface.
  */
object SegmentDedup {

  /** Consecutive non-overlapping n-token segments of `toks`, in order.
    * ceil(len/n) segments; the trailing partial segment is kept so the
    * reassembled text is lossless when nothing is dropped. Native
    * one-pass extraction ([[graft.functions.TokenSegmentsExpr]]) — the
    * exact values (incl. the empty-input [""] edge) of the interpreted
    * `transform(sequence, concat_ws(slice))` it replaces. */
  def segments(toks: Column, n: Int): Column =
    graft.functions.TextHashFunctions.token_segments(toks, n)

  /** Remove segments occurring ≥ `maxFreq` times corpus-wide. Returns
    * (idCol, cleaned) with one row per input document — documents whose
    * every segment was boilerplate come back as empty strings, like C4's
    * cleaned shards. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            n: Int = 3, maxFreq: Long = 3): DataFrame = {
    val base = docs.select(col(idCol), split(col(textCol), " ").as("__toks"))
    val segs = base.select(col(idCol),
      posexplode(segments(col("__toks"), n)).as(Seq("__pos", "__seg")))
    val cnt = segs.groupBy("__seg").agg(count(lit(1)).as("__n"))
    val re = segs.join(cnt, "__seg").filter(col("__n") < maxFreq)
      .groupBy(idCol)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__seg")))),
        x => x.getField("__seg")), " ").as("cleaned"))
    base.select(idCol).join(re, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cleaned"), lit("")).as("cleaned"))
  }
}
