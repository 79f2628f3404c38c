package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-mix construction (the "domain
  * weights" step of corpus curation): keep a row iff
  * `md5(key) mod 100 < stratum-percentage`.
  *
  * Hash-threshold sampling (not `rand()`) on purpose:
  *  - reproducible across runs, engines, and partitionings — no RNG state,
  *    so the oracle replays it and incremental re-runs keep the same rows;
  *  - a pure narrow predicate — pushes down, codegen'd, no shuffle;
  *  - per-stratum rates compose as one CASE expression, so a mix over many
  *    domains is still a single filter pass.
  */
object Sampling {

  /** Keep-predicate: per-stratum percentage (0-100), `defaultPct` for
    * unlisted strata. */
  def stratifiedKeep(keyCol: Column, stratumCol: Column,
      pctByStratum: Map[String, Int], defaultPct: Int): Column = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (k, p)) => when(stratumCol === k, lit(p)).otherwise(acc)
    }
    graft.dedup.TextDedup.md5Int(keyCol.cast("string")) % 100 < pct
  }
}
