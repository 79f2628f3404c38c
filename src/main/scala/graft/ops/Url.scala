package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and registrable-domain blocklisting — the web-corpus
  * hygiene primitives between WARC ingestion (s10) and host-level curation
  * (pp6's exact-host blocklist + cap). Crawls see the same page under many
  * spellings (case, default ports, fragments, tracking params, trailing
  * slashes); collapsing them BEFORE content dedup removes the cheapest dup
  * class with pure string algebra, no similarity machinery.
  *
  * Everything here is a narrow codegen'd Column expression (regexp + array
  * ops), so canonicalization rides inside whole-stage codegen adjacent to
  * the scan — at 100 TB the cost is the scan itself.
  *
  * Reference analog: none — its ingest keeps URLs verbatim (SURVEY §2 S4);
  * this belongs to the web-curation extension surface like tx24/pp6.
  */
object Url {

  /** RFC-3986-flavoured canonical form:
    *   - scheme and host lowercased
    *   - default port stripped (`:80` for http, `:443` for https)
    *   - fragment dropped
    *   - trailing slashes stripped from the path (`/a/` == `/a`, `/` == ``)
    *   - query params: empty and `utm_*` tracking params dropped, the rest
    *     sorted (param order never changes the resource)
    * Malformed input (no `scheme://`) canonicalizes to NULL and never
    * throws — hygiene must not kill the batch, but distinct malformed
    * inputs must stay IDENTIFIABLE: an empty-scheme passthrough would
    * collapse every `://`-prefixed fragment sharing a query string into one
    * canonical dedup group, silently merging unrelated records. NULL keys
    * group together too, but as an explicit "unparseable" bucket a caller
    * can filter or quarantine, not a fake resource identity. */
  def canonicalize(url: Column): Column = {
    // (?s) so '#' strips to true end-of-input in BOTH Java regex and RE2
    // (without it, Java's $ matches before a trailing newline and RE2's
    // does not — a newline-bearing crawl URL would canonicalize
    // differently cross-engine)
    val base = regexp_replace(url, "(?s)#.*", "")
    val scheme = lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // strip userinfo BEFORE anything reads the authority: the classic
    // 'https://good.com@blocked.example.com/' @-spoof must not evade the
    // host-derived blocklist
    val hostPort = regexp_replace(
      lower(regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      ".*@", "")
    val host = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val path = regexp_replace(
      regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    val rawQ = regexp_extract(base, "\\?([^#]*)", 1)
    val q = array_join(array_sort(filter(split(rawQ, "&"),
      p => p =!= "" && !startswith(p, lit("utm_")))), "&")
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** Host part of the canonical form (no userinfo, no port, lowercased). */
  def host(url: Column): Column = {
    val hp = lower(regexp_extract(regexp_replace(url, "(?s)#.*", ""),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    regexp_replace(regexp_replace(hp, ".*@", ""), ":\\d+$", "")
  }

  /** Every dot-label suffix of `host` ("a.b.c" → ["a.b.c", "b.c", "c"]) —
    * the join key set for suffix-rule matching. A host with L labels emits
    * L keys (L ≤ ~10 in practice), so matching a blocklist of ANY size is
    * one explode + one broadcast equi-join instead of a host × rules
    * regex product. Same mechanism the Public Suffix List is applied with. */
  def labelSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels) - i), "."))
  }

  /** The LONGEST of `suffixes` matching `host` ('' when clean) as a pure
    * codegen Column — the literal-rule-list variant of [[blockBySuffix]]
    * for config-sized blocklists: a filter + fold over the host's ≤ ~10
    * label suffixes, no join, no aggregation, STATELESS — usable
    * unchanged inside a streaming projection where [[blockBySuffix]]'s
    * groupBy would demand watermarked state. */
  def blockedByLiteral(host: Column, suffixes: Seq[String]): Column = {
    require(suffixes.nonEmpty, "blockedByLiteral: empty blocklist")
    val rules = array(suffixes.map(lit): _*)
    // coalesce: a NULL host must read as clean (''), matching
    // blockBySuffix's contract (explode drops the row, left join
    // coalesces) — without it the fold propagates NULL
    coalesce(
      aggregate(
        filter(labelSuffixes(host), s => array_contains(rules, s)),
        lit(""),
        (acc, s) => when(length(s) > length(acc), s).otherwise(acc)),
      lit(""))
  }

  /** Annotate `df` with the LONGEST blocklist suffix matching `hostCol`
    * (`blocked_by`, '' when clean): explode the host's label suffixes,
    * equi-join the broadcast rule table, keep the max-length match per row.
    * A rule matches its exact host and every subdomain, never a label
    * fragment ("example.com" does not match "notexample.com" — suffix keys
    * are whole labels by construction). `keyCols` must uniquely key `df`. */
  def blockBySuffix(df: DataFrame, hostCol: String, suffixes: Seq[String],
      keyCols: Seq[String]): DataFrame = {
    require(suffixes.nonEmpty, "blockBySuffix: empty blocklist")
    val spark = df.sparkSession
    import spark.implicits._
    val rules = broadcast(suffixes.toDF("__sfx"))
    val hits = df.select(keyCols.map(col) :+
        explode(labelSuffixes(col(hostCol))).as("__sfx"): _*)
      .join(rules, "__sfx")
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(length(col("__sfx")).as("l"), col("__sfx").as("s")))
        .getField("s").as("blocked_by"))
    df.join(hits, keyCols, "left")
      .withColumn("blocked_by", coalesce(col("blocked_by"), lit("")))
  }
}
