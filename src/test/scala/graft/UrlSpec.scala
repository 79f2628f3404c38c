package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Url

/** Url canonicalization/blocklist edges beyond the q:url1/url2 fixture:
  * non-default ports kept, http :80 stripped, query-less and utm-only
  * URLs, malformed input, and the label-boundary non-match rule. */
class UrlSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def canon(u: String): String =
    spark.range(1).select(Url.canonicalize(lit(u))).head.getString(0)

  test("case, default port, fragment, utm, param order, trailing slash") {
    assert(canon("HTTPS://WWW.Ex.COM:443/A/b/?utm_x=1&b=2&a=1#f")
      === "https://www.ex.com/A/b?a=1&b=2")
  }

  test("non-default port survives; http :80 is the default") {
    assert(canon("https://ex.com:8443/a") === "https://ex.com:8443/a")
    assert(canon("HTTP://ex.com:80/a") === "http://ex.com/a")
    assert(canon("http://ex.com:443/a") === "http://ex.com:443/a")
  }

  test("query-less and utm-only queries emit no '?'") {
    assert(canon("https://ex.com/a") === "https://ex.com/a")
    assert(canon("https://ex.com/a?utm_source=x&utm_medium=y")
      === "https://ex.com/a")
    assert(canon("https://ex.com/?") === "https://ex.com")
  }

  test("malformed input canonicalizes to NULL (identifiable), never throws") {
    // NULL, not a '://'-prefixed residue: distinct malformed inputs must
    // not collapse into one canonical dedup group (they'd silently merge
    // unrelated records in url1-style groupBy-canonical dedup)
    assert(canon("not a url") === null)
    assert(canon("relative/path?a=1") === null)
    assert(canon("ftp://Mixed.Case/KeepPath") === "ftp://mixed.case/KeepPath")
  }

  test("userinfo @-spoof cannot evade the host or the blocklist") {
    assert(canon("https://good.com@Blocked.Example.COM/x")
      === "https://blocked.example.com/x")
    val got = spark.range(1).select(
      Url.blockedByLiteral(Url.host(
        lit("https://good.com@sub.blocked.example.com:8443/x")),
        Seq("blocked.example.com"))).head.getString(0)
    assert(got === "blocked.example.com")
  }

  test("NULL host reads as clean ('') through both blocklist paths") {
    import spark.implicits._
    val hosts = Seq((1L, null.asInstanceOf[String]), (2L, "a.example.com"))
      .toDF("doc_id", "host")
    val viaLit = hosts.select(col("doc_id"),
        Url.blockedByLiteral(col("host"), Seq("example.com")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaJoin = Url.blockBySuffix(hosts, "host", Seq("example.com"),
        Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(viaLit == Map(1L -> "", 2L -> "example.com"))
    assert(viaJoin == viaLit)
  }

  test("suffix rules match on label boundaries only") {
    import spark.implicits._
    val hosts = Seq((1L, "example.com"), (2L, "a.example.com"),
      (3L, "notexample.com"), (4L, "example.com.evil.org"))
      .toDF("doc_id", "host")
    val got = Url.blockBySuffix(hosts, "host", Seq("example.com"), Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "example.com", 2L -> "example.com",
      3L -> "", 4L -> ""))
  }

  test("blockedByLiteral (stateless codegen) agrees with blockBySuffix (join)") {
    import spark.implicits._
    val hosts = Seq((1L, "example.com"), (2L, "a.example.com"),
      (3L, "notexample.com"), (4L, "cdn.media.s.example.com"), (5L, "com"))
      .toDF("doc_id", "host")
    val rules = Seq("example.com", "media.s.example.com", "com")
    val viaJoin = Url.blockBySuffix(hosts, "host", rules, Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val viaLit = hosts
      .select(col("doc_id"), Url.blockedByLiteral(col("host"), rules).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaLit == viaJoin)
    assert(viaLit(4L) === "media.s.example.com") // longest, not 'com'
    assert(viaLit(3L) === "com") // matches the TLD rule only, on the label
  }

  test("longest matching rule wins") {
    import spark.implicits._
    val hosts = Seq((1L, "cdn.media.s.example.com")).toDF("doc_id", "host")
    val got = Url.blockBySuffix(hosts, "host",
      Seq("example.com", "media.s.example.com"), Seq("doc_id"))
      .head.getString(2)
    assert(got === "media.s.example.com")
  }
}
