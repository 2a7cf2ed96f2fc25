package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(s: String): String =
    Seq(Tuple1(s)).toDF("u").select(Urls.canonicalizeUrl(col("u"))).as[String].head()

  test("canonicalizeUrl: each step and their compositions") {
    // lowercase scheme/host only; path+query case preserved
    assert(canon("HTTPS://ExAmple.COM/Path?Q=Az") == "https://example.com/Path?Q=Az")
    // default ports stripped, non-default kept, even with nothing after
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:443") == "https://a.com")
    assert(canon("https://a.com:8443/x") == "https://a.com:8443/x")
    // http:443 and https:80 are NOT default — preserved
    assert(canon("http://a.com:443/x") == "http://a.com:443/x")
    // fragment dropped before anything else
    assert(canon("https://a.com/x#sec?fake=1") == "https://a.com/x")
    // CONSECUTIVE tracking params all stripped (the regex-rescan trap)
    assert(canon("https://a.com/x?utm_a=1&utm_b=2&utm_c=3&keep=4")
      == "https://a.com/x?keep=4")
    // all params stripped -> the '?' goes too
    assert(canon("https://a.com/x?gclid=1&fbclid=2&utm_z=3") == "https://a.com/x")
    // valueless tracking params
    assert(canon("https://a.com/x?gclid&keep=1") == "https://a.com/x?keep=1")
    // a param NAMED like a prefix of a keeper stays
    assert(canon("https://a.com/x?utmost=1") == "https://a.com/x?utmost=1")
    // no scheme: trim + fragment only, nothing to lowercase
    assert(canon("  Not A Url#frag  ") == "Not A Url")
    assert(canon("") == "")
  }

  test("urlHost + registrableDomainApprox + blocklist subdomain semantics") {
    val df = Seq(
      (1L, "https://News.Example.COM:8443/a"),
      (2L, "http://example.com/x"),
      (3L, "https://no-dot-host/x"),
      (4L, "https://keep.example.org/x"),
      (5L, "plain string")).toDF("id", "url")
    assert(df.select(col("id"), Urls.urlHost(col("url")).as("h"))
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "news.example.com", 2L -> "example.com", 3L -> "no-dot-host",
        4L -> "keep.example.org", 5L -> ""))
    assert(df.select(col("id"),
      Urls.registrableDomainApprox(Urls.urlHost(col("url"))).as("d"))
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "example.com", 2L -> "example.com", 3L -> "no-dot-host",
        4L -> "example.org", 5L -> ""))
    // blocklist drops the domain AND its subdomains, nothing else (a
    // no-scheme row has host '' and must survive)
    val kept = Urls.filterBlockedDomains(df, "url",
        Seq("example.com").toDF("domain"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L), s"blocklist semantics: $kept")
  }
}
