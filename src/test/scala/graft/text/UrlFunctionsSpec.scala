package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UrlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def dom(host: String): String =
    Seq(host).toDF("h")
      .select(UrlFunctions.registrableDomain($"h")).as[String].head()

  test("registrableDomain: plain, multi-part-suffix, bare, IP, null") {
    assert(dom("news.example.com") == "example.com")
    assert(dom("a.b.c.example.org") == "example.org")
    assert(dom("shop.acme.co.uk") == "acme.co.uk")
    assert(dom("weird.deep.site.co.jp") == "site.co.jp")
    assert(dom("example.com.au") == "example.com.au")
    assert(dom("CASE.Example.COM") == "example.com") // lowercased
    assert(dom("example.com") == "example.com")      // already eTLD+1
    assert(dom("co.uk") == "co.uk")                  // bare suffix, 2 labels
    assert(dom("localhost") == "localhost")
    assert(dom("192.168.10.1") == "192.168.10.1")    // IPv4 passthrough
    val n = Seq(Option.empty[String]).toDF("h")
      .select(UrlFunctions.registrableDomain($"h")).head()
    assert(n.isNullAt(0))
  }

  test("url part extraction via parse_url") {
    val u = Seq("HTTPS://News.Example.com/a/b?q=1").toDF("u")
    val r = u.select(UrlFunctions.urlProtocol($"u"), UrlFunctions.urlHost($"u"),
      UrlFunctions.urlPath($"u"), UrlFunctions.urlDomain($"u")).head()
    assert(r.getString(0) == "https" && r.getString(1) == "news.example.com")
    assert(r.getString(2) == "/a/b" && r.getString(3) == "example.com")
  }

  test("domainProfile aggregates per registrable domain, blocklist drops eTLD+1-wide") {
    val df = Seq(
      "https://a.x.com/1", "https://b.x.com/2", "https://x.com/3",
      "https://y.org/4", "https://bad.com/5", "https://sub.bad.com/6")
      .toDF("url")
    val prof = UrlFunctions.domainProfile(df, "url")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prof == Map("x.com" -> 3L, "y.org" -> 1L, "bad.com" -> 2L))
    val kept = UrlFunctions.filterBlockedDomains(df, "url", Seq("bad.com"))
    assert(kept.count() == 4) // both bad.com subdomain rows dropped
    assert(UrlFunctions.filterBlockedDomains(df, "url", Nil).count() == 6)
  }

  test("domainQuota caps per domain deterministically") {
    val df = (1L to 100L).map(i =>
      (i, s"https://host${i % 3}.example${i % 3}.com/p/$i")).toDF("id", "url")
    val out = UrlFunctions.domainQuota(df, "url", n = 4, "id", salt = "t")
    assert(out.count() == 12) // 3 domains x 4
    assert(out.columns.toSeq == Seq("id", "url")) // helper column dropped
    val again = UrlFunctions.domainQuota(df.repartition(7), "url", 4, "id", "t")
    assert(out.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)
  }
}
