package graft

import graft.operators.Urls
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpecBase {
  import spark.implicits._

  private def host(u: String): String =
    Seq(Tuple1(u)).toDF("url").select(Urls.extractHost(col("url"))).head().getString(0)
  private def domain(u: String): String =
    Seq(Tuple1(u)).toDF("url").select(Urls.normalizedDomain(col("url"))).head().getString(0)

  test("extractHost strips scheme, userinfo, port, path, query, fragment") {
    assert(host("https://user:pw@WWW.Example.COM:8443/a/b?q=1#f") === "www.example.com")
    assert(host("http://ex.org/path") === "ex.org")
    assert(host("ftp://files.ex.net") === "files.ex.net")
    assert(host("ex.org/no-scheme") === "ex.org")   // schemeless
    assert(host("ex.org") === "ex.org")
    assert(host("") === "")
  }

  test("normalizedDomain drops exactly one leading www label") {
    assert(domain("https://www.ex.com/x") === "ex.com")
    assert(domain("https://www.www.ex.com") === "www.ex.com") // only the first
    assert(domain("https://wwwx.ex.com") === "wwwx.ex.com")   // not a www. label
  }

  test("domainCounts groups case-insensitively across url variants") {
    val df = Seq(
      "https://www.Ex.com/a", "http://ex.COM/b", "https://user@ex.com:80/c",
      "https://other.net/d").toDF("url")
    val out = Urls.domainCounts(df, "url").as[(String, Long)].collect().toMap
    assert(out === Map("ex.com" -> 3L, "other.net" -> 1L))
  }

  test("host extraction is narrow — no Exchange before the final rollup") {
    val df = Seq.tabulate(10)(i => s"https://www.site$i.com/p").toDF("url")
    val plan = df.select(Urls.normalizedDomain(col("url")).as("d"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // -------------------------------------------------------- canonicalizeUrl

  private def canon(s: String): String =
    Seq(Tuple1(s)).toDF("url").select(Urls.canonicalizeUrl(col("url"))).head().getString(0)

  test("canonicalizeUrl: scheme/host casefold, default-port strip, fragment strip, empty path -> /") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/One#frag") ===
      "https://www.example.com/Path/One")
    assert(canon("HTTP://Ex.com:80") === "http://ex.com/")
    assert(canon("https://ex.com") === "https://ex.com/")
    assert(canon("  https://ex.com/a  ") === "https://ex.com/a")
  }

  test("canonicalizeUrl: non-default ports, userinfo, and path case are preserved") {
    assert(canon("https://User@Ex.com:8443/A/B") === "https://User@ex.com:8443/A/B")
    assert(canon("http://ex.com:443/x") === "http://ex.com:443/x",
      "443 is only default for https")
  }

  test("canonicalizeUrl: tracking params drop, empties drop, survivors sort; bare ? disappears") {
    assert(canon("https://ex.com/p?b=2&utm_source=x&a=1&gclid=id&fbclid=f") ===
      "https://ex.com/p?a=1&b=2")
    assert(canon("https://ex.com/p?utm_campaign=c") === "https://ex.com/p")
    assert(canon("https://ex.com/p?") === "https://ex.com/p")
    assert(canon("https://ex.com/p?a=1&&b=2") === "https://ex.com/p?a=1&b=2")
    assert(canon("https://ex.com/p?utmx=keep") === "https://ex.com/p?utmx=keep",
      "only the utm_ PREFIX family drops")
  }

  test("canonicalizeUrl: permuted-param and mixed-case variants collapse to one canonical form") {
    val variants = Seq(
      "https://ex.com/item?a=1&b=2",
      "HTTPS://EX.com:443/item?b=2&a=1#sec",
      "https://ex.com/item?utm_medium=m&b=2&a=1")
    assert(variants.map(canon).distinct === Seq("https://ex.com/item?a=1&b=2"))
  }

  test("canonicalizeUrl: relative/garbage inputs pass through trimmed; null stays null") {
    assert(canon(" /relative/path?x=1 ") === "/relative/path?x=1")
    assert(canon("not a url") === "not a url")
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("url")
      .select(Urls.canonicalizeUrl(col("url"))).head()
    assert(r.isNullAt(0))
  }

  test("canonicalCounts merges crawl variants per resource") {
    val df = Seq(
      "https://ex.com/a?x=1&y=2",
      "HTTPS://ex.com:443/a?y=2&x=1&utm_source=s",
      "https://ex.com/b").toDF("url")
    val out = Urls.canonicalCounts(df, "url").as[(String, Long)].collect().toMap
    assert(out === Map("https://ex.com/a?x=1&y=2" -> 2L, "https://ex.com/b" -> 1L))
  }
}
