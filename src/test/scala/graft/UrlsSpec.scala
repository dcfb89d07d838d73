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
}
