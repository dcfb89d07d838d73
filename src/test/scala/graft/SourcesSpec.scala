package graft

import graft.sources._

/** Source identity + fetch contracts (reference sources.py; id contract
  * sources.py:32-39 — MD5 of sorted-keys JSON, stable under reordering). */
class SourcesSpec extends SparkSpecBase {

  test("source id is deterministic under param-key reordering") {
    val a = ApiSource("http://x/y", Map("b" -> 2, "a" -> 1))
    val b = ApiSource("http://x/y", Map("a" -> 1, "b" -> 2))
    assert(a.getId === b.getId)
    assert(a.getId !== ApiSource("http://x/y", Map("a" -> 1, "b" -> 3)).getId)
  }

  test("RawSource id depends only on data") {
    val a = RawSource(Seq(Map("x" -> 1), Map("x" -> 2)))
    val b = RawSource(Seq(Map("x" -> 1), Map("x" -> 2)))
    assert(a.getId === b.getId)
  }

  test("ApiSource flattens the JSON body; non-2xx raises") {
    val f = new MapFetcher(Map(
      "http://api/items" -> """[{"id":1,"tags":["a","b"]},{"id":2}]"""))
    val rows = ApiSource("http://api/items").fetchRows(f)
    assert(rows.size === 3) // id=1 fans out over tags, id=2 single
    intercept[RuntimeException] {
      ApiSource("http://api/missing").fetchRows(f)
    }
  }

  test("WebSource is the reference's stub: one row {content: body}") {
    val f = new MapFetcher(Map("http://page" -> "<html>hi</html>"))
    val rows = WebSource("http://page").fetchRows(f)
    assert(rows === Seq("""{"content":"<html>hi</html>"}"""))
  }

  test("PdfSource: one row per page (form-feed or JSON-array fixture)") {
    val f = new MapFetcher(Map(
      "http://doc.pdf" -> "page one\fpage two",
      "http://doc2.pdf" -> """["p1","p2","p3"]"""))
    assert(PdfSource("http://doc.pdf").fetchRows(f).size === 2)
    assert(PdfSource("http://doc2.pdf").fetchRows(f).size === 3)
  }

  test("GenerativeSource offline generator: page grids and date ranges") {
    val f = new MapFetcher(Map.empty)
    assert(GenerativeSource("fetch pages 1 to 4 of the api").fetchRows(f).size === 4)
    assert(GenerativeSource("dates from 2024-01-01 to 2024-01-03").fetchRows(f).size === 3)
    assert(GenerativeSource("something else").fetchRows(f).size === 1)
  }

  test("fetchWithRetry returns None after exhausting attempts (all-null row path)") {
    val f = new MapFetcher(Map.empty, alwaysFail = Set("http://down"))
    assert(f.fetchWithRetry("http://down", maxSleepMs = 0).isEmpty)
  }

  test("MagicTable.fromSource caches by source id") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_test_wh").toString
    val graph = new graft.core.TableGraph(tmp)
    val src = RawSource(Seq(Map("x" -> 1), Map("x" -> 2)))
    val t1 = graft.core.MagicTable.fromSource(spark, src, new MapFetcher(Map.empty), graph)
    assert(t1.count() === 2)
    assert(graph.getNode(src.getId).isDefined)
    val t2 = graft.core.MagicTable.fromSource(spark, src, new MapFetcher(Map.empty), graph)
    assert(t2.count() === 2) // served from the warehouse, no re-fetch
  }
}
