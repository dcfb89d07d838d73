package graft

import graft.core.{MagicTable, TableGraph}
import graft.operators.Chain
import graft.sources.{ApiSource, FileFetcher}
import org.apache.spark.sql.functions._

/** Golden end-to-end replay of the reference's only executable verification
  * artifact (/root/reference/example.ipynb cell-0): TMDb popular page ->
  * per-row detail chain -> NL transform "top 5 unique by id". Shapes pinned
  * by FIXTURES.md §B: ingest 20x17, chain 209x31, transform 5x7.
  */
class GoldenReplaySpec extends SparkSpecBase {
  import spark.implicits._

  private val fixtures = new java.io.File("src/test/resources/graft/fixtures").getAbsolutePath
  private def fetcher = new FileFetcher(fixtures)

  private def freshGraph = new TableGraph(
    java.nio.file.Files.createTempDirectory("graft_golden_wh").toString)

  test("ingest: popular page flattens to 20 rows x 17 cols with dotted names") {
    val mt = MagicTable.fromSource(spark,
      ApiSource("https://api.tmdb.example/movie/popular"), fetcher, freshGraph)
    assert(mt.count() === 20)
    assert(mt.columns.length === 17)
    assert(mt.columns.contains("results.id") && mt.columns.contains("page"))
    // scalar page fields replicate onto every movie row (utils.py:49-53)
    assert(mt.df.select("page").distinct().as[Long].collect().toSeq === Seq(1L))
    // genre_ids stays an array VALUE (one level only, utils.py semantics)
    assert(mt.df.schema("results.genre_ids").dataType.typeName === "array")
  }

  test("chain: 20 detail URLs fan out to the golden 209 x 31") {
    val mt = MagicTable.fromSource(spark,
      ApiSource("https://api.tmdb.example/movie/popular"), fetcher, freshGraph)
    // {id} resolves to results.id via the suffix rule (C4); movie 120 has
    // no fixture -> retries exhaust -> one all-null api_* row kept
    val (out, keys) = Chain(mt.df, "https://api.tmdb.example/movie/{id}",
      fetcher, maxSleepMs = 0)
    assert(keys === Seq("results.id"))
    assert(out.count() === 209)
    assert(out.columns.length === 31)
    assert(out.columns.count(_.startsWith("api_")) === 14)
    assert(out.columns.contains("api_genres.name") &&
      out.columns.contains("api_belongs_to_collection.name"))
    // the failed movie keeps exactly one row, all api_* null
    val failed = out.filter(col("`results.id`") === 120)
    assert(failed.count() === 1)
    assert(failed.filter(col("`api_id`").isNull && col("`api_genres.name`").isNull).count() === 1)
    // key-union: movies whose response lacked "tagline" read null there
    assert(out.filter(col("`results.id`") === 101)
      .filter(col("`api_tagline`").isNull).count() > 0)
    // fan-out multiplicity: movie 119 flattened to 10 rows, others to 11
    val c119 = out.filter(col("`results.id`") === 119).count()
    val c101 = out.filter(col("`results.id`") === 101).count()
    assert(c119 === 10 && c101 === 11)
  }

  test("transform: top 5 unique by id -> 5 rows x 7 cols, date coerced") {
    val graph = freshGraph
    val mt = MagicTable.fromSource(spark,
      ApiSource("https://api.tmdb.example/movie/popular"), fetcher, graph)
    val (chained, _) = Chain(mt.df, "https://api.tmdb.example/movie/{id}",
      fetcher, maxSleepMs = 0)
    val table = MagicTable.fromDataFrame(chained, "popular_chained", graph)
    val out = table.transform(
      "parse results.release_date as date, then top 5 unique by results.id " +
        "by results.vote_average desc showing results.id, results.title, " +
        "results.release_date, results.vote_average, results.popularity, " +
        "results.vote_count and results.original_language")
    val rows = out.df.collect()
    assert(rows.length === 5 && out.columns.length === 7)
    // highest vote_averages are ids 101..105 (strictly decreasing fixture)
    assert(out.df.select("`results.id`").as[Long].collect().toSet ===
      Set(101L, 102L, 103L, 104L, 105L))
    // movie 103's "not-a-date" release_date coerced to null, others parsed
    assert(out.df.schema("results.release_date").dataType.typeName === "timestamp")
    assert(out.df.filter(col("`results.release_date`").isNull).count() === 1)
    // lineage recorded (C13)
    assert(graph.getChains("popular_chained").exists(_.chainType === "transform"))
  }

  test("chain(other: MagicTable): the notebook call shape, template from other's source") {
    val graph = freshGraph
    val mt = MagicTable.fromSource(spark,
      ApiSource("https://api.tmdb.example/movie/popular"), fetcher, graph)
    // the reference derives the template from the OTHER table's last source
    // (magictable.py:210-219) — the user never restates the URL
    val details = new MagicTable(mt.df, "movie_details",
      Seq(ApiSource("https://api.tmdb.example/movie/{id}")), graph)
    val out = mt.chain(details, fetcher, None, None)
    assert(out.count() === 209)
    assert(out.df.columns.count(_.startsWith("api_")) === 14)
    // merged lineage: both the popular source and the detail template
    assert(out.sources.map(_.getIdentifier).toSet ===
      Set("https://api.tmdb.example/movie/popular", "https://api.tmdb.example/movie/{id}"))
    // whole-chain result registered + fresh (C14 cache posture)
    assert(graph.isFresh(out.name))
  }
}
