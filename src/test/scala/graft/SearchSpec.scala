package graft

import graft.operators.{Dedup, Search}
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffle join spark spark"), // tf(spark)=3, short
    (2L, "spark join " + Seq.fill(50)("filler").mkString(" ")), // tf(spark)=1, long
    (3L, "hash aggregation pipeline"), // no query terms
    (4L, "spark"), // tf=1, shortest
    (5L, "join join join join")).toDF("doc_id", "text")

  test("bm25TopK ranks higher-tf and shorter docs first, k bounds output") {
    val queries = Seq((10, "spark")).toDF("qid", "qtext")
    val out = Search.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 10)
      .orderBy($"rank")
    val ranked = out.select("doc_id").as[Long].collect().toSeq
    // docs 1, 2, 4 contain "spark"; doc 1 (tf=3, short) beats doc 4 (tf=1,
    // shortest) beats doc 2 (tf=1, much longer than average)
    assert(ranked === Seq(1L, 4L, 2L))
    assert(out.select("rank").as[Int].collect().toSeq === Seq(1, 2, 3))
    // k truncates
    assert(Search.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 1)
      .count() === 1)
  }

  test("bm25TopK: multi-term queries sum per-term contributions; no-match queries vanish") {
    val queries = Seq((1, "spark join"), (2, "zebra unicorn")).toDF("qid", "qtext")
    val out = Search.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 10)
    assert(out.filter($"qid" === 2).count() === 0)
    // doc 1 matches both terms and must beat every single-term match
    assert(out.filter($"qid" === 1).orderBy($"rank").select("doc_id")
      .as[Long].head() === 1L)
    // repeated query terms do not double-count: same result set and scores
    val dup = Seq((1, "spark spark join")).toDF("qid", "qtext")
    val a = out.filter($"qid" === 1).select("doc_id", "score", "rank")
    val b = Search.bm25TopK(corpus, "doc_id", "text", dup, "qid", "qtext", k = 10)
      .select("doc_id", "score", "rank")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("bm25TopK idfRoundDp changes scores by <1e-9 and never the ranking") {
    val queries = Seq((1, "spark join filler")).toDF("qid", "qtext")
    val full = Search.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 10)
    val rounded = Search.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext",
      k = 10, idfRoundDp = Some(9))
    val j = full.as("f").join(rounded.as("r"), Seq("qid", "doc_id"))
    assert(j.filter(abs($"f.score" - $"r.score") > 1e-8).count() === 0)
    assert(j.filter($"f.rank" =!= $"r.rank").count() === 0)
  }

  test("bm25TopK guard rails") {
    val queries = Seq((1, "spark")).toDF("qid", "qtext")
    intercept[IllegalArgumentException] {
      Search.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 0)
    }
    intercept[IllegalArgumentException] {
      Search.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 5, b = 1.5)
    }
  }

  test("moreLikeThis ranks docs sharing rarer terms first and excludes self") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"), // shares 2 terms with doc 1
      (3L, "alpha zzz yyy"), // shares only the common term
      (4L, "qqq rrr sss")) // shares nothing
      .toDF("doc_id", "text")
    val targets = Seq(Tuple1(1L)).toDF("doc_id")
    val out = Search.moreLikeThis(docs, "doc_id", "text", targets, k = 10)
      .orderBy($"rank")
      .select("doc_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.map(_._1).forall(_ === 1L))
    assert(out.map(_._2) === Seq(2L, 3L)) // doc 4 shares no term; self excluded
    // a target with no shared terms yields no rows
    val lonely = Search.moreLikeThis(docs, "doc_id", "text",
      Seq(Tuple1(4L)).toDF("doc_id"), k = 5)
    assert(lonely.count() === 0)
  }

  test("moreLikeThis large-target fallback drops the broadcast, same answer") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "alpha zzz yyy"),
      (4L, "qqq rrr sss")).toDF("doc_id", "text")
    val targets = Seq(Tuple1(1L), Tuple1(2L)).toDF("doc_id")
    def run(maxBc: Long) =
      Search.moreLikeThis(docs, "doc_id", "text", targets, k = 10,
          maxBroadcastTargets = maxBc)
        .select("doc_id", "neighbor_id", "rank")
        .orderBy("doc_id", "rank").as[(Long, Long, Int)].collect().toSeq
    val viaBroadcast = run(100000L)
    val viaShuffle = run(0L) // every target set exceeds 0 -> shuffle path
    assert(viaShuffle === viaBroadcast && viaShuffle.nonEmpty)
    // the fallback plan really contains no broadcast of the target side
    val plan = Search.moreLikeThis(docs, "doc_id", "text", targets, k = 10,
      maxBroadcastTargets = 0L).queryExecution.optimizedPlan.toString
    assert(!plan.contains("ResolvedHint"), plan)
  }

  test("dupNgramCoverage counts cross-doc shared n-grams, not within-doc repeats") {
    val docs = Seq(
      (1L, "a b c d"), // grams: "a b","b c","c d"
      (2L, "a b c e"), // shares "a b","b c" with doc 1
      (3L, "x y x y x y"), // within-doc repeated gram "x y"/"y x" shared with NOBODY
      (4L, "zz")).toDF("doc_id", "text") // < n tokens -> absent
    val out = Dedup.dupNgramCoverage(docs, "doc_id", "text", shingleN = 2)
      .orderBy("doc_id")
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byId(1L) === ((3L, 2L, 2.0 / 3.0)))
    assert(byId(2L) === ((3L, 2L, 2.0 / 3.0)))
    // doc 3 has DISTINCT grams {"x y","y x"}; repeats within one doc are
    // not duplicates across the corpus
    assert(byId(3L) === ((2L, 0L, 0.0)))
  }

  test("topTermsPerDoc: rare repeated terms outrank ubiquitous ones; minDf prunes hapaxes") {
    val docs = Seq(
      (1L, "spark spark spark the the common"),
      (2L, "duck duck the common"),
      (3L, "the common goose"),
      (4L, "the common spark")).toDF("doc_id", "text")
    // df: the=4, common=4, spark=2, duck=1, goose=1
    val out = Search.topTermsPerDoc(docs, "doc_id", "text", k = 2, minDf = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // doc 1: spark (tf=3, rare) must beat the/common (ubiquitous, idf 0)
    assert(out.filter(_._1 == 1L).map(_._2).head === "spark")
    // doc 2: duck pruned by minDf=2 -> top terms come from {the, common}
    assert(!out.filter(_._1 == 2L).map(_._2).contains("duck"))
    // every doc has at most k rows, ranks contiguous from 1
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length))
    }
    intercept[IllegalArgumentException] {
      Search.topTermsPerDoc(docs, "doc_id", "text", k = 0)
    }
  }

  test("rrfFuse: consensus items out-rank single-ranking items; exact scores") {
    import spark.implicits._
    // ranking A: items 10,11,12; ranking B: items 12,11,13 — item 11
    // (ranks 2+2) and 12 (3+1) both beat every single-list item
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "item_id", "rank")
    val b = Seq((1L, 12L, 1), (1L, 11L, 2), (1L, 13L, 3))
      .toDF("query_id", "item_id", "rank")
    val out = Search.rrfFuse(Seq(a, b), k = 10)
      .select("item_id", "n_rankings", "rrf_score", "fused_rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.map(_._1).toSeq === Seq(12L, 11L, 10L, 13L))
    assert(out.map(_._2).toSeq === Seq(2L, 2L, 1L, 1L))
    def rr(ranks: Int*): Double = ranks.map(r =>
      BigDecimal(1.0 / (r + 60.0)).setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(math.abs(out(0)._3 - rr(3, 1)) < 1e-15) // item 12
    assert(math.abs(out(1)._3 - rr(2, 2)) < 1e-15) // item 11
  }

  test("rrfFuse: a single ranking round-trips its own order; ranks contiguous per query") {
    import spark.implicits._
    val a = Seq((1L, 5L, 1), (1L, 6L, 2), (1L, 7L, 3),
      (2L, 8L, 1), (2L, 9L, 2)).toDF("query_id", "item_id", "rank")
    val out = Search.rrfFuse(Seq(a), k = 10)
      .select("query_id", "item_id", "fused_rank")
      .as[(Long, Long, Int)].collect()
    val byQ = out.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(byQ === Map(1L -> Seq(5L, 6L, 7L), 2L -> Seq(8L, 9L)))
    intercept[IllegalArgumentException] { Search.rrfFuse(Nil, k = 5) }
    intercept[IllegalArgumentException] {
      Search.rrfFuse(Seq(a.drop("rank")), k = 5) }
  }
}
