package graft

import graft.operators.LmScore
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the hat"),
    (3L, "zq xv qqq zzz pppp wwww"), // gibberish: no shared bigrams
    (4L, "the cat"),
    (5L, "one"), // single token: no bigrams
    (6L, "")
  ).toDF("doc_id", "text")

  test("fluent text under the corpus LM outscores gibberish") {
    val s = LmScore.scoreBigramSelf(docs, "doc_id", "text", vocabSize = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s.contains(1L) && s.contains(3L))
    assert(s(1L) > s(3L), s"fluent ${s(1L)} should beat gibberish ${s(3L)}")
    // docs without bigrams are absent (inner semantics)
    assert(!s.contains(5L) && !s.contains(6L))
  }

  test("hand-checked probabilities on a tiny corpus") {
    val tiny = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = LmScore.scoreBigramSelf(tiny, "doc_id", "text", vocabSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // bigrams: (a,b) x2, (a,c) x1; c(a)=3; types {a,b,c} -> V=3
    // P(b|a) = (2+1)/(3+3) = 0.5 ; P(c|a) = (1+1)/(3+3) = 1/3
    val pAB = BigDecimal(math.log(0.5)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAC = BigDecimal(math.log(1.0 / 3.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSet === Set((1L, 1L, pAB), (2L, 1L, pAB), (3L, 1L, pAC)))
  }

  test("vocabulary cut maps tail tokens to <unk>, changing nothing else") {
    // vocabSize 1 keeps only "the"; everything else becomes <unk> but every
    // doc still has the same bigram COUNT
    val full = LmScore.scoreBigramSelf(docs, "doc_id", "text", vocabSize = 100)
      .select("doc_id", "n_bigrams").as[(Long, Long)].collect().toMap
    val cut = LmScore.scoreBigramSelf(docs, "doc_id", "text", vocabSize = 1)
      .select("doc_id", "n_bigrams").as[(Long, Long)].collect().toMap
    assert(full === cut)
  }

  test("cross-corpus scoring: training distribution ranks held-out docs") {
    val train = Seq.tabulate(50)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val heldOut = Seq((100L, "the cat sat"), (101L, "mat the on zzz"))
      .toDF("doc_id", "text")
    val s = LmScore.scoreBigram(heldOut, "doc_id", "text", train, "text",
        vocabSize = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(100L) > s(101L), s"in-distribution ${s(100L)} vs scrambled ${s(101L)}")
  }

  test("guard rails") {
    intercept[IllegalArgumentException] {
      LmScore.topVocab(docs, "text", 0)
    }
    intercept[IllegalArgumentException] {
      LmScore.scoreBigramSelf(docs.withColumn("__w1", lit(1)), "doc_id", "text")
    }
    intercept[IllegalArgumentException] {
      LmScore.scoreBigramSelf(docs, "doc_id", "text", logRoundDp = 0)
    }
  }
}
