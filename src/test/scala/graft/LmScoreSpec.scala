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

  test("scoreBigramKN: hand-computed interpolated KN on 'a b a c'") {
    // bigrams (a,b),(b,a),(a,c); c1(a)=2 n1f(a)=2, c1(b)=1 n1f(b)=1;
    // n1r: a=1,b=1,c=1; nbt=3; d=0.75
    // P(b|a) = 0.25/2 + (0.75*2/2)*(1/3) = 0.375
    // P(a|b) = 0.25/1 + (0.75*1/1)*(1/3) = 0.5
    // P(c|a) = 0.375; probabilities per context a sum to 1 with P(a|a)=0.25
    val docs = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val r = LmScore.scoreBigramKNSelf(docs, "doc_id", "text", vocabSize = 10)
      .head()
    assert(r.getAs[Long]("n_bigrams") === 3L)
    val expected = (math.rint(math.log(0.375) * 1e9) / 1e9 * 2 +
      math.rint(math.log(0.5) * 1e9) / 1e9) / 3.0
    assert(math.abs(r.getAs[Double]("avg_logp") - expected) < 1e-8,
      s"got ${r.getAs[Double]("avg_logp")} expected $expected")
  }

  test("scoreBigramKN: unseen context backs off to continuation; zero clamps to eps") {
    // train "a b": vocab {a,b}; score "c a": c -> <unk> (unseen context),
    // continuation a never follows anything in train -> pc=0 -> eps clamp
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val test = Seq((9L, "c a")).toDF("doc_id", "text")
    val r = LmScore.scoreBigramKN(test, "doc_id", "text", train, "text",
      vocabSize = 10).head()
    assert(r.getAs[Long]("n_bigrams") === 1L)
    // ln(1e-12) rounded to 9 dp
    assert(r.getAs[Double]("avg_logp") === -27.631021116)
  }

  test("scoreBigramKN: per-context probabilities sum to 1 over the seen type set") {
    val docs = Seq((1L, "x y x z x y")).toDF("doc_id", "text")
    // bigrams: xy, yx, xz, zx, xy -> c1(x)=3 {y:2,z:1}, c1(y)=1 {x}, c1(z)=1 {x}
    // n1r: y=1, x=2, z=1; nbt=4
    def p(c12: Double, c1: Double, n1f: Double, n1r: Double) =
      math.max(c12 - 0.75, 0.0) / c1 + (0.75 * n1f / c1) * (n1r / 4.0)
    val ctxX = p(2, 3, 2, 1) + p(1, 3, 2, 1) + p(0, 3, 2, 2) // y, z, x
    assert(math.abs(ctxX - 1.0) < 1e-12, s"context-x mass $ctxX")
  }

  test("conditionalEntropy: deterministic text is 0; hand-computed split context") {
    // "a b a b": pairs (a,b)x2, (b,a)x1 -> every context deterministic -> 0
    val det = Seq((1L, "g", "a b a b")).toDF("id", "src", "text")
    val r0 = LmScore.conditionalEntropy(det, "id", "text", "src").head()
    assert(r0.getAs[Long]("n_bigrams") === 3L)
    assert(r0.getAs[Double]("cond_entropy") === 0.0)
    // "x y x z": context x splits 50/50 -> H = (2/3)*ln2 with ln9 terms:
    // 2 * round9((1/3)*(-ln9 2)) = -0.462098120 -> 0.462098120
    val mix = Seq((1L, "g", "x y x z")).toDF("id", "src", "text")
    val r1 = LmScore.conditionalEntropy(mix, "id", "text", "src").head()
    assert(r1.getAs[Long]("n_bigrams") === 3L)
    assert(r1.getAs[Long]("n_contexts") === 2L)
    assert(r1.getAs[Long]("n_pairs") === 3L)
    assert(r1.getAs[Double]("cond_entropy") === 0.462098120)
    // bigrams never span documents: "p q" + "q r" share no (q,q) bridge
    val two = Seq((1L, "g", "p q"), (2L, "g", "q r")).toDF("id", "src", "text")
    val r2 = LmScore.conditionalEntropy(two, "id", "text", "src").head()
    assert(r2.getAs[Long]("n_bigrams") === 2L)
    assert(r2.getAs[Double]("cond_entropy") === 0.0)
  }

  test("minKProbAudit: k=100% reproduces avg_logp; k=20% takes ceil(0.2n) worst") {
    val docs = Seq(
      (1L, "a b a b a b c d e f"), // 9 bigrams, varied probabilities
      (2L, "a b a b a b a b a b"), // 9 bigrams, all high-probability
      (3L, "x")                    // < 2 tokens: absent
    ).toDF("doc_id", "text")
    val full = LmScore.scoreBigramSelf(docs, "doc_id", "text", vocabSize = 50)
      .select("doc_id", "n_bigrams", "avg_logp")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val all = LmScore.minKProbAuditSelf(docs, "doc_id", "text",
        kPercent = 100.0, vocabSize = 50)
      .select("doc_id", "n_bigrams", "n_mink", "min_k_logp")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // k=100: selection is every bigram -> identical to the plain mean
    assert(all.keySet === Set(1L, 2L))
    for (id <- Seq(1L, 2L)) {
      assert(all(id)._2 === full(id)._2 && all(id)._3 === full(id)._2)
      assert(all(id)._4 === full(id)._3)
    }
    val k20 = LmScore.minKProbAuditSelf(docs, "doc_id", "text",
        kPercent = 20.0, vocabSize = 50)
      .select("doc_id", "n_bigrams", "n_mink", "min_k_logp")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // ceil(0.2 * 9) = 2 worst bigrams per doc
    assert(k20(1L)._3 === 2L && k20(2L)._3 === 2L)
    // the worst-k mean can never exceed the full mean
    assert(k20(1L)._4 <= full(1L)._3 && k20(2L)._4 <= full(2L)._3)
    // the memorization signal: doc 2's WORST bigrams are still the high-
    // probability "a b"/"b a" loop, doc 1's worst are its one-off tail —
    // min-k separates them harder than the diluted full mean does
    assert(k20(2L)._4 > k20(1L)._4)
  }

  test("goodTuringCounts: hand-computed N_c table, Katz discounts, unseen mass") {
    // counts: a:3 b:2 c:2 d:1 e:1 f:1 -> N1=3 N2=2 N3=1, N=10
    val df = Seq(("a a a b b c"), ("c d e f")).toDF("text")
    val got = LmScore.goodTuringCounts(df, "text", kCutoff = 4)
      .select("c", "n_c", "n_next", "c_star", "p_mass")
      .as[(Long, Option[Long], Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, None, 3L, Some(0.3), None)),
      "the c=0 row carries the unseen mass N1/N")
    assert(got(1L) === ((1L, Some(3L), 2L, Some(2.0 * 2.0 / 3.0), Some(0.3))))
    assert(got(2L) === ((2L, Some(2L), 1L, Some(3.0 * 1.0 / 2.0), Some(0.4))))
    assert(got(3L) === ((3L, Some(1L), 0L, Some(0.0), Some(0.3))))
    // an empty frequency class has NULL c_star (0/0 must not become 0)
    assert(got(4L) === ((4L, Some(0L), 0L, None, Some(0.0))))
    assert(got.size === 5)
    // total assigned mass over the observed buckets is exactly 1
    assert(got.values.flatMap(_._5).sum === 1.0)
  }
}
