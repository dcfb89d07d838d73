package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine on known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(3.0f, 4.0f)))
      .toDF("a", "b", "c")
    val Array(orth, self, mixed) = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("a")),
      Similarity.cosine(col("a"), col("c"))).head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(orth) < 1e-12)
    assert(math.abs(self - 1.0) < 1e-12)
    assert(math.abs(mixed - 0.6) < 1e-12) // cos([1,0],[3,4]) = 3/5
  }

  test("bruteForceTopK ranks by cosine desc with id tie-break") {
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f)),
      (11L, Seq(0.9f, 0.1f)),
      (12L, Seq(0.0f, 1.0f)),
      (13L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 10L)
    val out = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(out === Seq(11L, 12L))
  }

  test("hardNegatives: filter-then-rank skips same-label near misses; null labels drop") {
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f), Integer.valueOf(1)),
      (11L, Seq(0.99f, 0.01f), Integer.valueOf(1)),   // nearest, but same label
      (12L, Seq(0.9f, 0.1f), Integer.valueOf(2)),     // top hard negative
      (13L, Seq(0.8f, 0.2f), null.asInstanceOf[Integer]), // null label: excluded
      (14L, Seq(0.0f, 1.0f), Integer.valueOf(3))
    ).toDF("vec_id", "embedding", "label")
    val queries = corpus.filter($"vec_id" === 10L)
    val out = Similarity.hardNegatives(corpus, queries, "vec_id", "embedding", "label", 2)
      .orderBy("rank")
      .select("neighbor_id", "neighbor_label", "rank").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(12L, 14L)) // 11 skipped, 13 dropped
    assert(out.map(_.getInt(1)).toSeq === Seq(2, 3))
    // ranks are contiguous from 1 after the label filter (filter BEFORE rank)
    assert(out.map(_.getInt(2)).toSeq === Seq(1, 2))
  }

  test("lshTopK recall vs brute force on real embeddings") {
    val e = testdata("sf0.001", "embeddings")
    val q = e.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val approx = pairs(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, nBits = 6))
    assert(approx.forall { case (a, b) => a != b })
    val recall = (exact & approx).size.toDouble / exact.size
    // deterministic planes -> deterministic recall; two-sided multi-probe
    // at 6 bits covers hamming<=2 of the signature space
    assert(recall >= 0.4, s"recall $recall")
  }

  test("ivfTopK recall vs brute force on real embeddings") {
    val e = testdata("sf0.001", "embeddings")
    val q = e.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val approx = pairs(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 6))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall")
  }

  test("zero-norm vectors never NaN-outrank real neighbors in any search path") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 0.0f))) // zero vector: cosine would be NaN, NaN sorts FIRST
      .toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 1)
    val out = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out === Set(2L)) // 3 excluded, never rank 1
    // a zero-norm QUERY yields no rows rather than NaN scores
    assert(Similarity.bruteForceTopK(corpus, corpus.filter($"vec_id" === 3),
      "vec_id", "embedding", 5).count() === 0)
  }

  test("pqEncode emits one in-range code per subspace plus the reconstruction norm") {
    val e = testdata("sf0.001", "embeddings")
    val books = Similarity.pqCodebooks(e, "vec_id", "embedding", m = 4, nCodes = 8)
    assert(books.size === 4 && books.forall(_.size === 8) && books.forall(_.forall(_.length === 16)))
    val enc = Similarity.pqEncode(e, "vec_id", "embedding", books)
    val rows = enc.select($"vec_id", $"pq_codes", $"pq_normsq").collect()
    assert(rows.length === e.count())
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length === 4 && codes.forall(c => c >= 0 && c < 8))
      // reconstruction norm = left-assoc sum of the coded centroids' |c|²
      val expect = codes.zipWithIndex
        .map { case (c, s) => books(s)(c).foldLeft(0.0)((a, x) => a + x.toDouble * x) }
        .reduce(_ + _)
      assert(r.getDouble(2) === expect)
    }
  }

  test("pqTopK recall vs brute force on real embeddings") {
    val e = testdata("sf0.001", "embeddings")
    val q = e.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    // trained books (2 Lloyd rounds) on these near-random synthetic
    // embeddings reach 0.78; untrained sampled books only 0.64 — both
    // deterministic (md5 init, no RNG), so exact thresholds are stable
    val approx = pairs(Similarity.pqTopK(e, q, "vec_id", "embedding", 5,
      m = 8, nCodes = 32, refineFactor = 8, trainIters = 2))
    assert(approx.forall { case (a, b) => a != b })
    assert(approx.size === exact.size)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
    val untrained = pairs(Similarity.pqTopK(e, q, "vec_id", "embedding", 5,
      m = 8, nCodes = 32, refineFactor = 8))
    assert(recall >= (exact & untrained).size.toDouble / exact.size,
      "training must not hurt recall on this fixture")
  }

  test("ivf-pq: coarse cells cut the ADC scan and still recall against brute force") {
    val e = testdata("sf0.001", "embeddings")
    val q = e.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val ivfpq = Similarity.pqTopK(e, q, "vec_id", "embedding", 5,
      m = 8, nCodes = 32, refineFactor = 8, trainIters = 2,
      coarseCells = 8, nProbe = 4)
    val approx = pairs(ivfpq)
    assert(approx.forall { case (a, b) => a != b })
    // probing 4 of 8 cells scans ~half the index; deterministic recall
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall")
    // the candidate join really is cell-keyed, not a cross join
    val plan = ivfpq.queryExecution.optimizedPlan.toString
    assert(plan.contains("__cell"), plan)
  }

  test("native FloatArrayDot matches the decimal dot within 1e-9 on real data") {
    val e = testdata("sf0.001", "embeddings").limit(100)
    val both = e.select(
      graft.functions.FloatArrayDot.dot(col("embedding"), col("embedding")).as("fast"),
      Similarity.dot(col("embedding"), col("embedding")).as("exact"))
    val maxDiff = both.select(max(abs(col("fast") - col("exact")))).as[Double].head()
    assert(maxDiff < 1e-9, s"maxDiff $maxDiff")
  }

  test("signSignature buckets are reproducible and dim-correct") {
    val planes = Similarity.planes(8, 4)
    assert(planes.length === 8 && planes.forall(_.length === 4))
    assert(planes.map(_.toSeq) === Similarity.planes(8, 4).map(_.toSeq)) // deterministic
    val df = Seq(Tuple1(Seq(1.0f, 2.0f, -1.0f, 0.5f))).toDF("v")
    val s1 = df.select(Similarity.signSignature(col("v"), planes)).as[String].head()
    assert(s1.length === 8 && s1.forall(c => c == '0' || c == '1'))
  }
}
