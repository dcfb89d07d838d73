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

  test("DecimalVecFold: exact fold matches a reference BigDecimal sum") {
    // reference: quantize each product at scale 18 (HALF_UP — the Spark
    // cast rule), sum exactly, round once to double
    val e = testdata("sf0.001", "embeddings").limit(50)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val df = testdata("sf0.001", "embeddings").limit(50)
    val got = df.select(col("vec_id"), Similarity.dot(col("embedding"), col("embedding")).as("d"))
      .as[(Long, Double)].collect().toMap
    e.foreach { case (id, v) =>
      var acc = java.math.BigDecimal.ZERO
      v.foreach { x =>
        val t = x.toDouble * x.toDouble
        acc = acc.add(java.math.BigDecimal.valueOf(t)
          .setScale(18, java.math.RoundingMode.HALF_UP))
      }
      assert(got(id) === acc.doubleValue(), s"vec $id")
    }
  }

  test("DecimalVecFold: distSq is exact and symmetric; NaN component yields NULL") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(4.0f, 6.0f)),
      (2L, Array(Float.NaN, 0.0f), Array(0.0f, 0.0f)))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
      Similarity.distSq(col("a"), col("b")).as("d"),
      Similarity.distSq(col("b"), col("a")).as("dr")).orderBy("id").collect()
    assert(rows(0).getAs[Double]("d") === 25.0) // 9 + 16
    assert(rows(0).getAs[Double]("dr") === 25.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("d")))
  }

  test("signSignature buckets are reproducible and dim-correct") {
    val planes = Similarity.planes(8, 4)
    assert(planes.length === 8 && planes.forall(_.length === 4))
    assert(planes.map(_.toSeq) === Similarity.planes(8, 4).map(_.toSeq)) // deterministic
    val df = Seq(Tuple1(Seq(1.0f, 2.0f, -1.0f, 0.5f))).toDF("v")
    val s1 = df.select(Similarity.signSignature(col("v"), planes)).as[String].head()
    assert(s1.length === 8 && s1.forall(c => c == '0' || c == '1'))
  }

  // ------------------------------------------------------------ MMR

  private def cosD(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x))
    val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x.toDouble * x))
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
  }

  /** Driver greedy MMR over the exact top-poolSize candidates. */
  private def refMmr(corpus: Seq[(Long, Array[Float])], q: (Long, Array[Float]),
      k: Int, lambda: Double, poolSize: Int): Seq[(Long, Int, Double)] = {
    val cands = corpus.filter(_._1 != q._1)
      .map { case (id, v) => (id, cosD(q._2, v), v) }
      .sortBy { case (id, s, _) => (-s, id) }.take(poolSize)
    val taken = Array.fill(cands.size)(false)
    val sel = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
    var rank = 1
    while (rank <= k && rank <= cands.size) {
      var (bi, bs) = (-1, Double.NegativeInfinity)
      for (i <- cands.indices if !taken(i)) {
        val div = if (sel.isEmpty) 0.0 else sel.map(s => cosD(cands(i)._3, s)).max
        val m = lambda * cands(i)._2 - (1.0 - lambda) * div
        if (m > bs) { bi = i; bs = m }
      }
      taken(bi) = true; sel += cands(bi)._3
      out += ((cands(bi)._1, rank, bs))
      rank += 1
    }
    out.toSeq
  }

  test("mmrTopK demotes near-duplicate candidates; lambda=1 is plain top-k") {
    // query q; a is nearest, b is a near-copy of a, c is diverse
    val corpus = Seq(
      (10L, Array(0.95f, 0.05f, 0f)),   // a
      (11L, Array(0.94f, 0.06f, 0f)),   // b ~ a
      (12L, Array(0.55f, 0.80f, 0.1f)), // c diverse
      (13L, Array(0.10f, 0.10f, 0.98f))) // d far from q
    val q = Seq((1L, Array(1f, 0f, 0f)))
    val cdf = corpus.toDF("vec_id", "embedding")
    val qdf = q.toDF("vec_id", "embedding")
    // pool = top-3 by relevance (a, b, c); at lambda 0.45 the near-dup b
    // loses its relevance edge to its ~0.9999 redundancy with a:
    //   mmr(b) = .45*.99797 - .55*.99994 = -0.1009
    //   mmr(c) = .45*.56352 - .55*.60580 = -0.0796  -> c picked second
    val diverse = Similarity.mmrTopK(cdf, qdf, "vec_id", "embedding",
        k = 2, lambda = 0.45, poolSize = 3)
      .select("neighbor_id", "mmr_rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(diverse.map(_._1).toSeq === Seq(10L, 12L),
      "second pick must be the diverse candidate, not the near-dup")
    val plain = Similarity.mmrTopK(cdf, qdf, "vec_id", "embedding",
        k = 3, lambda = 1.0, poolSize = 4)
      .select("neighbor_id", "mmr_rank").as[(Long, Int)].collect().sortBy(_._2)
    val topk = Similarity.bruteForceTopK(cdf, qdf, "vec_id", "embedding", k = 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(plain.map(_._1).toSeq === topk.map(_._1).toSeq,
      "lambda=1 must reduce to relevance ranking")
  }

  test("mmrTopK matches the driver greedy reference on a seeded corpus") {
    val rnd = new scala.util.Random(19)
    val corpus = (0 until 40).map { i =>
      (i.toLong, Array.fill(6)(rnd.nextFloat() * 2f - 1f)) }
    val queries = corpus.filter(_._1 < 4)
    val got = Similarity.mmrTopK(corpus.toDF("vec_id", "embedding"),
        queries.toDF("vec_id", "embedding"), "vec_id", "embedding",
        k = 5, lambda = 0.6, poolSize = 12)
      .select("query_id", "neighbor_id", "mmr_rank", "mmr_score")
      .as[(Long, Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(t => (t._2, t._3, t._4)).toSeq).toMap
    for ((qid, qv) <- queries) {
      val exp = refMmr(corpus, (qid, qv), k = 5, lambda = 0.6, poolSize = 12)
      assert(got(qid).map(_._1) === exp.map(_._1), s"selection for query $qid")
      got(qid).zip(exp).foreach { case ((_, _, gs), (_, _, es)) =>
        assert(math.abs(gs - es) < 1e-9, s"score for query $qid") }
    }
  }

  test("property: mmr scores are non-increasing in rank; lambda=1 ≡ top-k") {
    // in a NON-NEGATIVE similarity space (all components >= 0, so every
    // cosine >= 0) the diversity penalty is >= 0 and only grows as S
    // grows, and each step's winner came from a superset of the next
    // step's candidates — so the greedy's score sequence can never
    // increase. (With mixed-sign vectors a negative cosine turns the
    // penalty into a bonus and the invariant genuinely does not hold.)
    for (seed <- 21 to 24) {
      val rnd = new scala.util.Random(seed)
      val corpus = (0 until 30).map { i =>
        (i.toLong, Array.fill(5)(rnd.nextFloat())) }
      val cdf = corpus.toDF("vec_id", "embedding")
      val qdf = corpus.take(3).toDF("vec_id", "embedding")
      val out = Similarity.mmrTopK(cdf, qdf, "vec_id", "embedding",
          k = 6, lambda = 0.5, poolSize = 10)
        .select("query_id", "mmr_rank", "mmr_score")
        .as[(Long, Int, Double)].collect()
      for ((_, rows) <- out.groupBy(_._1)) {
        val scores = rows.sortBy(_._2).map(_._3)
        assert(scores.zip(scores.tail).forall { case (a, b) => b <= a },
          s"seed $seed: scores increased: ${scores.toSeq}")
      }
      val plain = Similarity.mmrTopK(cdf, qdf, "vec_id", "embedding",
          k = 6, lambda = 1.0, poolSize = 10)
        .select("query_id", "neighbor_id", "mmr_rank")
        .as[(Long, Long, Int)].collect().groupBy(_._1)
        .view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      val topk = Similarity.bruteForceTopK(cdf, qdf, "vec_id", "embedding", k = 6)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().groupBy(_._1)
        .view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      assert(plain === topk, s"seed $seed: lambda=1 diverged from top-k")
    }
  }

  test("mmrTopK with k beyond the pool returns the whole pool, ranks contiguous") {
    val corpus = (0 until 6).map(i => (i.toLong,
      Array(math.cos(i * 0.9).toFloat, math.sin(i * 0.9).toFloat)))
    val out = Similarity.mmrTopK(corpus.toDF("vec_id", "embedding"),
        corpus.take(1).toDF("vec_id", "embedding"), "vec_id", "embedding",
        k = 10, lambda = 0.5, poolSize = 10)
      .select("mmr_rank").as[Int].collect().sorted
    assert(out.toSeq === (1 to 5)) // 5 candidates (self excluded)
  }

  test("mmrRerank(bruteForceTopK(...)) is identical to mmrTopK(...)") {
    val rnd = new scala.util.Random(31)
    val corpus = (0 until 40).map { i =>
      (i.toLong, Array.fill(6)(rnd.nextFloat() * 2f - 1f)) }
    val cdf = corpus.toDF("vec_id", "embedding")
    val qdf = corpus.take(4).toDF("vec_id", "embedding")
    val direct = Similarity.mmrTopK(cdf, qdf, "vec_id", "embedding",
        k = 5, lambda = 0.6, poolSize = 12)
      .select("query_id", "neighbor_id", "mmr_rank", "mmr_score")
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3))
    val injected = Similarity.mmrRerank(
        Similarity.bruteForceTopK(cdf, qdf, "vec_id", "embedding", k = 12),
        cdf, "vec_id", "embedding", k = 5, lambda = 0.6)
      .select("query_id", "neighbor_id", "mmr_rank", "mmr_score")
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3))
    assert(injected.toSeq === direct.toSeq,
      "the injected-candidates path must be bit-identical to the brute convenience")
  }

  test("mmrRerank on an LSH shortlist: greedy runs over ONLY the injected pool") {
    val rnd = new scala.util.Random(47)
    val corpus = (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2f - 1f)) }
    val cdf = corpus.toDF("vec_id", "embedding")
    val qdf = corpus.take(3).toDF("vec_id", "embedding")
    val shortlist = Similarity.lshTopK(cdf, qdf, "vec_id", "embedding",
      k = 10, nBits = 4)
    val pool = shortlist.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val out = Similarity.mmrRerank(shortlist, cdf, "vec_id", "embedding",
        k = 4, lambda = 0.5)
      .select("query_id", "neighbor_id", "mmr_rank", "mmr_score")
      .as[(Long, Long, Int, Double)].collect()
    assert(out.nonEmpty)
    for ((q, rows) <- out.groupBy(_._1)) {
      // every selection came from the injected shortlist — never the corpus
      assert(rows.map(_._2).toSet.subsetOf(pool(q)),
        s"query $q selected outside its injected pool")
      val ranks = rows.map(_._3).sorted.toSeq
      assert(ranks === (1 to ranks.size), s"query $q ranks not contiguous")
      // per-query greedy vs the driver reference restricted to the shortlist
      val vecs = corpus.toMap
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) =>
          BigDecimal(x.toDouble) * BigDecimal(y.toDouble) }.sum.toDouble
        val na = math.sqrt(a.map(x => BigDecimal(x.toDouble) * BigDecimal(x.toDouble)).sum.toDouble)
        val nb = math.sqrt(b.map(x => BigDecimal(x.toDouble) * BigDecimal(x.toDouble)).sum.toDouble)
        dot / (na * nb)
      }
      val rel = shortlist.filter(col("query_id") === q)
        .select("neighbor_id", "cosine").as[(Long, Double)].collect().toMap
      val ordered = rel.toSeq.sortBy { case (id, c) => (-c, id) }.map(_._1)
      val expected = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (expected.size < 4 && expected.size < ordered.size) {
        val remaining = ordered.filterNot(expected.contains)
        // maxBy keeps the FIRST max; ordered is relevance-ranked, so
        // ties resolve to the earlier pool rank like the engine
        val best = remaining.maxBy { id =>
          val div = if (expected.isEmpty) 0.0
            else expected.map(s => cos(vecs(id), vecs(s))).max
          0.5 * rel(id) - 0.5 * div
        }
        expected += best
      }
      assert(rows.sortBy(_._3).map(_._2).toSeq === expected.toSeq,
        s"query $q greedy selection diverged from the shortlist reference")
    }
  }

  test("matryoshkaAudit: retained cosine is the exact prefix-norm ratio") {
    val df = Seq(
      (1L, Array(3f, 4f, 0f, 0f)),   // d=2 keeps everything -> 1.0
      (2L, Array(0f, 0f, 3f, 4f)),   // d=2 keeps nothing -> 0.0
      (3L, Array(1f, 1f, 1f, 1f)),   // d=2 -> sqrt(2)/2
      (4L, Array(0f, 0f, 0f, 0f)),   // zero norm -> drops
      (5L, Array(1f, 2f))).toDF("vec_id", "embedding") // ragged -> drops
    val got = Similarity.matryoshkaAudit(df, "vec_id", "embedding", Seq(2, 4))
      .select("dim", "n_vecs", "mean_retained", "min_retained")
      .as[(Int, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r3 = r9(math.sqrt(2.0) / 2.0)
    assert(got(2) === ((2, 3L, r9((1.0 + 0.0 + r3) / 3.0), 0.0)))
    assert(got(4) === ((4, 3L, 1.0, 1.0)), "full width retains everything")
  }

  test("embeddingCovariance: hand-computed covariance/correlation; zero variance yields NULL corr") {
    val df = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingCovariance(df, "vec_id", "embedding")
      .select("i", "j", "n_vecs", "cov", "corr")
      .as[(Int, Int, Long, Double, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // means 2/3 each; var = 2/3 - 4/9 = 2/9; cov01 = 1/3 - 4/9 = -1/9
    assert(got((0, 0)) === ((0, 0, 3L, 0.222222222, Some(1.0))))
    assert(got((1, 1)) === ((1, 1, 3L, 0.222222222, Some(1.0))))
    assert(got((0, 1)) === ((0, 1, 3L, -0.111111111, Some(-0.5))))
    assert(got.size === 3, "only i <= j cells")
    val flat = Similarity.embeddingCovariance(
        Seq((1L, Array(1f, 2f)), (2L, Array(1f, 3f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .select("i", "j", "cov", "corr")
      .as[(Int, Int, Double, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(flat((0, 0))._3 === 0.0)
    assert(flat((0, 0))._4 === None, "zero variance -> NULL corr, never NaN")
    assert(flat((0, 1))._4 === None)
    assert(flat((1, 1))._4 === Some(1.0))
  }

  test("embeddingCovariance: ragged vectors fill prefix cells; NULL elements count n but skip sums") {
    // ragged: vec 2 has only dim 0, so cells (0,1)/(1,1) see n_vecs = 1
    val ragged = Seq(
      (1L, Array(1f, 2f)), (2L, Array(3f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingCovariance(ragged, "vec_id", "embedding")
      .select("i", "j", "n_vecs", "cov")
      .as[(Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got((0, 0))._3 === 2L)
    assert(got((0, 1))._3 === 1L, "short vector contributes only cells it has")
    assert(got((1, 1))._3 === 1L)
    assert(got((1, 1))._4 === 0.0, "single-vector cell: zero variance")
    // NULL element: the cell still counts the vector (old count(lit(1))
    // semantics) but every sum touching the NULL side skips its term —
    // here dim 1 of vec 2 is NULL, so cell (1,1) sees n=2 with only
    // vec 1's contribution: mean-of-sums math over n=2
    val withNull = Seq(
      (1L, Array[java.lang.Float](1f, 2f)),
      (2L, Array[java.lang.Float](1f, null)))
      .toDF("vec_id", "embedding")
    val nn = Similarity.embeddingCovariance(withNull, "vec_id", "embedding")
      .select("i", "j", "n_vecs", "cov")
      .as[(Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(nn((1, 1))._3 === 2L, "NULL element still counts toward n_vecs")
    // only vec 1 contributes terms: sxy = 4e10, sx = sy = 2e10 over n=2
    // -> cov = (4 - 2*2/2)/2 = 1.0 (the old null-skipping-sum semantics)
    assert(nn((1, 1))._4 === 1.0)
    assert(nn((0, 0)) === ((0, 0, 2L, 0.0)), "identical dim-0 values: zero variance")
  }

  test("marginScore: hand ratio, hubness discount, NULL on missing neighborhoods") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)),  // the pair: cosine 1
      (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    // injected neighborhoods: side 1 is crowded (avg cos 0.9), side 2
    // sparse (avg cos 0.1) -> denom = 0.9/2 + 0.1/2 = 0.5 -> margin 2.0
    val nbrA = Seq((1L, 10L, 0.8), (1L, 11L, 1.0))
      .toDF("query_id", "neighbor_id", "cosine")
    val nbrB = Seq((2L, 10L, 0.1)).toDF("query_id", "neighbor_id", "cosine")
    val out = Similarity.marginScore(pairs, "id_a", "id_b",
        emb, "vec_id", "embedding", nbrA, nbrB)
      .select("cosine", "margin").as[(Double, Double)].head()
    assert(out._1 === 1.0)
    assert(out._2 === 2.0, "cos / (0.9/2 + 0.1/2)")
    // a side with NO neighborhood rows -> margin NULL, cosine kept
    val out2 = Similarity.marginScore(pairs, "id_a", "id_b",
        emb, "vec_id", "embedding", nbrA,
        nbrB.filter($"query_id" === -1L))
      .select("cosine", "margin").collect().head
    assert(out2.getDouble(0) === 1.0 && out2.isNullAt(1))
  }

  test("embeddingAlignment/Uniformity: hand geometry on the unit sphere") {
    // alignment: identical pair -> d2 = 0; orthogonal unit pair -> d2 = 2
    val emb = Seq(
      (0L, Array(3f, 0f)), (1L, Array(5f, 0f)),   // same direction: d2 = 0
      (2L, Array(0f, 2f)), (3L, Array(7f, 0f)),   // orthogonal: d2 = 2
      (4L, Array(0f, 0f)))                         // zero norm: drops
      .toDF("vec_id", "embedding")
    val pairs = Seq((0L, 1L), (2L, 3L), (2L, 4L)) // the zero-norm pair drops
      .toDF("id_a", "id_b")
    val al = Similarity.embeddingAlignment(
        pairs, "id_a", "id_b", emb, "vec_id", "embedding")
      .as[(Long, Double)].head()
    assert(al === ((2L, 1.0)), "mean of {0, 2} over the two surviving pairs")
    // uniformity: all vectors identical -> every pair term exp(0) = 1 ->
    // ln(mean) = 0 exactly, regardless of bucketing
    val same = Seq.tabulate(6)(i => (i.toLong, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val un = Similarity.embeddingUniformity(same, "vec_id", "embedding",
      nBuckets = 2).as[(Long, Double)].head()
    assert(un._1 > 0L && un._2 === 0.0)
    // nBuckets = 1 pairs everything: C(6,2) = 15 pairs
    val all = Similarity.embeddingUniformity(same, "vec_id", "embedding",
      nBuckets = 1).as[(Long, Double)].head()
    assert(all === ((15L, 0.0)))
    // orthogonal spread: pair terms exp(-4) -> uniformity = ln9(exp9(-4))
    val ortho = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val uo = Similarity.embeddingUniformity(ortho, "vec_id", "embedding",
      nBuckets = 1).as[(Long, Double)].head()
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(uo._1 === 1L && uo._2 === q9(math.log(q9(math.exp(-4.0)))))
  }

  test("recallAtK: exact hit counting, zero-row approx queries, self-recall 1.0") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 99L), (1L, 12L), (2L, 21L)) // q3 absent entirely
      .toDF("query_id", "neighbor_id")
    val out = Similarity.recallAtK(approx, exact)
      .select("query_id", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 2L, 2.0 / 3.0)))
    assert(out(2L) === ((2L, 2L, 1L, 0.5)))
    assert(out(3L) === ((3L, 1L, 0L, 0.0)), "a missed query is a 0-recall row, not absent")
    // an index compared against itself is perfect
    val self = Similarity.recallAtK(exact, exact)
      .select("recall").as[Double].collect()
    assert(self.forall(_ === 1.0))
  }

  // --------------------------------------------------------- kCenterSelect

  test("kCenterSelect: farthest-point-first on a hand line; reported dist is the max-min at pick time") {
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(10f, 0f)),
      (3L, Array(5f, 0f)), (4L, Array(0f, 1f))).toDF("id", "v")
    val got = Similarity.kCenterSelect(df, "id", "v", k = 4)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getInt(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(got.toList === List((1L, 1, -1.0), (2L, 2, 100.0), (3L, 3, 25.0), (4L, 4, 1.0)))
  }

  test("kCenterSelect: max-min distances are non-increasing; ids unique; k caps at n") {
    val e = testdata("sf0.001", "embeddings")
    val rows = Similarity.kCenterSelect(e, "vec_id", "embedding", k = 8)
      .orderBy("step").collect()
    assert(rows.length === 8)
    assert(rows.map(_.getLong(0)).distinct.length === 8)
    val dists = rows.drop(1).map(_.getDouble(2))
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b },
      s"greedy max-min must not increase: ${dists.toList}")
    // k > n returns all n
    val tiny = e.limit(3)
    assert(Similarity.kCenterSelect(tiny, "vec_id", "embedding", k = 10).count() === 3L)
  }

  test("embeddingAudit: bad/zero/ragged vectors counted per group; norm stats over healthy only") {
    val df = Seq(
      ("g1", Array(3f, 4f)),                  // norm 5
      ("g1", Array(0f, 0f)),                  // zero vector
      ("g1", Array(Float.NaN, 1f)),           // bad: NaN component
      ("g1", null.asInstanceOf[Array[Float]]),// bad: null vector
      ("g2", Array(1f, 0f, 0f))).toDF("g", "v")
    val rows = Similarity.embeddingAudit(df, "g", "v").orderBy("g").collect()
    val g1 = rows(0)
    assert(g1.getLong(1) === 4L && g1.getLong(2) === 2L && g1.getLong(3) === 1L)
    assert(g1.getLong(4) === 2L && g1.getLong(5) === 2L)
    assert(g1.getDouble(6) === 0.0 && g1.getDouble(7) === 5.0 && g1.getDouble(8) === 2.5)
    val g2 = rows(1)
    assert(g2.getLong(4) === 3L && g2.getDouble(8) === 1.0)
  }

  test("embeddingAudit: an all-bad group reports NULL norm stats, not zeros") {
    val df = Seq(("g", null.asInstanceOf[Array[Float]])).toDF("g", "v")
    val r = Similarity.embeddingAudit(df, "g", "v").head()
    assert(r.getLong(1) === 1L && r.getLong(2) === 1L)
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8))
  }

  test("kCenterSelect: argmax ties break to the smaller id; empty input yields empty output") {
    // 2 and 3 are equidistant from the seed 1; 2 must win
    val df = Seq((1L, Array(0f)), (2L, Array(4f)), (3L, Array(-4f))).toDF("id", "v")
    val got = Similarity.kCenterSelect(df, "id", "v", k = 2)
      .orderBy("step").collect().map(_.getLong(0)).toList
    assert(got === List(1L, 2L))
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "v")
    assert(Similarity.kCenterSelect(empty, "id", "v", k = 3).count() === 0L)
  }

  test("int8QuantizationError: exactly representable dims quantize losslessly") {
    // dim 0 values are multiples of max/127 = 1.0 -> codes land exactly
    val df = Seq(
      (1L, Array(127.0f, 0.3f)),
      (2L, Array(-64.0f, -0.1f)),
      (3L, Array(5.0f, 0.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.int8QuantizationError(df, "embedding")
      .orderBy(col("dim")).collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Double]("scale") === 1.0)
    assert(rows(0).getAs[Double]("mse") === 0.0)
    assert(rows(0).getAs[Double]("max_abs_err") === 0.0)
    // dim 1: scale = 0.3/127; errors bounded by scale/2
    val d1 = rows(1)
    assert(d1.getAs[Double]("max_abs_err") <= d1.getAs[Double]("scale") / 2 + 1e-15)
  }

  test("int8QuantizationError: all-zero dimension reports NULL scale, zero error") {
    val df = Seq((1L, Array(0.0f, 1.0f)), (2L, Array(0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.int8QuantizationError(df, "embedding")
      .orderBy(col("dim")).collect()
    assert(r(0).isNullAt(r(0).fieldIndex("scale")))
    assert(r(0).getAs[Double]("mse") === 0.0)
    assert(r(0).getAs[Long]("n") === 2L)
  }

  test("int8QuantizationError: codes clamp at ±127 (no overflow past max)") {
    // negative extreme defines max|x|; positive values quantize within range
    val df = Seq((1L, Array(-254.0f)), (2L, Array(253.9f))).toDF("vec_id", "embedding")
    val r = Similarity.int8QuantizationError(df, "embedding").head()
    assert(r.getAs[Double]("scale") === 2.0)
    // 253.9f/2 ~ 126.95 -> floor(+0.5) = 127 -> err = 253.9f - 127*2
    val expected = 254.0 - 253.9f.toDouble
    assert(math.abs(r.getAs[Double]("max_abs_err") - expected) < 1e-12)
  }

  test("DecimalVecFold: a NULL array element yields NULL, never a silent zero term") {
    // the old zip_with fold propagated element nulls into a NULL sum;
    // reading the slot raw would treat an undefined value as a zero term
    val df = spark.range(1).selectExpr(
      "array(cast(1.0 as float), cast(null as float), cast(2.0 as float)) as a",
      "array(cast(3.0 as float), cast(4.0 as float), cast(5.0 as float)) as b")
    val r = df.select(Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.distSq(col("a"), col("b")).as("s"),
      Similarity.dot(col("b"), col("b")).as("dense")).head()
    assert(r.isNullAt(r.fieldIndex("d")), "dot over a null element must be NULL")
    assert(r.isNullAt(r.fieldIndex("s")), "distSq over a null element must be NULL")
    assert(r.getAs[Double]("dense") === 50.0)
  }

  test("mutualNearestNeighbors: reciprocal 1-NN pairs only, one pair per doc") {
    // a<->b reciprocal; c's NN is b but b's NN is a, so c stays unpaired
    val df = Seq(
      ("a", Array(1.0f, 0.0f)),
      ("b", Array(0.95f, 0.31225f)),
      ("c", Array(0.0f, 1.0f))).toDF("id", "vec")
    val rows = Similarity.mutualNearestNeighbors(df, "id", "vec").collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("id_a") === "a")
    assert(rows(0).getAs[String]("id_b") === "b")
    assert(rows(0).getAs[Double]("cosine") > 0.9)
  }

  test("mutualNearestNeighbors: identical twins pair; empty input yields no rows") {
    val df = Seq(
      ("a", Array(1.0f, 0.0f)),
      ("b", Array(1.0f, 0.0f)),
      ("c", Array(-1.0f, 0.0f)),
      ("d", Array(-1.0f, 0.0f))).toDF("id", "vec")
    val got = Similarity.mutualNearestNeighbors(df, "id", "vec")
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(got === Set(("a", "b"), ("c", "d")))
    val empty = Seq.empty[(String, Array[Float])].toDF("id", "vec")
    assert(Similarity.mutualNearestNeighbors(empty, "id", "vec").count() === 0L)
  }
}
