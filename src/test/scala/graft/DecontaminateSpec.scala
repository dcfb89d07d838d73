package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpecBase {
  import spark.implicits._

  private val bench = Seq(
    Tuple1("the quick brown fox jumps over the lazy dog")).toDF("question")

  test("overlapReport counts distinct shared shingles; clean docs are absent") {
    val docs = Seq(
      (1L, "he said the quick brown fox jumps high today"), // shares 3-grams
      (2L, "completely unrelated text about sparks and rivers"),
      (3L, "the quick brown fox jumps over the lazy dog")    // full overlap
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlapReport(docs, "doc_id", "text", bench, "question",
        shingleN = 3)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the quick brown", "quick brown fox", "brown fox jumps"
    assert(got === Map(1L -> 3L, 3L -> 7L)) // bench has 7 distinct 3-grams
  }

  test("duplicate shingles within a doc count once (DISTINCT semantics)") {
    val docs = Seq((1L, "the quick brown fox the quick brown fox")).toDF("doc_id", "text")
    val got = Decontaminate.overlapReport(docs, "doc_id", "text", bench, "question",
        shingleN = 3)
      .as[(Long, Long)].collect().toMap
    // "the quick brown" + "quick brown fox" each counted once,
    // plus the wrap-around "brown fox the"/"fox the quick" miss the bench
    assert(got === Map(1L -> 2L))
  }

  test("removeContaminated honors minHits and passes clean docs through") {
    val docs = Seq(
      (1L, "he said the quick brown fox jumps high today"),
      (2L, "completely unrelated text about sparks and rivers"),
      (3L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    def kept(minHits: Long) =
      Decontaminate.removeContaminated(docs, "doc_id", "text", bench, "question",
        shingleN = 3, minHits = minHits).select("doc_id").as[Long].collect().toSet
    assert(kept(1L) === Set(2L))
    assert(kept(5L) === Set(1L, 2L)) // doc 1's 3 hits < 5
    intercept[IllegalArgumentException] {
      Decontaminate.removeContaminated(docs, "doc_id", "text", bench, "question",
        minHits = 0)
    }
  }

  test("multi-row benchmarks shingle per row — no phantom cross-row shingles") {
    val multiBench = Seq(
      Tuple1("alpha beta gamma"),
      Tuple1("delta epsilon zeta")).toDF("question")
    // "gamma delta epsilon" spans the two bench rows; it must NOT count
    val docs = Seq(
      (1L, "x gamma delta epsilon y"),
      (2L, "x alpha beta gamma y")).toDF("doc_id", "text")
    val got = Decontaminate.overlapReport(docs, "doc_id", "text", multiBench, "question",
        shingleN = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 1L))
  }

  test("docs shorter than the shingle width can never be flagged") {
    val docs = Seq((1L, "quick brown")).toDF("doc_id", "text")
    assert(Decontaminate.overlapReport(docs, "doc_id", "text", bench, "question",
      shingleN = 3).isEmpty)
  }

  test("bloomDecontaminate is conservative: drops every exactly-contaminated doc") {
    val docs = Seq(
      (1L, "he said the quick brown fox jumps high today"),
      (2L, "completely unrelated text about sparks and rivers"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "short")
    ).toDF("doc_id", "text")
    val exact = Decontaminate.removeContaminated(docs, "doc_id", "text",
        bench, "question", shingleN = 3)
      .select("doc_id").as[Long].collect().toSet
    val bloom = Decontaminate.bloomDecontaminate(docs, "doc_id", "text",
        bench, "question", shingleN = 3)
      .select("doc_id").as[Long].collect().toSet
    // never under-drops: bloom survivors are a subset of exact survivors
    assert(bloom.subsetOf(exact), s"bloom kept ${bloom -- exact} that exact dropped")
    // at this size and fpp there are no false positives either
    assert(bloom === exact)
    assert(bloom === Set(2L, 4L))
  }

  test("bloomDecontaminate bounds the benchmark collect") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Decontaminate.bloomDecontaminate(docs, "doc_id", "text", bench, "question",
        shingleN = 1, maxBenchShingles = 2) // bench has 8 distinct tokens
    }
  }

  test("semantic decontamination flags near-parallel embeddings, spares orthogonal ones") {
    val train = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), // parallel to bench vector
      (2L, Seq(0.96f, 0.28f, 0.0f)), // cosine 0.96 to bench 1
      (3L, Seq(0.0f, 0.0f, 1.0f))) // orthogonal to both
      .toDF("doc_id", "embedding")
    val bench = Seq(
      Tuple1(Seq(2.0f, 0.0f, 0.0f)), // scaled: cosine ignores magnitude
      Tuple1(Seq(0.0f, 1.0f, 0.0f)))
      .toDF("embedding")
    val report = Decontaminate.semanticOverlapReport(
        train, "doc_id", "embedding", bench, "embedding", threshold = 0.9)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(report.keySet === Set(1L, 2L))
    assert(report(1L)._1 === 1L && math.abs(report(1L)._2 - 1.0) < 1e-6)
    assert(report(2L)._1 === 1L)
    val kept = Decontaminate.removeSemanticContaminated(
        train, "doc_id", "embedding", bench, "embedding", threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L))
  }

  test("zero-norm embeddings neither flag nor get flagged (no NaN >= threshold trap)") {
    val train = Seq(
      (1L, Seq(0.0f, 0.0f)), // zero vector: 0/0 cosine would be NaN
      (2L, Seq(1.0f, 0.0f))).toDF("doc_id", "embedding")
    val bench = Seq(
      Tuple1(Seq(0.0f, 0.0f)), // zero benchmark vector must not match EVERYTHING
      Tuple1(Seq(0.0f, 1.0f))).toDF("embedding")
    val report = Decontaminate.semanticOverlapReport(
      train, "doc_id", "embedding", bench, "embedding", threshold = 0.5)
    assert(report.count() === 0)
    assert(Decontaminate.removeSemanticContaminated(
      train, "doc_id", "embedding", bench, "embedding", 0.5).count() === 2)
  }

  test("NaN-component embeddings are excluded (NaN > 0 is true in Spark — a bare norm check passes it)") {
    val train = Seq((1L, Seq(1.0f, 0.0f))).toDF("doc_id", "embedding")
    val bench = Seq(
      Tuple1(Seq(Float.NaN, 1.0f)), // NaN norm must not flag everything
      Tuple1(Seq(0.0f, 1.0f)))
      .toDF("embedding")
    assert(Decontaminate.semanticOverlapReport(
      train, "doc_id", "embedding", bench, "embedding", threshold = 0.5).count() === 0)
    // and a NaN train row neither crashes nor appears
    val trainNaN = Seq((1L, Seq(Float.NaN, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("doc_id", "embedding")
    val r = Decontaminate.semanticOverlapReport(
      trainNaN, "doc_id", "embedding", bench, "embedding", threshold = 0.5)
    assert(r.select("doc_id").as[Long].collect().toSet === Set(2L))
  }

  test("contaminationSpans: consecutive hits merge into one run, scattered stay apart") {
    // bench passage "a b c d" sits verbatim in doc 1 (grams "a b c" and
    // "b c d" at consecutive starts -> one run of 2 -> span 4 tokens);
    // doc 2 contains "a b c" twice, separated -> two runs of 1.
    val bench = Seq("a b c d").toDF("text")
    val docs = Seq(
      (1L, "x a b c d y"),
      (2L, "a b c x x a b c"),
      (3L, "clean text here entirely")).toDF("doc_id", "text")
    val r = Decontaminate.contaminationSpans(docs, "doc_id", "text", bench, "text", shingleN = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_hits"), x.getAs[Long]("n_runs"),
         x.getAs[Long]("max_run"), x.getAs[Long]("max_span_tokens"))).toMap
    assert(r(1L) === ((2L, 1L, 2L, 4L)))
    assert(r(2L) === ((2L, 2L, 1L, 3L)))
    assert(!r.contains(3L)) // inner semantics: clean docs absent
  }

  test("contaminationSpans: a full verbatim copy spans the whole doc") {
    val bench = Seq("p q r s t").toDF("text")
    val docs = Seq((1L, "p q r s t")).toDF("doc_id", "text")
    val r = Decontaminate.contaminationSpans(docs, "doc_id", "text", bench, "text", shingleN = 3)
      .head()
    assert(r.getAs[Long]("max_run") === 3L)
    assert(r.getAs[Long]("max_span_tokens") === 5L)
  }

  test("contaminationSpans: tokenization lowercases (repo contract)") {
    val bench = Seq("Alpha Beta Gamma").toDF("text")
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    assert(Decontaminate.contaminationSpans(docs, "doc_id", "text", bench, "text", shingleN = 3)
      .count() === 1L)
  }
}
