package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: feature-stream contract, a full driver
  * differential (models + weights + Gumbel selection), and the
  * directional sanity a data-selection op owes its users. */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(key: String, salt: String): Long =
    java.lang.Long.parseLong(md5hex(s"$salt:$key").take(15), 16)

  private def roundLn(x: Double, dp: Int = 9): Double =
    BigDecimal(math.log(x)).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def features(text: String): Seq[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  /** Driver reference: id -> (n_features, log_weight, score). */
  private def refDsir(docs: Seq[(Long, String)], targetIds: Set[Long],
      nBuckets: Int, salt: String): Map[Long, (Long, Double, Double)] = {
    def buckets(text: String): Seq[Long] =
      features(text).map(f => h60(f, salt) % nBuckets)
    val rawB = docs.flatMap { case (_, t) => buckets(t) }
    val tgtB = docs.filter(d => targetIds(d._1)).flatMap { case (_, t) => buckets(t) }
    val cr = rawB.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = tgtB.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nr, nt) = (rawB.size.toLong, tgtB.size.toLong)
    def llr(b: Long): Double =
      roundLn((ct.getOrElse(b, 0L) + 1).toDouble / (nt + nBuckets)) -
        roundLn((cr.getOrElse(b, 0L) + 1).toDouble / (nr + nBuckets))
    docs.flatMap { case (id, t) =>
      val bs = buckets(t)
      if (bs.isEmpty) None else {
        val byB = bs.groupBy(identity).view.mapValues(_.size).toMap
        val lw = byB.toSeq
          .map { case (b, c) => BigDecimal(c.toDouble * llr(b))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP) }
          .sum.toDouble
        val u = (h60(id.toString, s"$salt:gum").toDouble + 0.5) / math.pow(2, 60)
        val g = -roundLn(math.max(-roundLn(u), 1e-9))
        Some(id -> ((bs.size.toLong, lw, lw + g)))
      }
    }.toMap
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log"),
    (3L, "quantum flux capacitor overload"),
    (4L, "the cat and the dog sat"),
    (5L, "zzz qqq xxx vvv"),
    (6L, ""),
    (7L, "   "),
    (8L, "the cat sat"))

  test("featureStream preserves multiplicity and hashes into range") {
    val df = Seq((1L, "a b a")).toDF("doc_id", "text")
    val rows = Dsir.featureStream(df, "doc_id", "text", 16, "s")
      .select("bucket").as[Long].collect()
    // features: a, b, a, "a b", "b a" -> 5 occurrences
    assert(rows.length === 5)
    assert(rows.forall(b => b >= 0 && b < 16))
  }

  test("differential vs driver reference: weights, scores, ranks") {
    val targetIds = Set(1L, 2L, 8L) // the "the-cat/dog-sat" register
    val df = corpus.toDF("doc_id", "text")
    val target = df.filter(col("doc_id").isin(targetIds.toSeq: _*))
    val expected = refDsir(corpus, targetIds, nBuckets = 64, salt = "dsir")
    val weights = Dsir.importanceWeights(df, "doc_id", "text",
        target, "doc_id", "text", nBuckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(weights.keySet === expected.keySet) // 6/7 (no features) absent
    for ((id, (nf, lw, _)) <- expected) {
      assert(weights(id)._1 === nf, s"n_features of $id")
      assert(math.abs(weights(id)._2 - lw) < 1e-12, s"log_weight of $id")
    }
    val got = Dsir.resampleTopK(df, "doc_id", "text",
        target, "doc_id", "text", k = 3, nBuckets = 64)
      .select("doc_id", "score", "rank").as[(Long, Double, Int)].collect()
    val expTop = expected.toSeq.sortBy { case (id, (_, _, s)) => (-s, id) }.take(3)
    assert(got.sortBy(_._3).map(_._1).toSeq === expTop.map(_._1))
    for ((id, sc, _) <- got)
      assert(math.abs(sc - expected(id)._3) < 1e-12, s"score of $id")
  }

  test("target-like documents out-weigh off-distribution ones") {
    val targetIds = Set(1L, 2L, 8L)
    val df = corpus.toDF("doc_id", "text")
    val weights = Dsir.importanceWeights(df, "doc_id", "text",
        df.filter(col("doc_id").isin(targetIds.toSeq: _*)), "doc_id", "text",
        nBuckets = 64)
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    // per-feature normalization: compare MEAN feature log-ratio so doc
    // length doesn't decide the comparison
    val nf = refDsir(corpus, targetIds, 64, "dsir")
    def mean(id: Long) = weights(id) / nf(id)._1
    assert(mean(4L) > mean(3L), "in-register doc must out-weigh jargon doc")
    assert(mean(1L) > mean(5L), "target member must out-weigh gibberish")
  }

  test("k larger than the corpus returns every scored doc, ranks contiguous") {
    val df = corpus.toDF("doc_id", "text")
    val out = Dsir.resampleTopK(df, "doc_id", "text",
        df.filter(col("doc_id") === 1L), "doc_id", "text", k = 100, nBuckets = 32)
      .select("doc_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.length === 6) // docs 6 and 7 have no features
    assert(out.map(_._2).toSeq === (1 to 6))
  }

  test("property: target == raw makes every log_weight exactly zero") {
    // llr(b) = roundLn(pT) - roundLn(pR) with IDENTICAL counts on both
    // sides — each bucket's terms cancel bitwise, so the decimal-summed
    // weight is 0.0 exactly, for any corpus
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val words = Vector("alpha", "beta", "gamma", "delta", "eps")
      val docs = (0 until 30).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" ")) }
      val df = docs.toDF("doc_id", "text")
      val vals = Dsir.importanceWeights(df, "doc_id", "text",
          df, "doc_id", "text", nBuckets = 32)
        .select("log_weight").as[Double].collect()
      assert(vals.nonEmpty && vals.forall(_ === 0.0), s"seed $seed: ${vals.toSeq}")
    }
  }

  test("empty target still scores (uniform target model)") {
    val df = corpus.toDF("doc_id", "text")
    val out = Dsir.importanceWeights(df, "doc_id", "text",
      df.filter(lit(false)), "doc_id", "text", nBuckets = 32)
    // all llr = ln(1/B) - ln((cr+1)/(nr+B)): defined, negative-ish, no NaN
    val vals = out.select("log_weight").as[Double].collect()
    assert(vals.length === 6 && vals.forall(v => !v.isNaN))
  }
}
