package graft

import graft.operators.Vocab
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "CAT cat")).toDF("doc_id", "text")

  test("buildVocab ranks by frequency desc then token asc; maxSize and minCount cut") {
    val v = Vocab.buildVocab(docs, "text", maxSize = 100)
      .orderBy("token_id").as[(String, Int, Long)].collect().toSeq
    // the:3, cat:3 (lowercased, CAT+cat+cat), sat:2, then dog/mat/on at 1
    assert(v.take(3) === Seq(("cat", 0, 3L), ("the", 1, 3L), ("sat", 2, 2L)))
    assert(v.drop(3).map(_._1) === Seq("dog", "mat", "on"))
    assert(Vocab.buildVocab(docs, "text", maxSize = 2).count() === 2)
    val pruned = Vocab.buildVocab(docs, "text", maxSize = 100, minCount = 2)
    assert(pruned.select("token").as[String].collect().toSet === Set("cat", "the", "sat"))
  }

  test("encodeIds preserves token order, marks OOV, counts both") {
    val v = Vocab.buildVocab(docs, "text", maxSize = 3) // cat=0, the=1, sat=2
    val enc = Vocab.encodeIds(docs, "doc_id", "text", v)
      .orderBy("doc_id")
      .select("doc_id", "token_ids", "n_tokens", "n_oov")
      .as[(Long, Seq[Int], Long, Long)].collect().toSeq
    assert(enc === Seq(
      (1L, Seq(1, 0, 2, -1, 1, -1), 6L, 2L), // the cat sat on the mat
      (2L, Seq(1, -1, 2), 3L, 1L), // the dog sat
      (3L, Seq(0, 0), 2L, 0L))) // CAT cat
  }

  test("guard rails") {
    intercept[IllegalArgumentException] { Vocab.buildVocab(docs, "text", 0) }
    intercept[IllegalArgumentException] { Vocab.buildVocab(docs, "text", 5, minCount = 0) }
    intercept[IllegalArgumentException] { Vocab.bpeMerges(docs, "text", 0) }
  }

  /** Driver-side reference BPE trainer — the textbook algorithm on word
    * counts (Sennrich 2016 fig. 1), with the operator's deterministic
    * (count desc, left asc, right asc) tie-break. */
  private def refBpe(texts: Seq[String], numMerges: Int,
      minPairCount: Long): Seq[(Int, String, String, Long)] = {
    val wordCounts = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .foreach(w => wordCounts(w) = wordCounts.getOrElse(w, 0L) + 1L)
    var words = wordCounts.toSeq.map { case (w, n) =>
      val cs = w.toCharArray.map(_.toString).toVector
      (cs.init :+ (cs.last + Vocab.EndOfWord), n)
    }
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          pairCounts((p(0), p(1))) = pairCounts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      val best = pairCounts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          out += ((rank, l, r, c))
          words = words.map { case (syms, n) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.size) {
              if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
                acc += (l + r); i += 2
              } else { acc += syms(i); i += 1 }
            }
            (acc.toVector, n)
          }
          rank += 1
        case _ => done = true
      }
    }
    out.toSeq
  }

  test("bpeMerges equals the textbook driver reference (tie-break and " +
    "early-exhaustion included)") {
    val texts = Seq(
      "low low low low low", "lower lower", "newest newest newest",
      "widest widest", "new new new")
    for (k <- Seq(3, 8, 40)) {
      val got = Vocab.bpeMerges(texts.zipWithIndex.map(_.swap).toDF("id", "text"),
          "text", numMerges = k)
        .orderBy("rank")
        .as[(Int, String, String, Long)].collect().toSeq
      assert(got === refBpe(texts, k, minPairCount = 2L), s"numMerges=$k")
    }
  }

  test("bpeEncode applies merges lowest-rank-first; concatenated subwords " +
    "rebuild the words; no merges means character + </w> sequences") {
    val texts = Seq("low lower newest", "unseen")
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val merges = Vocab.bpeMerges(df, "text", numMerges = 10)
    val enc = Vocab.bpeEncode(df, "id", "text", merges)
      .orderBy("id")
      .as[(Int, Seq[String], Int)].collect().toSeq
    enc.zip(texts).foreach { case ((_, subs, n), text) =>
      assert(n === subs.size)
      // subwords concatenate back to the words (with </w> at each end)
      val rebuilt = subs.mkString("").split(java.util.regex.Pattern.quote(Vocab.EndOfWord))
        .filter(_.nonEmpty).toSeq
      assert(rebuilt === text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq, subs.toString)
    }
    // empty merge table degrades to chars + fused end-of-word marker
    val none = Vocab.bpeEncode(df, "id", "text",
      Vocab.bpeMerges(df, "text", numMerges = 1, minPairCount = 1000L))
      .orderBy("id").as[(Int, Seq[String], Int)].collect().head
    assert(none._2.take(3) === Seq("l", "o", "w" + Vocab.EndOfWord))
  }
}
