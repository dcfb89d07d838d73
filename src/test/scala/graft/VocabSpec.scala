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
  }
}
