package graft

import graft.functions.FeatureHashEmbedder
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class EmbedderSpec extends SparkSpecBase {
  import spark.implicits._

  test("driver-level embed is deterministic, normalized, dimension-correct") {
    val e = new FeatureHashEmbedder(16)
    val v = e.embed("the quick brown fox")
    assert(v.length === 16)
    assert(v.toSeq === e.embed("the quick brown fox").toSeq)
    assert(math.abs(v.map(x => x.toDouble * x).sum - 1.0) < 1e-6)
    assert(e.embed("").forall(_ == 0f)) // empty text -> zero vector
  }

  test("distributed hashEmbedding matches the driver-level embedder") {
    val texts = Seq((1L, "the quick brown fox"), (2L, "spark shuffles are expensive"), (3L, ""))
    val df = texts.toDF("doc_id", "text")
    val dist = FeatureHashEmbedder.hashEmbedding(df, "doc_id", "text", 16)
      .orderBy("doc_id").select("embedding").as[Seq[Float]].collect()
    val e = new FeatureHashEmbedder(16)
    texts.zip(dist).foreach { case ((_, txt), got) =>
      val want = e.embed(txt).toSeq
      want.zip(got).foreach { case (w, g) => assert(math.abs(w - g) < 1e-6f) }
    }
  }

  test("embed -> ANN round trip: near-identical texts are nearest neighbors") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "one two three four five six"),
      (4L, "seven eight nine ten eleven")).toDF("doc_id", "text")
    val emb = FeatureHashEmbedder.hashEmbedding(df, "doc_id", "text", 32)
    val top = Similarity.bruteForceTopK(emb, emb.filter($"doc_id" === 1L),
        "doc_id", "embedding", 1)
      .select("neighbor_id").as[Long].head()
    assert(top === 2L)
  }
}
