package graft

import java.nio.file.Files

/** Every gate query must run (not necessarily return rows) against EMPTY
  * tables with the production schemas — the degenerate shape every 100 TB
  * job meets when partition pruning or an upstream filter leaves nothing.
  * Round-9 sweep found 7/109 queries crashing here (embedding ops
  * inferring their dimension from a row that doesn't exist; IVF building
  * an unresolvable zero-entry cell literal) — this spec keeps the fixes
  * fixed.
  *
  * c1_chain is the one documented exclusion: its api_* output columns ARE
  * data (the union of fetched response keys), so with zero rows there are
  * zero api_* columns and the gate's projection of them cannot resolve.
  * That dynamic-schema behavior is the reference's own chain contract
  * (key-union across responses), not an empty-input bug.
  */
class EmptyInputSpec extends SparkSpecBase {

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dst = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "graft-empty").toAbsolutePath.toString
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .limit(0).coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    dst
  }

  test("every gate query except c1_chain runs on empty tables") {
    val failures = SparkEntry.queries
      .filter { case (name, _) => name != "c1_chain" }
      .flatMap { case (name, fn) =>
        try {
          fn(spark, emptyDir).write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable => Some(s"$name -> ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(160).replace('\n', ' '))
        }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("empty-corpus ANN and embedding near-dup return typed empty frames") {
    val empty = spark.read.parquet(s"$emptyDir/embeddings.parquet")
    val topK = graft.operators.Similarity.lshTopK(empty, empty, "vec_id", "embedding", k = 3)
    assert(topK.columns.toSeq === Seq("query_id", "neighbor_id", "rank", "cosine"))
    assert(topK.count() === 0)
    val ivf = graft.operators.Similarity.ivfTopK(empty, empty, "vec_id", "embedding", k = 3)
    assert(ivf.columns.toSeq === Seq("query_id", "neighbor_id", "rank", "cosine"))
    assert(ivf.count() === 0)
    val pq = graft.operators.Similarity.pqTopK(empty, empty, "vec_id", "embedding", k = 3)
    assert(pq.count() === 0)
    val pairs = graft.operators.Dedup.nearDupPairsEmbeddingLsh(
      empty, "vec_id", "embedding", threshold = 0.9)
    assert(pairs.columns.toSeq === Seq("id_a", "id_b", "cosine"))
    assert(pairs.count() === 0)
  }
}
