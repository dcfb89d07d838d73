package graft

import graft.operators.{Curation, Stager}

/** The reusable curation funnel (operators/Curation.scala); end-to-end
  * values are oracle-gated by p11 — this spec covers the operator API. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    // long, alpha-heavy English doc: survives quality
    (1L, "the quick brown fox jumps over the lazy dog and then the fox rests " * 5),
    // exact duplicate of 1 with a HIGHER id: dropped by exact dedup
    (2L, "the quick brown fox jumps over the lazy dog and then the fox rests " * 5),
    // junk: fails the quality gate
    (3L, "!!! ??? ,,, ;;;"),
    // distinct long doc: survives everything
    (4L, "a completely different long passage about the weather in the north " * 5)
  ).toDF("doc_id", "text")

  test("funnel keeps quality survivors, drops exact dups (higher id) and junk") {
    val out = Curation.curate(docs, "doc_id", "text")
    // all input columns survive on the survivor rows
    assert(out.columns.toSeq === Seq("doc_id", "text"))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 4L))
  }

  test("staging mode is pluggable; curateStaged releases what it staged") {
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.keySet
    val (out, cleanup) = Curation.curateStaged(docs, "doc_id", "text",
      Curation.Config(stager = Stager.Persist))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 4L))
    assert(sc.getPersistentRDDs.keySet.size > baseline.size) // something staged
    cleanup()
    assert(sc.getPersistentRDDs.keySet.subsetOf(baseline),
      "cleanup must release every block this call staged")
  }

  test("cleanup releases ONLY this call's stages — bystander blocks survive") {
    val sc = spark.sparkContext
    // a concurrent consumer's persisted frame, alive across the funnel
    val bystander = docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bystander.count()
    val bystanderIds = sc.getPersistentRDDs.keySet
    try {
      val (out, cleanup) = Curation.curateStaged(docs, "doc_id", "text",
        Curation.Config(stager = Stager.LocalCheckpoint))
      assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 4L))
      assert(sc.getPersistentRDDs.keySet.size > bystanderIds.size) // staged something
      cleanup()
      assert(sc.getPersistentRDDs.keySet === bystanderIds,
        "cleanup must release localCheckpoint blocks but never the bystander's")
    } finally bystander.unpersist(blocking = true)
  }

  test("Parquet-mode cleanup drops only its own stage tables") {
    val dir = java.nio.file.Files.createTempDirectory("curation_pq").toString
    val graph = new graft.core.TableGraph(dir)
    // another caller's stage table, registered before the funnel runs
    graph.addTable("other_stage", docs.limit(1), metadata = Map("role" -> "stage"))
    val (out, cleanup) = Curation.curateStaged(docs, "doc_id", "text",
      Curation.Config(stager = Stager.Parquet(graph)))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 4L))
    cleanup()
    assert(graph.getTable(spark, "other_stage").isDefined,
      "precise release must not reclaim other callers' stages")
    assert(!graph.allNodes.map(_.name).exists(_.startsWith("curation_canon_")),
      "this call's stages must be gone")
  }

  test("reserved helper names are rejected") {
    intercept[IllegalArgumentException] {
      Curation.curate(docs.withColumnRenamed("text", "__n_char"), "doc_id", "__n_char")
    }
  }
}
