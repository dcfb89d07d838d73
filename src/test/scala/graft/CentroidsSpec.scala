package graft

import graft.operators.{Centroids, Similarity}
import org.apache.spark.sql.functions._

/** groupCentroids semantics (exact means, position order, n_vecs,
  * addition-order independence) and its consumer, the spherical-k-means
  * refinement behind ivfTopK(refineIters > 0).
  */
class CentroidsSpec extends SparkSpecBase {
  import spark.implicits._

  test("groupCentroids computes exact per-position means and sums, in position order") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f, 3.0f)),
      ("a", Seq(3.0f, 2.0f, 1.0f)),
      ("b", Seq(10.0f, 0.0f, 0.0f))).toDF("g", "v")
    val out = Centroids.groupCentroids(df, "g", "v")
      .select(col("g"), col("n_vecs"), col("centroid"),
        col("centroid_sum").cast("array<double>"))
      .orderBy("g")
      .as[(String, Long, Seq[Double], Seq[Double])].collect()
    assert(out === Array(
      ("a", 2L, Seq(2.0, 2.0, 2.0), Seq(4.0, 4.0, 4.0)),
      ("b", 1L, Seq(10.0, 0.0, 0.0), Seq(10.0, 0.0, 0.0))))
  }

  test("groupCentroids is partition/addition-order independent (decimal accumulator)") {
    val e = testdata("sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) =
      Centroids.groupCentroids(df, "label", "embedding")
        .select(col("label"), col("n_vecs"), col("centroid"),
          col("centroid_sum").cast("array<string>"))
        .orderBy("label").as[(String, Long, Seq[Double], Seq[String])].collect().toSeq
    val a = run(e.repartition(1))
    val b = run(e.repartition(16, col("vec_id")))
    assert(a === b, "means/sums must not depend on partitioning / addition order")
  }

  test("groupCentroids rounds to the requested precision") {
    val df = Seq(("g", Seq(1.0f)), ("g", Seq(2.0f)), ("g", Seq(2.0f))).toDF("g", "v")
    val Seq(c3) = Centroids.groupCentroids(df, "g", "v", roundTo = 3)
      .select("centroid").as[Seq[Double]].head()
    assert(c3 === 1.667) // 5/3 rounded to 3 places
  }

  test("centroid_sum + n_vecs are mergeable: shard partials combine to the global sum") {
    val e = testdata("sf0.001", "embeddings")
    val s1 = e.filter($"vec_id" % 2 === 0)
    val s2 = e.filter($"vec_id" % 2 === 1)
    def sums(df: org.apache.spark.sql.DataFrame) =
      Centroids.groupCentroids(df, "label", "embedding")
        .select(col("label"), posexplode(col("centroid_sum")).as(Seq("pos", "s")))
    val merged = sums(s1).unionAll(sums(s2))
      .groupBy("label", "pos").agg(sum(col("s")).as("s"))
    val global = sums(e)
    val joined = merged.join(global.withColumnRenamed("s", "g"), Seq("label", "pos"))
    assert(joined.filter(col("s") =!= col("g")).count() === 0L,
      "sum of shard partials must equal the single-pass sum exactly")
  }

  test("ivfCentroidsRefined returns unit vectors and converges on separable clusters") {
    // two tight clusters on orthogonal axes; after refinement the two cells
    // should sit on the axes (any hash-seeded start mixes them)
    val rows = (0 until 50).map(i => (i.toLong, Seq(1.0f, 0.01f * (i % 5)))) ++
      (50 until 100).map(i => (i.toLong, Seq(0.01f * (i % 5), 1.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroidsRefined(df, "vec_id", "embedding", nCells = 2, iters = 5)
    assert(cents.size === 2)
    for ((_, v) <- cents) {
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"centroid not unit: norm=$norm")
    }
    // each axis direction should be ~owned by one centroid
    val byAxis = cents.map { case (_, v) => if (v(0) > v(1)) 0 else 1 }.toSet
    assert(byAxis === Set(0, 1), s"refined centroids collapsed: $cents")
    intercept[IllegalArgumentException] {
      Similarity.ivfCentroidsRefined(df, "vec_id", "embedding", 2, iters = -1)
    }
  }

  test("ivfTopK(refineIters) keeps recall at least as good as unrefined seeding") {
    val e = testdata("sf0.001", "embeddings")
    val q = e.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val refined = pairs(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 6, refineIters = 2))
    val recall = (exact & refined).size.toDouble / exact.size
    assert(recall >= 0.4, s"refined recall $recall")
  }

  test("silhouette: hand-computed two well-separated clusters") {
    val df = Seq(
      (1L, 0, Array(0f, 0f)), (2L, 0, Array(0f, 2f)),
      (3L, 1, Array(10f, 0f)), (4L, 1, Array(10f, 2f)))
      .toDF("id", "lab", "vec")
    val rows = Centroids.silhouette(df, "id", "lab", "vec")
      .orderBy("lab").collect()
    // centroids (0,1) and (10,1): every vector has a = 1, b = sqrt(101)
    val expected = (math.sqrt(101.0) - 1.0) / math.sqrt(101.0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") === 2L)
      assert(math.abs(r.getAs[Double]("mean_intra") - 1.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_silhouette") - expected) < 1e-9)
    }
  }

  test("silhouette: single cluster is undefined; coincident clusters score 0") {
    val one = Seq((1L, 0, Array(1f, 1f)), (2L, 0, Array(3f, 1f)))
      .toDF("id", "lab", "vec")
    val r1 = Centroids.silhouette(one, "id", "lab", "vec").head()
    assert(r1.isNullAt(r1.fieldIndex("mean_silhouette")))
    assert(r1.isNullAt(r1.fieldIndex("mean_inter")))
    val coincident = Seq(
      (1L, 0, Array(5f, 5f)), (2L, 0, Array(5f, 5f)),
      (3L, 1, Array(5f, 5f)), (4L, 1, Array(5f, 5f)))
      .toDF("id", "lab", "vec")
    val rows = Centroids.silhouette(coincident, "id", "lab", "vec").collect()
    rows.foreach(r => assert(r.getAs[Double]("mean_silhouette") === 0.0))
  }

  test("silhouette: tight clusters beat a split-down-the-middle labeling") {
    val pts = (0 until 20).map { i =>
      val cluster = i % 2
      val base = if (cluster == 0) 0f else 20f
      (i.toLong, cluster, Array(base + (i / 2) * 0.1f, base - (i / 2) * 0.1f))
    }
    val good = Centroids.silhouette(pts.toDF("id", "lab", "vec"), "id", "lab", "vec")
      .agg(avg("mean_silhouette")).as[Double].head()
    // same points, labels assigned orthogonally to the real structure
    // (consecutive pairs straddle both real clusters)
    val badDf = pts.map { case (id, _, v) => (id, ((id / 2) % 2).toInt, v) }
      .toDF("id", "lab", "vec")
    val bad = Centroids.silhouette(badDf, "id", "lab", "vec")
      .agg(avg("mean_silhouette")).as[Double].head()
    assert(good > 0.9, s"tight clustering should score near 1, got $good")
    assert(bad < 0.1, s"structure-blind labels should score near/below 0, got $bad")
  }

  test("centroidSimilarityMatrix: counts cancel — cosine of the mean is cosine of the sum") {
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)), // centroid (1,0), sum (2,0)
      (1, Seq(0.0f, 2.0f)),                       // (0,2)
      (2, Seq(3.0f, 4.0f)),                       // (3,4)
      (3, Seq(0.0f, 0.0f)))                       // zero vector
      .toDF("label", "vec")
    val rows = graft.operators.Centroids
      .centroidSimilarityMatrix(df, "label", "vec")
      .orderBy("label_a", "label_b").collect()
    val m = rows.map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) ->
      (if (r.isNullAt(r.fieldIndex("cosine"))) None
       else Some(r.getAs[Double]("cosine")))).toMap
    assert(m((0, 1)) === Some(0.0))
    assert(m((0, 2)) === Some(0.6))
    assert(m((1, 2)) === Some(0.8))
    assert(m((0, 3)) === None && m((1, 3)) === None && m((2, 3)) === None)
    val r01 = rows.find(r => r.getAs[Int]("label_a") === 0 &&
      r.getAs[Int]("label_b") === 1).get
    assert(r01.getAs[Long]("n_a") === 2L && r01.getAs[Long]("n_b") === 1L)
  }
}
