package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

import scala.math.Ordered.orderingToOrdered

/** SemDeDup (Abbas et al. 2023): pair-rule unit cases, a driver-side
  * differential reference (clustering included), and a self-consistency
  * invariant that re-derives kept/dropped from the output's own cluster
  * and centroid_sim columns — which also covers refineIters > 0, where
  * the centroids are not reproducible driver-side. */
class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def dotD(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
  private def normD(v: Array[Float]): Double = math.sqrt(dotD(v, v))
  private def cosD(a: Array[Float], b: Array[Float]): Double =
    dotD(a, b) / (normD(a) * normD(b))

  /** Driver reference for refineIters = 0: md5-lowest centroids, max-cosine
    * assignment with ties to the higher cell, per-pair loser = higher
    * (centroid_sim, id). Returns id -> (cluster, centroid_sim, kept). */
  private def refSemDedup(rows: Seq[(Long, Array[Float])], nClusters: Int,
      eps: Double): Map[Long, (Int, Double, Boolean)] = {
    val valid = rows.filter { case (_, v) => v != null && v.nonEmpty }
    val cents = valid.sortBy { case (id, _) => md5hex(id.toString) }
      .take(nClusters).zipWithIndex
      .map { case ((_, v), i) => (i, v, normD(v)) }
      .filter { case (_, _, n) => java.lang.Double.isFinite(n) && n > 0 }
    val usable = valid.filter { case (_, v) =>
      val n = normD(v); java.lang.Double.isFinite(n) && n > 0 }
    val assign = usable.map { case (id, v) =>
      val n = normD(v)
      val (cell, csim) = cents
        .map { case (cid, c, cn) => (cid, dotD(v, c) / (n * cn)) }
        .maxBy { case (cid, s) => (s, cid) }
      (id, v, cell, csim)
    }
    val dropped = scala.collection.mutable.Set.empty[Long]
    for {
      Seq(a, b) <- assign.sortBy(_._1).combinations(2)
      if a._3 == b._3 && cosD(a._2, b._2) >= eps
    } dropped += (if ((a._4, a._1) > ((b._4, b._1))) a._1 else b._1)
    assign.map { case (id, _, cell, csim) =>
      id -> ((cell, csim, !dropped.contains(id))) }.toMap
  }

  test("identical pair in one cluster: higher id dropped, far doc kept") {
    val u = Array(1f, 0f, 0f)
    val df = Seq((1L, u), (2L, u), (3L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding", eps = 0.9, nClusters = 1)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("keep rule keeps the member farthest from the centroid") {
    // one cluster seeded by doc 1 (only centroid); docs 2 and 3 are a dup
    // pair; 3 sits farther from the centroid than 2 -> 2 dropped, 3 kept
    val df = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.8f, 0.2f))).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding", eps = 0.97, nClusters = 1)
    val rows = out.select("vec_id", "centroid_sim", "kept")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(cosD(Array(0.9f, 0.1f), Array(0.8f, 0.2f)) >= 0.97)
    assert(rows.map(r => r._1 -> r._3).toMap === Map(1L -> false, 2L -> false, 3L -> true))
    // centroid_sim ordering matches: 1 (the centroid itself) > 2 > 3
    assert(rows(0)._2 > rows(1)._2 && rows(1)._2 > rows(2)._2)
  }

  test("eps above every pairwise cosine keeps everything") {
    val df = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0.5f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding", eps = 1.5, nClusters = 2)
    assert(out.filter(!col("kept")).count() === 0)
    assert(out.count() === 3)
  }

  test("degenerate inputs: empty corpus and unusable vectors yield typed empties") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Dedup.semDedup(empty, "vec_id", "embedding", eps = 0.5)
    assert(out.columns.toSeq === Seq("vec_id", "cluster", "centroid_sim", "kept"))
    assert(out.count() === 0)
    // null / empty / zero-norm / NaN vectors carry no signal and are absent
    val dirty = Seq(
      (1L, null.asInstanceOf[Array[Float]]),
      (2L, Array.empty[Float]),
      (3L, Array(0f, 0f)),
      (4L, Array(Float.NaN, 1f)),
      (5L, Array(1f, 0f)),
      (6L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val rows = Dedup.semDedup(dirty, "vec_id", "embedding", eps = 0.9, nClusters = 1)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(rows.keySet === Set(5L, 6L))
    assert(rows(5L) !== rows(6L)) // the identical pair loses exactly one member
  }

  test("differential vs driver reference on a seeded corpus (refineIters = 0)") {
    val rnd = new scala.util.Random(42)
    // planted structure: 40 base vectors plus 20 near-copies (dup pairs)
    val base = (0 until 40).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2f - 1f)) }
    val near = (0 until 20).map { i =>
      val (_, v) = base(i)
      (100L + i, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)) }
    val rows = base ++ near
    val expected = refSemDedup(rows, nClusters = 4, eps = 0.95)
    val got = Dedup.semDedup(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", eps = 0.95, nClusters = 4)
      .select("vec_id", "cluster", "centroid_sim", "kept")
      .as[(Long, Int, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === expected.keySet)
    for ((id, (cell, csim, kept)) <- expected) {
      val (gCell, gCsim, gKept) = got(id)
      assert(gCell === cell, s"cluster of $id")
      assert(math.abs(gCsim - csim) < 1e-12, s"centroid_sim of $id")
      assert(gKept === kept, s"kept of $id")
    }
    assert(expected.values.count(!_._3) >= 15, "planted dups must drop")
  }

  test("self-consistency invariant holds under refineIters > 0") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).map { i =>
      (i.toLong, Array.fill(6)(rnd.nextFloat() * 2f - 1f)) } ++
      (0 until 15).map { i => (200L + i,
        (0 until 6).map(j => (rnd.nextFloat() * 0.01f + (if (j == i % 6) 1f else 0f))).toArray) }
    val eps = 0.9
    val out = Dedup.semDedup(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", eps = eps, nClusters = 5, refineIters = 2)
      .select("vec_id", "cluster", "centroid_sim", "kept")
      .as[(Long, Int, Double, Boolean)].collect()
    val vecOf = rows.toMap
    // re-derive the drop rule from the OUTPUT's cluster + centroid_sim:
    // d dropped iff a same-cluster e with cos >= eps precedes it in the
    // (centroid_sim, id) keep order
    for (d <- out) {
      val beats = out.filter(e => e._1 != d._1 && e._2 == d._2 &&
        cosD(vecOf(e._1), vecOf(d._1)) >= eps && (e._3, e._1) < ((d._3, d._1)))
      assert(d._4 === beats.isEmpty,
        s"doc ${d._1}: kept=${d._4} but beating set is ${beats.map(_._1).toSeq}")
    }
    assert(out.count(!_._4) >= 1, "the planted basis dups should collide")
  }

  test("property: every populated cluster keeps its keep-order-first member") {
    // the min-(centroid_sim, id) member of a cluster has no beater, so a
    // cluster can never be emptied — for any corpus, eps, clustering
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 40).map { i =>
        (i.toLong, Array.fill(5)(rnd.nextFloat() * 2f - 1f)) } ++
        (0 until 10).map { i => // planted identical pairs force drops
          (300L + i, Array.fill(5)(0f).updated(i % 5, 1f)) }
      val out = Dedup.semDedup(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", eps = 0.8, nClusters = 3 + seed)
        .select("vec_id", "cluster", "centroid_sim", "kept")
        .as[(Long, Int, Double, Boolean)].collect()
      assert(out.length === rows.size, s"seed $seed: partition property")
      for ((cl, members) <- out.groupBy(_._2)) {
        assert(members.exists(_._4), s"seed $seed: cluster $cl lost every member")
        val first = members.minBy(m => (m._3, m._1))
        assert(first._4, s"seed $seed: keep-order-first of cluster $cl was dropped")
      }
      assert(out.count(!_._4) >= 5, s"seed $seed: planted identical dups must drop")
    }
  }

  test("assignEmbeddingClusters agrees with semDedup's own assignment") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(4)(rnd.nextFloat() * 2f - 1f)) }
    val df = rows.toDF("vec_id", "embedding")
    val viaSem = Dedup.semDedup(df, "vec_id", "embedding", eps = 2.0, nClusters = 4)
      .select("vec_id", "cluster", "centroid_sim")
      .as[(Long, Int, Double)].collect().toSet
    val direct = Dedup.assignEmbeddingClusters(df, "vec_id", "embedding", nClusters = 4)
      .as[(Long, Int, Double)].collect().toSet
    assert(direct === viaSem)
    // empty input: typed empty with the documented schema
    val empty = Dedup.assignEmbeddingClusters(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    assert(empty.columns.toSeq === Seq("vec_id", "cluster", "centroid_sim"))
    assert(empty.count() === 0)
  }

  test("fixture differential at sf0.001 (gate pre-flight)") {
    val df = testdata("sf0.001", "embeddings")
    val rows = df.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val expected = refSemDedup(rows, nClusters = 8, eps = 0.35)
    val got = Dedup.semDedup(df, "vec_id", "embedding",
        eps = 0.35, nClusters = 8)
      .select(col("vec_id").cast("long"), col("cluster"), col("centroid_sim"), col("kept"))
      .as[(Long, Int, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === expected.keySet)
    for ((id, (cell, csim, kept)) <- expected) {
      val (gCell, gCsim, gKept) = got(id)
      assert(gCell === cell, s"cluster of $id")
      assert(math.abs(gCsim - csim) < 1e-12, s"centroid_sim of $id")
      assert(gKept === kept, s"kept of $id")
    }
  }
}
