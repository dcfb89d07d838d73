package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpecBase {
  import spark.implicits._

  test("star graph: the hub outranks every leaf; mass sums to 1") {
    // undirected star: hub 0 <-> leaves 1..5
    val edges = (1L to 5L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("u", "v")
    val pr = Graphs.pagerank(edges, "u", "v", iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > pr(1L) * 2)
    (1L to 5L).foreach(l => assert(math.abs(pr(l) - pr(1L)) < 1e-9))
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
  }

  test("dangling nodes: mass is redistributed, not lost") {
    // directed chain 1 -> 2 -> 3; node 3 dangles
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val pr = Graphs.pagerank(edges, "u", "v", iters = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, pr.toString)
    assert(pr(3L) > pr(2L) && pr(2L) > pr(1L)) // downstream accumulates
  }

  /** Driver-side reference PageRank with the operator's exact semantics:
    * uniform init, dangling mass redistributed uniformly, per-iteration
    * rounding through 12 decimals (the operator's DECIMAL(25,12) grain).
    */
  private def refPagerank(
      edges: Seq[(Long, Long)], iters: Int, damping: Double = 0.85): Map[Long, Double] = {
    val es = edges.filter(e => e._1 != e._2).distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = es.groupBy(_._1).view.mapValues(_.size).toMap
    def r12(v: Double) =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(out.contains).map(pr).sum
      pr = nodes.map { v =>
        val in = es.collect { case (s, d) if d == v => pr(s) / out(s) }.sum
        v -> r12((1.0 - damping) / n + damping * (in + dang / n))
      }.toMap
    }
    pr
  }

  test("dangling mass: operator agrees with a hand-unrolled reference " +
    "iteration on a graph with sinks") {
    // two sinks (4, 5), one source-only node (1), a cycle-free core —
    // exercises the dangling-redistribution branch the p61 gate cannot
    // (its minhash pair graph is symmetrized: every node has out-degree)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 5L))
    for (iters <- Seq(1, 3, 10)) {
      val got = Graphs.pagerank(edges.toDF("u", "v"), "u", "v", iters = iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = refPagerank(edges, iters)
      assert(got.keySet === want.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-9, s"iters=$iters node=$k got=$v want=${want(k)}")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-6, s"iters=$iters mass=${got.values.sum}")
    }
  }

  test("self-loops, duplicate edges and null endpoints are dropped") {
    val edges = Seq(
      (Some(1L), Some(2L)), (Some(1L), Some(2L)), // dup
      (Some(2L), Some(2L)),                       // self-loop
      (Some(2L), Some(1L)),
      (None, Some(1L)), (Some(1L), None)          // nulls
    ).toDF("u", "v")
    val pr = Graphs.pagerank(edges, "u", "v", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet === Set(1L, 2L))
    // symmetric 2-node graph: equal ranks
    assert(math.abs(pr(1L) - pr(2L)) < 1e-9)
  }

  test("guard rails") {
    val e = Seq((1L, 2L)).toDF("u", "v")
    intercept[IllegalArgumentException] { Graphs.pagerank(e, "u", "v", iters = 0) }
    intercept[IllegalArgumentException] { Graphs.pagerank(e, "u", "v", damping = 1.0) }
  }

  private def tri(edges: Seq[(Long, Long)]): Long =
    Graphs.triangleCount(edges.toDF("u", "v"), "u", "v")
      .as[Long].collect().head

  test("triangle count: K4 has 4 triangles, path and star have none") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(tri(k4) === 4L)
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === 0L)       // path
    assert(tri((1L to 6L).map(l => (0L, l))) === 0L)            // star
    assert(tri(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === 1L)       // one triangle
  }

  test("triangle count: duplicate / reversed edges, self-loops and nulls " +
    "don't inflate the count; empty graph counts 0 (not an empty frame)") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(tri(messy) === 1L)
    val withNulls = Seq(
      (Some(1L), Some(2L)), (Some(2L), Some(3L)), (Some(3L), Some(1L)),
      (None, Some(1L)), (Some(2L), None)
    ).toDF("u", "v")
    assert(Graphs.triangleCount(withNulls, "u", "v").as[Long].collect().head === 1L)
    assert(tri(Seq.empty) === 0L)
  }

  test("triangle count: two overlapping triangles sharing an edge") {
    // {1,2,3} and {2,3,4} share edge 2-3
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(tri(e) === 2L)
    // adding hub 0 connected to everything: each old edge forms a triangle
    // with the hub (5), plus the original 2 -> C(4,2) pairs among 1..4 that
    // are edges: 5 edges -> 5 hub triangles + 2 = 7
    val withHub = e ++ (1L to 4L).map(l => (0L, l))
    assert(tri(withHub) === 7L)
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graphs.labelPropagation(edges.toDF("a", "b"), "a", "b", iters)
      .as[(Long, Long)].collect().toMap

  test("labelPropagation: cliques converge to their min id; disjoint cliques stay apart") {
    val twoTriangles = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    assert(lpa(twoTriangles, 2) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("labelPropagation: synchronous semantics pinned on a path (2-cycle is the contract)") {
    // path 1-2-3. Round 1: n1<-2 (only neighbor), n2<-min(1,3)=1, n3<-2.
    // Round 2: n1 <- n2's r1 label 1; n2 <- both neighbors carry 2 -> 2;
    // n3 <- 1. The documented synchronous oscillation, exactly.
    assert(lpa(Seq((1L, 2L), (2L, 3L)), 1) === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    assert(lpa(Seq((1L, 2L), (2L, 3L)), 2) === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("labelPropagation: direction, duplicates, self-loops and nulls don't matter") {
    val base = lpa(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 2)
    val messy = Seq((2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 1L), (1L, 3L))
    assert(lpa(messy, 2) === base)
    val withNull = messy.map { case (a, b) => (Option(a), Option(b)) } :+
      ((Option(5L), Option.empty[Long]))
    val got = Graphs.labelPropagation(withNull.toDF("a", "b"), "a", "b", 2)
      .as[(Long, Long)].collect().toMap
    assert(got === base, "a null-endpoint edge must vanish, not create a node")
  }

  // --- degree assortativity -------------------------------------------------

  test("degreeAssortativity: a star is maximally disassortative (r = -1)") {
    // hub 0 to leaves 1..4: every edge joins degree 4 to degree 1
    val edges = (1L to 4L).map((0L, _)).toDF("a", "b")
    val r = Graphs.degreeAssortativity(edges, "a", "b").head()
    assert(r.getAs[Long]("n_nodes") === 5L)
    assert(r.getAs[Long]("n_edges") === 4L)
    assert(r.getAs[Double]("assortativity") === -1.0)
  }

  test("degreeAssortativity: hand-computed path graph P4 gives r = -1/2") {
    // 1-2-3-4: degrees 1,2,2,1. Newman 2002's textbook value for P4.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r = Graphs.degreeAssortativity(edges, "a", "b").head()
    assert(r.getAs[Double]("assortativity") === -0.5)
  }

  test("degreeAssortativity: regular graphs have zero variance -> NULL") {
    // triangle: every degree 2 -> no variance -> undefined
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val r = Graphs.degreeAssortativity(edges, "a", "b").head()
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  test("degreeAssortativity: self-loops and NULL endpoints drop") {
    val edges = Seq(
      (Some(0L), Some(1L)), (Some(0L), Some(2L)), (Some(0L), Some(3L)),
      (Some(0L), Some(4L)),
      (Some(7L), Some(7L)), (Some(9L), None)).toDF("a", "b")
    val r = Graphs.degreeAssortativity(edges, "a", "b").head()
    assert(r.getAs[Long]("n_nodes") === 5L)
    assert(r.getAs[Double]("assortativity") === -1.0)
  }

  // --- k-core ---------------------------------------------------------------

  test("kCore: strips a dangling chain off a triangle, keeps the core") {
    // triangle 1-2-3 plus chain 3-4-5: 2-core = the triangle, all degree 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = Graphs.kCore(edges, "a", "b", k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: peeling cascades (a chain vanishes entirely at k=2)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graphs.kCore(edges, "a", "b", k = 2, rounds = 4).count() === 0L)
    // ...but the whole chain IS a 1-core
    assert(Graphs.kCore(edges, "a", "b", k = 1, rounds = 4).count() === 4L)
  }

  test("kCore: extra rounds past convergence are idempotent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val a4 = Graphs.kCore(edges, "a", "b", k = 2, rounds = 4)
      .as[(Long, Long)].collect().toSet
    val a8 = Graphs.kCore(edges, "a", "b", k = 2, rounds = 8)
      .as[(Long, Long)].collect().toSet
    assert(a4 === a8)
  }

  test("linkPrediction: non-adjacent 2-hop pairs only, hand-computed scores") {
    // path 1-2-3 plus 3-4: candidates (1,3) via 2; (2,4) via 3; (1,4) none
    // (3 hops). Pair (1,3): common {2}, deg1=1 deg3=2 -> jacc 1/2,
    // aa = 1/ln(2). Pair (2,4): common {3}, deg2=2 deg4=1 -> jacc 1/2,
    // aa = 1/ln(2). Edge (1,2) itself never appears.
    def ln9(x: Double) = BigDecimal(math.log(x))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graphs.linkPrediction(edges, "a", "b")
      .select("id_a", "id_b", "common_neighbors", "jaccard", "adamic_adar")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val aa2 = r9(r9(1.0 / ln9(2.0)))
    assert(got((1L, 3L)) === ((1L, 3L, 1L, 0.5, aa2)))
    assert(got((2L, 4L)) === ((2L, 4L, 1L, 0.5, aa2)))
    assert(got.size === 2, "adjacent and >2-hop pairs never score")
    // a triangle has no non-adjacent pairs at all
    val tri = Graphs.linkPrediction(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b"), "a", "b")
    assert(tri.count() === 0L)
    // hub cut: star center above maxCenterDegree stops vouching
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)).toDF("a", "b")
    assert(Graphs.linkPrediction(star, "a", "b").count() === 6L)
    assert(Graphs.linkPrediction(star, "a", "b",
      maxCenterDegree = Some(3L)).count() === 0L)
  }

  test("kCore: duplicate edges, reversed orientations, and self-loops don't inflate degrees") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
      .toDF("a", "b")
    val got = Graphs.kCore(edges, "a", "b", k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
