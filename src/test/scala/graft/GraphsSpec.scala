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
}
