package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics over edge lists (beyond-reference,
  * SURVEY.md §2.4). [[DupClusters]] owns connected components; this file
  * holds PageRank (Page et al. 1999) — the standard authority score for
  * curation weighting (rank domains by link authority, rank documents by
  * centrality in the near-dup neighborhood graph).
  *
  * 100 TB shape: the textbook MapReduce formulation — per iteration one
  * join of edges×ranks on the source key, one map-side-combinable inflow
  * aggregation on the destination key, one bounded (1-row) dangling-mass
  * aggregate, all staged per round through the pluggable [[Stager]] so
  * lineage cannot stack across iterations (the [[DupClusters]] rule).
  * Driver sees only two scalars per call (node count, per-round stage
  * actions) — never vertex data.
  *
  * Determinism (the p26/p61 oracle contract): per-(src,dst) contribution
  * pr/outdeg is one IEEE division; inflow sums contributions through
  * DECIMAL(38,18) (order-independent); each iteration's rank is rounded
  * through DECIMAL(25,12), which absorbs the ≤2 ulp noise from literal
  * arithmetic differing across engines (e.g. DuckDB computes 1.0-0.85 in
  * exact decimal, the JVM in binary64 — 2e-17 apart, 5 orders below the
  * rounding grain).
  */
object Graphs {

  /** PageRank over directed edges. Dangling mass (nodes with no
    * out-edges) is redistributed uniformly, per the original paper.
    * Returns (id, pr). Self-loops and duplicate edges are dropped
    * (`distinct` on the canonical edge list); null endpoints dropped. */
  def pagerank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 10,
      damping: Double = 0.85,
      stager: Stager = Stager.LocalCheckpoint): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val e = stager.stage(
      edges.select(col(s"`$srcCol`").as("u"), col(s"`$dstCol`").as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
        .distinct(),
      s"pagerank_edges_$runId")
    val nodes = stager.stage(
      e.select(col("u").as("id")).unionAll(e.select(col("v").as("id"))).distinct(),
      s"pagerank_nodes_$runId")
    // one driver scalar — the graph's node count; bounded at any scale
    val n = nodes.count().toDouble
    val outdeg = stager.stage(
      e.groupBy(col("u")).agg(count(lit(1)).as("__outdeg")),
      s"pagerank_outdeg_$runId")
    val jump = 1.0 - damping

    var pr = nodes.withColumn("pr", lit(1.0 / n))
    for (i <- 1 to iters) {
      val inflow = e
        .join(pr.select(col("id").as("u"), col("pr")), "u")
        .join(outdeg, "u")
        .select(col("v").as("id"),
          (col("pr") / col("__outdeg").cast("double")).as("__c"))
        .groupBy(col("id"))
        .agg(sum(col("__c").cast(DecimalType(38, 18))).cast("double").as("__in"))
      val dangling = pr.join(outdeg.select(col("u").as("id")), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("pr").cast(DecimalType(38, 18))),
          lit(0).cast(DecimalType(38, 18))).cast("double").as("__dang"))
      pr = stager.stage(
        nodes.join(inflow, Seq("id"), "left")
          .crossJoin(broadcast(dangling))
          .select(col("id"),
            (lit(jump) / lit(n) + lit(damping) *
              (coalesce(col("__in"), lit(0.0)) + col("__dang") / lit(n)))
              .cast(DecimalType(25, 12)).cast("double").as("pr")),
        s"pagerank_iter_${runId}_$i")
    }
    pr
  }
}
