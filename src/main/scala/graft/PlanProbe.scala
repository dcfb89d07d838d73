package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("c3_transform_join", "q22_multi_join", "p11_curation")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).size
      println(s"PROBE $name: broadcastJoins=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
        s"exchanges=${n("Exchange")} scans=${n("Scan parquet|FileScan")} " +
        s"wsc=${n("WholeStageCodegen")}")
    }
    spark.stop()
  }
}
