package graft

/** Diagnostic harness (guide §1: measure first): run named gate queries
  * with a stage-level listener and print, per query — total wall time per
  * rep, then every STAGE's wall time, task count, and name — so the cost
  * of a multi-job query (stager materializations, driver-loop rounds,
  * range-bounds sampling) is attributable without the UI. Not part of the
  * bench contract; local iteration only.
  *
  * Usage: graft.TimeQuery <sfDir> <name,name,...> [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSet)
      .getOrElse(sys.error("pass query names"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages.add((i.stageId, i.name.takeWhile(_ != '\n'), ms, i.numTasks))
      }
    })
    // session warm-up (parquet reader, codegen, noop sink)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1000).selectExpr("sum(id % 7)").collect()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
        if names.contains(name)) {
      // one untimed warm pass
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$name warm FAILED: ${e.getMessage}") }
      for (r <- 1 to reps) {
        stages.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"\n== $name rep $r: $sec%.3f s, ${stages.size} stages ==")
        if (r == reps) {
          import scala.jdk.CollectionConverters._
          for ((id, nm, ms, nt) <- stages.asScala.toSeq.sortBy(-_._3).take(12))
            println(f"  stage $id%4d  $ms%6d ms  $nt%4d tasks  $nm")
        }
      }
      if (sys.env.get("SPARK_GRAFT_TQ_PLAN").contains("1")) {
        println(s"---- plan $name ----")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
