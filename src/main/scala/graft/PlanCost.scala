package graft

/** Diagnostic harness (guide §1: measure first) — decompose the per-query
  * FIXED floor: for each named gate query print construction+analysis time,
  * executed-plan job/stage/task counts, the sum of stage wall-clocks and of
  * task run times, and the driver "gap" (wall − Σ stage wall ≈ planning +
  * job-submission + AQE re-optimization round-trips that never appear in
  * any stage). Local iteration only; not part of the bench contract.
  *
  * Usage: graft.PlanCost <sfDir> [name,name,... | all] [reps]
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.lift(1).filter(_ != "all").map(_.split(",").toSet)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(0L)
        stages.add((ms, i.numTasks))
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
    })
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1000).selectExpr("sum(id % 7)").collect()
    println(f"${"query"}%-28s ${"wall"}%7s ${"cons"}%6s ${"jobs"}%4s ${"stg"}%4s ${"tsk"}%5s ${"stgSum"}%7s ${"taskSum"}%8s ${"gap"}%7s")
    import scala.jdk.CollectionConverters._
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
        if only.forall(_.contains(name))) {
      try {
        // untimed warm pass
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        var best = (Double.MaxValue, 0.0, 0, 0, 0, 0.0, 0.0)
        for (_ <- 1 to reps) {
          val unpersistBefore = spark.sparkContext.getPersistentRDDs.keySet
          jobs = 0; stages.clear(); taskMs.set(0)
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          // listener bus is async — give it a beat before reading counters
          Thread.sleep(120)
          val wall = (t2 - t0) / 1e9
          val cons = (t1 - t0) / 1e9
          val ss = stages.asScala.toSeq
          val rec = (wall, cons, jobs, ss.size, ss.map(_._2).sum,
            ss.map(_._1).sum / 1e3, taskMs.get() / 1e3)
          if (rec._1 < best._1) best = rec
          spark.sparkContext.getPersistentRDDs
            .filter { case (id, _) => !unpersistBefore.contains(id) }
            .values.foreach(_.unpersist(blocking = false))
        }
        val (wall, cons, nj, nst, ntk, stgSum, tskSum) = best
        println(f"$name%-28s ${wall}%7.3f ${cons}%6.3f $nj%4d $nst%4d $ntk%5d ${stgSum}%7.3f ${tskSum}%8.3f ${wall - stgSum}%7.3f")
      } catch { case e: Throwable =>
        println(s"$name FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    spark.stop()
  }
}
