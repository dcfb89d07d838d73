package graft.operators

import org.apache.spark.sql.DataFrame
import graft.core.TableGraph

/** Strategy for materializing a multiply-consumed intermediate EXACTLY once.
  *
  * Several operators (minhash dedup most of all) build an intermediate that
  * feeds 3+ consumers; Catalyst's column pruning specializes each copy of
  * the subtree, defeating ReuseExchange, so without an explicit
  * materialization the whole upstream recomputes per consumer. HOW to
  * materialize is a deployment decision, so it is pluggable:
  *
  *  - [[Stager.LocalCheckpoint]] (default): eager in-memory/disk
  *    checkpoint. Fast (the eager cut keeps the downstream plans small —
  *    measured 2x faster than lazy Persist on the curation funnel at
  *    sf0.1), but it TRUNCATES LINEAGE: on a real cluster a lost executor
  *    cannot recompute its blocks and the job dies. Right where re-running
  *    the job is an acceptable recovery.
  *  - [[Stager.Persist]]: MEMORY_AND_DISK persist, lineage retained —
  *    executor loss recomputes. Blocks are still cluster-local (no
  *    durability across driver restart).
  *  - [[Stager.Parquet]]: stage through the [[TableGraph]] warehouse
  *    (durable storage — HDFS/S3 on a cluster). The cluster-safe mode:
  *    lineage restarts from the staged files, any executor can re-read
  *    them, and the staged table participates in graph lineage/TTL.
  */
trait Stager {
  /** Return a DataFrame equivalent to `df` that consumers can scan
    * repeatedly without recomputing `df`'s plan. */
  def stage(df: DataFrame, name: String): DataFrame

  /** Whether [[stage]] RUNS an action before returning (localCheckpoint,
    * parquet write) or merely marks storage (persist). Callers that
    * piggyback on a stage's action — e.g. DupClusters' Observation-based
    * convergence signature — use this to decide whether metrics can
    * possibly be in flight (eager) or cannot have been produced at all
    * (lazy, skip the wait). */
  def eager: Boolean
}

object Stager {

  /** Eager local checkpoint (lineage-truncating — local mode / tests). */
  object LocalCheckpoint extends Stager {
    override def stage(df: DataFrame, name: String): DataFrame = df.localCheckpoint()
    override def eager: Boolean = true
  }

  /** MEMORY_AND_DISK persist; lineage retained, not durable. */
  object Persist extends Stager {
    override def stage(df: DataFrame, name: String): DataFrame =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    override def eager: Boolean = false
  }

  /** Durable parquet staging through the TableGraph warehouse. */
  final case class Parquet(graph: TableGraph) extends Stager {
    override def stage(df: DataFrame, name: String): DataFrame = {
      graph.addTable(name, df, metadata = Map("role" -> "stage"))
      graph.getTable(df.sparkSession, name)
        .getOrElse(sys.error(s"stage $name vanished from the graph"))
    }
    override def eager: Boolean = true
  }

  /** Delegating wrapper that remembers a release handle for EVERY stage it
    * creates, so a caller (Curation.curateStaged) frees exactly its own
    * stages — never blocks persisted by concurrent work in the same session
    * or other callers' Parquet stage tables.
    *
    * Per-mode handle:
    *  - Persist: the staged Dataset itself — `unpersist` works there.
    *  - Parquet: the stage NAME — dropped via [[TableGraph.dropStage]].
    *  - LocalCheckpoint (and unknown stagers): `Dataset.unpersist` is a
    *    NO-OP for localCheckpoint blocks and the checkpointed RDD is not
    *    reachable through public API, so the handle is the persistent-RDD-id
    *    delta captured around the single EAGER stage call — a window of one
    *    blocking checkpoint, not the whole funnel + consumer lifetime the
    *    old global-delta cleanup raced over. Released ids are re-checked
    *    against the live registry so an id freed elsewhere is skipped.
    */
  final class Recording(underlying: Stager) extends Stager {
    private val handles = scala.collection.mutable.ListBuffer[() => Unit]()
    private lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[Recording])
    override def eager: Boolean = underlying.eager

    override def stage(df: DataFrame, name: String): DataFrame = synchronized {
      underlying match {
        case Persist =>
          val out = underlying.stage(df, name)
          handles += (() => out.unpersist(blocking = false))
          out
        case Parquet(graph) =>
          val out = underlying.stage(df, name)
          handles += (() => graph.dropStage(name))
          out
        case _ =>
          // RDD-id-delta fallback. Residual caveats (also noted on
          // Curation.curateStaged): a concurrent thread persisting during
          // this one eager stage call gets its RDD captured in `mine` and
          // freed at release; a LAZY unknown stager persists nothing during
          // the call, so the delta is empty and release frees nothing —
          // warn so the leak is visible instead of silent.
          val sc = df.sparkSession.sparkContext
          val before = sc.getPersistentRDDs.keySet.toSet
          val out = underlying.stage(df, name)
          val mine = sc.getPersistentRDDs.keySet.toSet -- before
          if (mine.isEmpty)
            log.warn(s"Recording stager: stage '$name' through $underlying registered no " +
              "persistent RDDs (lazy stager?) — release() will not free its storage")
          handles += (() => sc.getPersistentRDDs
            .filter { case (rddId, _) => mine.contains(rddId) }
            .values.foreach(_.unpersist(blocking = false)))
          out
      }
    }

    /** Release everything staged through this wrapper (idempotent). */
    def release(): Unit = synchronized {
      handles.foreach(_.apply())
      handles.clear()
    }
  }
}
