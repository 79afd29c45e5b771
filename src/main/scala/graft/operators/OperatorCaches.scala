package graft.operators

import org.apache.spark.sql.Dataset

/** Registry for the intermediate relations the LSH-family operators
  * `.cache()` (signature/token tables scanned several times across
  * self-join branches). The cache is consumed entirely within the returned
  * plan's first action, but Spark gives no way to unpersist-on-completion
  * from inside a lazy plan — so the operators register their cached
  * relations here and the caller releases them once the action is done:
  *
  * {{{
  *   val pairs = Dedup.lshPairs(df, ...)   // registers its signature cache
  *   pairs.count()                          // action consumes the cache
  *   OperatorCaches.unpersistAll()          // release executor storage
  * }}}
  *
  * Scoped alternative to `spark.catalog.clearCache()`, which would also
  * drop caches the application owns. Bench/Verify call this between
  * queries so one query's signature cache can't pollute the next query's
  * executor memory (the round-2 p3/a5 bench-regression suspect).
  */
object OperatorCaches {
  private val registered = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Register an already-cached dataset for later release; returns it. */
  def register[T](ds: Dataset[T]): Dataset[T] =
    synchronized { registered += (() => ds.unpersist(): Unit); ds }

  /** Register an arbitrary release action (e.g. unpersisting a
    * localCheckpoint's underlying RDD blocks, which `Dataset.unpersist`
    * cannot reach — it only consults the plan-cache manager). */
  def registerRelease(release: () => Unit): Unit =
    synchronized { registered += release }

  /** Run every registered release (blocking=false semantics) and clear. */
  def unpersistAll(): Unit = synchronized {
    registered.foreach(_.apply())
    registered.clear()
  }

  /** Release the executor blocks behind a `localCheckpoint`, which
    * `Dataset.unpersist` can't: it consults the plan-cache manager, which
    * never saw the checkpoint's internal RDD — reach through the analyzed
    * plan's LogicalRDD instead. Shared by the checkpoint users (connected
    * components' label passes, the consolidation lock snapshot). */
  def releaseLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
