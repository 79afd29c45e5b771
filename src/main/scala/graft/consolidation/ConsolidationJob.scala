package graft.consolidation

import graft.catalog.{Catalog, CatalogQueries, DatasetFilters, Schemas}
import graft.layout.Layout
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Job FSM (C1, reference internal/geocube/job.go + consolidater.go
  * csldOnEnterNewState:21-106) in its Spark-native form: the reference
  * needs 20 states because work hops across processes through a message
  * queue with retries; here each state handler IS a Spark action, so the
  * happy path is a linear drive with the state journal persisted to the
  * `jobs` table after every transition (step-by-step replay/debugging —
  * the equivalent of the reference's pause levels). Failure rolls back the
  * not-yet-swapped INACTIVE datasets, mirroring job.go's rollback path. */
object ConsolidationJob {

  final case class Spec(
      jobId: String,
      name: String,
      instanceId: String,
      recordIds: Seq[String],
      layout: Layout,
      params: ConsolidationParams,
      collapseOnRecordId: Option[String] = None)

  val states: Seq[String] = Seq(
    "NEW", "CREATED", "CONSOLIDATIONINPROGRESS", "CONSOLIDATIONDONE",
    "CONSOLIDATIONINDEXED", "CONSOLIDATIONEFFECTIVE", "DONE")

  private def logState(spark: SparkSession, cat: Catalog, spec: Spec,
      state: String, payload: String = ""): Unit = {
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    cat.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(spec.jobId, spec.name, "CONSOLIDATION", state, 0, 0, payload, now, now))),
      Schemas.jobs), "jobs")
  }

  /** Drive the FSM to DONE (sync execution mode). Returns the final state. */
  def run(spark: SparkSession, cat: Catalog, spec: Spec): String = {
    logState(spark, cat, spec, "NEW")
    try {
      // layout validation on entry (layout.go:120-129: bad interlacing
      // grammar or grid params fail the job before any work)
      spec.layout.validate()
      // C2 init: lock = snapshot the ids of the datasets to consolidate
      val locked = CatalogQueries.findDatasets(spark, cat, DatasetFilters(
        status = Seq("ACTIVE"), instanceIds = Seq(spec.instanceId),
        recordIds = spec.recordIds, order = false))
        .select("id").collect().map(_.getString(0)).toSeq
      require(locked.nonEmpty, s"job ${spec.jobId}: no datasets to consolidate")
      logState(spark, cat, spec, "CREATED", s"""{"locked":${locked.size}}""")

      // C3 prepare orders
      val tasks = Consolidation.prepareOrders(spark, cat, spec.jobId,
        spec.instanceId, spec.recordIds, spec.layout, spec.collapseOnRecordId)
      tasks.cache()
      val nTasks = tasks.count()
      logState(spark, cat, spec, "CONSOLIDATIONINPROGRESS", s"""{"tasks":$nTasks}""")

      // C4 consolidate (one Spark task per container, + overview pyramid)
      val newTiles = Consolidation.consolidate(spark, cat, tasks, spec.params,
        spec.layout.overviewsMinSize)
      logState(spark, cat, spec, "CONSOLIDATIONDONE")

      // C5 index (INACTIVE)
      Consolidation.index(spark, cat, newTiles, spec.instanceId, spec.params)
      logState(spark, cat, spec, "CONSOLIDATIONINDEXED")

      // C6 swap (atomic)
      Consolidation.swap(spark, cat, spec.instanceId, locked)
      logState(spark, cat, spec, "CONSOLIDATIONEFFECTIVE")

      // C7 delete old
      Consolidation.deleteDatasets(spark, cat)
      logState(spark, cat, spec, "DONE")
      "DONE"
    } catch {
      case e: Exception =>
        // rollback: drop this job's INACTIVE datasets (job.go rollback path)
        try {
          val ds = cat.read(spark, "datasets")
          cat.rewrite(ds.filter(!(col("status") === "INACTIVE" &&
            col("container_uri").startsWith(s"${cat.root}/containers/${spec.jobId}/"))),
            "datasets")
        } catch { case _: Exception => () }
        logState(spark, cat, spec, "FAILED", s"""{"error":"${e.getMessage}"}""")
        "FAILED"
    }
  }
}
