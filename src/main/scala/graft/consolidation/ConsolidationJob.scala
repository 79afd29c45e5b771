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
      state: String, payload: String = ""): Unit =
    logStateRaw(spark, cat, spec.jobId, spec.name, state, payload)

  private[consolidation] def logStateRaw(spark: SparkSession, cat: Catalog,
      jobId: String, name: String, state: String, payload: String = "",
      jobType: String = "CONSOLIDATION"): Unit = {
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    cat.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(jobId, name, jobType, state, 0, 0, payload, now, now))),
      Schemas.jobs), "jobs")
  }

  /** CancelJob by id (service.go:74 / grpc CancelJob): routes on the
    * journaled job type — consolidation jobs roll back via the csldRollback
    * chain below, deletion jobs via `DeletionJob.cancel`. NOTFOUND for ids
    * with no journal. */
  def cancelById(spark: SparkSession, cat: Catalog, jobId: String): String = {
    val rows = cat.read(spark, "jobs").filter(col("id") === jobId)
      .select("name", "type").collect()
    if (rows.isEmpty) return "NOTFOUND"
    val name = rows.head.getString(0)
    rows.head.getString(1) match {
      case "DELETION" => DeletionJob.cancel(spark, cat, jobId, name)
      case _ => cancelConsolidation(spark, cat, jobId, name)
    }
  }

  /** CancelledByUser — allowed until the swap is journaled (job.go
    * :550-580 marks the post-swap states critical): runs the csldRollback
    * chain (consolidater.go:826-870) — drop this job's INACTIVE datasets,
    * purge its not-yet-authoritative containers/tiles, release the locks
    * (our lock is the journal itself) — and journals ABORTED. A job at or
    * past CONSOLIDATIONEFFECTIVE refuses with CANCELLATIONFAILED: the old
    * datasets are already TODELETE-flagged and the new ones serve reads. */
  def cancel(spark: SparkSession, cat: Catalog, spec: Spec): String =
    cancelConsolidation(spark, cat, spec.jobId, spec.name)

  private def cancelConsolidation(spark: SparkSession, cat: Catalog,
      jobId: String, name: String): String = {
    val done: Set[String] = cat.read(spark, "jobs")
      .filter(col("id") === jobId).select("state")
      .collect().map(_.getString(0)).toSet
    // a job id with no journal is a typo, not a cancellable job — refusing
    // here also keeps the id usable (ABORTED would be terminal for run())
    if (done.isEmpty) return "NOTFOUND"
    val prefix = s"${cat.root}/containers/$jobId/"
    // the swap rewrite and its journal entry are two writes: a crash
    // between them leaves CONSOLIDATIONEFFECTIVE unjournaled while the
    // job's datasets already serve reads — detect the APPLIED swap from
    // the data (any ACTIVE dataset under the job prefix), not the journal
    lazy val swapApplied = cat.read(spark, "datasets")
      .filter(col("container_uri").startsWith(prefix) &&
        col("status") === "ACTIVE")
      .limit(1).count() > 0
    if (done.contains("CONSOLIDATIONEFFECTIVE") || done.contains("DONE") ||
        swapApplied) {
      logStateRaw(spark, cat, jobId, name, "CANCELLATIONFAILED",
        """{"error":"job already effective"}""")
      return "CANCELLATIONFAILED"
    }
    // from CONSOLIDATIONDONE/INDEXED: the job's INACTIVE datasets vanish
    cat.rewrite(cat.read(spark, "datasets")
      .filter(!(col("status") === "INACTIVE" &&
        col("container_uri").startsWith(prefix))), "datasets")
    // from CONSOLIDATIONINPROGRESS: its containers/tiles are not
    // authoritative until INDEXED — purge them
    cat.rewrite(cat.read(spark, "tiles")
      .filter(!col("container_uri").startsWith(prefix)), "tiles")
    cat.rewrite(cat.read(spark, "containers")
      .filter(!col("uri").startsWith(prefix)), "containers")
    logStateRaw(spark, cat, jobId, name, "ABORTED")
    "ABORTED"
  }

  /** Drive the FSM (sync execution mode). `pauseAfter` is the step-by-step
    * execution level of the reference (operations.proto:24-30 + job.go
    * pause levels): the job journals its state and stops after the named
    * state; a later call with the same spec resumes from the journal
    * (idempotent state guards, like handleTaskEvt's "already done" path).
    * Returns the final state reached. */
  def run(spark: SparkSession, cat: Catalog, spec: Spec,
      pauseAfter: Option[String] = None): String = {
    // resume support: states already journaled for this job are skipped
    val done: Set[String] = cat.read(spark, "jobs")
      .filter(col("id") === spec.jobId).select("state")
      .collect().map(_.getString(0)).toSet
    def step(state: String)(body: => String): Boolean = {
      if (!done.contains(state)) {
        val payload = body
        logState(spark, cat, spec, state, payload)
      }
      pauseAfter.contains(state)
    }
    if (done.contains("ABORTED")) return "ABORTED" // cancelled: terminal
    if (!done.contains("NEW")) logState(spark, cat, spec, "NEW")
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
      if (step("CREATED") { s"""{"locked":${locked.size}}""" }) return "CREATED"

      // C3 prepare orders
      val tasks = Consolidation.prepareOrders(spark, cat, spec.jobId,
        spec.instanceId, spec.recordIds, spec.layout, spec.collapseOnRecordId)
      tasks.cache()
      val nTasks = tasks.count()
      if (step("CONSOLIDATIONINPROGRESS") { s"""{"tasks":$nTasks}""" })
        return "CONSOLIDATIONINPROGRESS"

      // C4 consolidate (one Spark task per container, + overview pyramid).
      // On resume before indexing, partial/previous outputs of this job are
      // purged and C4 redone — the reference's retry path deletes partial
      // uploads (handler_consolidation.go cancellation/cleanup) rather than
      // trusting them. Once INDEXED is journaled the outputs are authoritative
      // and C4 is skipped entirely.
      val newTiles =
        if (done.contains("CONSOLIDATIONINDEXED"))
          spark.emptyDataFrame // not needed downstream
        else {
          // Purge unconditionally whenever C4 is about to be redone:
          // consolidate() appends tiles/containers rows BEFORE the
          // CONSOLIDATIONDONE state is journaled, so a crash between those
          // appends and logState leaves partial rows behind with no DONE
          // marker — gating the purge on CONSOLIDATIONDONE would let the
          // rerun append a full duplicate set.
          val prefix = s"${cat.root}/containers/${spec.jobId}/"
          cat.rewrite(cat.read(spark, "tiles")
            .filter(!col("container_uri").startsWith(prefix)), "tiles")
          cat.rewrite(cat.read(spark, "containers")
            .filter(!col("uri").startsWith(prefix)), "containers")
          Consolidation.consolidate(spark, cat, tasks, spec.params,
            spec.layout.overviewsMinSize)
        }
      tasks.unpersist() // consumed by count() + consolidate()
      if (step("CONSOLIDATIONDONE") { "" }) return "CONSOLIDATIONDONE"

      // C5 index (INACTIVE)
      if (!done.contains("CONSOLIDATIONINDEXED"))
        Consolidation.index(spark, cat, newTiles, spec.instanceId, spec.params)
      if (step("CONSOLIDATIONINDEXED") { "" }) return "CONSOLIDATIONINDEXED"

      // C6 swap (atomic; collapse keeps the originals ACTIVE; the flip is
      // scoped to this job's containers so a concurrent job's INACTIVE
      // outputs stay inactive)
      if (!done.contains("CONSOLIDATIONEFFECTIVE"))
        Consolidation.swap(spark, cat, spec.instanceId, locked,
          keepOld = spec.collapseOnRecordId.isDefined,
          newPrefix = Some(s"${cat.root}/containers/${spec.jobId}/"))
      if (step("CONSOLIDATIONEFFECTIVE") { "" }) return "CONSOLIDATIONEFFECTIVE"

      // C7 delete old
      if (!done.contains("DONE")) Consolidation.deleteDatasets(spark, cat)
      step("DONE") { "" }
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
