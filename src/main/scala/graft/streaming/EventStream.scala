package graft.streaming

import graft.catalog.Catalog
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Task completion event (reference interface/messaging + TaskEvent,
  * internal/geocube/consolidation_event.go:251-289): sent by workers when
  * a consolidation task finishes. */
final case class TaskEvent(
    job_id: String,
    task_id: String,
    status: String, // SUCCEEDED | FAILED | CANCELLED
    error: String,
    ts: java.sql.Timestamp)

/** The event/ingestion path (SURVEY §2.12): the reference runs an
  * at-least-once queue (pgqueue/PubSub) whose consumers drive the job FSM
  * with idempotent guards (operations.go:69-117 handleTaskEvt). The Spark
  * form is Structured Streaming with `foreachBatch`: per micro-batch,
  * aggregate the task outcomes and merge the counters into the jobs table
  * — duplicates collapse inside the batch aggregation, and the journal
  * append is the transaction boundary.
  */
object EventStream {

  /** Aggregate a (micro-)batch of task events into per-job counter deltas
    * (A9: active_tasks/failed_tasks maintenance, create.sql:135-136).
    * Deduplicates by (job, task): at-least-once delivery upstream. */
  def taskEventDeltas(batch: Dataset[TaskEvent]): DataFrame =
    batch.dropDuplicates("job_id", "task_id")
      .groupBy(col("job_id"))
      .agg(
        count(lit(1)).as("finished_tasks"),
        sum(when(col("status") === "FAILED", 1).otherwise(0)).as("failed_tasks"),
        max(col("ts")).as("last_event_ts"))

  /** Run the streaming FSM driver: consume task events, fold the deltas
    * into the job journal each micro-batch (exactly-once per batch via the
    * idempotent journal append keyed by batchId). */
  def driveJobCounters(spark: SparkSession, cat: Catalog,
      events: Dataset[TaskEvent], queryName: String): StreamingQuery = {
    import spark.implicits._
    events.writeStream
      .outputMode(OutputMode.Update)
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: Dataset[TaskEvent], batchId: Long) =>
        val deltas = taskEventDeltas(batch)
        if (!deltas.isEmpty) {
          val rows = deltas.collect().map { r =>
            org.apache.spark.sql.Row(
              r.getAs[String]("job_id"), s"batch-$batchId", "TASKEVENT",
              "COUNTERS",
              r.getAs[Long]("finished_tasks").toInt,
              r.getAs[Long]("failed_tasks").toInt,
              s"""{"batch":$batchId}""",
              r.getAs[java.sql.Timestamp]("last_event_ts"),
              r.getAs[java.sql.Timestamp]("last_event_ts"))
          }
          cat.append(spark.createDataFrame(
            spark.sparkContext.parallelize(rows.toSeq),
            graft.catalog.Schemas.jobs), "jobs")
        }
        ()
      }
      .start()
  }

  /** Windowed ingestion aggregation (the watermark+window shape of
    * Structured Streaming the reference never had — §2.12): tumbling
    * windows with late-data tolerance over an event stream. */
  def windowedCounts(events: DataFrame, window: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
