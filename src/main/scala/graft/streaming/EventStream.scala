package graft.streaming

import graft.catalog.TableStore
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

/** Streaming FSM state for one job: task ids already counted (idempotence
  * under at-least-once delivery) + failure tally. */
final case class JobFsmState(seen: Seq[String], failed: Int)

/** One FSM emission per job per micro-batch. */
final case class JobProgress(
    job_id: String, expected: Int, finished: Int, failed: Int, state: String)

/** One banded-signature arrival: a document id + one of its LSH band
  * buckets (band index folded into the key). */
final case class BandArrival(doc_id: Long, bucket: String)

/** Streaming state per LSH bucket: doc ids seen so far (capped) + the
  * overflow flag once the cap is hit. */
final case class BucketState(ids: Seq[Long], overflowed: Boolean)

/** A streaming candidate emission: a near-dup candidate pair, or (with
  * `overflowed = true` and sentinel ids) a bucket-overflow notice. */
final case class CandidatePair(
    doc_a: Long, doc_b: Long, bucket: String, overflowed: Boolean)

/** The event/ingestion path (SURVEY §2.12): the reference runs an
  * at-least-once queue (pgqueue/PubSub) whose consumers drive the job FSM
  * with idempotent guards (operations.go:69-117 handleTaskEvt). The Spark
  * form is Structured Streaming with `foreachBatch`: per micro-batch,
  * aggregate the task outcomes and merge the counters into the jobs table
  * — duplicates collapse inside the batch aggregation, and the journal
  * append is the transaction boundary.
  */
object EventStream {

  /** External-broker adapter, consumer side (reference
    * interface/messaging/messaging.go:12-35 Publisher/Consumer, with
    * pgqueue/PubSub backends): task events arrive as JSON-lines files
    * dropped into a queue directory by any external producer — the
    * transport-agnostic proof for the FSM, which consumes a
    * `Dataset[TaskEvent]` and never sees the broker. A Kafka deployment
    * swaps `readStream.json(dir)` for `readStream.format("kafka")` +
    * the same `.as[TaskEvent]`; nothing downstream changes. Delivery is
    * at-least-once (a crashed producer may re-drop a file), exactly the
    * reference brokers' contract — the counter fold and the streaming
    * FSM both dedup on (job, task). */
  def fileQueueEvents(spark: SparkSession, queueDir: String): Dataset[TaskEvent] = {
    import spark.implicits._
    spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[TaskEvent]].schema)
      .json(queueDir)
      .as[TaskEvent]
  }

  /** The wire encoding shared by EVERY broker binding (one message = one
    * JSON object, the same shape the file queue frames as lines and a
    * Kafka producer puts in the record value): full string escaping —
    * error fields carry exception text with newlines/tabs, and one
    * unescaped control character would corrupt the framing and silently
    * null the row in a PERMISSIVE reader. */
  def encodeEvent(e: TaskEvent): String = {
    def esc(s: String): String = graft.core.JsonUtil.escape(s)
    s"""{"job_id":"${esc(e.job_id)}","task_id":"${esc(e.task_id)}",""" +
      s""""status":"${esc(e.status)}","error":"${esc(e.error)}",""" +
      s""""ts":"${e.ts.toInstant}"}""" // ISO-8601 Z — Spark's default parse
  }

  /** Broker adapter, generic consumer side: any Structured Streaming
    * source whose rows carry the message bytes in a `value` column (the
    * Kafka/PubSub wire shape) maps onto the FSM with this one shim —
    * parse the [[encodeEvent]] JSON out of the value, done. Downstream
    * (driveJobCounters, the deltas fold, the journal) consumes
    * `Dataset[TaskEvent]` and cannot tell transports apart. */
  def eventsFromBroker(broker: DataFrame): Dataset[TaskEvent] = {
    val spark = broker.sparkSession
    import spark.implicits._
    val schema = implicitly[org.apache.spark.sql.Encoder[TaskEvent]].schema
    broker
      .select(from_json(col("value").cast("string"), schema).as("e"))
      .select("e.*").as[TaskEvent]
  }

  /** Kafka binding — pure configuration over [[eventsFromBroker]]
    * (messaging.go's PubSub/pgqueue backends swap the same way). Needs
    * the spark-sql-kafka connector on the deploy classpath; the sandbox
    * has no broker, so the seam is proven by StreamingSpec feeding the
    * SAME wire bytes through an in-memory source instead. */
  def kafkaEvents(spark: SparkSession, bootstrapServers: String,
      topic: String, startingOffsets: String = "latest"): Dataset[TaskEvent] =
    eventsFromBroker(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load())

  /** Publisher side of the file queue (messaging.go Publish): one
    * JSON-lines file per publish batch, written to a temp name and
    * renamed — the file source must never observe a partial message,
    * the file-system analogue of a broker's atomic enqueue. Spark-free:
    * external workers publish without a session. */
  def publishToFileQueue(events: Seq[TaskEvent], queueDir: String): Unit = {
    val dir = java.nio.file.Paths.get(queueDir)
    java.nio.file.Files.createDirectories(dir)
    val payload = events.map(encodeEvent).mkString("", "\n", "\n")
    // UUID name: nanoTime+hash can collide across publisher PROCESSES and
    // POSIX ATOMIC_MOVE replaces an existing target — a collision would
    // silently drop a whole published batch
    val name = s"evt-${java.util.UUID.randomUUID()}"
    val tmp = dir.resolve(s".$name.tmp")
    java.nio.file.Files.write(tmp, payload.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, dir.resolve(s"$name.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  /** Streaming exact-dedup for a document stream (the continuous-ingest
    * form of the training-pipeline dedup stage): key each document by its
    * canonical fingerprint (md5 over the sorted distinct token set —
    * [[graft.operators.Dedup.canonicalKey]]'s streaming twin) and keep the
    * first arrival within the watermark horizon via
    * `dropDuplicatesWithinWatermark`. State is bounded by the horizon —
    * the property that keeps this runnable forever at ingest scale;
    * at-least-once upstream delivery collapses here. */
  def dedupDocuments(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String = "10 minutes"): DataFrame =
    docs
      // THE batch key, not a re-implementation: a diverging inline copy
      // would silently stop batch and streaming dedup agreeing
      .withColumn("fingerprint", graft.operators.Dedup.canonicalKey(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

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

  /** Fold one micro-batch of task events into the job journal —
    * IDEMPOTENT per (runKey, job, TASK): one ledger row per task, name
    * `<runKey>-task-<task_id>`, so the journal itself is the dedup
    * ledger (the single streaming writer makes check-then-append
    * race-free) and convergence is per task, not per batch. The old
    * per-(runKey, batchId) marker only caught SAME-batch replays: an
    * at-least-once transport (a re-dropped queue file, broker
    * redelivery past a lost checkpoint) delivers the same (job, task)
    * event in a LATER micro-batch with a fresh batch id, and the
    * batch-keyed guard double-counted it — a consumer summing
    * finished_tasks could declare a job complete while real tasks were
    * still outstanding. The key carries `runKey` — batch-independent,
    * stable across restarts for checkpointed queries (runKey =
    * queryName), per-incarnation for throwaway streams (documented
    * at-least-once there). Volume: one row per task ever — the
    * cardinality of the tasks table itself, partition-pruned by type;
    * the per-batch probe reads only the `type=TASKEVENT` partition. */
  def journalTaskDeltas(spark: SparkSession, cat: TableStore,
      batch: Dataset[TaskEvent], batchId: Long, runKey: String): Unit = {
    val evts = batch.dropDuplicates("job_id", "task_id")
    if (!evts.isEmpty) {
      val already = cat.read(spark, "jobs")
        .filter(col("type") === "TASKEVENT" &&
          col("name").startsWith(s"$runKey-task-"))
        .select(col("id").as("job_id"), col("name"))
      val rows = evts.toDF()
        .withColumn("name", concat(lit(s"$runKey-task-"), col("task_id")))
        .withColumnRenamed("job_id", "id")
        .join(already.withColumnRenamed("job_id", "id"), Seq("id", "name"),
          "left_anti")
        .select(
          col("id"), col("name"),
          lit("TASKEVENT").as("type"), lit("COUNTERS").as("state"),
          lit(1).as("active_tasks"),
          when(col("status") === "FAILED", 1).otherwise(0).as("failed_tasks"),
          lit(s"""{"batch":$batchId}""").as("payload"),
          col("ts").as("created_at"), col("ts").as("updated_at"))
      if (rows.limit(1).count() > 0) cat.append(rows, "jobs")
    }
  }

  /** Run the streaming FSM driver: consume task events, fold the deltas
    * into the job journal each micro-batch (exactly-once per batch via
    * [[journalTaskDeltas]]'s replay guard). With `checkpointDir` the
    * query is DURABLE: batch ids persist across restarts, the marker is
    * keyed by the stable query name, and a restarted query resumes from
    * its source offsets — exactly-once end to end. Without it (tests,
    * throwaway streams) each start is a fresh incarnation: the marker
    * gets a per-start unique key so a restart can never skip fresh
    * deltas, at the price of at-least-once (the un-checkpointed source
    * re-reads from scratch). */
  def driveJobCounters(spark: SparkSession, cat: TableStore,
      events: Dataset[TaskEvent], queryName: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val runKey = checkpointDir.map(_ => queryName).getOrElse(
      s"$queryName-${java.util.UUID.randomUUID().toString.take(8)}")
    val writer = events.writeStream
      .outputMode(OutputMode.Update)
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: Dataset[TaskEvent], batchId: Long) =>
        journalTaskDeltas(spark, cat, batch, batchId, runKey)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** The job FSM as CUSTOM STREAMING STATE (flatMapGroupsWithState — the
    * Spark-native form of the reference's per-job transition guards,
    * operations.go:69-117 handleTaskEvt + job.go Trigger): per-job state
    * lives in the state store across micro-batches, duplicate task events
    * collapse against the seen-set exactly like the reference's
    * "task already finished" guard, and the completion transition
    * (CONSOLIDATIONDONE / CONSOLIDATIONFAILED once every expected task
    * reported, consolidation_event.go:251-289) is emitted downstream.
    * Scale shape: state is partitioned by job id — thousands of concurrent
    * jobs stripe across executors with no driver bottleneck. */
  def jobFsm(events: Dataset[TaskEvent], expectedTasks: Map[String, Int]):
      Dataset[JobProgress] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.groupByKey(_.job_id)
      .flatMapGroupsWithState[JobFsmState, JobProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (job: String, evts: Iterator[TaskEvent], state: GroupState[JobFsmState]) =>
          val st0 = state.getOption.getOrElse(JobFsmState(Seq.empty, 0))
          // the seen-set folds through a hash set, not Seq.contains — a
          // collapse job journals 10⁵ task events and the linear scan per
          // event would make the fold quadratic in job size (state still
          // ENCODES as a Seq; emission order is irrelevant to the guard)
          val seenSet = scala.collection.mutable.LinkedHashSet.empty[String]
          seenSet ++= st0.seen
          var failed = st0.failed
          evts.foreach { e =>
            if (seenSet.add(e.task_id)) // at-least-once dedup guard
              failed += (if (e.status == "FAILED") 1 else 0)
          }
          val st = JobFsmState(seenSet.toSeq, failed)
          state.update(st)
          val expected = expectedTasks.getOrElse(job, Int.MaxValue)
          val phase =
            if (st.seen.size < expected) "CONSOLIDATIONINPROGRESS"
            else if (st.failed > 0) "CONSOLIDATIONFAILED"
            else "CONSOLIDATIONDONE"
          Iterator(JobProgress(job, expected, st.seen.size, st.failed, phase))
      }
  }

  /** Streaming near-dup candidate generation — the continuous-ingest twin
    * of [[graft.operators.Dedup.lshNearDupPairs]]: arriving documents are
    * exploded to their MinHash band keys ([[bandArrivals]], one row per
    * band), state per band bucket keeps the doc ids seen so far, and each
    * new arrival emits a candidate pair against every id already in its
    * bucket. Confirmation (true Jaccard over token sets) stays a batch
    * join downstream — state carries IDS ONLY, so a bucket member costs
    * ~8 bytes, and `maxPerBucket` bounds the skew pathology (a degenerate
    * band key collecting the whole corpus): past the cap a bucket stops
    * emitting and flags `overflowed` in its last emission, the same
    * documented trade-off as the batch operator's 2-row-band note. Scale
    * shape: state partitions by bucket across executors; the per-arrival
    * work is O(bucket size) ≤ maxPerBucket.
    *
    * TOTAL-state growth: `maxPerBucket` caps each bucket but not the
    * NUMBER of distinct buckets, which grows with the corpus vocabulary
    * over continuous ingest. Pass `stateTtl` (e.g. "24 hours") to expire
    * buckets cold for that long via a processing-time timeout — expired
    * buckets simply restart empty, so a late near-dup against an expired
    * cohort is missed (the same recall trade-off every TTL'd streaming
    * dedup makes). Leave it None only for bounded replays/backfills.
    *
    * Overflow notices: the `overflowed=true` emission is a NOTICE row,
    * not a pair — its doc_a/doc_b carry the -1 sentinel and must be
    * discriminated by the flag alone (a corpus with legitimate negative
    * ids must not interpret the sentinel ids; filter on `overflowed`
    * before joining candidates). */
  def streamingCandidatePairs(arrivals: Dataset[BandArrival],
      maxPerBucket: Int = 64,
      stateTtl: Option[String] = None): Dataset[CandidatePair] = {
    import arrivals.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    arrivals.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, timeoutConf) {
        (bucket: String, rows: Iterator[BandArrival],
            state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { // cold bucket: drop state, emit nothing
            state.remove()
            Iterator.empty
          } else {
          var st = state.getOption.getOrElse(BucketState(Vector.empty, false))
          val out = Seq.newBuilder[CandidatePair]
          rows.foreach { r =>
            if (!st.ids.contains(r.doc_id)) { // at-least-once dedup guard
              if (st.ids.size < maxPerBucket) {
                st.ids.foreach { prev =>
                  val (a, b) =
                    if (prev < r.doc_id) (prev, r.doc_id) else (r.doc_id, prev)
                  out += CandidatePair(a, b, bucket, overflowed = false)
                }
                st = BucketState(st.ids :+ r.doc_id, st.overflowed)
              } else if (!st.overflowed) {
                st = st.copy(overflowed = true)
                out += CandidatePair(-1L, -1L, bucket, overflowed = true)
              }
            }
          }
          state.update(st)
          stateTtl.foreach(state.setTimeoutDuration)
          out.result().iterator
          }
      }
  }

  /** Explode a document stream to (doc_id, band-bucket) arrivals using
    * the SAME MinHash banding as the batch operator, so a corpus can mix
    * batch backfill and streaming ingest against one key space. Ids must
    * be numeric (castable to long): a non-castable id fails the batch
    * eagerly with a named error instead of surfacing later as an opaque
    * encoder NPE. */
  def bandArrivals(docs: DataFrame, idCol: String, textCol: String,
      nHashes: Int = 8, rowsPerBand: Int = 4): Dataset[BandArrival] = {
    import docs.sparkSession.implicits._
    require(nHashes % rowsPerBand == 0, "nHashes must divide into bands")
    val nBands = nHashes / rowsPerBand
    val mh = graft.operators.Dedup.minhash(col(textCol), nHashes)
    val buckets = (0 until nBands).map { b =>
      concat(lit(s"b$b|"),
        concat(mh.slice(b * rowsPerBand, (b + 1) * rowsPerBand): _*))
    }
    val id = col(idCol).cast("long")
    val checkedId = when(assert_true(id.isNotNull,
      concat(lit(s"bandArrivals: id column '$idCol' not castable to long: "),
        col(idCol).cast("string"))).isNull, id)
    docs.select(checkedId.as("doc_id"),
        explode(array(buckets: _*)).as("bucket"))
      .as[BandArrival]
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
