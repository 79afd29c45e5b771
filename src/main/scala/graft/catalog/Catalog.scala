package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** Parquet-backed catalog root: one directory per table under `root`.
  *
  * The reference keeps the catalog in PostGIS; ours is columnar files so
  * every catalog query is a Catalyst plan over parquet with pushdown +
  * bbox pruning. At production scale the `datasets` table is the only big
  * metadata one (SURVEY §7.4 risk 7) — written partitioned by
  * `instance_id` so instance filters become partition pruning; everything
  * else is broadcast-sized. The `tiles` pixel store is the single
  * 100-TB-class table and gets both a derived hash-bucket layout (reads
  * prune to a request's buckets) and a bucket-scoped delete
  * ([[deleteWhere]] — a GC pass rewrites only the buckets it touches).
  *
  * All filesystem mutation goes through the Hadoop [[FileSystem]] API,
  * resolved from the root's scheme: plain and `file:` roots use the local
  * FS, `hdfs:` roots get HDFS's atomic rename, and a scheme with no
  * registered connector (e.g. `gs:` without the GCS connector on the
  * classpath) fails LOUDLY at first touch instead of silently no-op'ing
  * renames the way `java.io.File` on a URI string would. On stores whose
  * rename is a copy (S3A), swap the impl for Delta/Iceberg — the
  * interface here is the part that matters (reference: the PostGIS
  * transaction in pg_containers.go plus interface/storage/gcs/strategy.go
  * for the object side).
  *
  * Writes that must be atomic (the consolidation status swap, C6) go
  * through [[Catalog.rewrite]]: write-new-then-rename, the filesystem
  * stand-in for a Delta MERGE transaction.
  *
  * Reader contract: NOT snapshot isolation. A query whose file listing
  * predates a concurrent swap can fail transiently with Spark's
  * stale-file error (`FAILED_READ_FILE`) when it opens the replaced
  * files — retry the read (the same guidance Spark's error text gives).
  * The swap protocol guarantees the stronger properties that matter:
  * readers can never corrupt the store or destroy in-flight staging,
  * committed swaps always complete, and no state is silently lost
  * (CatalogPartitionOpsSpec pins this under a concurrent hammer).
  */
final case class Catalog(root: String) {
  private def path(table: String) = s"$root/$table"

  /** The root's filesystem. Unknown schemes throw here (loud guard):
    * "No FileSystem for scheme" — never a silent no-op rename. */
  private def fs(spark: SparkSession): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def read(spark: SparkSession, table: String): DataFrame = {
    val f = fs(spark)
    healSwap(f, table)
    val schema = readSchema(table)
    if (f.exists(new Path(path(table)))) {
      migrateLegacyLayout(spark, table)
      // normalize to the logical column order: Spark appends partition
      // columns after the data columns, so a partitioned table would
      // otherwise change its positional layout (readers select by name,
      // but Row-positional consumers and encoders must see one order)
      spark.read.schema(schema).parquet(path(table))
        .select(schema.fieldNames.toIndexedSeq.map(col): _*)
    } else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Read-side schema: the logical table schema plus any DERIVED partition
    * column ([[derivedPartition]]). The derived column is part of the read
    * frame on purpose — pruned joins reference it so Catalyst's dynamic
    * partition pruning can skip whole buckets (see [[graft.cube.GetCube]]
    * `selectTileLevel`). */
  private def readSchema(table: String): org.apache.spark.sql.types.StructType = {
    val base = Schemas.all(table)
    derivedPartition(table).fold(base) { d =>
      org.apache.spark.sql.types.StructType(
        base.fields :+ org.apache.spark.sql.types.StructField(
          d.name, org.apache.spark.sql.types.IntegerType))
    }
  }

  /** Tables written with a partition column: `datasets` by instance
    * (instance filters prune), `jobs` by type — the streaming journal
    * probes `type = TASKEVENT` once per micro-batch, and FSM state rows
    * must not make that probe a full-history scan at 100× scale.
    *
    * Layout-version note: a jobs directory written BEFORE the
    * partitioning (flat part files with `type` as a data column) cannot
    * be mixed with `type=` subdirectories — Spark refuses mixed leaf
    * depths ("Conflicting directory structures detected"). Every
    * read/append of a partitioned table therefore runs
    * [[migrateLegacyLayout]] first: a one-time atomic rewrite of any
    * flat legacy files into the partitioned form (memoized per JVM so
    * the steady-state cost is one set lookup). */
  private def partitionColumn(table: String): Option[String] = table match {
    case "datasets" => Some("instance_id")
    case "jobs" => Some("type")
    // tasks by job: every FSM read is job-scoped (lock snapshots, task
    // outcomes, resume journals) and prunes to one partition; every FSM
    // task rewrite goes through [[updatePartitions]] and swaps only its
    // job's directory — a big consolidation holds 10⁵ task rows per job
    // and must not pay (or race) other jobs' I/O
    case "tasks" => Some("job_id")
    case "tiles" => Some(Catalog.TilesBucketCol)
    case _ => None
  }

  private case class Derived(name: String, srcCol: String, derive: Column => Column)

  /** DERIVED partition columns: not part of the logical schema — computed
    * by [[append]]/[[rewrite]] from a data column at write time. `tiles`
    * (the pixel store, the ONLY 100-TB-class table) is hash-bucketed by
    * container URI so a serving-path join against a request's container
    * set becomes dynamic partition pruning instead of a full payload scan.
    * CRC-32 is the bucket hash on purpose: a frozen public standard, so
    * the layout can never silently disagree with the query-time derivation
    * the way a Spark-internal hash could across versions. */
  private def derivedPartition(table: String): Option[Derived] =
    table match {
      case "tiles" =>
        Some(Derived(Catalog.TilesBucketCol, "container_uri", Catalog.tilesBucketOf))
      case _ => None
    }

  /** Upgrade a pre-partitioning table directory in place: flat
    * `part-*.parquet` files (the partition key still a data column) are
    * read with the full schema, unioned with any already-partitioned
    * subdirectories (a half-migrated or mixed dir), and rewritten through
    * the atomic [[rewrite]] swap. No-op when the layout is already clean. */
  private def migrateLegacyLayout(spark: SparkSession, table: String): Unit =
    partitionColumn(table).foreach { _ =>
      val key = path(table)
      if (!Catalog.migrationChecked.contains(key)) {
        val f = fs(spark)
        val dir = new Path(path(table))
        val files =
          if (f.exists(dir)) f.listStatus(dir).toIndexedSeq
          else IndexedSeq.empty
        val flat = files.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        if (flat.nonEmpty) {
          val schema = Schemas.all(table)
          val legacy = spark.read.schema(schema)
            .parquet(flat.map(_.getPath.toString): _*)
          val parts = files.filter(s => s.isDirectory && s.getPath.getName.contains("="))
          // project both legs onto the LOGICAL schema: a derived partition
          // column (tiles' bucket) exists only on the partitioned leg and
          // is recomputed by the rewrite below anyway
          val logical = schema.fieldNames.toIndexedSeq.map(col)
          val whole =
            if (parts.isEmpty) legacy
            else legacy.select(logical: _*).unionByName(spark.read
              .option("basePath", dir.toString).schema(schema)
              .parquet(parts.map(_.getPath.toString): _*)
              .select(logical: _*))
          rewrite(whole, table)
        }
        Catalog.migrationChecked.add(key): Unit
      }
    }

  /** Recompute any derived partition column from its source data column —
    * authoritative at every write, so callers never supply (or can never
    * corrupt) the bucket. Idempotent on frames that already carry it.
    *
    * Derived-bucket writes also repartition before the partitioned write,
    * for the standard reason: an unrepartitioned partitionBy append from
    * a 1000-task consolidation batch would spray up to 64k tiny files
    * into the 100-TB store per batch — the small-file death spiral. But
    * keying on the bucket ALONE caps write parallelism at ≤64 tasks
    * (really ~40: hash collisions leave ~1/e of the 64 partitions empty),
    * which serializes a multi-TB append through a handful of writers. So
    * the shuffle key is (bucket, salt) with [[filesPerBucket]] salts sized
    * from the batch's estimated bytes (targeting ~1 GiB files): a small
    * append keeps the ≤1-file-per-bucket property, a huge one fans out to
    * up to 64×64 writers while the per-append file count stays bounded at
    * buckets × salts (each task still writes ≤1 file per bucket dir). */
  private def withDerived(df: DataFrame, table: String): DataFrame =
    derivedPartition(table).fold(df) { d =>
      val stamped = df.withColumn(d.name, d.derive(col(d.srcCol)))
      val salts = Catalog.filesPerBucket(df)
      if (salts <= 1)
        stamped.repartition(Catalog.TilesBuckets, col(d.name))
      else
        stamped.repartition(Catalog.TilesBuckets * salts, col(d.name),
          pmod(xxhash64(col(d.srcCol)), lit(salts.toLong)))
    }

  def append(df: DataFrame, table: String): Unit = {
    healSwap(fs(df.sparkSession), table)
    migrateLegacyLayout(df.sparkSession, table)
    val writer = withDerived(df, table).write.mode(SaveMode.Append)
    partitionColumn(table).fold(writer)(writer.partitionBy(_))
      .parquet(path(table))
  }

  /** Atomic full-table replace: write to a temp dir, swap directories.
    * Readers opened before the swap keep their snapshot (file handles);
    * new reads see the new version — the single-writer ACID contract the
    * consolidation FSM needs (csldSwapDatasets, consolidater.go:644-667). */
  def rewrite(df: DataFrame, table: String): Unit = {
    val f = fs(df.sparkSession)
    healSwap(f, table)
    val dest = new Path(path(table))
    val tmp = new Path(path(table) + ".swap")
    val old = new Path(path(table) + ".old")
    if (f.exists(tmp)) f.delete(tmp, true)
    val writer = withDerived(df, table).write.mode(SaveMode.Overwrite)
    partitionColumn(table).fold(writer)(writer.partitionBy(_))
      .parquet(tmp.toString)
    if (f.exists(old)) f.delete(old, true)
    if (f.exists(dest) && !f.rename(dest, old))
      throw new java.io.IOException(s"swap: cannot stage $dest")
    if (!f.rename(tmp, dest)) {
      f.rename(old, dest) // rollback
      throw new java.io.IOException(s"swap: cannot promote $tmp")
    }
    f.delete(old, true): Unit
  }

  /** Bucket-scoped delete from the derived-partitioned pixel store: drop
    * every row whose `uriCol` appears in `uris`, rewriting ONLY the hash
    * buckets the delete set maps to and leaving every other bucket's
    * files untouched — byte-identical, never listed, never read. This is
    * the parquet stand-in for the reference's targeted row deletes
    * (DeleteDatasets / container GC, pg_containers.go:100-109; Delta
    * `DELETE` on a real lake): at 100 TB a kilobyte-scale GC pass costs
    * the affected ~|uris|/64 buckets' I/O, not a ~200 TB full rewrite.
    *
    * Steps: (1) checkpoint the delete set — its lineage may read the very
    * files the swap replaces, and it is consumed twice; (2) derive the
    * affected bucket set (≤64 ints, a driver-safe collect); (3) hand the
    * anti-join to [[rewritePartitionDirs]], whose commit-marker swap
    * stages survivors and replaces only those bucket directories. A
    * bucket whose rows are all deleted is removed outright; the operation
    * is idempotent — the FSM retry that re-runs it deletes nothing new. */
  def deleteWhere(spark: SparkSession, table: String, uris: DataFrame,
      uriCol: String = "container_uri"): Unit = {
    val d = derivedPartition(table).getOrElse(throw new IllegalArgumentException(
      s"deleteWhere: table '$table' has no derived bucket partition"))
    val del = uris.select(col(uriCol).as("__gc_uri")).distinct()
      .localCheckpoint(true)
    try {
      val affected = del.select(d.derive(col("__gc_uri")).as("__b"))
        .distinct().collect().map(_.getInt(0)).sorted
      rewritePartitionDirs(spark, table, affected.map(_.toString),
        cur => cur.join(del, cur(d.srcCol) === del("__gc_uri"), "left_anti"))
    } finally graft.operators.OperatorCaches.releaseLocalCheckpoint(del)
  }

  /** Partition-scoped atomic update of a statically-partitioned table
    * (`datasets` by instance, `jobs` by type): read ONLY the named
    * partitions' directories, apply `transform` to their logical rows,
    * and atomically swap those directories — every other partition's
    * files are untouched, byte-identical, never listed. This is the
    * metadata-table sibling of [[deleteWhere]] and the parquet stand-in
    * for the reference's targeted SQL UPDATEs (ChangeDatasetsStatus /
    * DeleteDatasets, pg_containers.go:385-473): an FSM status flip for
    * one instance costs that instance's partition I/O, not a rewrite of
    * the whole catalog-scale datasets relation.
    *
    * `partValues` empty means ALL on-disk partitions (the unscoped form
    * — e.g. a pattern-only deletion job); `transform` must keep every
    * row in its partition (guarded: a staged directory outside the
    * target set fails the update before any swap) but may insert into an
    * absent one. Crash windows close through [[rewritePartitionDirs]]'s
    * commit-marker roll-forward. */
  def updatePartitions(spark: SparkSession, table: String,
      partValues: Seq[String], transform: DataFrame => DataFrame): Unit = {
    require(derivedPartition(table).isEmpty,
      s"updatePartitions: '$table' is derived-bucket-partitioned — use deleteWhere")
    val pc = partitionColumn(table).getOrElse(throw new IllegalArgumentException(
      s"updatePartitions: table '$table' is not partitioned"))
    val values =
      if (partValues.nonEmpty) partValues.distinct
      else { // unscoped: every on-disk partition, still via per-dir swaps
        val f = fs(spark)
        val dest = new Path(path(table))
        if (!f.exists(dest)) return
        f.listStatus(dest).toIndexedSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$pc="))
          .map(s => ExternalCatalogUtils
            .unescapePathName(s.getPath.getName.stripPrefix(s"$pc=")))
      }
    rewritePartitionDirs(spark, table, values, transform)
  }

  /** Shared core of [[deleteWhere]] / [[updatePartitions]]: stage the
    * transformed rows of the targeted partition directories
    * (`<table>.bswap`), COMMIT by renaming a `_COMMIT` marker into the
    * staging root (its lines record each targeted directory and whether
    * it swaps or is a pure delete), then swap each directory in place.
    * A partition whose rows all disappear is removed; one the transform
    * INSERTS rows into (a named-but-absent partition — the task-outcome
    * upsert shape) is created by its swap; a transform that emits rows
    * OUTSIDE the targeted partitions is rejected before the commit
    * (those rows would otherwise be silently dropped).
    *
    * Crash/concurrency protocol: before the marker exists, the staging
    * root is invisible to [[healSwap]] — a concurrent reader can never
    * disturb (or be disturbed by) an in-flight staging job, whose window
    * is minutes-long at scale. From the marker on, the swap only ROLLS
    * FORWARD: writer and any concurrent healer drive the same idempotent
    * per-directory promotion ([[applyMarked]]), so a crash at any rename
    * completes on the next read/write instead of restoring pre-images
    * (pre-images parked under `<table>.bold` are debris, kept only until
    * cleanup). */
  private def rewritePartitionDirs(spark: SparkSession, table: String,
      values: Seq[String], transform: DataFrame => DataFrame): Unit = {
    val pc = partitionColumn(table).get
    val f = fs(spark)
    healSwap(f, table)
    migrateLegacyLayout(spark, table)
    val dest = new Path(path(table))
    if (values.isEmpty) return
    // a missing table dir is NOT a no-op: the transform may INSERT rows
    // (the task-outcome upsert on a job with no prior task rows)
    if (!f.exists(dest)) f.mkdirs(dest)
    // directory names use Spark's partition-value escaping (a job id
    // with ':' writes as job_id=a%3Ab) — building paths from the RAW
    // value would silently miss the partition and no-op the update
    val names =
      values.map(v => s"$pc=" + ExternalCatalogUtils.escapePathName(v)).distinct
    val existing = names.map(n => new Path(dest, n)).filter(f.exists)
    val swapRoot = new Path(path(table) + ".bswap")
    val oldRoot = new Path(path(table) + ".bold")
    if (f.exists(swapRoot)) f.delete(swapRoot, true)
    if (f.exists(oldRoot)) f.delete(oldRoot, true)
    // stage the transformed partitions; the write runs while the live
    // files still exist (renames come after), so lazy lineage is safe.
    // An all-absent target set still stages: the transform may insert.
    val cur =
      if (existing.nonEmpty)
        spark.read.option("basePath", dest.toString)
          .schema(readSchema(table))
          .parquet(existing.map(_.toString): _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], readSchema(table))
    val logical = Schemas.all(table).fieldNames.toIndexedSeq.map(col)
    val out = withDerived(transform(cur).select(logical: _*), table)
    out.write.mode(SaveMode.Overwrite).partitionBy(pc).parquet(swapRoot.toString)
    val stagedNames = f.listStatus(swapRoot).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$pc="))
      .map(_.getPath.getName).toSet
    val escapedOut = stagedNames.toSeq.filterNot(names.toSet)
    if (escapedOut.nonEmpty) {
      f.delete(swapRoot, true)
      throw new IllegalArgumentException(
        s"partition rewrite of '$table' moved rows outside the targeted " +
          s"partitions: ${escapedOut.mkString(", ")}")
    }
    // ops per targeted dir: swap in staged content, or pure delete. A
    // name neither staged nor on disk is a no-op and is not recorded.
    val ops = names.flatMap { n =>
      if (stagedNames(n)) Some(s"S $n")
      else if (f.exists(new Path(dest, n))) Some(s"D $n")
      else None
    }
    if (ops.isEmpty) { f.delete(swapRoot, true); return }
    // COMMIT: marker written whole then renamed into place (atomic) —
    // from here the swap is committed and only rolls forward
    val markerTmp = new Path(swapRoot, "_COMMIT.tmp")
    val os = f.create(markerTmp, true)
    try os.write((ops.mkString("\n") + "\n").getBytes("UTF-8"))
    finally os.close()
    if (!f.rename(markerTmp, new Path(swapRoot, Catalog.CommitMarker)))
      throw new java.io.IOException(s"partition swap: cannot commit $swapRoot")
    f.mkdirs(oldRoot)
    ops.foreach(op => applyMarked(f, dest, swapRoot, oldRoot, op))
    f.delete(swapRoot, true): Unit
    f.delete(oldRoot, true): Unit
  }

  /** One committed per-directory swap op, idempotent and shared by the
    * writer and [[healSwap]]'s roll-forward: `"S <dir>"` promotes the
    * staged directory (parking any live pre-image under `oldRoot`),
    * `"D <dir>"` deletes the live directory. Concurrent executions race
    * only on atomic renames; every loser re-checks for the completed
    * state and an unrecognizable state throws loudly — never a silent
    * loss. */
  private def applyMarked(f: FileSystem, dest: Path, swapRoot: Path,
      oldRoot: Path, op: String): Unit = {
    val (kind, name) = (op.take(1), op.drop(2))
    val staged = new Path(swapRoot, name)
    val live = new Path(dest, name)
    val pre = new Path(oldRoot, name)
    kind match {
      case "S" =>
        if (!f.exists(staged)) {
          // already promoted by the writer or a concurrent healer — or a
          // racer parked the new live away a heartbeat ago: restore it
          if (f.exists(live)) return
          if (f.exists(pre) && f.rename(pre, live)) return
          if (f.exists(live)) return
          throw new java.io.IOException(s"partition swap: lost $name")
        }
        if (f.exists(live)) { f.rename(live, pre): Unit } // park pre-image
        if (!f.rename(staged, live)) {
          // lost the promotion race iff someone else completed it
          if (!(f.exists(live) && !f.exists(staged)))
            throw new java.io.IOException(s"partition swap: cannot promote $staged")
        }
      case _ =>
        if (f.exists(live)) f.delete(live, true): Unit
    }
  }

  /** Repair a [[rewrite]] swap cut short by a crash. The swap's commit
    * point is the tmp→dest rename: a MISSING table dir with a staged
    * `.old` beside it means the swap never committed — the pre-image is
    * authoritative and is restored (the `.swap` payload is recomputed by
    * whoever retries). With the dir present, a leftover `.old` is
    * already-committed garbage and is reclaimed. Without this, the
    * missing-dir branch of [[read]] would serve an EMPTY table for the
    * whole window — a silently wrong catalog (GC would collect
    * everything, FSM resumes would re-derive nonsense).
    *
    * Partition-scoped swaps ([[rewritePartitionDirs]]) heal by their
    * commit marker: a staging root WITHOUT `_COMMIT` is an in-flight or
    * crashed staging job and is left strictly alone — a reader touching
    * it could destroy a live writer's minutes-long staging pass (the
    * next write on the table reclaims it); one WITH the marker is a
    * committed swap cut short mid-loop, and the heal ROLLS IT FORWARD by
    * replaying the marker's idempotent ops. Pre-image debris under
    * `.bold` outlives its marker only between the two cleanup deletes —
    * reclaimed here. */
  private def healSwap(f: FileSystem, table: String): Unit = {
    val dest = new Path(path(table))
    val old = new Path(path(table) + ".old")
    if (!f.exists(dest)) {
      if (f.exists(old) && !f.rename(old, dest))
        throw new java.io.IOException(s"swap heal: cannot restore $dest")
    } else if (f.exists(old)) f.delete(old, true)
    val swapRoot = new Path(path(table) + ".bswap")
    val oldRoot = new Path(path(table) + ".bold")
    val marker = new Path(swapRoot, Catalog.CommitMarker)
    // the marker can vanish between the exists probe and the open (the
    // writer's cleanup deleting the staging root) — that IS the
    // completed-swap state, not an error
    val ops =
      if (!f.exists(marker)) None
      else try {
        val in = f.open(marker)
        Some(try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toVector
        finally in.close())
      } catch { case _: java.io.FileNotFoundException => None }
    ops match {
      case Some(lines) =>
        f.mkdirs(oldRoot)
        lines.foreach(op => applyMarked(f, dest, swapRoot, oldRoot, op))
        f.delete(swapRoot, true): Unit
        f.delete(oldRoot, true): Unit
      case None =>
    }
    if (ops.isEmpty && f.exists(oldRoot) && !f.exists(swapRoot)) {
      // marker (and staging) gone ⇒ the swap completed; parked
      // pre-images are debris from an interrupted cleanup
      f.delete(oldRoot, true): Unit
    }
    // a swapRoot without a marker is left alone on purpose (in-flight or
    // crashed staging; reclaimed by the next write on this table)
  }
}

object Catalog {
  /** Table paths whose on-disk layout has been checked (and migrated if
    * legacy) this JVM — keeps [[Catalog.migrateLegacyLayout]] to one set
    * lookup on the hot read/append paths. */
  private val migrationChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The tiles store's derived partition column (bucket of the container
    * URI) and its bucket count. 64 buckets keeps directories manageable
    * while cutting a request-scoped payload scan ~64× via dynamic
    * partition pruning; at 100 TB that is ~1.5 TB of parquet per bucket —
    * row-group stats on `container_uri` prune further within a bucket. */
  val TilesBucketCol = "__bucket"
  val TilesBuckets = 64

  /** Target parquet file size for derived-bucket writes — the salt count
    * of a batch is sized so each writer task emits ~this many bytes. */
  private val TargetFileBytes = 1L << 30

  /** Conf key overriding the per-append salt count (mainly for tests and
    * for operators that know their batch size better than plan stats). */
  val FilesPerBucketConf = "graft.tiles.filesPerBucket"

  /** The partition-swap commit marker: a staging root holding this file
    * is a COMMITTED swap (heal rolls it forward); without it the staging
    * is in-flight/abandoned and heal leaves it strictly alone. */
  private[catalog] val CommitMarker = "_COMMIT"

  /** Intra-bucket write salts for one batch: ⌈batchBytes / (1 GiB × 64
    * buckets)⌉, clamped to [1, 64] — a ≥4 TiB append gets the full
    * 4096-way fan-out, a toy append stays at the ≤1-file-per-bucket
    * minimum. Batch bytes come from the optimized plan's stats; an
    * estimate ≥1 PiB is a default, not a measurement (typed pipelines —
    * the consolidation worker's mapGroups output, RDD-backed frames —
    * report `defaultSizeInBytes`), and for those the salt count falls
    * back to the batch's PLANNED parallelism instead: writing with
    * roughly the task count the engine already chose to compute the
    * batch keeps a 4096-partition cluster consolidation at cluster-wide
    * write fan-out while a 32-partition local batch stays at 1. The conf
    * override remains the explicit escape hatch. */
  private[catalog] def filesPerBucket(df: DataFrame): Int =
    df.sparkSession.conf.getOption(FilesPerBucketConf)
      .map(_.toInt.max(1).min(TilesBuckets))
      .getOrElse {
        val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        if (bytes > 0 && bytes < BigInt(1L << 50)) {
          val unit = BigInt(TargetFileBytes) * TilesBuckets
          (((bytes + unit - 1) / unit).min(TilesBuckets)).toInt.max(1)
        } else {
          val parts = df.rdd.getNumPartitions
          math.min(TilesBuckets, math.max(1, (parts + TilesBuckets - 1) / TilesBuckets))
        }
      }

  /** The bucket derivation, usable on EITHER side of a pruned join: the
    * write path stamps rows with it, and query-side joins compare the
    * stored bucket against this same expression over the request's
    * container set — the equality Catalyst's DPP rule turns into a
    * partition filter. CRC-32 over UTF-8 bytes: frozen standard, stable
    * across Spark/JVM versions (a Spark-internal hash could silently
    * re-bucket on upgrade and mis-prune). */
  def tilesBucketOf(uri: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    pmod(crc32(encode(uri, "UTF-8")), lit(TilesBuckets.toLong)).cast("int")
  }

  /** Strictly-increasing microsecond wall clock for journal rows: two
    * FSM transitions in the same millisecond still get distinct,
    * correctly-ordered `created_at` stamps, so `ORDER BY created_at`
    * reconstructs one driver's journal deterministically (across driver
    * restarts the ≥1 s gap dwarfs the microsecond tie window). */
  private val lastMicros = new java.util.concurrent.atomic.AtomicLong(0L)
  def journalNow(): java.sql.Timestamp = {
    val micros = lastMicros.updateAndGet(prev =>
      math.max(prev + 1, System.currentTimeMillis() * 1000L))
    val ts = new java.sql.Timestamp((micros / 1000000L) * 1000L)
    ts.setNanos(((micros % 1000000L) * 1000L).toInt)
    ts
  }
}
