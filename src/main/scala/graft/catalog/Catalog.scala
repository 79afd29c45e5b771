package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
    if (f.exists(new Path(path(table)))) {
      migrateLegacyLayout(spark, table)
      spark.read.schema(readSchema(table)).parquet(path(table))
    } else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], readSchema(table))
  }

  /** Read-side schema: the logical table schema plus any DERIVED partition
    * column ([[derivedPartition]]). The derived column is part of the read
    * frame on purpose — pruned joins reference it so Catalyst's dynamic
    * partition pruning can skip whole buckets (see [[graft.cube.GetCube]]
    * `prunedTiles`). */
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
      val key = s"${path(table)}"
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
    * files phase 3 replaces, and it is consumed twice; (2) stage the
    * affected buckets' surviving rows (read-bucket → anti-join →
    * partitioned write to `<table>.bswap`); (3) per bucket, atomically
    * swap: current dir → `<table>.bold/` pre-image, staged dir → live. A
    * bucket whose rows are all deleted is removed outright. Crash windows
    * are healed by [[healSwap]] (a bucket missing from the table with a
    * staged pre-image is restored); the operation is idempotent — the FSM
    * retry that re-runs it deletes nothing new. */
  def deleteWhere(spark: SparkSession, table: String, uris: DataFrame,
      uriCol: String = "container_uri"): Unit = {
    val d = derivedPartition(table).getOrElse(throw new IllegalArgumentException(
      s"deleteWhere: table '$table' has no derived bucket partition"))
    val f = fs(spark)
    healSwap(f, table)
    migrateLegacyLayout(spark, table)
    val dest = new Path(path(table))
    if (!f.exists(dest)) return
    val del = uris.select(col(uriCol).as("__gc_uri")).distinct()
      .localCheckpoint(true)
    try {
      val affected = del.select(d.derive(col("__gc_uri")).as("__b"))
        .distinct().collect().map(_.getInt(0)).sorted
      val bucketDirs = affected.map(b => new Path(dest, s"${d.name}=$b"))
        .filter(f.exists)
      if (bucketDirs.isEmpty) return
      val swapRoot = new Path(path(table) + ".bswap")
      val oldRoot = new Path(path(table) + ".bold")
      if (f.exists(swapRoot)) f.delete(swapRoot, true)
      if (f.exists(oldRoot)) f.delete(oldRoot, true)
      // stage survivors of the affected buckets only; the write runs the
      // anti-join while the live files still exist (renames come after)
      val cur = spark.read.option("basePath", dest.toString)
        .schema(readSchema(table))
        .parquet(bucketDirs.map(_.toString): _*)
      val logical = Schemas.all(table).fieldNames.toIndexedSeq.map(col)
      val kept = cur
        .join(del, cur(d.srcCol) === del("__gc_uri"), "left_anti")
        .select(logical: _*)
      val writer = withDerived(kept, table).write.mode(SaveMode.Overwrite)
      writer.partitionBy(d.name).parquet(swapRoot.toString)
      // per-bucket atomic swap; [[healSwap]] closes each crash window
      f.mkdirs(oldRoot)
      bucketDirs.foreach { live =>
        val staged = new Path(swapRoot, live.getName)
        val pre = new Path(oldRoot, live.getName)
        if (f.exists(staged)) {
          if (f.exists(live) && !f.rename(live, pre))
            throw new java.io.IOException(s"deleteWhere: cannot stage $live")
          if (!f.rename(staged, live)) {
            f.rename(pre, live) // rollback this bucket
            throw new java.io.IOException(s"deleteWhere: cannot promote $staged")
          }
        } else {
          // every row in this bucket was deleted — remove the dir; a
          // partial delete here is just rows still pending deletion
          f.delete(live, true): Unit
        }
      }
      f.delete(oldRoot, true): Unit
      f.delete(swapRoot, true): Unit
    } finally graft.operators.OperatorCaches.releaseLocalCheckpoint(del)
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
    * The same rule heals a torn [[deleteWhere]] per BUCKET: a bucket dir
    * staged under `<table>.bold` whose live counterpart is missing was
    * caught between its two renames — restore the pre-image (the delete
    * is idempotent; the retry re-drops those rows). Any other `.bold` /
    * `.bswap` leftovers are committed-or-recomputable garbage. */
  private def healSwap(f: FileSystem, table: String): Unit = {
    val dest = new Path(path(table))
    val old = new Path(path(table) + ".old")
    if (!f.exists(dest)) {
      if (f.exists(old) && !f.rename(old, dest))
        throw new java.io.IOException(s"swap heal: cannot restore $dest")
    } else if (f.exists(old)) f.delete(old, true)
    val oldRoot = new Path(path(table) + ".bold")
    if (f.exists(oldRoot)) {
      f.listStatus(oldRoot).foreach { s =>
        val live = new Path(dest, s.getPath.getName)
        if (s.isDirectory && s.getPath.getName.contains("=") && !f.exists(live))
          if (!f.rename(s.getPath, live))
            throw new java.io.IOException(s"swap heal: cannot restore $live")
      }
      f.delete(oldRoot, true): Unit
    }
    val swapRoot = new Path(path(table) + ".bswap")
    if (f.exists(swapRoot)) f.delete(swapRoot, true): Unit
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

  /** Intra-bucket write salts for one batch: ⌈batchBytes / (1 GiB × 64
    * buckets)⌉, clamped to [1, 64] — a ≥4 TiB append gets the full
    * 4096-way fan-out, a toy append stays at the ≤1-file-per-bucket
    * minimum. Batch bytes come from the optimized plan's stats; an
    * estimate ≥1 PiB is a join-multiplied default, not a measurement, and
    * falls back to 1 (the conf override is the escape hatch). */
  private[catalog] def filesPerBucket(df: DataFrame): Int =
    df.sparkSession.conf.getOption(FilesPerBucketConf)
      .map(_.toInt.max(1).min(TilesBuckets))
      .getOrElse {
        val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        if (bytes <= 0 || bytes >= BigInt(1L << 50)) 1
        else {
          val unit = BigInt(TargetFileBytes) * TilesBuckets
          (((bytes + unit - 1) / unit).min(TilesBuckets)).toInt.max(1)
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
