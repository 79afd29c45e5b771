package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet-backed catalog root: one directory per table under `root`.
  *
  * The reference keeps the catalog in PostGIS; ours is columnar files so
  * every catalog query is a Catalyst plan over parquet with pushdown +
  * bbox pruning. At production scale the `datasets` table is the only big
  * one (SURVEY §7.4 risk 7) — written partitioned by `instance_id` so
  * instance filters become partition pruning; everything else is
  * broadcast-sized.
  *
  * Writes that must be atomic (the consolidation status swap, C6) go
  * through [[Catalog.rewrite]]: write-new-then-rename, the filesystem
  * stand-in for a Delta MERGE transaction (the interface is the part that
  * matters; swap the impl for Delta on a real lake).
  */
final case class Catalog(root: String) {
  private def path(table: String) = s"$root/$table"

  def read(spark: SparkSession, table: String): DataFrame = {
    healSwap(table)
    val p = new java.io.File(path(table))
    if (p.exists) {
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
    derivedPartition(table).fold(base) { case (name, _) =>
      org.apache.spark.sql.types.StructType(
        base.fields :+ org.apache.spark.sql.types.StructField(
          name, org.apache.spark.sql.types.IntegerType))
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

  /** DERIVED partition columns: not part of the logical schema — computed
    * by [[append]]/[[rewrite]] from a data column at write time. `tiles`
    * (the pixel store, the ONLY 100-TB-class table) is hash-bucketed by
    * container URI so a serving-path join against a request's container
    * set becomes dynamic partition pruning instead of a full payload scan.
    * CRC-32 is the bucket hash on purpose: a frozen public standard, so
    * the layout can never silently disagree with the query-time derivation
    * the way a Spark-internal hash could across versions. */
  private def derivedPartition(table: String): Option[(String, org.apache.spark.sql.Column)] =
    table match {
      case "tiles" =>
        Some((Catalog.TilesBucketCol, Catalog.tilesBucketOf(
          org.apache.spark.sql.functions.col("container_uri"))))
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
        val dir = new java.io.File(path(table))
        val files = Option(dir.listFiles).getOrElse(Array.empty[java.io.File])
        val flat = files.filter(f => f.isFile && f.getName.endsWith(".parquet"))
        if (flat.nonEmpty) {
          val schema = Schemas.all(table)
          val legacy = spark.read.schema(schema)
            .parquet(flat.map(_.getPath).toIndexedSeq: _*)
          val parts = files.filter(f => f.isDirectory && f.getName.contains("="))
          // project both legs onto the LOGICAL schema: a derived partition
          // column (tiles' bucket) exists only on the partitioned leg and
          // is recomputed by the rewrite below anyway
          val logical = schema.fieldNames.toIndexedSeq
            .map(org.apache.spark.sql.functions.col)
          val whole =
            if (parts.isEmpty) legacy
            else legacy.select(logical: _*).unionByName(spark.read
              .option("basePath", dir.getPath).schema(schema)
              .parquet(parts.map(_.getPath).toIndexedSeq: _*)
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
    * Derived-bucket writes also repartition on the bucket, so each write
    * emits ≤1 file per bucket instead of one per (task × bucket): an
    * unrepartitioned partitionBy append from a 1000-task consolidation
    * batch would spray up to 64k tiny files into the 100-TB store per
    * batch — the small-file death spiral. One extra shuffle of bytes
    * that are being written anyway, the standard partitioned-write
    * pattern. Safe to key on the bucket alone (unlike `instance_id` /
    * `type` partitioned tables, where repartitioning on a low-cardinality
    * key would collapse write parallelism) because the bucket is a hash
    * with a guaranteed 64-way spread. */
  private def withDerived(df: DataFrame, table: String): DataFrame =
    derivedPartition(table).fold(df) { case (name, expr) =>
      df.withColumn(name, expr)
        .repartition(Catalog.TilesBuckets, org.apache.spark.sql.functions.col(name))
    }

  def append(df: DataFrame, table: String): Unit = {
    healSwap(table)
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
    healSwap(table)
    val dest = new java.io.File(path(table))
    val tmp = new java.io.File(path(table) + ".swap")
    val old = new java.io.File(path(table) + ".old")
    if (tmp.exists) delete(tmp)
    val writer = withDerived(df, table).write.mode(SaveMode.Overwrite)
    partitionColumn(table).fold(writer)(writer.partitionBy(_))
      .parquet(tmp.getPath)
    if (old.exists) delete(old)
    if (dest.exists && !dest.renameTo(old))
      throw new java.io.IOException(s"swap: cannot stage $dest")
    if (!tmp.renameTo(dest)) {
      old.renameTo(dest) // rollback
      throw new java.io.IOException(s"swap: cannot promote $tmp")
    }
    delete(old)
  }

  /** Repair a [[rewrite]] swap cut short by a crash. The swap's commit
    * point is the tmp→dest rename: a MISSING table dir with a staged
    * `.old` beside it means the swap never committed — the pre-image is
    * authoritative and is restored (the `.swap` payload is recomputed by
    * whoever retries). With the dir present, a leftover `.old` is
    * already-committed garbage and is reclaimed. Without this, the
    * missing-dir branch of [[read]] would serve an EMPTY table for the
    * whole window — a silently wrong catalog (GC would collect
    * everything, FSM resumes would re-derive nonsense). */
  private def healSwap(table: String): Unit = {
    val dest = new java.io.File(path(table))
    val old = new java.io.File(path(table) + ".old")
    if (!dest.exists) {
      if (old.exists && !old.renameTo(dest))
        throw new java.io.IOException(s"swap heal: cannot restore $dest")
    } else if (old.exists) delete(old)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(delete)
    f.delete()
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
