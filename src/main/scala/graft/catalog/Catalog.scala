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
    val p = new java.io.File(path(table))
    if (p.exists) spark.read.schema(Schemas.all(table)).parquet(path(table))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.all(table))
  }

  /** Tables written with a partition column: `datasets` by instance
    * (instance filters prune), `jobs` by type — the streaming journal
    * probes `type = TASKEVENT` once per micro-batch, and FSM state rows
    * must not make that probe a full-history scan at 100× scale.
    *
    * Layout-version note: a jobs directory written BEFORE the
    * partitioning (flat part files with `type` as a data column) cannot
    * be mixed with `type=` subdirectories — migrating a pre-existing
    * catalog means one rewrite of the jobs table under the new build
    * before the first append. */
  private def partitionColumn(table: String): Option[String] = table match {
    case "datasets" => Some("instance_id")
    case "jobs" => Some("type")
    case _ => None
  }

  def append(df: DataFrame, table: String): Unit = {
    val writer = df.write.mode(SaveMode.Append)
    partitionColumn(table).fold(writer)(writer.partitionBy(_))
      .parquet(path(table))
  }

  /** Atomic full-table replace: write to a temp dir, swap directories.
    * Readers opened before the swap keep their snapshot (file handles);
    * new reads see the new version — the single-writer ACID contract the
    * consolidation FSM needs (csldSwapDatasets, consolidater.go:644-667). */
  def rewrite(df: DataFrame, table: String): Unit = {
    val dest = new java.io.File(path(table))
    val tmp = new java.io.File(path(table) + ".swap")
    val old = new java.io.File(path(table) + ".old")
    if (tmp.exists) delete(tmp)
    val writer = df.write.mode(SaveMode.Overwrite)
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

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(delete)
    f.delete()
  }
}
