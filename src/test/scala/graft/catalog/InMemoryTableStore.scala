package graft.catalog

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** A second, deliberately naive [[TableStore]]: rows in a synchronized
  * in-JVM map, partition ops as row-group surgery. Exists ONLY to prove
  * the TableStore contract spec is implementation-agnostic — that the
  * seam a Delta/Iceberg impl would plug into is constrained by the
  * CONTRACT, not by parquet-layout accidents (a contract spec with one
  * subclass proves nothing about the trait boundary). Not for
  * production use: no durability, no scale, driver-resident. */
final class InMemoryTableStore extends TableStore {
  /** Unresolvable on purpose: stamps against it come back unobservable,
    * so callers bypass their caches (see [[TableStore.root]]). */
  override def root: String = "memory:///unrooted"
  private val tables =
    scala.collection.mutable.Map.empty[String, Vector[Row]].withDefaultValue(Vector.empty)

  private def partitionColumn(table: String): Option[String] = table match {
    case "datasets" => Some("instance_id")
    case "jobs" => Some("type")
    case "tasks" => Some("job_id")
    case _ => None
  }

  private def df(spark: SparkSession, table: String, rows: Vector[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, math.min(4, rows.size))),
      Schemas.all(table))

  override def read(spark: SparkSession, table: String): DataFrame =
    synchronized { df(spark, table, tables(table)) }

  override def append(batch: DataFrame, table: String): Unit = {
    val logical = Schemas.all(table).fieldNames.toIndexedSeq
    val rows = batch.selectExpr(logical: _*).collect().toVector
    synchronized { tables(table) = tables(table) ++ rows }
  }

  override def rewrite(batch: DataFrame, table: String): Unit = {
    val logical = Schemas.all(table).fieldNames.toIndexedSeq
    val rows = batch.selectExpr(logical: _*).collect().toVector
    synchronized { tables(table) = rows }
  }

  override def deleteWhere(spark: SparkSession, table: String, uris: DataFrame,
      uriCol: String): Unit = {
    val doomed = uris.select(uriCol).collect()
      .flatMap(r => Option(r.getString(0))).toSet
    val idx = Schemas.all(table).fieldIndex(uriCol)
    synchronized {
      tables(table) = tables(table).filterNot(r => doomed(r.getString(idx)))
    }
  }

  override def updatePartitions(spark: SparkSession, table: String,
      partValues: Seq[String], transform: DataFrame => DataFrame): Unit = {
    val pc = partitionColumn(table).getOrElse(throw new IllegalArgumentException(
      s"updatePartitions: table '$table' is not partitioned"))
    val idx = Schemas.all(table).fieldIndex(pc)
    val (targeted, current) = synchronized {
      val all = tables(table)
      val values =
        if (partValues.nonEmpty) partValues.toSet
        else all.map(_.getString(idx)).toSet
      (values, all.filter(r => values(r.getString(idx))))
    }
    val out = transform(df(spark, table, current))
    val logical = Schemas.all(table).fieldNames.toIndexedSeq
    val rows = out.selectExpr(logical: _*).collect().toVector
    val escaped = rows.map(_.getString(idx)).toSet -- targeted
    if (escaped.nonEmpty)
      throw new IllegalArgumentException(
        s"partition rewrite of '$table' moved rows outside the targeted " +
          s"partitions: ${escaped.mkString(", ")}")
    synchronized {
      tables(table) =
        tables(table).filterNot(r => targeted(r.getString(idx))) ++ rows
    }
  }
}

/** The naive impl against the same contract — proves the spec holds at
  * the trait boundary, not at parquet-layout details. */
class InMemoryTableStoreContractSpec extends TableStoreContract {
  override def newStore(tag: String): TableStore = new InMemoryTableStore
}
