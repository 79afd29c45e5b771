package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All relational operator queries (SURVEY.md §2) are expressed over these
  * tables so the driver's DuckDB oracle can check them; the geocube-domain
  * catalog (records/datasets/...) is seeded separately in tests.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, table): building a parquet DataFrame pays
  // file listing + footer schema reads every time — measurable fixed cost
  // when 49 bench queries each re-open their inputs. Plans are immutable,
  // so reuse across queries is safe.
  private val built =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    built.computeIfAbsent((spark, dir, name), { _ =>
      if (name == "events") {
        // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
        // Spark's vectorized reader rejects — read as raw long nanos and
        // convert with integer arithmetic; a double division would lose
        // precision at 2024-epoch nanos ≈ 1.7e18 > 2^53) and plain
        // TIMESTAMP(MICROS) (readable directly). Branch on the read type.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.{LongType, TimestampNTZType}
        val raw = spark.read.parquet(s"$dir/$name.parquet")
        raw.schema("ts").dataType match {
          case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case TimestampNTZType =>
            // Session TZ is UTC everywhere (Verify/Bench/tests), so NTZ→TZ
            // is a type relabel, keeping downstream unix_micros() legal.
            raw.withColumn("ts", col("ts").cast("timestamp"))
          case _ => raw
        }
      } else spark.read.parquet(s"$dir/$name.parquet")
    })

  /** Register every table as a temp view so `spark.sql` queries can use the
    * same table names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
