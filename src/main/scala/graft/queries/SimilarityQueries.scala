package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search operators over the `embeddings` table
  * (64-dim float vectors): brute-force cosine top-k (the exact baseline)
  * and random-hyperplane LSH bucketing (the ANN scale path — at 100 TB the
  * bucket join touches only colliding vectors, never the full n² grid).
  *
  * Vector math uses codegen'd `zip_with`/`aggregate` higher-order
  * functions over `array<double>` — no UDFs, no driver-side loops. The
  * LSH plane weights are deterministic literals (fixed LCG seed) emitted
  * identically into the DataFrame plan and the DuckDB oracle.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))

  private val DIM = 64
  private val PLANES = 8

  /** Deterministic pseudo-random hyperplane weights in [-1, 1), 6-decimal
    * literals so both engines parse the exact same doubles. */
  private[queries] val planes: Seq[Seq[Double]] = {
    var state = 42L
    def next(): Double = {
      state = (state * 1103515245L + 12345L) & 0x7fffffffL
      math.rint((state.toDouble / 0x7fffffffL.toDouble * 2.0 - 1.0) * 1e6) / 1e6
    }
    Seq.fill(PLANES)(Seq.fill(DIM)(next()))
  }

  private def planeArraySql(p: Seq[Double]): String =
    p.mkString("array(", ", ", ")")

  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"

  /** sim_cosine_topk — exact nearest neighbors of vec_id=0 by cosine:
    * broadcast the query vector, one codegen'd pass over all vectors,
    * TakeOrderedAndProject top-20 (no global sort). */
  def simCosineTopk(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("cos",
        expr(dotExpr("v", "qv")) /
          (sqrt(expr(dotExpr("v", "v"))) * sqrt(expr(dotExpr("qv", "qv")))))
      .orderBy(col("cos").desc, col("vec_id"))
      .select(col("vec_id"), col("label"), round(col("cos"), 6).as("cos"))
      .limit(20)
  }

  /** sim_lsh_buckets — random-hyperplane LSH: 8 sign bits → bucket id per
    * vector. The signature is the map side of ANN; candidate generation is
    * a groupBy/join on `bucket`. */
  def simLshBuckets(s: SparkSession, dir: String): DataFrame = {
    val bucketExpr = planes.zipWithIndex.map { case (p, j) =>
      s"CASE WHEN ${dotExpr("v", planeArraySql(p))} > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString(" + ")
    emb(s, dir)
      .select(col("vec_id"), col("label"), expr(bucketExpr).cast("int").as("bucket"))
      .orderBy("vec_id")
  }

  /** sim_lsh_histogram — bucket occupancy (the skew diagnostic for the ANN
    * bucket join: a hot bucket at scale → salting). */
  def simLshHistogram(s: SparkSession, dir: String): DataFrame = {
    val bucketExpr = planes.zipWithIndex.map { case (p, j) =>
      s"CASE WHEN ${dotExpr("v", planeArraySql(p))} > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString(" + ")
    emb(s, dir)
      .select(expr(bucketExpr).cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** sim_label_stats — per-label vector statistics (norm mean/min/max):
    * partial-aggregatable, one shuffle of 10 groups. */
  def simLabelStats(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .withColumn("norm", sqrt(expr(dotExpr("v", "v"))))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(avg("norm"), 6).as("avg_norm"),
        round(min("norm"), 6).as("min_norm"),
        round(max("norm"), 6).as("max_norm"))
      .orderBy("label")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_cosine_topk" -> simCosineTopk _,
    "sim_lsh_buckets" -> simLshBuckets _,
    "sim_lsh_histogram" -> simLshHistogram _,
    "sim_label_stats" -> simLabelStats _)

  // DuckDB formulations: embeddings cast to DOUBLE[], dot product via
  // list_zip + list_transform + list_aggregate to mirror the fold order.
  private def duckDot(a: String, b: String): String =
    s"list_aggregate(list_transform(list_zip($a, $b), p -> p[1] * p[2]), 'sum')"

  private def duckPlane(p: Seq[Double]): String =
    p.mkString("CAST([", ", ", "] AS DOUBLE[])")

  val oracle: Map[String, String] = {
    val duckBucket = planes.zipWithIndex.map { case (p, j) =>
      s"CASE WHEN ${duckDot("v", duckPlane(p))} > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString(" + ")
    Map(
      "sim_cosine_topk" ->
        s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
            SELECT vec_id, label,
                   round(${duckDot("v", "qv")} /
                     (sqrt(${duckDot("v", "v")}) * sqrt(${duckDot("qv", "qv")})), 6) AS cos
            FROM e, q WHERE vec_id <> 0
            ORDER BY ${duckDot("v", "qv")} /
                     (sqrt(${duckDot("v", "v")}) * sqrt(${duckDot("qv", "qv")})) DESC, vec_id
            LIMIT 20""",
      "sim_lsh_buckets" ->
        s"""SELECT vec_id, label, CAST($duckBucket AS INT) AS bucket
            FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
            ORDER BY vec_id""",
      "sim_lsh_histogram" ->
        s"""SELECT bucket, count(*) AS n FROM (
              SELECT CAST($duckBucket AS INT) AS bucket
              FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings))
            GROUP BY bucket ORDER BY bucket""",
      "sim_label_stats" ->
        s"""SELECT label, count(*) AS n,
            round(avg(norm), 6) AS avg_norm,
            round(min(norm), 6) AS min_norm,
            round(max(norm), 6) AS max_norm
            FROM (SELECT label, sqrt(${duckDot("v", "v")}) AS norm
                  FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings))
            GROUP BY label ORDER BY label""")
  }
}
