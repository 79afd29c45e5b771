package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for training-data
  * pipelines: select a reproducible fraction of each stratum (source,
  * language, quality bucket …) with NO RNG state — membership is a pure
  * function of the row key, so reruns, retries and different cluster
  * sizes keep identical samples, and the filter is codegen'd and
  * shuffle-free (the rates dimension broadcasts; the md5 threshold
  * compare pushes into the scan stage). */
object Sampling {

  /** Hex threshold below which the first 8 md5 digits of a key fall with
    * probability `rate` (hex digits are uniform; "g" accepts everything
    * because every hex digit sorts below it). 32-bit granularity: the
    * old 16-bit form floored any rate below 1/65536 to ZERO — a
    * realistic web-scale mixing rate like 1e-5 silently contributed
    * nothing — and quantized every rate by up to 1/65536. */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    if (rate >= 1.0) "g" else f"${(rate * 4294967296.0).toLong}%08x"
  }

  /** Keep each row of `df` iff substring(md5(key),1,8) < threshold(rate of
    * its stratum). Rows in strata absent from `rates` are dropped (mixing
    * semantics: unlisted sources contribute nothing). */
  def stratified(spark: SparkSession, df: DataFrame, keyCol: String,
      strataCol: String, rates: Map[String, Double]): DataFrame = {
    import spark.implicits._
    val dim = rates.toSeq.map { case (k, r) => (k, rateThreshold(r)) }
      .toDF("__stratum", "__thr")
    df.join(broadcast(dim), col(strataCol) === col("__stratum"))
      .filter(substring(md5(col(keyCol).cast("string")), 1, 8) < col("__thr"))
      .drop("__stratum", "__thr")
  }

  /** Deterministic weighted reservoir sample per stratum (Efraimidis &
    * Spirtakis 2006, "Weighted random sampling with a reservoir" — the
    * A-ES scheme): each row gets key ln(u)/w with u a uniform in (0,1)
    * derived from the first 48 md5 bits of its id; the k LARGEST keys
    * per stratum are exactly a weighted sample without replacement.
    * No RNG state — reruns, retries and different cluster sizes keep
    * identical samples. The plan shuffles once on the stratum key for
    * the window rank, and Spark plans a WindowGroupLimit Partial BEFORE
    * that exchange (verified in PLANS.md): each task forwards at most k
    * rows per stratum, so the shuffle moves O(k·strata·tasks) rows, not
    * the corpus.
    *
    * Weights MUST be strictly positive — A-ES is undefined otherwise
    * (w = 0 divides by zero; w < 0 flips the key sign so invalid rows
    * would always win). Non-positive weights fail the job eagerly via
    * `assert_true` rather than silently skewing the sample. */
  def weightedTopK(df: DataFrame, idCol: String, strataCol: String,
      weight: Column, k: Int): DataFrame = {
    require(k > 0, s"sample size $k must be positive")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("double") + 0.5) / 281474976710656.0 // 2^48
    val checked = when(assert_true(weight > 0,
      concat(lit("weightedTopK: non-positive weight "), weight.cast("string"),
        lit(" for id "), col(idCol).cast("string"))).isNull, weight)
    val key = log(u) / checked
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(key.desc, col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .withColumnRenamed("__rk", "sample_rank")
  }
}
