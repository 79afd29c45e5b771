package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for training-data
  * pipelines: select a reproducible fraction of each stratum (source,
  * language, quality bucket …) with NO RNG state — membership is a pure
  * function of the row key, so reruns, retries and different cluster
  * sizes keep identical samples, and the filter is codegen'd and
  * shuffle-free (the rates dimension broadcasts; the md5 threshold
  * compare pushes into the scan stage). */
object Sampling {

  /** Hex threshold below which the first 4 md5 digits of a key fall with
    * probability `rate` (hex digits are uniform; "g" accepts everything
    * because every hex digit sorts below it). */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    if (rate >= 1.0) "g" else f"${(rate * 65536).toInt}%04x"
  }

  /** Keep each row of `df` iff substring(md5(key),1,4) < threshold(rate of
    * its stratum). Rows in strata absent from `rates` are dropped (mixing
    * semantics: unlisted sources contribute nothing). */
  def stratified(spark: SparkSession, df: DataFrame, keyCol: String,
      strataCol: String, rates: Map[String, Double]): DataFrame = {
    import spark.implicits._
    val dim = rates.toSeq.map { case (k, r) => (k, rateThreshold(r)) }
      .toDF("__stratum", "__thr")
    df.join(broadcast(dim), col(strataCol) === col("__stratum"))
      .filter(substring(md5(col(keyCol).cast("string")), 1, 4) < col("__thr"))
      .drop("__stratum", "__thr")
  }
}
