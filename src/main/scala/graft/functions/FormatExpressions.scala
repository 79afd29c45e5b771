package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar formatting helpers — F14, the reference's `humanise` byte-count
  * log formatter (grpc/service.go:986-997): counts below 10 Ki print
  * plain, then `k`/`M`/`G` with 10-unit thresholds and truncating
  * division. Pure built-in expressions (codegen'd, no UDF), usable in any
  * projection — e.g. job/log summaries over transfer sizes. */
object FormatExpressions {
  private val K = 1024L

  def humanise(c: Column): Column = {
    val v = c.cast("long")
    // `/` on columns is double division; the truncating cast back to long
    // matches Go's integer division for the positive byte counts this
    // formats (and doubles are exact far beyond the 10G branch point)
    def unit(div: Long, suffix: String): Column =
      concat((v / div).cast("long").cast("string"), lit(suffix))
    when(v < 10 * K, v.cast("string"))
      .when(v < 10 * K * K, unit(K, "k"))
      .when(v < 10 * K * K * K, unit(K * K, "M"))
      .otherwise(unit(K * K * K, "G"))
  }
}
