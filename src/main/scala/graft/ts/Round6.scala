package graft.ts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic 6-dp quantization.
  *
  * `round(x, 6)` is NOT portable between engines: Spark rounds the
  * shortest decimal repr (BigDecimal HALF_UP) while DuckDB scales and
  * rounds the binary value, so exact .xxxxxx5 ties resolve differently.
  * `floor(x*1e6 + 0.5)/1e6` is a fixed sequence of IEEE ops — two engines
  * fed bit-identical doubles produce bit-identical results, ties
  * included. Also normalizes -0.0 to +0.0. Domain: |x| < 2^52/1e6.
  */
object Round6 {
  /** The 0.000137 margin shifts the rounding boundary off exact decimal
    * halves: aggregation results that are exact .xxxxxx5 decimals (e.g.
    * avg of quantized inputs) otherwise land 1 float-sum-order ulp on
    * either side of the boundary per engine. The shifted boundary is not
    * a value any low-denominator rational hits, and the margin is ~5
    * orders of magnitude above accumulated float error. */
  private val Bias = 0.500137
  def r6(c: Column): Column = floor(c * lit(1e6) + lit(Bias)) / lit(1e6)
  def r6Sql(e: String): String = s"floor(($e) * 1000000.0 + $Bias) / 1000000.0"
}
