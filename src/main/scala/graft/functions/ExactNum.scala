package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The numeric-determinism contract's shared kernels (SURVEY.md §5) —
  * ONE definition site, so a contract change cannot drift between the
  * PromQL and TimeSeries surfaces (the oracle SQL strings mirror these
  * formulas literally).
  */
object ExactNum {

  /** Exact, order-independent sum of a double column: decimal(30,6)
    * accumulation, double result.
    */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(30,6)")).cast("double")

  /** Exact sum of squares: quantize the value to the contract's 6
    * decimals FIRST (a cast both engines agree on — the binary noise of
    * a double sits far from the 0.5e-6 rounding boundary), then square
    * IN DECIMAL: (18,6)² → scale 12, exact integer arithmetic,
    * identical on every engine. Squaring the double and casting the
    * product at scale 12 is NOT cross-engine safe (Spark rounds the
    * shortest decimal string, DuckDB the binary value), and casting at
    * scale 6 truncates x² of values below ~1e-3 to 0.
    */
  def exactSumSq(c: Column): Column = {
    val q = c.cast("decimal(18,6)")
    sum((q * q).cast("decimal(38,12)")).cast("double")
  }

  /** ceil(q·n) with a rounding guard: the double product can land a
    * hair above an integral value (0.95·20 = 19.000000000000004) and
    * ceil one position too high — round to 9 decimals first.
    */
  def ceilPos(n: Column, q: Double): Column =
    ceil(round(n * q, 9)).cast("long")

  /** [[ceilPos]] clamped to >= 1, so quantile(0, v) = min. */
  def quantilePos(n: Column, q: Double): Column =
    greatest(lit(1L), ceilPos(n, q))
}
