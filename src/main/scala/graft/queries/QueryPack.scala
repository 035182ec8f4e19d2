package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A query pack contributes named queries (DataFrame programs over a
  * fixture dir) plus DuckDB-oracle SQL duals. SparkEntry unions all packs.
  */
trait QueryPack {
  type Fn = (SparkSession, String) => DataFrame
  def queries: Map[String, Fn]
  def oracle: Map[String, String]
}

/** Cross-engine-exact numeric helpers.
  *
  * Oracle comparison hashes values, so aggregates must be bit-identical
  * between Spark (parallel, arbitrary partition order) and DuckDB
  * (sequential). Double summation is order-dependent; these helpers make
  * the compared value order-independent:
  *  - `moneySum`: cast each row to DECIMAL(18,s) (a deterministic rounding
  *    of the double), sum exactly, and emit the total as DOUBLE. Matches
  *    SQL `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
  *  - `exactAvg`: exact decimal sum divided by count, result double —
  *    both engines perform the identical division on identical inputs.
  *    Matches `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(*)`.
  * The final DOUBLE cast matters for the comparator: Spark's decimal sum
  * widens to DECIMAL(28,s) while DuckDB's widens to DECIMAL(38,s), and
  * scale-padded decimal rendering ("50000.00") disagrees with float
  * rendering ("50000.0") in the driver's hash. A decimal whose unscaled
  * value is < 2^53 converts to the identical IEEE double on both engines
  * (exact integer → exact power-of-ten division, correctly rounded), so
  * the compared value is bit-stable. The internal sum stays decimal —
  * that is also the right engineering at 1000 executors: float drift
  * across merge order is a real reproducibility bug at 100 TB.
  */
object OracleSafe {
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))
  def moneySum(c: Column, scale: Int = 2): Column =
    sum(dec(c, scale)).cast("double")
  def exactAvg(c: Column, scale: Int = 2): Column =
    moneySum(c, scale) / count(lit(1))
}
