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

  // ---- Long-quantized exact sums (the q1 fast path) -------------------
  //
  // `moneySum`'s decimal accumulation costs ~5× the codegen'd long path
  // (Spark widens to DECIMAL(28,s), off the compact-long fast path), so
  // hot scans quantize each row to integer 10^-s units — floor(x·10^s
  // + 0.5) is a correctly-rounded IEEE expression both engines evaluate
  // identically — and sum exact longs. Exactness has a PRECONDITION:
  // Σ|units| must stay below 2^63. What happens past it depends on
  // session config: under ANSI mode (the Spark 4 DEFAULT) the sum
  // throws a generic mid-aggregation ARITHMETIC_OVERFLOW, but with
  // spark.sql.ansi.enabled=false (common in sessions migrated from
  // Spark 3) sum(long) WRAPS and the units cast SATURATES — both
  // silently. Every quantized sum therefore ships with the
  // refuse-loudly guard below (the dd5/dd6/dd7 rule: a scale limit
  // must throw, not corrupt): config-independent, fires on the
  // a-priori bound BEFORE any wrap, and names the decimal fallback.

  /** A-priori overflow bound for long-quantized sums, with 2× slack:
    * a group of `n` rows whose largest |unit| value is `m` satisfies
    * |Σ units| ≤ n·m (every partial sum too), so n·m < 2^62 guarantees
    * the exact long sum never nears 2^63; the slack absorbs the double
    * rounding of the n·m product itself. */
  val quantBound: Double = 4.6e18 // < 2^62 = 4.611686e18

  /** Integer 10^-s units of `c` (s10 = 10^s), rounding half-up on the
    * binary product — written identically in oracle SQL texts. */
  def units(c: Column, s10: Double): Column =
    floor(c * lit(s10) + lit(0.5)).cast("long")

  /** Exact long-quantized sum emitted as DOUBLE (same long → same
    * double everywhere). Callers MUST pair with [[quantGuarded]]. */
  def quantSum(c: Column, s10: Double): Column =
    sum(units(c, s10)).cast("double") / lit(s10)

  /** Refuse-loudly overflow guard for long-quantized sums. Wrap EVERY
    * quantized output column (`through`, declared type `dtype`) of the
    * post-aggregation projection with the per-group bound check
    * `max|units| · rows < 2^62`; past the bound the query THROWS
    * (raise_error) instead of returning silently wrapped sums — the
    * caller partitions the input or falls back to [[moneySum]].
    * Wrapping every quantized column (not one designated carrier)
    * matters: Catalyst prunes unreferenced project expressions, so a
    * guard on a column the caller did not select would vanish with it —
    * this way whichever wrappable values ARE consumed carry the check.
    * `maxUnits`/`rows` come from the same aggregation as the sums
    * (`max(abs(units(...)))`, `count(*)`) so the guard adds two cheap
    * agg buffers and zero extra passes; a quantizing cast that
    * saturated at Long.MaxValue trips the bound too.
    * Empty input is in-bound by definition: a global aggregate over
    * zero rows has `max(abs(units))` NULL (and rows 0), the sums are
    * NULL, and no wrap is possible — without the explicit NULL/zero
    * arm the when-predicate would evaluate NULL and fall through to
    * raise_error, a spurious refusal on a legitimate empty filter
    * match (e.g. q19's narrow brand/size predicates at small SF). */
  def quantGuarded(through: Column, maxUnits: Column, rows: Column,
      dtype: String, query: String): Column =
    when(rows === lit(0L) || maxUnits.isNull ||
        maxUnits.cast("double") * rows.cast("double") < lit(quantBound),
      through)
    .otherwise(raise_error(concat(
      lit(s"$query: long-quantized sum overflow risk - max|units| "),
      maxUnits.cast("string"), lit(" x rows "), rows.cast("string"),
      lit(" reaches 2^62; non-ANSI sum(long) would wrap silently. " +
        "Partition the input or use the decimal moneySum fallback.")))
      .cast(dtype))
}
