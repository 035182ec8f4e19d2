package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline utilities: stratified sampling, reproducible
  * shuffling, and context-window packing. All distributed, deterministic
  * (seeded / hash-ordered), and driver-state-free.
  */
object Pipeline {

  /** Stratified sample: per-stratum Bernoulli fractions, seeded. The
    * standard class-balancing primitive (e.g., downsample over-represented
    * languages). Scan-local: no shuffle. */
  def stratifiedSample(
      df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Reproducible global shuffle: orders by a salted content hash. The
    * same (data, seed) yields the same permutation on any cluster layout —
    * unlike rand()-based shuffles. Used to decorrelate training batches.
    * One range-partitioned sort — the unavoidable cost of a total order. */
  def deterministicShuffle(df: DataFrame, seed: Long, keyCols: Column*): DataFrame =
    df.orderBy(xxhash64(lit(seed) +: keyCols: _*), keyCols.head)

  /** Context-window packing: assign documents (in a stable id order) to
    * training bins by prefix token sums — bin b holds the docs whose
    * preceding cumulative token count falls in [b*budget, (b+1)*budget).
    * Prefix-sum semantics (a doc may straddle its boundary) rather than
    * stateful first-fit: expressible as one window, so it scales; exact
    * first-fit would need a sequential scan per partition. */
  def packByTokenBudget(
      df: DataFrame, idCol: Column, tokensCol: Column,
      budget: Int): DataFrame = {
    val w = Window.orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokensCol).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - tokensCol).cast("double") / budget)
          .cast("int"))
  }
}
