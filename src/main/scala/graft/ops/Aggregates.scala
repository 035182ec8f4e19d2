package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation library (SURVEY.md §2d).
  *
  * The reference's live path supports exactly Count/Sum/Average via a
  * driver-heap groupBy fold (Microbase.scala:343-416); its generic
  * declarative-aggregate engine is dead code (M:303-342,417-499). Spark's
  * HashAggregateExec implements that same partial/final contract natively
  * — map-side partial aggregation before the shuffle, spillable hash map,
  * codegen — which is what survives 100 TB (the reference's
  * `rows.groupBy` materializes every group on one heap).
  */
object Aggregates {

  /** A1 — ungrouped (global) aggregate (M:343-369). Note: the reference's
    * AVG over ints does integer division (M:362) — we follow ANSI/Spark
    * (double) and document the divergence. */
  def global(aggs: Column*)(df: DataFrame): DataFrame = df.agg(aggs.head, aggs.tail: _*)

  /** A2 — hash group-by aggregate (M:370-416), superset: any number of
    * grouping expressions (reference only supports bare attributes,
    * M:446-450). */
  def byKey(keys: Seq[Column], aggs: Seq[Column])(df: DataFrame): DataFrame =
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** HAVING — absent from the reference; group-filter after aggregation. */
  def having(keys: Seq[Column], aggs: Seq[Column], cond: Column)(df: DataFrame): DataFrame =
    byKey(keys, aggs)(df).filter(cond)

  /** ROLLUP / CUBE — absent from the reference. */
  def rollup(keys: Seq[Column], aggs: Seq[Column])(df: DataFrame): DataFrame =
    df.rollup(keys: _*).agg(aggs.head, aggs.tail: _*)
  def cube(keys: Seq[Column], aggs: Seq[Column])(df: DataFrame): DataFrame =
    df.cube(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Exact money sum that is bit-identical across engines and partition
    * orders: per-row cast to DECIMAL(18,s) (deterministic round of the
    * double), then exact decimal summation. Used by every oracle-compared
    * money aggregate; also the correct choice at scale (no float drift
    * across 1000 executors). */
  def moneySum(c: Column, scale: Int = 2): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, scale)))

  /** A3 idiomatic replacement — a typed custom Aggregator implementing the
    * same init/update/merge/finish contract the reference's dead generic
    * engine extracted from DeclarativeAggregate (M:303-342). Weighted mean:
    * value*weight accumulated exactly. */
  class WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Double)): Double = if (b._2 == 0) 0.0 else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
  val weightedAvg = udaf(new WeightedAvg())

  /** EXACT distinct counting via fixed-range bitmaps — the roaring-bitmap
    * pattern without the library: each (group, id-bucket) cell holds a
    * `bits`-wide bitset (16 longs at 1024), reduce sets a bit, merge ORs
    * — fully mergeable and ORDER-INDEPENDENT, so unlike a float sketch it
    * is exact, and unlike `count_distinct`'s expand it never shuffles raw
    * ids twice. The caller buckets ids (`id div bits` → bucket key,
    * `id mod bits` → slot) and SUMS per-bucket popcounts: distinct ids
    * never collide across buckets, so the sum is the exact global count.
    * State per cell is bits/8 bytes regardless of row count — the
    * segment-membership / exact-audience shape at 100 TB (HLL is the
    * approximate companion when ids are unbounded or cells explode). */
  class BitsetDistinct(bits: Int)
      extends Aggregator[Long, Array[Long], Long] {
    require(bits > 0 && bits % 64 == 0, "bits must be a positive multiple of 64")
    def zero: Array[Long] = new Array[Long](bits / 64)
    def reduce(b: Array[Long], slot: Long): Array[Long] = {
      val i = slot.toInt
      require(i >= 0 && i < bits, s"slot $slot outside [0, $bits)")
      b(i >> 6) |= 1L << (i & 63)
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Long = {
      var c = 0L; var i = 0
      while (i < b.length) { c += java.lang.Long.bitCount(b(i)); i += 1 }
      c
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
  val bitsetDistinct1024 = udaf(new BitsetDistinct(1024))

  /** Count-Min sketch as a typed mergeable Aggregator (Cormode &
    * Muthukrishnan 2005) — the point-frequency member of the sketch
    * family (HLL = cardinality, theta = set overlap, Misra–Gries =
    * frequent items, GK = quantiles, CMS = "how often did THIS key
    * occur"). The buffer is a fixed depth×width counter matrix: reduce
    * adds 1 to one counter per row (the row's seeded hash of the item),
    * merge sums element-wise — mergeable and order-independent, so it
    * map-side-combines and shuffles depth·width longs regardless of
    * corpus size or key cardinality. Estimates (min over rows, see
    * [[cmsEstimate]]) can only OVERCOUNT: est − true ≤ e/width · N with
    * probability 1 − (1/e)^depth. Row-sum invariant: every row of the
    * matrix independently sums to N. */
  class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth > 0 && width > 0, "depth and width must be positive")
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(b: Array[Long], item: String): Array[Long] = {
      var d = 0
      while (d < depth) {
        b(d * width + CountMin.bucket(item, d, width)) += 1L
        d += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
  object CountMin {
    /** Row-d bucket for an item: seeded MurmurHash3, floor-mod to width —
      * shared by the aggregator's update path and the estimate side, which
      * is what makes a persisted sketch queryable later. */
    def bucket(item: String, d: Int, width: Int): Int =
      math.floorMod(scala.util.hashing.MurmurHash3.stringHash(item, d), width)
  }

  /** Point-frequency estimate from a finished CMS: min over each row's
    * counter for the item — never under the true count. The sketch is a
    * bounded scalar (depth·width longs) — broadcasting it to score a key
    * list is the intended 100 TB use. */
  def cmsEstimate(sketch: Array[Long], depth: Int, width: Int,
      item: String): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + CountMin.bucket(item, d, width))
      if (c < est) est = c
      d += 1
    }
    est
  }

  /** Misra–Gries heavy-hitters summary as a typed mergeable Aggregator —
    * the bounded-memory frequent-items sketch (Misra–Gries 1982; merge
    * rule per Agarwal et al., "Mergeable Summaries", PODS'12). The buffer
    * holds at most k counters regardless of input size; merge sums
    * counters pointwise, then subtracts the (k+1)-largest count from all
    * and drops non-positives.
    *
    * Guarantee (spec-asserted): estimates UNDERCOUNT by at most N/(k+1)
    * total stream length N, so every item with true count > N/(k+1)
    * survives in the summary — the heavy hitters — while memory stays
    * O(k) per partition instead of O(distinct). The at-scale shape of
    * "top tokens over 100 TB of text" where an exact groupBy's key space
    * would dwarf memory. */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0)
    def zero: Map[String, Long] = Map.empty

    /** Subtract the (k+1)-largest counter from all and drop non-positive
      * results: at most k entries exceed that cut, so ≤ k remain. The
      * error-bound argument needs the cut to be the (k+1)-largest
      * REGARDLESS of current buffer size — each shrink then removes ≥
      * (k+1)·cut count units while undercounting any single item by ≤
      * cut, so total undercount ≤ N/(k+1). */
    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
        m.flatMap { case (key, c) =>
          if (c - cut > 0) Some(key -> (c - cut)) else None
        }
      }

    // The buffer may grow to 2k between shrinks: triggering the O(k log k)
    // cut on every saturated insert would dominate per-row cost on a
    // heavy-tailed stream; deferring until 2k amortizes it to O(log k)
    // per element while the bound above is unchanged (the cut is still
    // the (k+1)-largest). finish() compacts to ≤ k.
    def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      if (item == null) b // builtin aggs skip NULLs; map keys must too
      else {
        val grown = b.updated(item, b.getOrElse(item, 0L) + 1L)
        if (grown.size > 2 * k) shrink(grown) else grown
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (combined.size > 2 * k) shrink(combined) else combined
    }

    def finish(b: Map[String, Long]): Map[String, Long] = shrink(b)
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
  def heavyHitters(c: Column, k: Int): Column = udaf(new MisraGries(k)).apply(c)

  // ---- ε-bounds verdicts for sketch audits -------------------------------
  //
  // Sketch ESTIMATES are engine-specific (register layouts, seeds, merge
  // schedules), so they can never be hash-compared against an oracle — but
  // each structure's PUBLISHED error bound at its configured parameters
  // can: the audit emits the exact counterpart (which DuckDB recomputes)
  // plus a boolean "estimate landed inside the bound" verdict (which the
  // oracle asserts as TRUE). The bound predicates live here so the query
  // pack and the mis-parameterization specs (AggregatesSpec: a sketch
  // built too small must FAIL its honest bound) share one definition.

  /** |est − exact| ≤ sigmas·rsd·exact — the cardinality-sketch bound for
    * HLL-family estimators quoted at `sigmas` standard errors (rsd =
    * 1.04/√m for a 2^lgK-register HLL; Spark's approx_count_distinct
    * takes rsd directly). 4σ keeps the deterministic fixture verdicts
    * far from the boundary (observed: ≤ 0.73σ at sf0.01/sf0.1). */
  def cardinalityWithinBounds(est: Column, exact: Column, rsd: Double,
      sigmas: Double = 4.0): Column =
    abs(est.cast("double") - exact.cast("double")) <=
      lit(sigmas * rsd) * exact.cast("double")

  /** Greenwald–Khanna rank-error verdict: the value returned for quantile
    * `q` over `n` rows must have a RANK interval [lt+1, le] within
    * ε·n (+1 for the target-rank convention gap) of the target rank q·n —
    * the GK guarantee is on rank, never on value distance. `lt`/`le` are
    * the exact counts of rows strictly-below / at-or-below the returned
    * value. */
  def rankWithinEps(lt: Column, le: Column, n: Column, q: Double,
      eps: Double): Column = {
    val nd = n.cast("double")
    val slack = lit(eps) * nd + lit(1.0)
    (lt.cast("double") + lit(1.0) <= lit(q) * nd + slack) &&
      (le.cast("double") >= lit(q) * nd - slack)
  }

  /** Count-Min overcount verdict: est ≥ exact always (min over rows of
    * summed counters can only collide upward), and est − exact ≤
    * (e/width)·N with probability 1 − e^-depth per key — deterministic on
    * a fixed corpus with the seeded hashes above (observed max overcount:
    * 0.45·ε·N at sf0.1, zero violators). */
  def cmsWithinEps(est: Column, exact: Column, width: Int, totalN: Long)
      : Column =
    (est - exact).cast("double") <= lit(math.E / width * totalN)

  /** Pairwise Pearson correlation matrix over `cols`, computed from
    * exact decimal moment sums in ONE aggregate pass.
    *
    * The built-in `corr` streams double accumulators whose partition
    * merge order perturbs the last ulps — fine numerically, fatal for a
    * hash-comparing oracle. Here every moment (Σx, Σxy, …) is an exact
    * DECIMAL sum (each input cast to DECIMAL(18,`scale`); products carry
    * 2·scale digits), so the moments are merge-order-independent, and the
    * correlation is then ONE fixed double expression over those exact
    * moments — bit-identical on any cluster and on the oracle engine.
    * Same policy as [[moneySum]]; inputs must keep every moment's VALUE
    * under 2^53 at the chosen scale (the double cast is then exact) —
    * holds for bounded columns like quantities/rates into the billions of
    * rows. The exact-decimal pass is also the right call at 100 TB: a
    * training-metrics pipeline re-run must reproduce its numbers.
    *
    * Output: one row per unordered pair — (col_x, col_y, n, corr). */
  def corrMatrixExact(df: DataFrame, cols: Seq[String], scale: Int = 3): DataFrame = {
    require(cols.size >= 2, "corrMatrixExact needs at least two columns")
    def d(c: String): Column = col(c).cast(DecimalType(18, scale))
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val moments: Seq[Column] =
      count(lit(1)).cast("double").as("__n") +:
      (cols.map(c => sum(d(c)).cast("double").as(s"__s_$c")) ++
       cols.map(c => sum(d(c) * d(c)).cast("double").as(s"__ss_$c")) ++
       pairs.map { case (x, y) =>
         sum(d(x) * d(y)).cast("double").as(s"__sp_${x}_$y") })
    val wide = df.agg(moments.head, moments.tail: _*)
    val stackArgs = pairs.map { case (x, y) =>
      s"""'$x', '$y',
          (__n * __sp_${x}_$y - __s_$x * __s_$y) /
            sqrt(__n * __ss_$x - __s_$x * __s_$x) /
            sqrt(__n * __ss_$y - __s_$y * __s_$y)""" }.mkString(", ")
    wide.selectExpr(
      "CAST(__n AS BIGINT) AS n",
      s"stack(${pairs.size}, $stackArgs) AS (col_x, col_y, corr)")
      .select("col_x", "col_y", "n", "corr")
  }

  /** Deterministic per-group mode: the most frequent value, smallest
    * value winning count ties — unlike the built-in `mode()`, whose tie
    * winner is whatever partition merge order produced (unusable under a
    * hash-comparing oracle or a reproducibility contract). Two keyed
    * aggregations (value counts, then argmax by count with value
    * tie-break); shuffles key on (group, value) then group. */
  def modeByKey(
      df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val counts = df.groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("n").desc, col(valueCol).asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(keys.map(col) :+ col(valueCol).as("mode_value") :+
        col("n").as("mode_count"): _*)
  }

  /** Per-group ordinary-least-squares line y = slope·x + intercept, from
    * the same exact-decimal moment discipline as [[corrMatrixExact]]:
    * Σx, Σy, Σxy, Σx² are exact DECIMAL sums (merge-order-independent),
    * then slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and
    * intercept = (Σy − slope·Σx)/n are fixed double expressions —
    * bit-identical on any cluster and on the oracle engine. One
    * aggregation pass per group; the groupwise trend-fit primitive
    * (regression per segment/tenant/experiment arm) without ML-library
    * weight, and reproducible enough to gate a pipeline on. */
  def linregByKey(
      df: DataFrame, keys: Seq[String], xCol: String, yCol: String,
      scale: Int = 3): DataFrame = {
    def d(c: String): Column = col(c).cast(DecimalType(18, scale))
    val n = count(lit(1)).cast("double")
    val sx = sum(d(xCol)).cast("double")
    val sy = sum(d(yCol)).cast("double")
    val sxy = sum(d(xCol) * d(yCol)).cast("double")
    val sxx = sum(d(xCol) * d(xCol)).cast("double")
    df.groupBy(keys.map(col): _*)
      .agg(n.as("__n"), sx.as("__sx"), sy.as("__sy"),
        sxy.as("__sxy"), sxx.as("__sxx"))
      .withColumn("slope",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")))
      .withColumn("intercept",
        (col("__sy") - col("slope") * col("__sx")) / col("__n"))
      .select(keys.map(col) ++ Seq(
        col("__n").cast("long").as("n"), col("slope"), col("intercept")): _*)
  }

  /** Per-group skewness and excess kurtosis from exact raw moments —
    * the shape diagnostics (is the distribution lopsided / heavy-tailed?)
    * behind outlier policy and transform choice, computed under the same
    * discipline as [[linregByKey]]/[[corrMatrixExact]]: Σx…Σx⁴ are exact
    * DECIMAL sums (merge-order-independent — the moments a built-in
    * `skewness()` accumulates in floats, drifting with partition order),
    * then population m₂/m₃/m₄ and the ratios are one fixed double
    * expression. `m₂^1.5` is written `m₂·√m₂` (sqrt is IEEE
    * correctly-rounded; `pow(x, 1.5)` is not guaranteed to be) →
    * bit-identical cross-engine. Values must fit DECIMAL(4,0) (integer
    * grades/quantities/counts): 4th powers then stay within precision 38
    * through the multiply chain — wider inputs need a scale tradeoff. */
  def skewKurtosis(
      df: DataFrame, keys: Seq[String], xCol: String): DataFrame = {
    val d0 = col(xCol).cast(DecimalType(4, 0))
    val n = count(lit(1)).cast("double")
    df.groupBy(keys.map(col): _*)
      .agg(n.as("_n"),
        sum(d0).cast("double").as("_sx"),
        sum(d0 * d0).cast("double").as("_sx2"),
        sum(d0 * d0 * d0).cast("double").as("_sx3"),
        sum(d0 * d0 * d0 * d0).cast("double").as("_sx4"))
      .withColumn("mu", col("_sx") / col("_n"))
      .withColumn("m2",
        col("_sx2") / col("_n") - col("mu") * col("mu"))
      .withColumn("m3",
        col("_sx3") / col("_n") -
          lit(3.0) * col("mu") * (col("_sx2") / col("_n")) +
          lit(2.0) * col("mu") * col("mu") * col("mu"))
      .withColumn("m4",
        col("_sx4") / col("_n") -
          lit(4.0) * col("mu") * (col("_sx3") / col("_n")) +
          lit(6.0) * col("mu") * col("mu") * (col("_sx2") / col("_n")) -
          lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
      .select(keys.map(col) ++ Seq(
        col("_n").cast("long").as("n"),
        (col("m3") / (col("m2") * sqrt(col("m2")))).as("skewness"),
        (col("m4") / (col("m2") * col("m2")) - lit(3.0))
          .as("kurtosis_excess")): _*)
  }

  /** Exact weighted percentile: the smallest value v whose cumulative
    * weight (in value order) reaches p of the total — weighted median at
    * p = 1/2. The estimator behind "the price point where half the
    * QUANTITY (not half the rows) has traded", reweighted quantiles of a
    * mixture, or capacity planning on weighted demand.
    *
    * p is a RATIONAL `pNum/pDen`, so the threshold test is
    * `pDen·cum ≥ pNum·W` — pure integer comparison, no float epsilon at
    * the boundary in either engine. The cumulative weight is the
    * two-phase [[Pipeline.runningTotal]] (no SinglePartition window), W
    * is a 1-row broadcast, and the answer is a TakeOrderedAndProject
    * limit-1 over the qualifying rows. Weights must be positive longs
    * (cum is then strictly increasing, making the answer row unique);
    * the (cum, value) ordering below keeps the pick deterministic even
    * if a caller slips in zero weights. */
  def weightedPercentile(
      df: DataFrame, valCol: Column, weightCol: Column,
      pNum: Long, pDen: Long, tiebreaks: Column*): DataFrame = {
    require(pNum >= 0 && pDen > 0 && pNum <= pDen, "need 0 <= p <= 1")
    val base = df.select((valCol.as("_v") +: weightCol.as("_w") +:
      tiebreaks): _*)
    val order = col("_v").asc +: tiebreaks.map(_.asc)
    val rt = Pipeline.runningTotal(base, col("_w"), "cum_w", order: _*)
    val total = base.agg(sum(col("_w").cast("long")).as("total_w"))
    rt.crossJoin(broadcast(total))
      .filter(col("cum_w") * pDen >= col("total_w") * pNum)
      .orderBy(col("cum_w").asc, col("_v").asc)
      .limit(1)
      .select(col("_v").as("value"), col("cum_w"), col("total_w"))
  }

  /** Equi-DEPTH histogram: `buckets` ranges holding (as near as integer
    * division allows) equal row counts — the boundary set you feed a
    * range partitioner, a sort-merge bucketing layout, or a monotone
    * binning UDF at 100 TB, where equi-WIDTH bins (agg_histogram) are
    * useless under skew. Bucket of a row = `⌊(rank−1)·B / n⌋` on the
    * GLOBAL rank from [[Pipeline.globalPosition]] (two-phase range
    * partitioning — no SinglePartition window), n a 1-row broadcast;
    * per-bucket lo/hi/count is one 16-key aggregation. All-integer
    * bucket arithmetic → deterministic and oracle hash-exact. Rows tied
    * across a boundary are placed by the `tiebreaks` order; FULL
    * duplicates may straddle, which changes nothing observable. */
  def equiDepthHistogram(
      df: DataFrame, valCol: Column, buckets: Int,
      tiebreaks: Column*): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val base = df.select((valCol.as("_v") +: tiebreaks): _*)
    val ranked = Pipeline.globalPosition(base, "_rk",
      (col("_v").asc +: tiebreaks.map(_.asc)): _*)
    val n = base.agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        expr(s"CAST(((_rk - 1) * $buckets) div _n AS INT)"))
      .groupBy("bucket")
      .agg(min(col("_v")).as("lo"), max(col("_v")).as("hi"),
        count(lit(1)).as("n_rows"))
  }
}
