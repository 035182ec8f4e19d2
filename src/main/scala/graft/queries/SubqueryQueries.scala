package graft.queries

import graft.sources.Tables

/** Subquery surface beyond the reference (SURVEY.md §2e: only FROM-clause
  * derived tables work there — no scalar, correlated, or IN subqueries).
  * All through the SQL text path: Spark's analyzer decorrelates these into
  * joins (scalar-agg → broadcast join; correlated → left outer join on the
  * correlation key; IN → left semi join), which is exactly the 100 TB
  * shape — no per-row re-execution.
  *
  * Scalar averages are computed as exact decimal-sum / count so the
  * threshold comparisons are bit-identical across engines.
  */
object SubqueryQueries extends QueryPack {

  private val exactAvgPrice =
    "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)"
  private val exactAvgQty =
    "CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)"

  private def run(sqlText: String): Fn = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(sqlText)
  }

  private val sq1 =
    s"""SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_totalprice > 2 * (SELECT $exactAvgPrice FROM orders)
       ORDER BY o_orderkey"""

  private val sq2 =
    s"""SELECT l.l_orderkey, l.l_partkey, l.l_quantity FROM lineitem l
       WHERE l.l_quantity < 0.3 * (SELECT $exactAvgQty
                                   FROM lineitem l2
                                   WHERE l2.l_partkey = l.l_partkey)
       ORDER BY l.l_orderkey, l.l_partkey, l.l_quantity"""

  private val sq3 =
    """SELECT o_orderkey, o_custkey FROM orders
       WHERE o_custkey IN (SELECT c_custkey FROM customer
                           WHERE c_acctbal > 8000)
       ORDER BY o_orderkey, o_custkey"""

  private val sq4 =
    """SELECT c_custkey, c_acctbal FROM customer
       WHERE c_acctbal NOT IN (SELECT o_totalprice FROM orders
                               WHERE o_custkey = c_custkey)
       ORDER BY c_custkey"""

  val queries: Map[String, Fn] = Map(
    // scalar (uncorrelated) subquery in a predicate
    "sq1_scalar_subquery" -> run(sq1),
    // correlated scalar subquery (TPC-H Q17 shape) — decorrelated by the
    // analyzer into an aggregate + join on the correlation key
    "sq2_correlated_scalar" -> run(sq2),
    // IN subquery → left semi join
    "sq3_in_subquery" -> run(sq3),
    // correlated NOT IN → null-aware anti join
    "sq4_not_in_correlated" -> run(sq4)
  )

  val oracle: Map[String, String] = Map(
    "sq1_scalar_subquery" -> sq1,
    "sq2_correlated_scalar" -> sq2,
    "sq3_in_subquery" -> sq3,
    "sq4_not_in_correlated" -> sq4
  )
}
