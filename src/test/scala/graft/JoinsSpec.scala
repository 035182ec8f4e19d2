package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins
import graft.sources.Tables

/** Scale-mechanics join tests: salted joins preserve semantics; bucketed
  * tables join without a shuffle. */
class JoinsSpec extends GraftSuite {

  test("salted join returns exactly the plain join's rows") {
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    val plain = ord.join(cust, col("o_custkey") === col("c_custkey"))
    val salted = Joins.salted(ord, cust, "o_custkey", "c_custkey", salt = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    Tables.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
      "orders_b", 4, "o_custkey")
    Tables.writeBucketed(
      Tables.customer(spark, sf).select("c_custkey", "c_acctbal"),
      "customer_b", 4, "c_custkey")
    // force a sort-merge join (broadcast would hide the bucketing effect)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
