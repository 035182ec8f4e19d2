package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.OracleSafe._
import graft.sources.Tables

/** Dev-only A/B: decimal moneySum vs long-quantized sums for the
  * non-q1 money queries (r16 verdict stretch item 7). Times catalog
  * (decimal) vs a quantized variant of each body, min-of-3, Force.run,
  * cached tables — decide adopt vs document per query. */
object DevQuant {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("WARN")
    Tables.tpch.foreach(t => Tables.load(s, d, t).cache().count())

    def qs(c: org.apache.spark.sql.Column) = quantSum(c, 1e4)
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

    def q3v(m: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1999-06-01").cast("timestamp"))
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1999-06-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"), col("o_orderpriority"))
        .agg(m(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc).limit(10)
    }
    def q6v(m: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24.0)
        .agg(m(col("l_extendedprice") * col("l_discount")).as("revenue"), count(lit(1)).as("n_rows"))
    def q10v(m: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      li.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(m(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc).limit(20)
    }
    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q3", () => q3v(c => moneySum(c, 4)), () => q3v(qs)),
      ("q6", () => q6v(c => moneySum(c, 4)), () => q6v(qs)),
      ("q10", () => q10v(c => moneySum(c, 4)), () => q10v(qs)))
    cases.foreach { case (n, dec, qnt) =>
      Force.run(dec()); Force.run(qnt())
      val td = (1 to 3).map { _ => val t0 = System.nanoTime(); Force.run(dec()); (System.nanoTime()-t0)/1e9 }
      val tq = (1 to 3).map { _ => val t0 = System.nanoTime(); Force.run(qnt()); (System.nanoTime()-t0)/1e9 }
      println(f"[devquant] $n%-4s decimal ${td.min}%.3f s  quant ${tq.min}%.3f s  ratio ${td.min/tq.min}%.2f")
    }
    s.stop()
  }
}
