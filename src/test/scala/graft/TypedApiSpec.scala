package graft

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Typed Dataset[T] API surface (SURVEY.md §1 Spark mapping: case-class
  * Encoders where type safety helps). The reference exposes only untyped
  * rows; our engine supports the full typed path: as[T], typed
  * filter/map, groupByKey + typed aggregation, joinWith. Map-typed
  * columns are exercised here too (absent from the reference's five-type
  * system). */
// Case classes live at top level: Spark cannot synthesize encoders for
// classes nested inside a (test) class instance.
case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
  o_totalprice: Double)
case class Cust(c_custkey: Long, c_mktsegment: String)

class TypedApiSpec extends GraftSuite {
  import spark.implicits._

  private lazy val orders: Dataset[Order] =
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[Order]

  test("typed filter/map agree with the untyped DSL") {
    val typed = orders.filter(_.o_totalprice > 100000.0)
      .map(_.o_orderkey).collect().sorted
    val untyped = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(typed.toSeq === untyped.toSeq)
  }

  test("groupByKey with a typed aggregator matches groupBy") {
    val typed = orders.groupByKey(_.o_orderstatus)
      .agg(org.apache.spark.sql.expressions.scalalang.typed.count[Order](_.o_orderkey))
      .collect().toMap
    val untyped = Tables.orders(spark, sf).groupBy("o_orderstatus")
      .agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed === untyped)
  }

  test("joinWith yields typed pairs") {
    val custs = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").as[Cust]
    val joined = orders.joinWith(custs,
      orders("o_custkey") === custs("c_custkey"))
    val (o, c) = joined.head()
    assert(o.o_custkey === c.c_custkey)
    assert(joined.count() === Tables.orders(spark, sf).count())
  }

  test("map-typed columns work (beyond the reference's five types)") {
    val m = Tables.orders(spark, sf).limit(10)
      .select(map(lit("status"), col("o_orderstatus"),
        lit("prio"), col("o_orderpriority")).as("m"))
      .select(
        element_at(col("m"), "status").as("status"),
        map_keys(col("m")).as("ks"),
        size(map_values(col("m"))).as("nv"))
      .collect()
    assert(m.forall(r => r.getSeq[String](1).toSet === Set("status", "prio")))
    assert(m.forall(_.getInt(2) === 2))
  }
}
