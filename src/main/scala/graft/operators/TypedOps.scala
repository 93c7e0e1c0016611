package graft.operators

import graft.{OpModule, Tables}
import graft.model.{Customer, Order}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` surface (SURVEY.md §1.2: case-class `Encoder`s
  * where type safety helps): lambda filters, `groupByKey`, and a typed
  * `joinWith` — compiled field access instead of string column names.
  *
  * Scale note: typed lambdas are opaque to Catalyst (no pushdown
  * through a `filter(f: T => Boolean)`), which is why only this module
  * uses them — the lambda here runs after a columnar scan and the
  * groupByKey still aggregates two-phase.
  */
object TypedOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // High-value orders per customer segment, all typed: joinWith gives
    // Dataset[(Order, Customer)], groupByKey on a computed field.
    "q61_typed_pipeline" -> { (s, d) =>
      import s.implicits._
      val orders = Tables(s, d, "orders").as[Order]
      val customers = Tables(s, d, "customer").as[Customer]
      orders.filter((o: Order) => o.o_totalprice > 300000.0)
        .joinWith(customers, $"o_custkey" === $"c_custkey")
        .groupByKey { case (_, c) => c.c_mktsegment }
        .count()
        .toDF("seg", "cnt")
        .orderBy("seg")
    }
  )

  def oracles: Map[String, String] = Map(
    "q61_typed_pipeline" ->
      """SELECT c_mktsegment AS seg, count(*) AS cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 300000.0
        |GROUP BY seg ORDER BY seg""".stripMargin
  )
}
