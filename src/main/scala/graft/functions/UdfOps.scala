package graft.functions

import graft.{Det, OpModule, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Geometric mean as a typed [[Aggregator]] (the declared UDAF surface,
  * SURVEY.md §2B q40). Buffer = (Σ ln x, n); merge is associative and
  * commutative, so the aggregation runs partial+final exactly like a
  * built-in — no data skew or single-reducer bottleneck at scale.
  */
object GeoMeanAgg extends Aggregator[Double, (Double, Long), Double] {
  def zero: (Double, Long) = (0.0, 0L)
  def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + math.log(a), b._2 + 1)
  def merge(b1: (Double, Long), b2: (Double, Long)): (Double, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  def finish(b: (Double, Long)): Double = math.exp(b._1 / b._2)
  def bufferEncoder: Encoder[(Double, Long)] = Encoders.product[(Double, Long)]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** UDF / UDAF surface (SURVEY.md §2B q39–q40).
  *
  * q39 deliberately uses a Scala UDF (an opaque black box to Catalyst —
  * no codegen fusion, no pushdown through it); the oracle is the
  * equivalent CASE expression. In production code prefer the native
  * `when()` chain — the UDF exists to declare the extension surface.
  */
object UdfOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_udf_scalar" -> { (s, d) =>
      val band = udf((p: Double) =>
        if (p < 100000) "LOW" else if (p < 300000) "MID" else "HIGH")
      Tables(s, d, "orders")
        .groupBy(band(col("o_totalprice")).as("band"))
        .agg(count(lit(1)).as("cnt"),
             Det.decSum(col("o_totalprice")).as("sum_price"))
        .orderBy("band")
    },

    "q40_udaf" -> { (s, d) =>
      val geo = udaf(GeoMeanAgg)
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(geo(col("l_extendedprice")), 4).as("geo_price"),
             count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }
  )

  def oracles: Map[String, String] = Map(
    "q39_udf_scalar" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'LOW'
        |            WHEN o_totalprice < 300000 THEN 'MID'
        |            ELSE 'HIGH' END AS band,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY band ORDER BY band""".stripMargin,

    "q40_udaf" ->
      """SELECT l_returnflag,
        |  round(exp(avg(ln(l_extendedprice))), 4) AS geo_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
