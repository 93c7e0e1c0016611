package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort / limit / top-k / set operations (SURVEY.md §2B q27–q29).
  *
  * Scale notes: global top-k compiles to `TakeOrderedAndProjectExec` —
  * per-partition partial top-k then a driver-side merge of k·partitions
  * rows, never a full sort. Multi-key sort+limit is likewise
  * limit-pushed. Set ops are distinct-aggregations (one shuffle on the
  * full row) — at 100 TB prefer the keyed groupBy formulation these
  * compile to over `dropDuplicates` on wide rows.
  */
object SortSetOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_sort_multi" -> { (s, d) =>
      Tables(s, d, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc,
                 col("o_orderkey").asc)
        .limit(100)
    },

    "q28_topk" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
                 col("l_linenumber").asc)
        .limit(10)
    },

    "q29_setops" -> { (s, d) =>
      val a = Tables(s, d, "orders").select(col("o_custkey").as("k"))
      val b = Tables(s, d, "events").select(col("user_id").as("k"))
      def tag(df: DataFrame, op: String): DataFrame =
        df.agg(count(lit(1)).as("cnt")).select(lit(op).as("op"), col("cnt"))
      tag(a.unionAll(b), "union_all")
        .unionAll(tag(a.union(b).distinct(), "union_distinct"))
        .unionAll(tag(a.intersect(b), "intersect"))
        .unionAll(tag(a.except(b), "except"))
        .orderBy("op")
    }
  )

  def oracles: Map[String, String] = Map(
    "q27_sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "q28_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 10""".stripMargin,

    "q29_setops" ->
      """SELECT 'union_all' AS op, count(*) AS cnt
        |  FROM (SELECT o_custkey AS k FROM orders UNION ALL SELECT user_id FROM events)
        |UNION ALL SELECT 'union_distinct', count(*)
        |  FROM (SELECT o_custkey AS k FROM orders UNION SELECT user_id FROM events)
        |UNION ALL SELECT 'intersect', count(*)
        |  FROM (SELECT o_custkey AS k FROM orders INTERSECT SELECT user_id FROM events)
        |UNION ALL SELECT 'except', count(*)
        |  FROM (SELECT o_custkey AS k FROM orders EXCEPT SELECT user_id FROM events)
        |ORDER BY op""".stripMargin
  )
}
