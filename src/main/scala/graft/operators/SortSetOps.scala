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

    // Top-k WITH TIES (added r12) — q28 is row_number top-k (exactly k
    // rows, ties broken); the OTHER top-k surface SQL exposes (FETCH
    // FIRST ... WITH TIES / QUALIFY rank() ≤ k) keeps EVERY row tied
    // at the qualifying ranks — run on quantity, where ties are real
    // (~thousands of rows share the top 3 quantity levels), so the
    // semantic difference is exercised, not vacuous. The window is
    // globally ordered, but Spark's rank-limit pushdown inserts a
    // map-side WindowGroupLimit below the singleton exchange
    // (plan-asserted) — each input partition forwards only its own
    // rank-≤3 candidates, so the single-partition window sees
    // per-partition survivors, never the fact table.
    "q195_topk_ties" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
                round(col("l_quantity") * 100).cast("long").as("qty_cents"))
        .withColumn("rk",
          rank().over(Window.orderBy(col("qty_cents").desc)).cast("long"))
        .where(col("rk") <= 3)
        .orderBy("l_orderkey", "l_linenumber")
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
    },

    // 2D skyline / Pareto frontier (added r12) — the multi-criteria
    // generalization of top-k: orders not dominated in (price, recency);
    // o2 dominates o iff o2 is >= on both axes and > on at least one.
    // Shape: sort one axis, then the frontier test is two window maxes
    // over the OTHER axis — max(dt) over strictly-higher price (range
    // frame to -1 on negated cents) and max(dt) within the same price.
    // Scale path is the classic two-phase skyline: a dominated-in-any-
    // subset row is dominated globally, so a 64-group local prune (same
    // windows, partitioned by pmod(key)) runs parallel and shrinks the
    // input to ~frontier×groups before the single-partition global pass
    // — the global window never sees the corpus. Exact integer cents +
    // timestamps; oracle is the independent NOT EXISTS dominance scan.
    "q173_skyline" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables(s, d, "orders").select(
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("pr"),
        col("o_orderdate").as("dt"))
      def frontier(df: DataFrame, grp: Seq[String]): DataFrame = {
        val wStrict = Window.partitionBy(grp.map(col): _*)
          .orderBy(col("npr"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val wTie = Window.partitionBy((grp.map(col) :+ col("pr")): _*)
        df.withColumn("npr", -col("pr"))
          .withColumn("m1", max(col("dt")).over(wStrict))
          .withColumn("m2", max(col("dt")).over(wTie))
          .where((col("m1").isNull || col("m1") < col("dt")) &&
                 col("m2") === col("dt"))
          .drop("npr", "m1", "m2")
      }
      val local = frontier(
        o.withColumn("g", pmod(col("o_orderkey"), lit(64))), Seq("g"))
        .drop("g")
      frontier(local, Seq.empty)
        .select(col("o_orderkey"), col("pr").as("price_cents"),
                col("dt").as("o_orderdate"))
        .orderBy("o_orderkey")
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
        |ORDER BY op""".stripMargin,

    "q195_topk_ties" ->
      """SELECT l_orderkey, l_linenumber, qty_cents, rk FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents,
        |    rank() OVER (ORDER BY CAST(round(l_quantity * 100) AS BIGINT)
        |                 DESC) AS rk
        |  FROM lineitem)
        |WHERE rk <= 3 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q173_skyline" ->
      """WITH t AS (SELECT o_orderkey,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS pr,
        |             o_orderdate AS dt FROM orders)
        |SELECT o_orderkey, pr AS price_cents, dt AS o_orderdate FROM t o
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM t o2
        |  WHERE o2.pr >= o.pr AND o2.dt >= o.dt
        |    AND (o2.pr > o.pr OR o2.dt > o.dt))
        |ORDER BY o_orderkey""".stripMargin
  )
}
