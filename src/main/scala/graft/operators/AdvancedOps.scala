package graft.operators

import graft.{Det, OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pivot/unpivot and the two hand-rolled scale techniques from
  * SURVEY.md §4's 100 TB notes, demonstrated as verifiable queries:
  *
  *  - q59 bucketed join: both fact tables written `bucketBy(8, key)` +
  *    `sortBy` and joined with a merge hint — co-located, co-sorted
  *    buckets mean the SortMergeJoin needs NO shuffle exchange on
  *    either side (asserted in PlanShapeSpec). This is the pattern that
  *    turns a 100 TB fact-fact join from 2 full shuffles into 0.
  *  - q60 salted join: the probe side's hot keys are split across
  *    `SALT` deterministic sub-keys and the build side replicated per
  *    sub-key, so one executor never owns a whole hot key. (AQE skew
  *    join does this adaptively; explicit salting is the portable
  *    fallback and composes with pre-aggregation.)
  */
object AdvancedOps extends OpModule {

  private val Salt = 8

  /** Ensures the two bucketed tables exist for this (session, sfDir).
    * All the write-once / atomic-rename / external-registration
    * machinery lives in [[graft.BucketedCache]]. */
  private def bucketedTables(s: SparkSession, d: String): (String, String) = (
    graft.BucketedCache.ensure(s, d, "li_bucketed",
        "l_orderkey BIGINT, l_quantity DOUBLE", "l_orderkey", 8)(
      Tables(s, d, "lineitem").select("l_orderkey", "l_quantity")),
    graft.BucketedCache.ensure(s, d, "or_bucketed",
        "o_orderkey BIGINT, o_custkey BIGINT", "o_orderkey", 8)(
      Tables(s, d, "orders").select("o_orderkey", "o_custkey")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_pivot" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .orderBy("l_returnflag")
    },

    "q58_unpivot" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .unpivot(Array(col("l_returnflag")), Array(col("F"), col("O")),
                 "linestatus", "cnt")
        .orderBy("l_returnflag", "linestatus")
    },

    "q59_bucketed_join" -> { (s, d) =>
      val (liT, orT) = bucketedTables(s, d)
      s.table(liT)
        .join(s.table(orT).hint("merge"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"),
             Det.decSum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_custkey")
    },

    // Bloom-prefiltered semi join — the shuffle-reduction pattern for a
    // 100 TB probe side: build a bloom filter over the (small, filtered)
    // key set, broadcast the BITS (not the rows), drop definite
    // non-members map-side BEFORE any shuffle, then run the exact semi
    // join on the survivors. No false negatives means the result equals
    // the plain semi join — which is exactly what the oracle asserts —
    // while false positives only cost a little extra shuffle. (Spark's
    // runtime row-level filtering injects this same shape automatically;
    // declared here as the explicit, tunable operator.)
    "q74_bloom_semi" -> { (s, d) =>
      val hot = Tables(s, d, "orders")
        .where(col("o_totalprice") > 300000)
        .select(col("o_custkey"))
      val G = org.apache.spark.sql.graft.GraftFunctions
      val bf = hot.agg(G.bloomFilterAgg(col("o_custkey"), 10000L, 100000L)
        .as("bf"))
      Tables(s, d, "customer")
        .where(G.mightContain(bf, col("c_custkey")))
        .join(hot, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "q60_skew_salted" -> { (s, d) =>
      val e = Tables(s, d, "events")
        .select(col("user_id"), pmod(col("event_id"), lit(Salt)).as("sl"))
      val o = Tables(s, d, "orders")
        .select(col("o_custkey"),
                explode(array((0 until Salt).map(lit(_)): _*)).as("sr"))
      e.join(o, col("user_id") === col("o_custkey") && col("sl") === col("sr"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("user_id")
    },

    // Column profiler (added r6) — per-column nulls / distincts / value
    // range in ONE pass over the table: a single multi-distinct
    // aggregate (Catalyst plans it as one scan + an Expand that
    // replicates each row once per distinct column — still one read of
    // the data), then `stack` unpivots the 1×20 stat row into one row
    // per column. min/max aggregate in the column's NATIVE type and
    // cast afterwards, so numeric columns range numerically, not
    // lexically. At 100 TB the same shape runs with
    // approx_count_distinct instead (no Expand, pure map-side sketch
    // merge) — exact distincts here because the oracle demands
    // bit-equality.
    "q86_profile_stats" -> { (s, d) =>
      val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
      val aggs = cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max")))
      val stackArgs = cols.map(c =>
        s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max").mkString(", ")
      Tables(s, d, "documents")
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_val, max_val)")
        .orderBy("col_name")
    }
  )

  def oracles: Map[String, String] = Map(
    "q57_pivot" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS F,
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q58_unpivot" ->
      """SELECT l_returnflag, l_linestatus AS linestatus, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, linestatus""".stripMargin,

    "q59_bucketed_join" ->
      """SELECT o_custkey, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q74_bloom_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q60_skew_salted" ->
      """SELECT user_id, count(*) AS cnt
        |FROM events JOIN orders ON user_id = o_custkey
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q86_profile_stats" -> Seq("doc_id", "lang", "n_chars", "source", "text")
      .map(c =>
        s"""SELECT '$c' AS col_name,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val
           |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  )
}
