package graft.operators

import graft.{Det, OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2B q22–q26): ranking, analytic
  * offsets, ROWS/RANGE frames, distribution functions.
  *
  * Scale notes: every window here partitions by a natural high-cardinality
  * key (o_custkey / user_id) so state is bounded per partition and the
  * plan is a single shuffle on the partition key + per-partition sort —
  * no global single-partition window anywhere. Moving aggregates are
  * computed as exact decimal sums divided into doubles (see [[graft.Det]])
  * because DuckDB evaluates sliding frames with a segment tree whose
  * floating-point association differs from Spark's running frame.
  */
object WindowOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_win_rank" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                row_number().over(w).cast("long").as("rn"),
                rank().over(w).cast("long").as("rk"),
                dense_rank().over(w).cast("long").as("drk"),
                ntile(4).over(w).cast("long").as("nt"))
        .where(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    "q23_win_analytic" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
                lag("ts", 1).over(w).as("prev_ts"),
                lead("ts", 1).over(w).as("next_ts"),
                first("event_type").over(w).as("first_type"),
                last("event_type").over(wFull).as("last_type"))
        .orderBy("event_id")
    },

    "q24_win_frame_rows" -> { (s, d) =>
      val wb = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRun = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wMov = wb.rowsBetween(-3, 3)
      Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                sum(Det.dec(col("o_totalprice"))).over(wRun)
                  .cast("double").as("running_total"),
                round(sum(Det.dec(col("o_totalprice"))).over(wMov).cast("double") /
                      count(lit(1)).over(wMov), 6).as("mov_avg"))
        .orderBy("o_custkey", "o_orderkey")
    },

    "q25_win_frame_range" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3600000000L, 0)
      Tables(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts"),
                sum(col("value").cast("decimal(18,6)")).over(w)
                  .cast("double").as("trailing_sum"))
        .orderBy("event_id")
    },

    "q26_win_percent" -> { (s, d) =>
      val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"))
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
                round(percent_rank().over(w), 6).as("pr"),
                round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_orderkey")
    },

    // Clamped running ledger (added r12) — the floor-at-zero wallet every
    // loyalty/credits system runs: engagement (signup/view/click) earns
    // `round(value·100)` points, a purchase REDEEMS 5× its cents, and the
    // balance can never go below zero — points you don't hold are
    // forfeited, not borrowed. The recurrence b_i = max(0, b_{i-1}+δ_i)
    // is non-associative (naively a per-key sequential fold, the
    // mapGroups escape hatch), but it has the classic closed form
    // b_i = prefix_i − min(0, min_{j≤i} prefix_j), which turns the whole
    // ledger into TWO stacked windows on ONE user_id shuffle — fully
    // declarative, whole-stage-codegen'd, and parallel across users. A
    // redemption hits the floor exactly when prefix_i dips below the
    // previous running minimum's min(0,·), so the floored-event count is
    // a window indicator too. The per-user groupBy reuses the window's
    // hash partitioning (q113's no-second-exchange shape); every quantity
    // is exact integer cents. Event order is declared (ts, event_id) —
    // the same tie pinning the oracle mirrors.
    "q202_clamped_ledger" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, d, "events")
        .where(col("event_type") =!= "error")
        .select(col("user_id"), col("ts"), col("event_id"),
                when(col("event_type") === "purchase",
                     -round(col("value") * 100).cast("long") * 5)
                  .otherwise(round(col("value") * 100).cast("long"))
                  .as("delta"))
        .withColumn("prefix", sum(col("delta")).over(wRun))
        .withColumn("floored",
          (col("prefix") <
             least(lit(0L), coalesce(min(col("prefix")).over(wPrev),
                                     lit(0L)))).cast("long"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
             sum(col("delta")).as("net"),
             min(col("prefix")).as("runmin"),
             sum(col("floored")).as("floored_redemptions"))
        .select(col("user_id"), col("n_events"),
                (col("net") - least(lit(0L), col("runmin")))
                  .as("final_points"),
                (-least(lit(0L), col("runmin"))).as("forfeited_points"),
                col("floored_redemptions"))
        .orderBy("user_id")
    }
  )

  def oracles: Map[String, String] = Map(
    "q22_win_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rk,
        |    dense_rank() OVER w AS drk, ntile(4) OVER w AS nt
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q23_win_analytic" ->
      """SELECT event_id, user_id, ts,
        |  lag(ts, 1) OVER w AS prev_ts,
        |  lead(ts, 1) OVER w AS next_ts,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q24_win_frame_rows" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w1 AS DOUBLE) AS running_total,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w2 AS DOUBLE) /
        |        count(*) OVER w2, 6) AS mov_avg
        |FROM orders
        |WINDOW
        |  w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q25_win_frame_range" ->
      """SELECT event_id, user_id, ts,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us(ts)
        |     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS trailing_sum
        |FROM events ORDER BY event_id""".stripMargin,

    "q26_win_percent" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
        |ORDER BY o_orderkey""".stripMargin,

    "q202_clamped_ledger" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase'
        |         THEN -CAST(round(value * 100) AS BIGINT) * 5
        |         ELSE CAST(round(value * 100) AS BIGINT) END AS delta
        |  FROM events WHERE event_type <> 'error'),
        |pre AS (
        |  SELECT user_id, ts, event_id, delta,
        |    sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS prefix
        |  FROM e),
        |p AS (
        |  SELECT user_id, delta, prefix,
        |    min(prefix) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND 1 PRECEDING) AS runmin_prev
        |  FROM pre)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(delta) - least(0, min(prefix)) AS BIGINT)
        |    AS final_points,
        |  CAST(-least(0, min(prefix)) AS BIGINT) AS forfeited_points,
        |  CAST(sum(CASE WHEN prefix < least(0, coalesce(runmin_prev, 0))
        |                THEN 1 ELSE 0 END) AS BIGINT)
        |    AS floored_redemptions
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
