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
    },

    // Per-key imperative sessionization via typed flatMapGroups — the
    // batch analog of (flat)mapGroupsWithState custom state (the
    // streaming variants are exercised in StreamingSpec): one shuffle
    // on user_id, then per-key state bounded by that user's events.
    // Session semantics match q38's session_window: a gap >= 30 min
    // opens a new session. Oracle = the classic gaps-and-islands SQL.
    "q72_sessionize_typed" -> { (s, d) =>
      import s.implicits._
      val gapUs = 30L * 60 * 1000000
      Tables(s, d, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (uid: Long, it: Iterator[(Long, Long)]) =>
          val ts = it.map(_._2).toArray
          java.util.Arrays.sort(ts)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
          var start = ts(0); var prev = ts(0); var n = 0L
          var i = 0
          while (i < ts.length) {
            if (ts(i) - prev >= gapUs) {
              out += ((uid, start, prev, n)); start = ts(i); n = 0
            }
            prev = ts(i); n += 1; i += 1
          }
          out += ((uid, start, prev, n))
          out
        }
        .toDF("user_id", "start_us", "end_us", "n_events")
        .select(col("user_id"),
                expr("timestamp_micros(start_us)").as("sess_start"),
                expr("timestamp_micros(end_us)").as("sess_end"),
                col("n_events"))
        .orderBy("user_id", "sess_start")
    }
  )

  def oracles: Map[String, String] = Map(
    "q61_typed_pipeline" ->
      """SELECT c_mktsegment AS seg, count(*) AS cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 300000.0
        |GROUP BY seg ORDER BY seg""".stripMargin,

    "q72_sessionize_typed" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s2 AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS sess_start, max(ts) AS sess_end,
        |  count(*) AS n_events
        |FROM s2 GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin
  )
}
