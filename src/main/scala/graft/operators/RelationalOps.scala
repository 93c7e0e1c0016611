package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scans, filters, projections and the full join surface (SURVEY.md §2B
  * q01–q13).
  *
  * Scale notes (100 TB design intent):
  *  - q01/q02 rely on Parquet footer stats + pushdown: the planner never
  *    materializes pruned columns (`ReadSchema` in explain) and skips row
  *    groups via `PushedFilters`.
  *  - dimension joins (nation/region/part) are explicitly `broadcast()`;
  *    fact-fact joins (orders⋈lineitem) shuffle on the join key and are
  *    AQE-managed (skew split + partition coalescing on by default).
  *  - the as-of join (q13) is a union of the two event streams plus one
  *    running `last()` window per user: one shuffle on user_id and
  *    rows stay linear in the input. (The join-then-max formulation it
  *    replaced materialized every purchase × earlier-signup pair per
  *    user before aggregating — s·p rows for a hot user, quadratic on
  *    skew.)
  */
object RelationalOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_count" -> { (s, d) =>
      Seq("lineitem", "orders", "customer")
        .map(t => Tables(s, d, t).agg(count(lit(1)).as("cnt"))
          .select(lit(t).as("tbl"), col("cnt")))
        .reduce(_.unionAll(_))
        .orderBy("tbl")
    },

    "q02_scan_pruned" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .where(col("l_shipdate") >= lit("1996-01-01") &&
               col("l_shipdate") < lit("1997-01-01"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    "q03_filter_compound" -> { (s, d) =>
      Tables(s, d, "orders")
        .where((col("o_orderpriority").isin("1-URGENT", "2-HIGH") ||
                col("o_orderstatus") === "F") &&
               col("o_totalprice").between(1000, 200000) &&
               !col("o_orderpriority").like("%LOW%"))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderpriority")
        .orderBy("o_orderkey")
    },

    "q04_project_exprs" -> { (s, d) =>
      Tables(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        // 6 dp: price(2dp)·(1-disc)(2dp)·(1+tax)(2dp) has ≤6 true decimal
        // digits, so rounding at 6 is tie-free across engines (4 is not).
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax")), 6).as("charge"),
        when(col("l_discount") > 0.05, "HIGH").otherwise("LOW").as("disc_band"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    "q05_join_inner4" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      val l = Tables(s, d, "lineitem")
      val n = Tables(s, d, "nation")
      val r = Tables(s, d, "region")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(graft.Det.decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy("n_name")
    },

    "q06_join_broadcast" -> { (s, d) =>
      val l = Tables(s, d, "lineitem")
      val p = Tables(s, d, "part").where(col("p_brand") === "Brand#23")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"),
             graft.Det.decSum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")
    },

    "q07_join_left" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy("c_custkey")
    },

    "q08_join_full" -> { (s, d) =>
      val o = Tables(s, d, "orders")
      val e = Tables(s, d, "events")
      o.join(e, col("o_custkey") === col("user_id"), "full")
        .groupBy(coalesce(col("o_custkey"), col("user_id")).as("k"))
        .agg(count(col("o_orderkey")).as("order_cnt"),
             count(col("event_id")).as("event_cnt"))
        .orderBy("k")
    },

    "q09_join_semi" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "q10_join_anti" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "q11_join_cross" -> { (s, d) =>
      Tables(s, d, "region").crossJoin(Tables(s, d, "nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    "q12_join_theta" -> { (s, d) =>
      val su = Tables(s, d, "supplier")
      val c = Tables(s, d, "customer")
      su.join(c, col("s_nationkey") === col("c_nationkey") &&
                 abs(col("s_acctbal") - col("c_acctbal")) < 100)
        .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
        .orderBy("s_suppkey", "c_custkey")
    },

    "q65_join_right" -> { (s, d) =>
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      o.join(c, col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy("c_custkey")
    },

    "q66_limit_offset" -> { (s, d) =>
      Tables(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(10)
        .limit(20)
    },

    // Null semantics, exercised deliberately (the corpus itself has no
    // nulls): nullif-generated nulls, count(*) vs count(col), coalesce,
    // null-safe equality, explicit NULLS FIRST ordering.
    "q70_null_semantics" -> { (s, d) =>
      val st = expr("nullif(o_orderstatus, 'P')")
      Tables(s, d, "orders")
        .groupBy(st.as("st"))
        .agg(count(lit(1)).as("cnt"), count(st).as("cnt_nonnull"))
        .select(col("st"), coalesce(col("st"), lit("<null>")).as("label"),
                col("cnt"), col("cnt_nonnull"),
                (col("st") <=> lit("F")).as("is_f"))
        .orderBy(asc_nulls_first("st"))
    },

    // Interval (range) join, bucketized — the scalable shape for
    // point-in-interval matching: each 1-hour attribution interval
    // explodes into its covered 15-minute buckets (≤5 rows), the point
    // side computes its single bucket, and the join is an EQUI join on
    // (user, bucket) + exact refine — a shuffle on a composite key
    // instead of the inequality-only join that degenerates to a
    // per-key cross product. Each point has one bucket, so a (click,
    // signup) pair can match at most once — no dedup needed.
    "q75_join_range" -> { (s, d) =>
      val bucketUs = 900000000L          // 15 min
      val windowUs = 3600000000L         // 1 h attribution window
      val e = Tables(s, d, "events")
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id").as("cu"), unix_micros(col("ts")).as("cus"))
        .withColumn("bk", expr(s"cus DIV $bucketUs"))
      val signups = e.where(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id").as("su"),
                unix_micros(col("ts")).as("sus"))
        .withColumn("bk", explode(sequence(
          expr(s"sus DIV $bucketUs"),
          expr(s"(sus + ${windowUs - 1}) DIV $bucketUs"))))
      clicks.join(signups, col("cu") === col("su") && clicks("bk") === signups("bk"))
        .where(col("cus") >= col("sus") && col("cus") < col("sus") + windowUs)
        .groupBy("signup_id")
        .agg(count(lit(1)).as("clicks"))
        .orderBy("signup_id")
    },

    // As-of join as union + running last(): tag each event stream,
    // interleave by (ts, kind) with signups(0) before purchases(1) so a
    // same-instant signup is visible (signup_ts <= ts is inclusive),
    // and carry the latest non-null signup_ts forward per user with a
    // ROWS unbounded-preceding frame. Equal-ts signup ties are benign:
    // every candidate carries the identical signup_ts value.
    "q13_join_asof" -> { (s, d) =>
      val e = Tables(s, d, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("kind"),
                lit(null).cast("timestamp").as("signup_ts"))
      val signups = e.where(col("event_type") === "signup")
        .select(lit(null).cast("long").as("event_id"), col("user_id"),
                col("ts"), lit(0).as("kind"), col("ts").as("signup_ts"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "kind")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                     org.apache.spark.sql.expressions.Window.currentRow)
      purchases.unionAll(signups)
        .withColumn("last_signup_ts",
                    last("signup_ts", ignoreNulls = true).over(w))
        .where(col("kind") === 1)
        .select("event_id", "user_id", "ts", "last_signup_ts")
        .orderBy("event_id")
    },

    // As-of join through the CUSTOM PHYSICAL OPERATOR (added r12) —
    // q13's exact semantics through the (c)-tier machinery the
    // compositional form doesn't exercise: a graft logical node
    // (AsOfJoin), a planner strategy (AsOfJoinStrategy, injected
    // per-session here and fleet-wide via GraftExtensions), and a
    // co-partitioned sort-merge SparkPlan (AsOfJoinExec). Same two
    // key-hash exchanges an equi-join pays — planned by
    // EnsureRequirements from declared requirements, AQE-sized — then
    // ONE O(left+right) merge pass per partition with O(1) state,
    // where the window form buffers the interleaved union per key.
    // Oracle: identical correlated-subquery SQL as q13; equality with
    // q13 itself and the plan shape are spec-asserted.
    "q223_asof_exec" -> { (s, d) =>
      val e = Tables(s, d, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = e.where(col("event_type") === "signup")
        .select(col("user_id").as("su_user"), col("ts").as("su_ts"))
      org.apache.spark.sql.graft.AsOfJoinPlan
        .asof(purchases, signups, "user_id", "su_user", "ts", "su_ts")
        .select(col("event_id"), col("user_id"), col("ts"),
                col("su_ts").as("last_signup_ts"))
        .orderBy("event_id")
    },

    // NEAREST-time join (added r12) — q13 answers "latest signup AT OR
    // BEFORE each purchase"; this answers the sensor-alignment dual:
    // the click CLOSEST to each purchase in EITHER direction (min
    // |Δt|, ties to the earlier side) — the join behind aligning two
    // irregularly-sampled streams (telemetry↔metrics, impressions↔
    // conversions). Same union + interleave shape as q13, ONE user_id
    // shuffle: clicks sort before same-instant purchases (kind 0 < 1),
    // the backward candidate is last(non-null) over the preceding
    // frame, the forward candidate first(non-null) over the following
    // frame, and one integer-µs CASE picks the closer — never a range
    // self-join, never per-row search. Purchases from users with no
    // clicks keep NULLs (left semantics).
    "q180_join_nearest" -> { (s, d) =>
      val e = Tables(s, d, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
                lit(1).as("kind"),
                lit(null).cast("timestamp").as("cts"))
      val clicks = e.where(col("event_type") === "click")
        .select(lit(null).cast("long").as("event_id"), col("user_id"),
                col("ts"), lit(0).as("kind"), col("ts").as("cts"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "kind")
      val wPrev = wb.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val wNext = wb.rowsBetween(
        org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      purchases.unionAll(clicks)
        .withColumn("pts", last("cts", ignoreNulls = true).over(wPrev))
        .withColumn("nts", first("cts", ignoreNulls = true).over(wNext))
        .where(col("kind") === 1)
        .withColumn("near_click_ts",
          when(col("pts").isNull && col("nts").isNull,
               lit(null).cast("timestamp"))
            .when(col("nts").isNull, col("pts"))
            .when(col("pts").isNull, col("nts"))
            .when(unix_micros(col("ts")) - unix_micros(col("pts")) <=
                  unix_micros(col("nts")) - unix_micros(col("ts")),
                  col("pts"))
            .otherwise(col("nts")))
        .select(col("event_id"), col("user_id"), col("ts"),
                col("near_click_ts"),
                (unix_micros(col("near_click_ts")) -
                 unix_micros(col("ts"))).as("delta_us"))
        .orderBy("event_id")
    },

    // LATERAL correlated join (added r12): per nation, the top-2
    // customers by account balance — the correlated ORDER BY + LIMIT
    // subquery that Catalyst decorrelates (DecorrelateInnerQuery turns
    // the per-row Limit into a rank window over one shuffled join; no
    // per-outer-row re-execution ever happens). The declarative SQL
    // surface for "top-k per group against another table" — the engine,
    // not the user, picks the window rewrite. Scale shape: one shuffle
    // of customer on the correlation key; nation never fans out.
    "q170_join_lateral" -> { (s, d) =>
      Tables(s, d, "nation").createOrReplaceTempView("graft_q170_n")
      Tables(s, d, "customer").createOrReplaceTempView("graft_q170_c")
      s.sql(
        """SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
          |FROM graft_q170_n n,
          |LATERAL (SELECT c_custkey, c_name, c_acctbal
          |         FROM graft_q170_c c
          |         WHERE c.c_nationkey = n.n_nationkey
          |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
          |ORDER BY n.n_name, t.c_custkey""".stripMargin)
    },

    // Correlated scalar + IN subqueries (added r12): orders priced above
    // 1.5× their customer's average order, restricted to two market
    // segments. The predicate is cleared-denominator EXACT integer
    // arithmetic (2·cents·count > 3·sum_cents, the q118/q144 trick) so
    // both engines compare the same BIGINTs — no cross-engine float
    // average. Catalyst rewrites the two correlated scalar aggregates
    // into ONE aggregated left join on o_custkey and the IN into a left
    // semi join — per-row subquery re-execution never happens; the scale
    // cost is one shuffle of orders on the correlation key.
    "q171_subquery_scalar" -> { (s, d) =>
      Tables(s, d, "orders").createOrReplaceTempView("graft_q171_o")
      Tables(s, d, "customer").createOrReplaceTempView("graft_q171_c")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM graft_q171_o o
          |WHERE 2 * CAST(round(o_totalprice * 100) AS BIGINT) *
          |      (SELECT count(*) FROM graft_q171_o o2
          |       WHERE o2.o_custkey = o.o_custkey)
          |      > 3 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
          |             FROM graft_q171_o o2 WHERE o2.o_custkey = o.o_custkey)
          |  AND o_custkey IN (SELECT c_custkey FROM graft_q171_c
          |                    WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE'))
          |ORDER BY o_orderkey""".stripMargin)
    }
  )

  def oracles: Map[String, String] = Map(
    "q01_scan_count" ->
      """SELECT 'customer' AS tbl, count(*) AS cnt FROM customer
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |ORDER BY tbl""".stripMargin,

    "q02_scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_filter_compound" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE (o_orderpriority IN ('1-URGENT','2-HIGH') OR o_orderstatus = 'F')
        |  AND o_totalprice BETWEEN 1000 AND 200000
        |  AND o_orderpriority NOT LIKE '%LOW%'
        |ORDER BY o_orderkey""".stripMargin,

    "q04_project_exprs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
        |  CASE WHEN l_discount > 0.05 THEN 'HIGH' ELSE 'LOW' END AS disc_band
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q05_join_inner4" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06_join_broadcast" ->
      """SELECT p_brand, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q07_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q08_join_full" ->
      """SELECT COALESCE(o_custkey, user_id) AS k,
        |  count(o_orderkey) AS order_cnt, count(event_id) AS event_cnt
        |FROM orders FULL JOIN events ON o_custkey = user_id
        |GROUP BY k ORDER BY k""".stripMargin,

    "q09_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q10_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q11_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q12_join_theta" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND abs(s_acctbal - c_acctbal) < 100
        |ORDER BY s_suppkey, c_custkey""".stripMargin,

    "q65_join_right" ->
      """SELECT c_custkey, count(o_orderkey) AS order_cnt
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q66_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20 OFFSET 10""".stripMargin,

    "q70_null_semantics" ->
      """SELECT st, COALESCE(st, '<null>') AS label, count(*) AS cnt,
        |  count(st) AS cnt_nonnull, st IS NOT DISTINCT FROM 'F' AS is_f
        |FROM (SELECT nullif(o_orderstatus, 'P') AS st FROM orders)
        |GROUP BY st ORDER BY st NULLS FIRST""".stripMargin,

    "q75_join_range" ->
      """SELECT s.event_id AS signup_id, count(*) AS clicks
        |FROM events s JOIN events c
        |  ON s.event_type = 'signup' AND c.event_type = 'click'
        | AND c.user_id = s.user_id
        | AND epoch_us(c.ts) >= epoch_us(s.ts)
        | AND epoch_us(c.ts) < epoch_us(s.ts) + 3600000000
        |GROUP BY signup_id ORDER BY signup_id""".stripMargin,

    "q13_join_asof" ->
      """SELECT p.event_id, p.user_id, p.ts,
        |  (SELECT max(su.ts) FROM events su
        |   WHERE su.event_type = 'signup' AND su.user_id = p.user_id
        |     AND su.ts <= p.ts) AS last_signup_ts
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,

    // the custom operator must be invisible to semantics: q13's
    // correlated-subquery oracle verbatim
    "q223_asof_exec" ->
      """SELECT p.event_id, p.user_id, p.ts,
        |  (SELECT max(su.ts) FROM events su
        |   WHERE su.event_type = 'signup' AND su.user_id = p.user_id
        |     AND su.ts <= p.ts) AS last_signup_ts
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,

    // independent formulation: two correlated extrema + the same
    // integer-µs tie-break CASE (ties to the earlier side)
    "q180_join_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |pn AS (SELECT p.event_id, p.user_id, p.ts,
        |  (SELECT max(c.ts) FROM events c WHERE c.event_type = 'click'
        |     AND c.user_id = p.user_id AND c.ts <= p.ts) AS pts,
        |  (SELECT min(c.ts) FROM events c WHERE c.event_type = 'click'
        |     AND c.user_id = p.user_id AND c.ts > p.ts) AS nts
        |  FROM p),
        |sel AS (SELECT event_id, user_id, ts,
        |  CASE WHEN pts IS NULL AND nts IS NULL THEN NULL
        |       WHEN nts IS NULL THEN pts
        |       WHEN pts IS NULL THEN nts
        |       WHEN epoch_us(ts) - epoch_us(pts) <=
        |            epoch_us(nts) - epoch_us(ts) THEN pts
        |       ELSE nts END AS near_click_ts
        |  FROM pn)
        |SELECT event_id, user_id, ts, near_click_ts,
        |  epoch_us(near_click_ts) - epoch_us(ts) AS delta_us
        |FROM sel ORDER BY event_id""".stripMargin,

    "q170_join_lateral" ->
      """SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_name, c_acctbal
        |         FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin,

    "q171_subquery_scalar" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE 2 * CAST(round(o_totalprice * 100) AS BIGINT) *
        |      (SELECT count(*) FROM orders o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |      > 3 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
        |             FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |  AND o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE'))
        |ORDER BY o_orderkey""".stripMargin
  )
}
