package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing in batch mode (SURVEY.md §2B q36–q38): tumbling,
  * sliding and session windows over the `events` table. The same
  * `window()` / `session_window()` expressions run unchanged under
  * Structured Streaming (see [[graft.streaming.StreamOps]]) — watermarks
  * then bound the state store instead of a full shuffle.
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregations on
  * (window, key) — two-phase, shuffle on the composite key. Session
  * windows shuffle on user_id then merge sorted runs per key; state per
  * key is O(sessions), bounded by the 30-min gap.
  */
object TimeWindowOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_win_tumbling" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("hour_start"), col("event_type"),
                col("cnt"))
        .orderBy("hour_start", "event_type")
    },

    "q37_win_sliding" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("win_start"), col("cnt"))
        .orderBy("win_start")
    },

    "q38_win_session" -> { (s, d) =>
      sessionize(Tables(s, d, "events")).orderBy("user_id", "sess_start")
    },

    // Session BOUNCE RATE by day-of-week (added r12) — the first
    // derived metric every session table feeds: the share of sessions
    // with exactly ONE event ("bounces"), split by the portable
    // day-of-week (days-since-Monday-epoch % 7 — the q144 calendar
    // discipline, immune to the engines' dayofweek numbering
    // disagreement). Reuses q38's session_window sessionization
    // verbatim (one user_id shuffle, state bounded by the gap), then
    // a 7-row rollup; the rate divides exact counts once. Weekend vs
    // weekday bounce divergence is the actual product read-out.
    "q197_bounce_rate" -> { (s, d) =>
      sessionize(Tables(s, d, "events"))
        .withColumn("dow",
          (datediff(to_date(col("sess_start")),
                    to_date(lit("1970-01-05"))) % 7).cast("long"))
        .groupBy("dow")
        .agg(count(lit(1)).as("sessions"),
             sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("bounced"))
        .select(col("dow"), col("sessions"), col("bounced"),
                round(col("bounced").cast("double") / col("sessions"), 6)
                  .as("bounce_rate"))
        .orderBy("dow")
    },

    // Gap-filled resample (added r9) — the time-series operation every
    // metrics/sensor pipeline runs between raw events and a model or
    // dashboard: hourly avg(value) per event_type on a DENSE hour grid
    // (one row per hour per type even when no events landed), gaps
    // forward-filled from the last observed hour. The grid is
    // generated from the global [min, max] hour span (a 2-value
    // broadcast) crossed with the distinct types — grid size is
    // O(span × types), independent of event volume; the fill is
    // last(ignoreNulls) over an hour-ordered window per type, which at
    // scale partitions by the series key and never sees raw events
    // (only the pre-aggregated hourly rows). avg uses the Det decimal
    // discipline so partial-agg order can't perturb it.
    "q112_gap_fill" -> { (s, d) =>
      val ev = Tables(s, d, "events")
      val hourly = ev
        .groupBy(col("event_type"),
                 date_trunc("hour", col("ts")).as("hour"))
        .agg(round(sum(col("value").cast("decimal(18,4)")).cast("double") /
                   count(lit(1)), 6).as("avg_value"))
      val span = ev.agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val grid = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
                explode(sequence(col("h0"), col("h1"),
                                 expr("INTERVAL 1 HOUR"))).as("hour"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("hour")
        .rowsBetween(org.apache.spark.sql.expressions.Window
                       .unboundedPreceding, 0)
      grid.join(hourly, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour"),
                last(col("avg_value"), ignoreNulls = true).over(w)
                  .as("filled_value"),
                col("avg_value").isNull.cast("int").as("was_gap"))
        .orderBy("event_type", "hour")
    },

    // Click-abandonment screen (added r12) — the NEGATIVE funnel: q113/
    // q185 count users who DID convert; the revenue-leak report counts
    // clicks that did NOT lead to a purchase within the conversion
    // window (1 h), per day. Per click, the next purchase is a
    // conditional min over the STRICTLY-FOLLOWING frame (rows 1
    // following → unbounded, order (ts, event_id) — the declared tie
    // pinning both engines share), so the whole screen is one window on
    // one user_id shuffle; the click filter then drops to the per-day
    // rollup. No self-join, no second scan; at 100 TB the only volume
    // term is the event scan. Same-µs purchase ordering follows the
    // declared event_id order — an explicit contract, not an accident.
    "q200_abandonment" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("next_purchase_us",
          min(when(col("event_type") === "purchase",
                   unix_micros(col("ts")))).over(w))
        .where(col("event_type") === "click")
        .withColumn("abandoned",
          (col("next_purchase_us").isNull ||
           col("next_purchase_us") >
             unix_micros(col("ts")) + lit(3600000000L)).cast("long"))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("clicks"), sum(col("abandoned")).as("abandoned"))
        .withColumn("abandon_rate",
          round(col("abandoned").cast("double") / col("clicks"), 6))
        .orderBy("day")
    },

    // Point-in-time feature extraction (added r12) — the feature-store
    // primitive behind leakage-free training data: for every LABEL
    // event (purchase), the user's behavioral features over the 7 days
    // STRICTLY BEFORE it (views, clicks, errors, prior purchase spend).
    // Using post-label rows would leak the future into the features —
    // the exact bug PIT joins exist to prevent. Four conditional sums
    // over ONE RANGE frame [−7d µs, −1 µs] on one user_id shuffle;
    // range frames are VALUE-bounded, so same-µs ties are excluded
    // symmetrically in both engines regardless of physical row order —
    // stricter determinism than any rows-frame formulation. No
    // self-join: labels and history interleave in the same partition,
    // the window reads history as it passes. Output is one row per
    // label event, the shape a trainer joins features from.
    "q204_pit_features" -> { (s, d) =>
      val weekUs = 604800000000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("tus"))
        .rangeBetween(-weekUs, -1L)
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
                col("ts"), unix_micros(col("ts")).as("tus"),
                round(col("value") * 100).cast("long").as("cents"))
        .withColumn("views_7d",
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(w))
        .withColumn("clicks_7d",
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
        .withColumn("errors_7d",
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).over(w))
        .withColumn("spend_7d_cents",
          coalesce(sum(when(col("event_type") === "purchase",
                            col("cents"))).over(w), lit(0L)))
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
                col("views_7d"), col("clicks_7d"), col("errors_7d"),
                col("spend_7d_cents"))
        .orderBy("event_id")
    },

    // Semi-additive balance rollup (added r12) — the warehouse measure
    // you must NOT sum over time: each user's outstanding loyalty
    // balance (q202's clamped ledger) snapshotted at each WEEK's last
    // event, carried forward through weeks with no activity, then
    // summed ACROSS users per week — "total points outstanding, by
    // week", the liability series finance reads. Additive across users,
    // last-value over time: the classic semi-additive shape. One
    // user_id shuffle computes per-event clamped balances (q202's
    // closed form, running min over the SAME frame), a per-(user, week)
    // row_number picks each week's last balance, and the forward fill
    // rides a users × weeks grid (weeks = the handful of distinct
    // calendar weeks — broadcast; the grid is |users|·|weeks|, never
    // event-sized). date_trunc('week') is Monday in both engines.
    "q207_semi_additive" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bal = Tables(s, d, "events")
        .where(col("event_type") =!= "error")
        .select(col("user_id"), col("ts"), col("event_id"),
                when(col("event_type") === "purchase",
                     -round(col("value") * 100).cast("long") * 5)
                  .otherwise(round(col("value") * 100).cast("long"))
                  .as("delta"))
        .withColumn("prefix", sum(col("delta")).over(wRun))
        .withColumn("bal",
          col("prefix") - least(lit(0L), min(col("prefix")).over(wRun)))
        .withColumn("wk", date_trunc("week", col("ts")))
      val wSnap = Window.partitionBy("user_id", "wk")
        .orderBy(col("ts").desc, col("event_id").desc)
      val snap = bal.withColumn("rn", row_number().over(wSnap))
        .where(col("rn") === 1).select("user_id", "wk", "bal")
      val weeks = snap.select("wk").distinct()
      val users = snap.select("user_id").distinct()
      val wFill = Window.partitionBy("user_id").orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      users.crossJoin(broadcast(weeks))
        .join(snap, Seq("user_id", "wk"), "left")
        .withColumn("fbal", last(col("bal"), ignoreNulls = true).over(wFill))
        .groupBy(to_date(col("wk")).as("week"))
        .agg(count(col("fbal")).as("users_reporting"),
             sum(coalesce(col("fbal"), lit(0L))).as("total_points"))
        .orderBy("week")
    },

    // Ordered funnel (added r9; single-scan r10) — product-analytics
    // staple: of the users who viewed, how many then clicked AFTER
    // their first view, and then purchased AFTER that first qualifying
    // click. Strict event-time ordering (not mere co-occurrence). The
    // r9 shape read the events table three times (one filtered scan +
    // shuffle per stage); at 100 TB that is 3× the scan I/O for work
    // one pass can do. Now: ONE scan, ONE shuffle on user_id — three
    // staged conditional-min windows over the same whole-partition
    // frame (stage k's condition references stage k−1's window result,
    // so the three Window operators stack on one Exchange+Sort), then
    // a per-user groupBy that REUSES the window's hash partitioning
    // (no second exchange; plan-asserted) and the global rollup.
    // Stage-gap averages are exact integer micros under the decimal
    // sum, divided and rounded once — bit-identical to the r9 result
    // by the shared oracle.
    "q113_funnel" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val staged = Tables(s, d, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t_click",
          min(when(col("event_type") === "click" &&
                   col("ts") > col("t_view"), col("ts"))).over(w))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" &&
                   col("ts") > col("t_click"), col("ts"))).over(w))
      staged
        .groupBy("user_id")
        .agg(first(col("t_view")).as("t_view"),
             first(col("t_click")).as("t_click"),
             first(col("t_purchase")).as("t_purchase"))
        .agg(count(col("t_view")).as("viewed"),
             count(col("t_click")).as("clicked"),
             count(col("t_purchase")).as("purchased"),
             round(sum((unix_micros(col("t_click")) -
                        unix_micros(col("t_view")))
                     .cast("decimal(18,0)")).cast("double") /
                   count(col("t_click")) / 3.6e9, 6)
               .as("avg_hours_view_to_click"))
    },

    // Time-CONSTRAINED funnel (added r12) — q113 counts view→click→
    // purchase in any order gap; real product funnels expire: each
    // stage must land within ONE HOUR of the previous or the journey
    // is broken (the "conversion window" every analytics product
    // exposes). Same single-scan stacked-window shape as q113 — three
    // conditional min windows on ONE user_id shuffle, each referencing
    // the previous stage's window result with the added integer-µs
    // deadline — so the constraint costs zero extra exchanges. The
    // deadline makes the stage minima genuinely order-dependent
    // (earliest view might strand a click a later view would have
    // caught — min-of-qualifying per stage is the DECLARED semantics,
    // mirrored exactly by the oracle's staged joins).
    "q185_funnel_windowed" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val hourUs = 3600L * 1000000L
      val staged = Tables(s, d, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t_click",
          min(when(col("event_type") === "click" &&
                   col("ts") > col("t_view") &&
                   unix_micros(col("ts")) <=
                     unix_micros(col("t_view")) + hourUs,
                   col("ts"))).over(w))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" &&
                   col("ts") > col("t_click") &&
                   unix_micros(col("ts")) <=
                     unix_micros(col("t_click")) + hourUs,
                   col("ts"))).over(w))
      staged
        .groupBy("user_id")
        .agg(first(col("t_view")).as("t_view"),
             first(col("t_click")).as("t_click"),
             first(col("t_purchase")).as("t_purchase"))
        .agg(count(col("t_view")).as("viewed"),
             count(col("t_click")).as("clicked_1h"),
             count(col("t_purchase")).as("purchased_1h"))
        .select(col("viewed"), col("clicked_1h"), col("purchased_1h"),
                round(col("clicked_1h").cast("double") /
                      col("viewed"), 6).as("click_rate"),
                round(col("purchased_1h").cast("double") /
                      col("clicked_1h"), 6).as("purchase_rate"))
    },

    // Anomaly flags (added r9) — per-series outlier detection, the
    // monitoring sibling of q112's resample: flag events whose value
    // sits more than 2 population standard deviations from their
    // (event_type, day) group mean. The z-test is made EXACT by
    // clearing denominators and comparing INTEGER squares — value has
    // two decimals, so v = round(100·value) is an exact BIGINT and
    // |v−μ| > 2σ  ⟺  (n·v − S)² > 4·(n·Q − S²) with S = Σv, Q = Σv²
    // (μ = S/n, σ² = (n·Q − S²)/n²; multiply through by n²) — no
    // floating point anywhere, so a statistical filter becomes
    // hash-checkable cross-engine. Day granularity, not hour: the
    // max attainable |z| in a group of n is (n−1)/√n, so tiny hourly
    // groups can never exceed 2σ — a filter that cannot fire tests
    // nothing (45/523/5050 events flag at the three SFs). Group stats
    // ride on a window over (type, day): ONE scan, one shuffle on the
    // series key (a groupBy+join-back would scan events twice). The
    // inequality operands are widened to decimal(38,0) (HUGEINT in the
    // oracle): with v ≤ 1e7 (two-decimal values ≤ 1e5) every term is
    // bounded by (n·v)² ≤ 1e38 up to n ~ 1e12 rows per (type, day)
    // group — BIGINT would overflow the squares at n·v > ~3e9, i.e.
    // well inside a 100 TB day.
    "q118_anomaly_flags" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type", "day")
      val ev = Tables(s, d, "events")
        .select(col("event_id"), col("event_type"),
                date_trunc("day", col("ts")).as("day"),
                expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      val dec = "decimal(38,0)"
      val (nD, vD, sD, qD) = (col("n").cast(dec), col("v").cast(dec),
                              col("s").cast(dec), col("q").cast(dec))
      ev.withColumn("n", count(lit(1)).over(w))
        // the sums are ALREADY decimal: a BIGINT Σv² overflows at
        // ~9e4 rows per group (v² ≤ 1e14), long before the squares
        .withColumn("s", sum(col("v").cast(dec)).over(w))
        .withColumn("q", sum(vD * vD).over(w))
        .where((nD * vD - sD) * (nD * vD - sD) >
               lit(4).cast(dec) * (nD * qD - sD * sD))
        .select("event_id", "event_type", "day", "v", "n")
        .orderBy("event_id")
    },

    // Session path transitions (added r10) — the sequence-analytics
    // family next to q113's funnel: the first-order Markov transition
    // matrix of user behavior — for every ordered (previous event →
    // next event) pair within a user's stream, the count and its share
    // of all transitions leaving the previous state. The lag rides on
    // ONE window shuffle on user_id (ts then event_id ordering makes
    // ties deterministic); the per-prev normalizer is a second window
    // over the 25-row transition matrix itself — nothing beyond the
    // (prev, next) key space moves after the first shuffle. The share
    // divides two exact counts once as doubles and rounds once (both
    // engines agree bit-for-bit on integer-operand division). At
    // 100 TB: one shuffle of (user, ts, type) triples, the rest is
    // matrix-sized.
    "q130_session_paths" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val nw = org.apache.spark.sql.expressions.Window.partitionBy("prev")
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .where(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("prev"), col("next"), col("cnt"),
                round(col("cnt").cast("double") /
                      sum(col("cnt")).over(nw), 6).as("share"))
        .orderBy("prev", "next")
    },

    // MATCH_RECOGNIZE row-pattern matching (added r13) — SQL:2016's
    // regex-over-rows operator (Oracle/Flink/Snowflake ship it; Spark
    // has no native form): PARTITION BY user ORDER BY (ts, event_id),
    // PATTERN (V+ C+ P) with V=view / C=click / P=purchase, AFTER
    // MATCH SKIP PAST LAST ROW. Because every pattern variable is a
    // plus-quantified single class in fixed order, greedy matching
    // reduces EXACTLY to run-length encoding: a match is a maximal
    // view-run, the immediately following maximal click-run, and the
    // FIRST row of an immediately following purchase-run (greedy V+/C+
    // consume their whole runs; if the row after the click-run is not
    // a purchase, no suffix of the run can match either, so RLE loses
    // nothing — the reduction is semantics-preserving, not heuristic).
    // MEASURES per match: first/last ts, per-variable row counts, and
    // the matched rows' value total (integer cents, one rounded
    // division at the end). Scale shape: ONE user_id shuffle; the
    // row-level windows and the run-level lead()s all partition by
    // user (never global), and the runs table the pattern logic walks
    // is |runs| ≪ |events|. At 100 TB this beats an NFA UDF exactly
    // the way the q113 funnel does: the matcher is window algebra the
    // optimizer can see, not opaque per-row state.
    "q303_match_recognize" -> { (s, d) =>
      val W = org.apache.spark.sql.expressions.Window
      val wRow = W.partitionBy("user_id").orderBy("ts", "event_id")
      val rows = Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
                col("event_type"),
                expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(wRow) === col("event_type"),
               0L).otherwise(1L))
        .withColumn("run_id", sum("chg").over(wRow))
        .withColumn("rn_run", row_number().over(
          W.partitionBy("user_id", "run_id").orderBy("ts", "event_id")))
      val runs = rows.groupBy("user_id", "run_id")
        .agg(max(col("event_type")).as("typ"),
             count(lit(1)).as("n"),
             min(col("ts")).as("t0"),
             sum(col("c")).as("csum"),
             max(when(col("rn_run") === 1, col("c"))).as("c_first"))
      val wRun = W.partitionBy("user_id").orderBy("run_id")
      runs
        .withColumn("t1", lead(col("typ"), 1).over(wRun))
        .withColumn("t2", lead(col("typ"), 2).over(wRun))
        .withColumn("n_click", lead(col("n"), 1).over(wRun))
        .withColumn("click_csum", lead(col("csum"), 1).over(wRun))
        .withColumn("p_ts", lead(col("t0"), 2).over(wRun))
        .withColumn("p_c", lead(col("c_first"), 2).over(wRun))
        .where(col("typ") === "view" && col("t1") === "click" &&
               col("t2") === "purchase")
        .withColumn("match_no",
          row_number().over(wRun).cast("long"))
        .select(col("user_id"), col("match_no"),
                col("t0").as("start_ts"), col("p_ts").as("purchase_ts"),
                col("n").as("n_view"), col("n_click"),
                round((col("csum") + col("click_csum") + col("p_c"))
                        .cast("double") / 100.0, 2).as("amount"))
        .orderBy("user_id", "match_no")
    },

    // Frequent event TRIGRAMS (added r12) — q130's transition matrix
    // is the order-1 Markov view; the order-2 extension is sequence
    // mining's workhorse: the most common 3-step behavioral paths
    // (view>click>purchase vs view>view>view separates browsers from
    // converters; error>error>error is the rage signal). Two lag
    // windows on the SAME user stream q130 orders (one shuffle, tie
    // order pinned by event_id), a path-string reduction, global share
    // from the exact trigram total, top 10 by count with the path as
    // the declared tie-break — a bounded TakeOrderedAndProject, never
    // a full sort. Paths are |types|³-bounded (125 here), so the
    // aggregate is domain-bound regardless of corpus size.
    "q191_path_trigrams" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val tri = Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
                col("event_type"))
        .withColumn("p1", lag(col("event_type"), 2).over(w))
        .withColumn("p2", lag(col("event_type"), 1).over(w))
        .where(col("p1").isNotNull)
        .groupBy(concat_ws(">", col("p1"), col("p2"), col("event_type"))
                   .as("path"))
        .agg(count(lit(1)).as("cnt"))
      val total = tri.agg(sum(col("cnt")).as("n"))
      tri.crossJoin(broadcast(total))
        .select(col("path"), col("cnt"),
                round(col("cnt").cast("double") / col("n"), 6).as("share"))
        .orderBy(col("cnt").desc, col("path"))
        .limit(10)
    },

    // Rolling engagement (added r10) — the DAU/WAU stickiness series
    // every product dashboard tracks: per day, the distinct users that
    // day (DAU), the distinct users over the trailing 7 days (WAU),
    // and their ratio. Rolling DISTINCT does not decompose into a
    // window aggregate (distinct isn't subtractable), so the exact
    // form is a bounded RANGE JOIN (q75's family): the deduplicated
    // (day, user) pairs — already tiny relative to events — fan out
    // ≤ 7× against the day grid and re-aggregate. At 100 TB the exact
    // fan-out is replaced by q110's discipline: one HLL sketch per
    // day, any trailing window = a 7-sketch merge — this query is the
    // exact twin the sketch path is validated against. Ratio divides
    // two exact counts once, rounds once.
    "q135_rolling_dau" -> { (s, d) =>
      val ud = Tables(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = ud.select(col("day").as("d")).distinct()
      val dau = ud.groupBy(col("day").as("d"))
        .agg(countDistinct("user_id").as("dau"))
      val wau = days
        .join(ud, col("day").between(date_sub(col("d"), 6), col("d")))
        .groupBy("d").agg(countDistinct("user_id").as("wau"))
      dau.join(wau, Seq("d"))
        .select(col("d").as("day"), col("dau"), col("wau"),
                round(col("dau").cast("double") / col("wau"), 6)
                  .as("stickiness"))
        .orderBy("day")
    },

    // Inter-arrival gap screen (added r12) — the bot/abuse and
    // instrumentation-health metric: the distribution of microsecond
    // gaps between each user's consecutive events, banded per the
    // LATER event's type (sub-second p50 = scripted traffic;
    // exploding p99 = dropped beacons). Exact lower percentiles from
    // the q151/q179 value-group discipline: one user_id shuffle
    // derives the gaps (lag over (ts, event_id) — the tie order is
    // pinned so the type attribution of equal-ts events matches the
    // oracle), one (type, gap) reduction, then conditional mins over
    // cumulative counts give p50/p90/p99 with pure integers
    // (cum·100 ≥ n·p — cleared denominators, no interpolation).
    "q190_gap_screen" -> { (s, d) =>
      val wU = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val gaps = Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
                col("event_type"))
        .withColumn("gap",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wU)))
        .where(col("gap").isNotNull)
      val vg = gaps.groupBy("event_type", "gap")
        .agg(count(lit(1)).as("cnt"))
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val wC = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("gap")
        .rowsBetween(org.apache.spark.sql.expressions.Window
                       .unboundedPreceding,
                     org.apache.spark.sql.expressions.Window.currentRow)
      vg.withColumn("cum", sum(col("cnt")).over(wC))
        .withColumn("n", sum(col("cnt")).over(wT))
        .groupBy("event_type")
        .agg(min(col("n")).as("n_gaps"),
             min(when(col("cum") * 100 >= col("n") * 50, col("gap")))
               .as("p50_us"),
             min(when(col("cum") * 100 >= col("n") * 90, col("gap")))
               .as("p90_us"),
             min(when(col("cum") * 100 >= col("n") * 99, col("gap")))
               .as("p99_us"))
        .orderBy("event_type")
    },

    // Week-over-week growth report (added r12) — the period-over-period
    // screen every metrics dashboard leads with: per event_type and
    // ISO week (both engines' date_trunc('week') = Monday), the count,
    // the prior week's count (lag over the type partitioning — a
    // calendar-bounded window, q176's argument) and the percentage
    // change, computed once in double from exact integer counts and
    // rounded (first week NULL, not zero — absence of a baseline is
    // not 0% growth). One (type, week) count shuffle; the lag reuses
    // the type partitioning.
    "q186_wow_growth" -> { (s, d) =>
      val wk = Tables(s, d, "events")
        .select(col("event_type"), date_trunc("week", col("ts")).as("wk"))
        .groupBy("event_type", "wk").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("wk")
      wk.withColumn("prev_cnt", lag(col("cnt"), 1).over(w))
        .withColumn("wow_pct",
          round((col("cnt") - col("prev_cnt")).cast("double") * 100 /
                col("prev_cnt"), 6))
        .orderBy("event_type", "wk")
    },

    // Cumulative distinct users / distinct-to-date (added r12) — the
    // "total users ever" growth curve next to q135's rolling DAU. The
    // naive form — count(DISTINCT user) OVER an expanding day window —
    // is O(days × users) and rescans the corpus per day; the scale
    // shape is the FIRST-SEEN reduction: a user contributes to exactly
    // one day (their min day), so one user_id shuffle produces the
    // per-day new-user counts and the cumulative curve is a prefix sum
    // over the per-day aggregate. That final window is global-ordered
    // but its input is CALENDAR-bounded (≤ 36 525 rows/century), never
    // corpus-bound — the one case a single-partition window is the
    // right plan (q141's bucketed prefix sum exists for value-row
    // inputs). Days with no first-seens still appear (left join + 0).
    "q176_cumulative_distinct" -> { (s, d) =>
      val ev = Tables(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val newPerDay = ev.groupBy("user_id").agg(min(col("day")).as("fd"))
        .groupBy(col("fd").as("day")).agg(count(lit(1)).as("new_users"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window
                       .unboundedPreceding,
                     org.apache.spark.sql.expressions.Window.currentRow)
      ev.select("day").distinct()
        .join(newPerDay, Seq("day"), "left")
        .na.fill(0L, Seq("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .orderBy("day")
    },

    // Cohort retention (added r9) — the growth-analytics matrix: users
    // cohorted by first-seen week, counted distinct in each later week
    // offset. Two aggregations shuffling on user_id (first-seen) and
    // (cohort, offset); the first-seen table joins back broadcast-or-
    // shuffle by size. Deterministic, exact, and the canonical example
    // of an operator whose 100 TB cost is two narrow shuffles.
    "q114_cohort_retention" -> { (s, d) =>
      val ev = Tables(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = ev.groupBy("user_id").agg(min(col("day")).as("first_day"))
      ev.join(first, Seq("user_id"))
        .groupBy(col("first_day"),
                 floor(datediff(col("day"), col("first_day")) / 7)
                   .cast("long").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("users"))
        .withColumnRenamed("first_day", "cohort_day")
        .orderBy("cohort_day", "week_offset")
    },

    // Time-weighted average (added r12) — TWAP, the time-series
    // aggregate plain AVG gets wrong whenever samples are irregular: a
    // value holds from its event until the next event of the SAME
    // type, so each observation weighs by its HOLDING interval, not
    // its row count (the finance/ops convention for price and gauge
    // series — a gauge sampled 1000× during a spike must not dominate
    // the day it spiked in). Exact to the last bit: integer cents ×
    // integer µs holding intervals, both decimal-summed (order-free,
    // overflow-safe at any volume), ONE division rounded 6 at the end;
    // next-event lookup is a lead() on the (type)-keyed window — one
    // shuffle, no self-join — with (ts, event_id) ordering so
    // same-instant ties are deterministic. The open-ended last
    // observation has no holding interval and is out of scope by
    // declared semantics (standard TWAP over the observed span). AVG
    // alongside shows the sampling bias the weighting removes.
    "q225_twap" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("tus", "event_id")
      Tables(s, d, "events")
        .select(col("event_type"), col("event_id"),
                unix_micros(col("ts")).as("tus"),
                round(col("value") * 100).cast("long").as("cents"))
        .withColumn("next_us", lead("tus", 1).over(w))
        .where(col("next_us").isNotNull)
        .withColumn("dur", col("next_us") - col("tus"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
             round(sum(col("dur").cast("decimal(28,0)")).cast("double") /
                   1000000.0, 6).as("span_sec"),
             round(sum(col("cents").cast("decimal(18,0)") * col("dur"))
                     .cast("double") /
                   sum(col("dur").cast("decimal(28,0)")).cast("double") /
                   100.0, 6).as("twap"),
             round(sum(col("cents").cast("decimal(28,0)")).cast("double") /
                   count(lit(1)) / 100.0, 6).as("plain_avg"))
        .orderBy("event_type")
    },

    // Exact finite-window EWMA spike screen (added r12) — the streaming
    // smoother made hash-checkable: with α = 1/2 the weights 2^−k are
    // exact powers of two, so a trailing-32 EWMA is a pure INTEGER pair
    // (num = Σ c_{n−1−j}·2^(31−j), den = Σ 2^(31−j)) and the spike rule
    // "current > 2× smoothed baseline" clears the denominator —
    // c·den > 2·num compares integers, no float enters the decision at
    // all (the q151/q179 cleared-denominator discipline applied to a
    // recursive-looking statistic). The 32-lag unroll is what makes the
    // recurrence declarative: one (type)-keyed window shuffle, no
    // sequential fold, no UDAF state; at a longer horizon the unroll
    // cost grows linearly and the documented alternative is a
    // mapPartitions running fold per key. The reported last-row EWMA
    // derives from the same pair via exact halving (every surviving
    // term is even), one rounded division at the end.
    "q233_ewma_spikes" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("tus", "event_id")
      val base = Tables(s, d, "events")
        .select(col("event_type"), col("event_id"),
                unix_micros(col("ts")).as("tus"),
                round(col("value") * 100).cast("long").as("c"))
      // r19 optimization: the 32-lag unroll built 65 window frames
      // (32 lag(c, j+1) for num, 32 for den, one for t32) evaluated
      // per row — 4.1 s of task time at sf0.1 with the WindowExec
      // maintaining one OffsetWindowFunctionFrame per lag. ONE
      // trailing-32 collect_list frame carries the identical values
      // (frame order = window order, oldest first: element i of an
      // m-element array IS lag m−i), and the weighted pair folds in a
      // codegen'd higher-order transform/aggregate: element i's
      // weight 2^(32−m+i) equals the unroll's 2^(31−j) at j = m−i−1,
      // and den = Σ 2^(31−j) telescopes to 2^32 − 2^(32−m). All-long
      // exact arithmetic, same values bit for bit (spec-asserted
      // against q118's mean path and the DuckDB oracle).
      base
        .withColumn("prevs",
          collect_list(col("c")).over(w.rowsBetween(-32, -1)))
        .withColumn("num_prev", expr(
          "aggregate(transform(prevs, (x, i) -> x * shiftleft(" +
            "CAST(1 AS BIGINT), 32 - size(prevs) + i)), " +
            "CAST(0 AS BIGINT), (a, b) -> a + b)"))
        .withColumn("den_prev", expr(
          "shiftleft(CAST(1 AS BIGINT), 32) - " +
            "shiftleft(CAST(1 AS BIGINT), 32 - size(prevs))"))
        .withColumn("t32",
          when(size(col("prevs")) === 32, element_at(col("prevs"), 1))
            .otherwise(lit(0L)))
        .withColumn("d32",
          when(size(col("prevs")) === 32, 1L).otherwise(0L))
        .withColumn("rn", row_number().over(w))
        .withColumn("spike",
          when(col("den_prev") > 0 &&
                 col("c") * col("den_prev") > col("num_prev") * 2, 1L)
            .otherwise(0L))
        // include-current pair by exact halving: num_incl =
        // c·2^31 + (num_prev − t32)/2 (all remaining terms even)
        .withColumn("num_incl",
          col("c") * lit(1L << 31) + expr("(num_prev - t32) div 2"))
        .withColumn("den_incl",
          lit(1L << 31) + expr("(den_prev - d32) div 2"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("spike").as("spikes"),
             round(max_by(col("num_incl").cast("double") /
                            col("den_incl").cast("double"), col("rn")) /
                     100.0, 6).as("ewma_last"),
             round(sum(col("c").cast("decimal(28,0)")).cast("double") /
                     count(lit(1)) / 100.0, 6).as("plain_avg"))
        .orderBy("event_type")
    },

    // Kaplan–Meier time-to-first-qualifying-purchase (added r12) — the survival
    // curve behind every activation/conversion dashboard, with the
    // right-censoring plain conversion-rate cuts ignore: users who
    // haven't converted YET (still under observation at the corpus
    // edge) are censored at their observed age, not counted as
    // failures. Conversion = first purchase in the premium payload
    // bucket (props.k < 5) — rare enough that censoring genuinely
    // occurs at every test SF, which is the estimator's whole point. The estimator's product Π(1 − d/n) is inherently
    // sequential — the ONE place a float recurrence is unavoidable —
    // so both engines run the IDENTICAL recursion: Spark 4's native
    // recursive CTE over the step table, each step exactly
    // s·((n−d)/n) in double (same two IEEE ops, same order ⇒
    // bit-equal before the final 6 dp round). Everything feeding it is
    // exact integer: per-user first-event / first-purchase ages in
    // days, a duration value-group table, at-risk counts n_t = total −
    // cum(dur < t) from ONE window over the ≤ 30-row step table. ONE
    // fact scan (pinned user table feeds cutoff + lifetimes); the
    // recursion runs on the step table, whose size is bounded by
    // distinct event DAYS, not users or events.
    "q237_km_survival" -> { (s, d) =>
      val life = kmLife(s, d)
      val wLess = org.apache.spark.sql.expressions.Window
        .orderBy("dur")
        .rowsBetween(org.apache.spark.sql.expressions.Window
                       .unboundedPreceding, -1)
      // pin the step table: the recursive CTE below rescans its view
      // once per iteration — blocks, not the replayed fact lineage
      val (steps, sh) = org.apache.spark.sql.graft.InternalPin.pin(
        life.groupBy("dur")
          .agg(count(lit(1)).as("ct"), sum("death").as("dth"))
          .withColumn("total",
            sum("ct").over(org.apache.spark.sql.expressions.Window
              .partitionBy(lit(1))))
          .withColumn("cless", coalesce(sum("ct").over(wLess), lit(0L)))
          .withColumn("n_risk", col("total") - col("cless"))
          .where(col("dth") > 0)
          .withColumn("k", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("dur")))
          .select(col("k"), col("dur").as("t_day"), col("n_risk"),
                  col("dth").as("deaths")))
      sh.count(); graft.PinScope.retain(sh)
      steps.createOrReplaceTempView("graft_km_steps")
      // r19: the KM product folds in ONE task (the oracle keeps the
      // recursive text; each step is the same two IEEE ops in the
      // same order — sv·((n−d)/n) with integer subtract-then-cast).
      // Spark's recursive CTE paid one scheduler round-trip per step;
      // the fold pays one task over the ≤|distinct days| step table.
      locally {
        import s.implicits._
        s.table("graft_km_steps")
          .select(col("k").cast("long"), col("n_risk").cast("long"),
                  col("deaths").cast("long"))
          .as[(Long, Long, Long)]
          .groupByKey(_ => 0)
          .flatMapGroups { (_: Int, it: Iterator[(Long, Long, Long)]) =>
            val st = it.toArray.sortBy(_._1)
            val buf = Vector.newBuilder[(Long, Double)]
            var sv = 1.0
            buf += ((0L, sv))
            st.foreach { case (k, n, dd) =>
              sv = sv * ((n - dd).toDouble / n.toDouble)
              buf += ((k, sv))
            }
            buf.result().iterator
          }.toDF("k", "sv")
          .createOrReplaceTempView("graft_km_surv")
      }
      s.sql("""
        WITH surv AS (SELECT k, sv FROM graft_km_surv)
        SELECT st.t_day, st.n_risk, st.deaths, round(s.sv, 6) AS surv
        FROM surv s JOIN graft_km_steps st ON st.k = s.k
        ORDER BY st.t_day""")
    },

    // Log-rank test (added r12) — the hypothesis test that belongs next
    // to q237's curve: "do the control and treatment arms (q159's md5
    // house split) convert at the same RATE over time?", asked the
    // censoring-correct way — a plain conversion-share cut is biased by
    // whoever happens to have been observed longer. At each death time
    // the observed arm-1 deaths are compared to the hypergeometric
    // expectation d·n1/n with variance d·(n1/n)·(n−n1)/n·(n−d)/(n−1);
    // O−E and V sum over steps and z = (O−E)/√V. Unlike the KM product
    // this is a SUM — no recursion: per-step e/v terms are rounded 6 dp
    // into order-free decimal sums (the q231 discipline) over the
    // ≤|distinct event days| step table. Same ONE pinned fact scan as
    // q237 (shared [[kmLife]] — one definition of the lifetimes is
    // what makes curve and test consistent); arm at-risk counts are a
    // second stacked window on the same global ordering, so the test
    // costs window algebra on the step table, nothing corpus-sized.
    "q248_logrank" -> { (s, d) =>
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      val W = org.apache.spark.sql.expressions.Window
      val life = kmLife(s, d)
        .withColumn("a1",
          when(substring(md5(col("user_id").cast("string")), 1, 1) <= "7",
               0L).otherwise(1L))
      val wLess = W.orderBy("dur")
        .rowsBetween(W.unboundedPreceding, -1)
      val wAll = W.partitionBy(lit(1))
      val steps = life.groupBy("dur")
        .agg(count(lit(1)).as("ct"), sum("death").as("dth"),
             sum("a1").as("ct1"),
             sum(col("death") * col("a1")).as("dth1"))
        .withColumn("total", sum("ct").over(wAll))
        .withColumn("total1", sum("ct1").over(wAll))
        .withColumn("cless", coalesce(sum("ct").over(wLess), lit(0L)))
        .withColumn("cless1", coalesce(sum("ct1").over(wLess), lit(0L)))
        .withColumn("n", col("total") - col("cless"))
        .withColumn("n1", col("total1") - col("cless1"))
        .where(col("dth") > 0)
      steps
        .agg(count(lit(1)).as("n_steps"),
             max("total").as("users"), max("total1").as("users1"),
             sum("dth1").as("o1"),
             sum(round(dd(col("dth")) * dd(col("n1")) / dd(col("n")), 6)
                   .cast("decimal(28,6)")).as("e1"),
             sum(when(col("n") > 1,
                   round(dd(col("dth")) * dd(col("n1")) / dd(col("n")) *
                           (dd(col("n")) - dd(col("n1"))) / dd(col("n")) *
                           (dd(col("n")) - dd(col("dth"))) /
                           (dd(col("n")) - 1.0), 6))
                   .otherwise(0.0).cast("decimal(28,6)")).as("v"))
        .select(col("n_steps"), col("users"), col("users1"), col("o1"),
                round(dd(col("e1")), 6).as("e1"),
                round(dd(col("v")), 6).as("lr_var"),
                round((dd(col("o1")) - dd(col("e1"))) / sqrt(dd(col("v"))),
                      6).as("z"),
                round((dd(col("o1")) - dd(col("e1"))) *
                        (dd(col("o1")) - dd(col("e1"))) / dd(col("v")),
                      6).as("chi2"))
    },

    // Matrix-profile motif + discord (added r13) — the time-series
    // MINING primitive next to q291's ACF and q177's CUSUM (Yeh et
    // al. 2016, the matrix-profile family): per event type's daily
    // revenue series, the MOTIF (the closest pair of non-overlapping
    // 7-day windows — recurring structure) and the DISCORD (the
    // window whose nearest non-overlapping neighbor is farthest — the
    // strongest anomaly, the definition that catches what pointwise
    // z-scores miss). Exactness discipline: windows are 7 CONSECUTIVE
    // calendar days (6 leads + the d6 = day+6 span check — any gap
    // drops the window), distances are exact integer Σ(Δcents)² in
    // DECIMAL (a daily diff can reach ~2e9 cents at volume; 7 squared
    // terms overflow BIGINT, so the fold is decimal/HUGEINT with ONE
    // final cast to double for output), argmins fully tie-broken.
    // Scale: the profile lives on the (type, day) CELL table — days²
    // pairs per type is CALENDAR-bounded (q292's league), flat at any
    // corpus volume; the fact scan is the only volume term.
    "q332_matrix_profile" -> { (s, d) =>
      val W = org.apache.spark.sql.expressions.Window
      val cells = Tables(s, d, "events")
        .groupBy(col("event_type").as("et"),
                 datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
                   .cast("long").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("c0"))
      val wOrd = W.partitionBy("et").orderBy("day")
      val leads = (1 to 6).flatMap(i => Seq(
        lead(col("c0"), i).over(wOrd).as(s"c$i"),
        lead(col("day"), i).over(wOrd).as(s"d$i")))
      val (win, wh) = org.apache.spark.sql.graft.InternalPin.pin(
        cells.select(col("et") +: col("day") +: col("c0") +: leads: _*)
          .where(col("d6") === col("day") + lit(6))
          .select(Seq(col("et"), col("day")) ++
                  (0 to 6).map(i => col(s"c$i")): _*))
      wh.count(); graft.PinScope.retain(wh)
      val a = win.select(col("et") +: col("day").as("sa") +:
        (0 to 6).map(i => col(s"c$i").as(s"a$i")): _*)
      val b = win.select(col("et") +: col("day").as("sb") +:
        (0 to 6).map(i => col(s"c$i").as(s"b$i")): _*)
      val d2 = (0 to 6).map(i =>
        s"CAST(a$i - b$i AS DECIMAL(38,0)) * (a$i - b$i)")
        .mkString(" + ")
      val (pr, ph) = org.apache.spark.sql.graft.InternalPin.pin(
        a.join(b, Seq("et"))
          .where(col("sa") < col("sb") && col("sb") - col("sa") >= 7)
          .select(col("et"), col("sa"), col("sb"), expr(d2).as("dist2")))
      ph.count(); graft.PinScope.retain(ph)
      val motif = pr
        .withColumn("rk", row_number().over(W.partitionBy("et")
          .orderBy(col("dist2"), col("sa"), col("sb"))))
        .where(col("rk") === 1)
        .select(col("et"), col("sa").as("motif_s"),
                col("sb").as("motif_t"),
                col("dist2").cast("double").as("motif_dist2"))
      val sym = pr.select(col("et"), col("sa").as("w"), col("dist2"))
        .unionAll(pr.select(col("et"), col("sb").as("w"), col("dist2")))
      val discord = sym.groupBy("et", "w")
        .agg(min(col("dist2")).as("nnd"))
        .withColumn("rk", row_number().over(W.partitionBy("et")
          .orderBy(col("nnd").desc, col("w"))))
        .where(col("rk") === 1)
        .select(col("et"), col("w").as("discord_s"),
                col("nnd").cast("double").as("discord_nnd"))
      motif.join(discord, Seq("et"))
        .select(col("et").as("event_type"), col("motif_s"),
                col("motif_t"), col("motif_dist2"),
                col("discord_s"), col("discord_nnd"))
        .orderBy("event_type")
    },

    // Cox proportional-hazards fit (added r13) — the survival
    // family's MODEL tier: q237 draws the curve, q248 tests the arms,
    // this ESTIMATES the effect size — the log hazard ratio β of the
    // q248 arm split, by Newton–Raphson on the Breslow partial
    // likelihood ℓ(β) = Σ_t [d1·β − d·ln(n0 + e^β·n1)] (Cox 1972;
    // Breslow ties). For ONE binary covariate every Newton quantity
    // is a fold over the SAME ≤|event-days| step table q248 builds
    // (per step: deaths d, arm-1 deaths d1, at-risk n0/n1) — the
    // 100 TB cost is the one kmLife fact scan; three staged rounds of
    // [[coxRound]]'s shared text (score U = Σ[d1 − d·p], information
    // I = Σ d·p(1−p) with p = e^β n1/(n0+e^β n1), update β += U/I,
    // per-term round 6 into order-free decimal sums — the q248
    // discipline; β rounds 6 between rounds, the q310 staging). The
    // score at β=0 is ALGEBRAICALLY the log-rank O−E (the score-test
    // identity — this fit and q248 are the same statistic to first
    // order), and the partial likelihood is concave in β, so the
    // round-over-round ascent (to within the |steps|·1e-6 per-term
    // rounding budget) + dead-score convergence the spec asserts are
    // the estimator's own guarantees. Output: per round, β, the
    // hazard ratio e^β, and ℓ(β).
    "q326_cox_hazard" -> { (s, d) =>
      val W = org.apache.spark.sql.expressions.Window
      val life = kmLife(s, d)
        .withColumn("a1",
          when(substring(md5(col("user_id").cast("string")), 1, 1) <= "7",
               0L).otherwise(1L))
      val wLess = W.orderBy("dur")
        .rowsBetween(W.unboundedPreceding, -1)
      val wAll = W.partitionBy(lit(1))
      val (steps, sh) = org.apache.spark.sql.graft.InternalPin.pin(
        life.groupBy("dur")
          .agg(count(lit(1)).as("ct"), sum("death").as("dth"),
               sum("a1").as("ct1"),
               sum(col("death") * col("a1")).as("dth1"))
          .withColumn("total", sum("ct").over(wAll))
          .withColumn("total1", sum("ct1").over(wAll))
          .withColumn("cless", coalesce(sum("ct").over(wLess), lit(0L)))
          .withColumn("cless1", coalesce(sum("ct1").over(wLess), lit(0L)))
          .where(col("dth") > 0)
          .select(col("dth"), col("dth1"),
                  (col("total") - col("cless") -
                   (col("total1") - col("cless1"))).as("n0"),
                  (col("total1") - col("cless1")).as("n1")))
      sh.count(); graft.PinScope.retain(sh)
      steps.createOrReplaceTempView("graft_cox_steps")
      s.sql("SELECT CAST(0.0 AS DOUBLE) AS b")
        .createOrReplaceTempView("graft_cox_b0")
      val outs = (1 to 3).map { k =>
        val out = s.sql(
          "WITH " + coxRound(k, "graft_cox_steps", s"graft_cox_b${k - 1}") +
          s" SELECT * FROM out$k")
        val (op, oh) = org.apache.spark.sql.graft.InternalPin.pin(out)
        oh.count(); graft.PinScope.retain(oh)
        op.select(col("beta").as("b"))
          .createOrReplaceTempView(s"graft_cox_b$k")
        op
      }
      outs.reduce(_.union(_))
        .select(col("cox_round").cast("long").as("cox_round"),
                col("beta"), col("hazard_ratio"), col("loglik"))
        .orderBy("cox_round")
    },

    // Weekday seasonal index (added r12) — the decomposition step
    // between q161's "is there weekly structure?" screen and any
    // deseasonalized model: per weekday, the ratio of daily revenue to
    // its CENTERED 7-day moving average (the classical ratio-to-moving-
    // average method — each calendar weekday appears exactly once in
    // every centered window, so the trend estimate is weekday-neutral
    // by construction). Windows requiring both 7 observed rows AND a
    // 6-day calendar span keep partial or gap-crossing windows out of
    // the index (edge days drop — standard for centered MA). Per-day
    // ratio = c·7/s7 fixed-order double rounded 6 into an order-free
    // decimal sum; weekday = days-since-Monday-epoch % 7 (the q144
    // portable calendar). ONE fact scan collapses to ~|days| cells;
    // the MA window and the 7-row rollup ride that tiny table.
    // Holt linear-trend smoothing (added r13) — the exponential-
    // smoothing forecaster between q161's seasonal-naive screen and a
    // real model: per event_type's daily value series, the classic
    // two-state recursion l_t = α·y_t + (1−α)(l+b), b_t = β(l_t−l) +
    // (1−β)b (α=0.3, β=0.1, init l₁=y₁, b₁=y₂−y₁), with a one-step-
    // ahead backtest (forecast f_t = l+b before seeing y_t) and a
    // 7-day-ahead projection. The smoothing is inherently sequential,
    // so it runs EXACTLY like q237's KM product: ONE fact scan folds
    // the pinned ≤|days|×|types| daily step table, and the recursion
    // is a Spark 4 native recursive CTE over that bounded table —
    // per-series state advances by a (series, k+1) join, |days| steps
    // total, never touching fact rows again. [[holtBody]] is ONE
    // string both engines execute, so every step's double chain is
    // operand-identical; the MAE rounds each |error| once at 4 dp and
    // sums exact decimals (order-free).
    "q307_holt_forecast" -> { (s, d) =>
      holtStepsView(s, d, "graft_holt_steps")
      // r19: the recursion folds in one task per series
      // ([[holtStatesView]]); the tail text is the oracle's own
      holtStatesView(s, "graft_holt_steps", "graft_holt_states")
      s.sql("WITH h AS (SELECT et, k, l, b FROM graft_holt_states),\n" +
            holtTail("graft_holt_steps"))
    },

    // Holt-WINTERS additive seasonal smoothing (added r13) — q307's
    // two-state recursion grown to the full triple (level, trend,
    // weekly seasonal buffer): l_t = α(y_t − s_{t−7}) + (1−α)(l+b),
    // b_t = β(l_t−l) + (1−β)b, s_t = γ(y_t−l_t) + (1−γ)s_{t−7}
    // (α=0.2, β=0.1, γ=0.05), classical init from the first two
    // weeks (l = week-1 mean, b = (week-2 mean − week-1 mean)/7,
    // s_i = y_i − week-1 mean — exact-integer week sums, ONE
    // conversion to double each, so the init is partition-order-free
    // where a double conditional sum would not be). The 7-slot
    // seasonal buffer rides the recursion as columns s1..s7 shifting
    // left each step — exactly how a bounded seasonal state
    // distributes: the recursive CTE advances per-series state by a
    // (series, k+1) join over the pinned ≤|days|×|types| step table
    // ([[holtStepsView]], shared with q307), zero fact contact after
    // the one fold. [[hwBody]] is ONE string both engines run; the
    // one-step backtest (f = l + b + s_oldest) rounds each |error|
    // once at 4 dp into an order-free decimal MAE sum. Output per
    // series adds the seasonal amplitude and the 7-day-ahead
    // forecast l + 7b + s_now beside q307's columns — the comparison
    // a forecasting team reads to decide whether weekly seasonality
    // earns its 7 extra state slots.
    "q316_holt_winters" -> { (s, d) =>
      holtStepsView(s, d, "graft_hw_steps")
      // r19: the recursion folds in one task per series
      // ([[hwStatesView]]); the tail text is the oracle's own
      hwStatesView(s, "graft_hw_steps", "graft_hw_states")
      s.sql("WITH hw AS (SELECT et, k, l, b, s1, s2, s3, s4, s5, s6, s7" +
            " FROM graft_hw_states),\n" + hwTail("graft_hw_steps"))
    },

    "q256_seasonal_index" -> { (s, d) =>
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      val W = org.apache.spark.sql.expressions.Window
      val cells = Tables(s, d, "events")
        .where(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("c"))
      val w7 = W.orderBy("day").rowsBetween(-3, 3)
      cells
        .withColumn("k", count(lit(1)).over(w7))
        .withColumn("span", datediff(max("day").over(w7),
                                     min("day").over(w7)))
        .withColumn("s7", sum("c").over(w7))
        .where(col("k") === 7 && col("span") === 6)
        .withColumn("ratio",
          round(dd(col("c")) * lit(7.0) / dd(col("s7")), 6)
            .cast("decimal(28,6)"))
        .withColumn("dow",
          (datediff(col("day"), to_date(lit("1970-01-05"))) % 7)
            .cast("long"))
        .groupBy("dow")
        .agg(count(lit(1)).as("n_days"),
             round(dd(sum("ratio")) / dd(count(lit(1))), 6)
               .as("seasonal_index"))
        .orderBy("dow")
    },

    // Additive STL-lite decomposition (added r13) — the step AFTER
    // q256's "how strong is each weekday?": split the daily revenue
    // series into trend + seasonal + residual and report, per weekday,
    // the ADDITIVE seasonal component in cents and the residual scale
    // — the decomposition a forecasting team reads before choosing a
    // model family (big |seasonal| ⇒ q161/q258's weekly models; big
    // residual ⇒ nothing calendar-shaped is left to model). Exactness:
    // the centered 7-day MA trend would be fractional, so everything
    // detrends at ×7 SCALE — det7 = 7c − s7 is a pure INTEGER on
    // q256's gap-free windows; per-weekday means are one exact decimal
    // sum + one division rounded 6 (grand centering likewise, so the
    // reported components sum to ~0 by construction, spec-asserted);
    // residual scale = mean |det7 − s7avg_w| / 7, the only double
    // chain, fixed-order. Same |days|-bounded cell table as q256 —
    // FLAT at any corpus volume.
    "q337_stl_lite" -> { (s, d) =>
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      val W = org.apache.spark.sql.expressions.Window
      val cells = Tables(s, d, "events")
        .where(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("c"))
      val w7 = W.orderBy("day").rowsBetween(-3, 3)
      val det = cells
        .withColumn("k", count(lit(1)).over(w7))
        .withColumn("span", datediff(max("day").over(w7),
                                     min("day").over(w7)))
        .withColumn("s7", sum("c").over(w7))
        .where(col("k") === 7 && col("span") === 6)
        .withColumn("det7", lit(7) * col("c") - col("s7"))
        .withColumn("dow",
          (datediff(col("day"), to_date(lit("1970-01-05"))) % 7)
            .cast("long"))
      val (dp, dh) = org.apache.spark.sql.graft.InternalPin.pin(det)
      dh.count(); graft.PinScope.retain(dh)
      val grand = dp.agg(
        (dd(sum(col("det7").cast("decimal(38,0)"))) /
         dd(count(lit(1)))).as("g7"))
      dp.groupBy("dow")
        .agg(count(lit(1)).as("n_days"),
             sum(col("det7").cast("decimal(38,0)")).as("sd7"),
             sum(col("det7").cast("decimal(38,0)") * col("det7"))
               .as("sdd7"))
        .crossJoin(broadcast(grand))
        .select(col("dow"), col("n_days"),
          // centered additive seasonal component, back at cent scale
          round((dd(col("sd7")) / dd(col("n_days")) - col("g7")) /
                  lit(7.0), 6).as("seasonal_cents"),
          // within-weekday residual scale (rms of det7 around its
          // weekday mean, back at cent scale) — fixed-order chain
          round(sqrt(greatest(
                  dd(col("sdd7")) / dd(col("n_days")) -
                    (dd(col("sd7")) / dd(col("n_days"))) *
                    (dd(col("sd7")) / dd(col("n_days"))),
                  lit(0.0))) / lit(7.0), 6).as("resid_rms_cents"))
        .orderBy("dow")
    },

    // Rolling-origin forecast backtest (added r12) — q161 asks whether
    // weekly structure EXISTS; this prices how well the seasonal-naive
    // forecaster (tomorrow = same weekday last week) would actually
    // have done, the honest evaluation a forecasting team runs before
    // shipping any model: hold out the LAST 14 observed days per
    // series and report MAE / MAPE / sMAPE of the day−7 forecast. All
    // errors are exact integer |c − f| over the (type, day) cell
    // table; the per-day relative terms round 6 dp into order-free
    // decimal sums (q142) and divide once by the day count. The
    // evaluation window comes from a broadcast 1-row max-day; the
    // shifted self-join is q161's date-add cell algebra. ONE pinned
    // fact scan; everything else is |types×days|-bound.
    "q258_forecast_backtest" -> { (s, d) =>
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      val (cells, h) = org.apache.spark.sql.graft.InternalPin.pin(
        Tables(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c")))
      h.count(); graft.PinScope.retain(h)
      val mx = cells.agg(max("day").as("mxday"))
      val sh = cells.select(col("event_type"),
                            date_add(col("day"), 7).as("day"),
                            col("c").as("f"))
      cells.join(sh, Seq("event_type", "day"))
        .crossJoin(broadcast(mx))
        .where(col("day") > date_sub(col("mxday"), 14))
        .withColumn("ae", abs(col("c") - col("f")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
             sum("ae").cast("long").as("abs_err_total"),
             round(dd(sum("ae")) / dd(count(lit(1))), 6).as("mae"),
             round(dd(sum(round(dd(col("ae")) / dd(col("c")), 6)
                          .cast("decimal(28,6)"))) /
                   dd(count(lit(1))), 6).as("mape"),
             round(dd(sum(round(dd(col("ae")) * lit(2.0) /
                                (dd(col("c")) + dd(col("f"))), 6)
                          .cast("decimal(28,6)"))) /
                   dd(count(lit(1))), 6).as("smape"))
        .orderBy("event_type")
    },

    // Autocorrelation function (added r12) — the standard time-series
    // diagnostic the family still lacked: q250 cross-correlates TWO
    // series; this is the daily-revenue series against ITSELF at lags
    // 1–7 (weekly structure shows as a lag-7 spike; a near-1 lag-1
    // says naive forecasts are hard to beat — the read that justifies
    // q161/q258's seasonal-naive baseline). The textbook estimator
    // r_k = Σ(y_t−ȳ)(y_{t+k}−ȳ)/Σ(y_t−ȳ)² clears its denominators to
    // pure integers: n²·num_k = n²·Σy_t·y_{t+k} − n·S·(A_k+B_k) +
    // (n−k)·S², n²·den = n·(nQ−S²) — all decimal(38,0) folds over the
    // PINNED calendar-bounded cell table, one division per lag, 6 dp.
    // All 7 lags come from ONE day-ordered window pass (7 stacked
    // leads); lag = positions in day order (declared; gaps are a data
    // property, not resampled away).
    "q291_acf" -> { (s, dir) =>
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      // pinBounded: one row per calendar DAY (~2 400 at any corpus
      // size); the lag-lead windows below ride it unpartitioned by
      // design
      val (cells, h) = org.apache.spark.sql.graft.InternalPin.pinBounded(
        Tables(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y")))
      h.count(); graft.PinScope.retain(h)
      val W = org.apache.spark.sql.expressions.Window
      val wOrd = W.orderBy("day")
      val led = cells.select(
        Seq(col("y").cast("decimal(38,0)").as("y")) ++
        (1 to 7).map(k => lead("y", k).over(wOrd)
          .cast("decimal(38,0)").as(s"l$k")): _*)
      val aggCols =
        Seq(count(lit(1)).as("n"), sum(col("y")).as("s"),
            sum(col("y") * col("y")).as("q")) ++
        (1 to 7).flatMap(k => Seq(
          sum(col("y") * col(s"l$k")).as(s"p$k"),
          sum(when(col(s"l$k").isNotNull, col("y"))).as(s"a$k"),
          sum(col(s"l$k")).as(s"b$k")))
      val agg = led.agg(aggCols.head, aggCols.tail: _*)
      val stackExpr = (1 to 7).map(k =>
        s"$k, cast(n - $k as bigint), p$k, a$k, b$k").mkString(", ")
      agg.select(col("n"), col("s"), col("q"),
          expr(s"stack(7, $stackExpr) AS (lag, n_pairs, p, a, b)"))
        .select(col("lag"), col("n_pairs"),
          round(dd(col("n").cast("decimal(38,0)") * col("n") * col("p") -
                   col("n").cast("decimal(38,0)") * col("s") *
                     (col("a") + col("b")) +
                   (col("n") - col("lag")) * col("s") * col("s")) /
                dd(col("n").cast("decimal(38,0)") *
                   (col("n").cast("decimal(38,0)") * col("q") -
                    col("s") * col("s"))), 6).as("acf"))
        .orderBy("lag")
    },

    // Theil–Sen robust trend (added r12) — the slope q147's OLS family
    // reports gets dragged by the exact outlier days q276 flags; the
    // median of all pairwise slopes has a 29% breakdown point and is
    // the robust line a revenue dashboard should quote next to OLS.
    // Pairs live on the CALENDAR-bounded daily cell table (pinned), so
    // the O(days²) pair set is a fixed ~3M rows at ANY corpus size —
    // the classic case where quadratic-in-cells beats linear-in-facts.
    // Each pairwise slope is one IEEE division of exact ints (<2^53 ⇒
    // bit-identical, so ordering agrees); the median is the DECLARED
    // lower median at rank (m+1) div 2 under (slope, then day pair)
    // order. Selection is TWO-PHASE (r12 verdict #6): a value-range
    // histogram (4096 buckets; the bucket map is weakly monotone in sl
    // — constant subtract/divide/multiply/floor all preserve IEEE
    // order, and equal slopes share a bucket, so bucket order can
    // never contradict slope order) locates the bucket holding the
    // global median rank via exclusive prefix offsets over the ≤4096-
    // row histogram; only THAT bucket's ~m/4096 rows are then sorted
    // for row_number selection. Replaces the 5.3 s single-partition
    // sort of all ~2.9M pairs with two distributed aggs + one tiny
    // sort — the same move as q280's value-range-bucketed ranks.
    // OLS slope from the same cells (q147's cleared-denominator form)
    // rides along for the robust-vs-LS contrast.
    "q292_theil_sen" -> { (s, dir) =>
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      // pinBounded: one row per calendar DAY — corpus-independent
      val (cells, h) = org.apache.spark.sql.graft.InternalPin.pinBounded(
        Tables(s, dir, "orders")
        .groupBy(datediff(to_date(col("o_orderdate")),
                          lit("1995-01-01").cast("date")).cast("long")
                   .as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y")))
      h.count(); graft.PinScope.retain(h)
      // r19 optimization (guide §1.2 step 1): the slope set is
      // CALENDAR-bounded (days² ≈ 2.9M pairs at ANY corpus size — the
      // docstring's own bound), so the whole median selection folds in
      // ONE task over the pinned daily cells: the O(days²) slope loop,
      // one Arrays.sort of the primitive double array, and the
      // (m+1) div 2 lower-median pick. The previous two-phase
      // histogram selection was already sort-free but MATERIALIZED the
      // ~2.9M-row pair table (pin + 3 distributed reads + a window) —
      // the fold pays the identical FLOPs once, in-registers, and
      // ships one row back. Equivalence: slopes are the same IEEE
      // divisions of exact longs (di < dj by the sorted scan, exactly
      // the join's predicate); the value at global rank (m+1) div 2
      // under (sl, di, dj) order is the k-th smallest of the slope
      // MULTISET, which the primitive sort selects bit-identically
      // (no NaN — denominators are positive; no -0.0 — numerators are
      // long-casts), so ts_slope is unchanged by construction.
      import s.implicits._
      val med = cells.select(col("d"), col("y")).as[(Long, Long)]
        .repartition(1)
        .mapPartitions { it =>
          val arr = it.toArray.sortBy(_._1)
          val nd = arr.length
          val m = nd.toLong * (nd - 1) / 2
          if (m == 0) Iterator.empty
          else {
            val slopes = new Array[Double](m.toInt)
            var idx = 0
            var i = 0
            while (i < nd) {
              var j = i + 1
              while (j < nd) {
                slopes(idx) = (arr(j)._2 - arr(i)._2).toDouble /
                  (arr(j)._1 - arr(i)._1).toDouble
                idx += 1; j += 1
              }
              i += 1
            }
            java.util.Arrays.sort(slopes)
            Iterator((m, slopes(((m + 1) / 2).toInt - 1)))
          }
        }
        .toDF("n_pairs", "sl")
        .select(col("n_pairs"),
                round(col("sl") / 100.0, 6).as("ts_slope"))
      val ols = cells.agg(
          count(lit(1)).as("n"),
          sum(col("d").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("d").cast("decimal(38,0)") * col("d")).as("sxx"),
          sum(col("d").cast("decimal(38,0)") * col("y")).as("sxy"))
        .select(col("n").as("n_days"),
          round(dd(col("n").cast("decimal(38,0)") * col("sxy") -
                   col("sx") * col("sy")) /
                dd(col("n").cast("decimal(38,0)") * col("sxx") -
                   col("sx") * col("sx")) / 100.0, 6).as("ols_slope"))
      med.crossJoin(broadcast(ols))
        .select(col("n_days"), col("n_pairs"), col("ts_slope"),
                col("ols_slope"))
    },

    // Level-1 sequential-pattern support (added r12) — the SUBSEQUENCE
    // semantics the adjacency pair (q130 transitions, q191 trigrams)
    // cannot express: "a then b" counts a user if ANY a-occurrence
    // strictly precedes ANY b-occurrence (the PrefixSpan/GSP support
    // definition — gaps allowed, each user votes once), which needs
    // only each user's per-type (min ts, max ts) envelope: a<b
    // supported ⟺ min_ts(a) < max_ts(b) (for a=b this demands two
    // occurrences at distinct instants — strict order declared). ONE
    // (user, type) shuffle folds the stream to ≤|types| envelope rows
    // per user; the pair expansion is a per-user HOF cross of that
    // tiny array (|types|²-bounded), and the user-count denominator
    // rides the SAME pass as a per-user marker pair — no second fact
    // scan, no distinct-count job. The 26-row pattern table is pinned;
    // support shares divide exact counts once, 6 dp.
    "q277_seq_2patterns" -> { (s, dir) =>
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)
      val ut = Tables(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(min("ts").as("mn"), max("ts").as("mx"))
      val perUser = ut.groupBy("user_id")
        .agg(collect_list(struct(col("event_type").as("t"),
                                 col("mn"), col("mx"))).as("arr"))
      val (pairs, h) = pin(perUser.select(explode(concat(
          expr("""flatten(transform(arr, x -> transform(arr,
                 |  y -> struct(x.t AS a, y.t AS b,
                 |              x.mn < y.mx AS ok))))""".stripMargin),
          array(struct(lit("~").as("a"), lit("~").as("b"),
                       lit(true).as("ok"))))).as("p"))
        .where(col("p.ok"))
        .groupBy(col("p.a").as("first_type"), col("p.b").as("then_type"))
        .agg(count(lit(1)).as("support")))
      h.count(); graft.PinScope.retain(h)
      val total = pairs.where(col("first_type") === "~")
        .select(col("support").as("tot"))
      pairs.where(col("first_type") =!= "~")
        .crossJoin(broadcast(total))
        .select(col("first_type"), col("then_type"), col("support"),
                round(dd(col("support")) / dd(col("tot")), 6)
                  .as("user_share"))
        .orderBy("first_type", "then_type")
    }
  )

  /** Per-user censored lifetime table shared by q237 (Kaplan–Meier
    * curve) and q248 (log-rank test): user_id, death ∈ {0,1} (converted
    * = first premium purchase, props.k < 5), dur = integer days from
    * first event to conversion, censored at the corpus edge otherwise.
    * ONE pinned fact scan; the corpus-edge cutoff is a 1-row broadcast.
    * One definition of the lifetimes is what makes the curve and the
    * test consistent by construction. */
  /** q307's shared recursion body: everything after `WITH RECURSIVE`,
    * parameterized only by the daily step table's name, so Spark and
    * DuckDB execute ONE string — every smoothing step's double chain
    * is operand-identical by construction. The step table contract:
    * (et, k row-number within series ordered by day, yc integer
    * cents). Note e at k=2 is 0 by the b₁=y₂−y₁ init (declared). */
  /** The pinned (et, day, yc, k) daily step table q307 and q316 both
    * recurse over: ONE fact scan, cents-exact daily sums, per-series
    * day index. */
  private def holtStepsView(s: SparkSession, d: String,
                            view: String): Unit = {
    val W = org.apache.spark.sql.expressions.Window
    val (steps, sh) = org.apache.spark.sql.graft.InternalPin.pin(
      Tables(s, d, "events")
        .groupBy(col("event_type").as("et"), to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("yc"))
        .withColumn("k", row_number()
          .over(W.partitionBy("et").orderBy("day")).cast("long")))
    sh.count(); graft.PinScope.retain(sh)
    steps.createOrReplaceTempView(view)
  }

  /** The [[holtBody]] recursion materialized as a per-series FOLD
    * (r19 optimization, guide §1.2 "the distributed algorithm"):
    * Spark 4's recursive CTE executes one job per recursion step —
    * |days| scheduler round-trips over a ≤|days|×|types| table — so
    * the state chain is computed instead inside ONE task per series,
    * with the IDENTICAL IEEE double chain (same literals, same operand
    * order as the SQL text: l' = 0.3·y + 0.7·(l+b), b' = 0.1·(l'−l) +
    * 0.9·b, init l=y₁ double, b=(y₂−y₁) integer-subtract-then-cast).
    * Equality is enforced three ways: the DuckDB oracle still runs the
    * full recursive [[holtBody]] text, the q307 rows hash-match it,
    * and the closure is bounded by the step table (state scale, never
    * corpus scale — the fold input is the same pinned ≤|days|×|types|
    * table the recursion consumed). */
  private def holtStatesView(s: SparkSession, steps: String,
                             out: String): Unit = {
    import s.implicits._
    val states = s.table(steps)
      .select(col("et"), col("k").cast("long"), col("yc").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (et: String, it: Iterator[(String, Long, Long)]) =>
        val y = it.map(t => (t._2, t._3)).toArray.sortBy(_._1).map(_._2)
        if (y.length < 2) Iterator.empty
        else {
          val buf = Vector.newBuilder[(String, Long, Double, Double)]
          var l = y(0).toDouble
          var b = (y(1) - y(0)).toDouble
          buf += ((et, 1L, l, b))
          var k = 2
          while (k <= y.length) {
            val yk = y(k - 1).toDouble
            val ln = 0.3 * yk + 0.7 * (l + b)
            val bn = 0.1 * (ln - l) + 0.9 * b
            l = ln; b = bn
            buf += ((et, k.toLong, l, b))
            k += 1
          }
          buf.result().iterator
        }
      }.toDF("et", "k", "l", "b")
    states.createOrReplaceTempView(out)
  }

  /** [[hwBody]]'s triple-smoothing recursion as the same per-series
    * fold — see [[holtStatesView]]. Init replicates the SQL exactly:
    * integer week sums w1/w2 cast once, l = w1/7e0, b = (w2/7e0 −
    * w1/7e0)/7e0, sᵢ = yᵢ − w1/7e0; series under 14 days drop (the
    * HAVING count(*) = 14 gate). Step: l' = 0.2(y−s₁) + 0.8(l+b),
    * b' = 0.1(l'−l) + 0.9b, s' = 0.05(y−l') + 0.95s₁, buffer shifts
    * left. */
  private def hwStatesView(s: SparkSession, steps: String,
                           out: String): Unit = {
    import s.implicits._
    val states = s.table(steps)
      .select(col("et"), col("k").cast("long"), col("yc").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (et: String, it: Iterator[(String, Long, Long)]) =>
        val y = it.map(t => (t._2, t._3)).toArray.sortBy(_._1).map(_._2)
        if (y.length < 14) Iterator.empty
        else {
          var w1 = 0L; var w2 = 0L
          var i = 0
          while (i < 7) { w1 += y(i); i += 1 }
          while (i < 14) { w2 += y(i); i += 1 }
          var l = w1.toDouble / 7e0
          var b = (w2.toDouble / 7e0 - w1.toDouble / 7e0) / 7e0
          val sbuf = new Array[Double](7)
          i = 0
          while (i < 7) { sbuf(i) = y(i).toDouble - w1.toDouble / 7e0; i += 1 }
          val buf = Vector.newBuilder[
            (String, Long, Double, Double, Double, Double, Double, Double,
             Double, Double, Double)]
          def emit(k: Long): Unit =
            buf += ((et, k, l, b, sbuf(0), sbuf(1), sbuf(2), sbuf(3),
                     sbuf(4), sbuf(5), sbuf(6)))
          emit(7L)
          var k = 8
          while (k <= y.length) {
            val yk = y(k - 1).toDouble
            val s1 = sbuf(0)
            val ln = 2e-1 * (yk - s1) + 8e-1 * (l + b)
            val bn = 1e-1 * (ln - l) + 9e-1 * b
            val sn = 5e-2 * (yk - ln) + 95e-2 * s1
            System.arraycopy(sbuf, 1, sbuf, 0, 6)
            sbuf(6) = sn
            l = ln; b = bn
            emit(k.toLong)
            k += 1
          }
          buf.result().iterator
        }
      }.toDF("et", "k", "l", "b", "s1", "s2", "s3", "s4", "s5", "s6", "s7")
    states.createOrReplaceTempView(out)
  }

  /** q316's Holt-Winters recursion body (everything after `WITH
    * RECURSIVE`), parameterized by the step table's name — the SAME
    * text runs in Spark and DuckDB, so every smoothing step's double
    * chain is operand-identical. State row: (et, k, l, b, s1..s7)
    * with s1 the OLDEST seasonal slot (the one day k+1 consumes). */
  private def hwBody(steps: String): String = {
    val ys = (1 to 7)
      .map(i => s"max(CASE WHEN k = $i THEN yc END) AS y$i")
      .mkString(",\n       |    ")
    val ss = (1 to 7)
      .map(i => s"CAST(y$i AS DOUBLE) - CAST(w1 AS DOUBLE) / 7e0 AS s$i")
      .mkString(",\n       |  ")
    s"""hw(et, k, l, b, s1, s2, s3, s4, s5, s6, s7) AS (
       |  SELECT et, CAST(7 AS BIGINT) AS k,
       |  CAST(w1 AS DOUBLE) / 7e0 AS l,
       |  (CAST(w2 AS DOUBLE) / 7e0 - CAST(w1 AS DOUBLE) / 7e0) / 7e0 AS b,
       |  $ss
       |  FROM (SELECT et,
       |    sum(CASE WHEN k <= 7 THEN yc ELSE 0 END) AS w1,
       |    sum(CASE WHEN k BETWEEN 8 AND 14 THEN yc ELSE 0 END) AS w2,
       |    $ys
       |    FROM $steps WHERE k <= 14
       |    GROUP BY et HAVING count(*) = 14)
       |  UNION ALL
       |  SELECT st.et, st.k,
       |    2e-1 * (CAST(st.yc AS DOUBLE) - p.s1) + 8e-1 * (p.l + p.b),
       |    1e-1 * ((2e-1 * (CAST(st.yc AS DOUBLE) - p.s1) +
       |             8e-1 * (p.l + p.b)) - p.l) + 9e-1 * p.b,
       |    p.s2, p.s3, p.s4, p.s5, p.s6, p.s7,
       |    5e-2 * (CAST(st.yc AS DOUBLE) -
       |            (2e-1 * (CAST(st.yc AS DOUBLE) - p.s1) +
       |             8e-1 * (p.l + p.b))) + 95e-2 * p.s1
       |  FROM hw p JOIN $steps st ON st.et = p.et AND st.k = p.k + 1),
       |${hwTail(steps)}""".stripMargin
  }

  /** Everything in [[hwBody]] after the recursive `hw` CTE — split out
    * (r19 optimization) so Spark can consume the per-series fold of
    * [[hwStatesView]] through the SAME tail text the oracle runs. */
  private def hwTail(steps: String): String = {
    val sAll = (1 to 7).map(i => s"f.s$i").mkString(", ")
    s"""err AS (
       |  SELECT p.et,
       |    CAST(round(abs(CAST(st.yc AS DOUBLE) - (p.l + p.b + p.s1)), 4)
       |         AS DECIMAL(28,4)) AS e
       |  FROM hw p JOIN $steps st ON st.et = p.et AND st.k = p.k + 1),
       |mae AS (
       |  SELECT et, round(CAST(sum(e) AS DOUBLE) / count(*) / 100.0, 6)
       |    AS mae_1step
       |  FROM err GROUP BY et),
       |lastk AS (SELECT et, max(k) AS kk FROM hw GROUP BY et),
       |fin AS (SELECT hw.* FROM hw
       |        JOIN lastk ON hw.et = lastk.et AND hw.k = lastk.kk)
       |SELECT f.et AS event_type, f.k AS n_days,
       |  round(f.l / 100.0, 6) AS level_end,
       |  round(f.b / 100.0, 6) AS trend_end,
       |  round((f.l + 7e0 * f.b + f.s7) / 100.0, 6) AS forecast_7d,
       |  round((greatest($sAll) - least($sAll)) / 100.0, 6)
       |    AS seasonal_amp,
       |  m.mae_1step
       |FROM fin f JOIN mae m ON f.et = m.et
       |ORDER BY event_type""".stripMargin
  }

  private def holtBody(steps: String): String =
    s"""h(et, k, l, b) AS (
       |  SELECT s1.et, CAST(1 AS BIGINT) AS k, CAST(s1.yc AS DOUBLE) AS l,
       |         CAST(s2.yc - s1.yc AS DOUBLE) AS b
       |  FROM $steps s1 JOIN $steps s2
       |    ON s1.et = s2.et AND s1.k = 1 AND s2.k = 2
       |  UNION ALL
       |  SELECT st.et, st.k,
       |         0.3 * CAST(st.yc AS DOUBLE) + 0.7 * (p.l + p.b),
       |         0.1 * ((0.3 * CAST(st.yc AS DOUBLE) + 0.7 * (p.l + p.b))
       |                - p.l) + 0.9 * p.b
       |  FROM h p JOIN $steps st ON st.et = p.et AND st.k = p.k + 1),
       |${holtTail(steps)}""".stripMargin

  /** Everything in [[holtBody]] after the recursive `h` CTE — split
    * out (r19 optimization) so Spark can consume the per-series fold
    * of [[holtStatesView]] through the SAME tail text the oracle runs,
    * while DuckDB keeps the full recursive body. */
  private def holtTail(steps: String): String =
    s"""err AS (
       |  SELECT p.et,
       |    CAST(round(abs(CAST(st.yc AS DOUBLE) - (p.l + p.b)), 4)
       |         AS DECIMAL(28,4)) AS e
       |  FROM h p JOIN $steps st ON st.et = p.et AND st.k = p.k + 1),
       |mae AS (
       |  SELECT et, round(CAST(sum(e) AS DOUBLE) / count(*) / 100.0, 6)
       |    AS mae_1step
       |  FROM err GROUP BY et),
       |lastk AS (SELECT et, max(k) AS kk FROM h GROUP BY et),
       |fin AS (SELECT h.et, h.k, h.l, h.b FROM h
       |        JOIN lastk ON h.et = lastk.et AND h.k = lastk.kk)
       |SELECT f.et AS event_type, f.k AS n_days,
       |  round(f.l / 100.0, 6) AS level_end,
       |  round(f.b / 100.0, 6) AS trend_end,
       |  round((f.l + 7.0 * f.b) / 100.0, 6) AS forecast_7d,
       |  m.mae_1step
       |FROM fin f JOIN mae m ON f.et = m.et
       |ORDER BY event_type""".stripMargin

  private def kmLife(s: SparkSession, d: String): DataFrame = {
    val (u, h) = org.apache.spark.sql.graft.InternalPin.pin(
      Tables(s, d, "events")
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("first_us"),
             min(when(col("event_type") === "purchase" &&
                        get_json_object(col("props"), "$.k")
                          .cast("long") < 5,
                      unix_micros(col("ts")))).as("p_us"),
             max(unix_micros(col("ts"))).as("last_us")))
    h.count(); graft.PinScope.retain(h)
    val cut = u.agg(max("last_us").as("cut_us"))
    u.crossJoin(broadcast(cut))
      .withColumn("death", when(col("p_us").isNotNull, 1L).otherwise(0L))
      .withColumn("dur",
        when(col("p_us").isNotNull,
             expr("(p_us - first_us) div 86400000000"))
          .otherwise(expr("(cut_us - first_us) div 86400000000")))
  }

  /** ONE Newton round of q326's Cox partial-likelihood fit, reading
    * the step table `steps` (dth, dth1, n0, n1 — exact integers) and
    * the previous round's 1-row β table `prev` (column b, rounded 6).
    * The SAME text serves the oracle's unrolled chain and Spark's
    * staged execution (prev = the prior round's pinned view — the
    * q310 discipline). Per-step score/information/log-likelihood
    * terms round 6 dp into order-free decimal sums (the q248
    * discipline, which also absorbs any last-ulp exp/ln divergence
    * between engines); p and 1−p are written as explicit fixed-order
    * quotients so both engines run the identical IEEE chain. */
  private def coxRound(k: Int, steps: String, prev: String): String =
    s"""tm$k AS (SELECT
       |    round(CAST(dth1 AS DOUBLE) -
       |          CAST(dth AS DOUBLE) * (exp(p.b) * CAST(n1 AS DOUBLE)) /
       |          (CAST(n0 AS DOUBLE) + exp(p.b) * CAST(n1 AS DOUBLE)),
       |          6) AS u_t,
       |    round(CAST(dth AS DOUBLE) *
       |          ((exp(p.b) * CAST(n1 AS DOUBLE)) /
       |           (CAST(n0 AS DOUBLE) + exp(p.b) * CAST(n1 AS DOUBLE))) *
       |          (CAST(n0 AS DOUBLE) /
       |           (CAST(n0 AS DOUBLE) + exp(p.b) * CAST(n1 AS DOUBLE))),
       |          6) AS i_t
       |  FROM $steps, $prev p),
       |ag$k AS (SELECT
       |    CAST(sum(CAST(u_t AS DECIMAL(28,6))) AS DOUBLE) AS u,
       |    CAST(sum(CAST(i_t AS DECIMAL(28,6))) AS DOUBLE) AS i
       |  FROM tm$k),
       |bu$k AS (SELECT round(p.b + a.u / a.i, 6) AS b
       |  FROM $prev p, ag$k a),
       |lt$k AS (SELECT
       |    round(CAST(dth1 AS DOUBLE) * nb.b -
       |          CAST(dth AS DOUBLE) *
       |          ln(CAST(n0 AS DOUBLE) + exp(nb.b) * CAST(n1 AS DOUBLE)),
       |          6) AS l_t
       |  FROM $steps, bu$k nb),
       |sl$k AS (SELECT
       |    CAST(sum(CAST(l_t AS DECIMAL(28,6))) AS DOUBLE) AS sll
       |  FROM lt$k),
       |out$k AS (SELECT $k AS cox_round, nb.b AS beta,
       |    round(exp(nb.b), 6) AS hazard_ratio,
       |    round(s.sll, 6) AS loglik
       |  FROM bu$k nb, sl$k s)""".stripMargin

  /** Gap-based sessionization shared by q38 (batch, 30-min default) and
    * q80_stream_sessionize (streaming): ONE definition is what makes
    * their bit-parity structural rather than copy-discipline. Works on
    * any frame with (user_id, ts) — batch DataFrame or stream — and any
    * gap width (`dur_us` = last-event − first-event, i.e. window span
    * minus the trailing gap session_window appends). Non-default gaps
    * are spec-tested against an independent gaps-and-islands fold. */
  private[graft] def sessionize(events: DataFrame,
                                gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
               session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
              col("session_window.start").as("sess_start"),
              col("cnt"),
              (unix_micros(col("session_window.end")) -
               unix_micros(col("session_window.start")) -
               lit(gapMinutes * 60000000L)).as("dur_us"))

  def oracles: Map[String, String] = Map(
    // same 32-lag integer unroll; the spike rule compares integers
    // (c*den > 2*num), the last-row EWMA is arg_max + one division
    "q233_ewma_spikes" -> {
      val num = (0 until 32).map { j =>
        s"coalesce(lag(c, ${j + 1}) OVER w, 0) * ${1L << (31 - j)}"
      }.mkString(" +\n        ")
      val den = (0 until 32).map { j =>
        s"CASE WHEN lag(c, ${j + 1}) OVER w IS NOT NULL THEN ${1L << (31 - j)} ELSE 0 END"
      }.mkString(" +\n        ")
      s"""WITH e AS (
         |  SELECT event_type, event_id, epoch_us(ts) AS tus,
         |    CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events),
         |lagged AS (
         |  SELECT event_type, c,
         |    $num AS num_prev,
         |    $den AS den_prev,
         |    coalesce(lag(c, 32) OVER w, 0) AS t32,
         |    CASE WHEN lag(c, 32) OVER w IS NOT NULL THEN 1 ELSE 0 END
         |      AS d32,
         |    row_number() OVER w AS rn
         |  FROM e
         |  WINDOW w AS (PARTITION BY event_type ORDER BY tus, event_id))
         |SELECT event_type, count(*) AS n,
         |  CAST(sum(CASE WHEN den_prev > 0 AND c * den_prev > num_prev * 2
         |                THEN 1 ELSE 0 END) AS BIGINT) AS spikes,
         |  round(arg_max(
         |      CAST(c * 2147483648 + (num_prev - t32) // 2 AS DOUBLE) /
         |      CAST(2147483648 + (den_prev - d32) // 2 AS DOUBLE), rn) /
         |    100.0, 6) AS ewma_last,
         |  round(CAST(sum(CAST(c AS DECIMAL(28,0))) AS DOUBLE) /
         |        count(*) / 100.0, 6) AS plain_avg
         |FROM lagged GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    // identical integer step table, identical recursion: each step is
    // exactly s*((n-d)/n) in double — same two IEEE ops, same order
    "q237_km_survival" ->
      """WITH RECURSIVE
        |u AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_us,
        |    min(CASE WHEN event_type = 'purchase'
        |              AND CAST(json_extract_string(props, '$.k')
        |                       AS BIGINT) < 5
        |             THEN epoch_us(ts) END) AS p_us,
        |    max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY user_id),
        |cut AS (SELECT max(last_us) AS cut_us FROM u),
        |life AS (
        |  SELECT CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS death,
        |    CASE WHEN p_us IS NOT NULL
        |         THEN (p_us - first_us) // 86400000000
        |         ELSE (cut_us - first_us) // 86400000000 END AS dur
        |  FROM u CROSS JOIN cut),
        |vg AS (SELECT dur, count(*) AS ct, sum(death) AS dth
        |       FROM life GROUP BY dur),
        |st0 AS (SELECT dur, ct, dth,
        |    sum(ct) OVER () AS total,
        |    coalesce(sum(ct) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cless
        |  FROM vg),
        |steps AS (SELECT
        |    row_number() OVER (ORDER BY dur) AS k,
        |    dur AS t_day, total - cless AS n_risk, dth AS deaths
        |  FROM st0 WHERE dth > 0),
        |surv(k, sv) AS (
        |  SELECT 0, CAST(1.0 AS DOUBLE)
        |  UNION ALL
        |  SELECT st.k,
        |    p.sv * (CAST(st.n_risk - st.deaths AS DOUBLE) /
        |            CAST(st.n_risk AS DOUBLE))
        |  FROM surv p JOIN steps st ON st.k = p.k + 1)
        |SELECT st.t_day, CAST(st.n_risk AS BIGINT) AS n_risk,
        |  CAST(st.deaths AS BIGINT) AS deaths, round(s.sv, 6) AS surv
        |FROM surv s JOIN steps st ON st.k = s.k
        |ORDER BY st.t_day""".stripMargin,

    // identical cells, leads, HUGEINT distance fold, and tie-broken
    // argmins; one final cast to double on each reported distance
    "q332_matrix_profile" -> {
      val leadSql = (1 to 6).map(i =>
        s"lead(c0, $i) OVER w AS c$i, lead(day, $i) OVER w AS d$i")
        .mkString(",\n    ")
      val d2 = (0 to 6).map(i =>
        s"CAST(a.c$i - b.c$i AS HUGEINT) * (a.c$i - b.c$i)")
        .mkString(" + ")
      s"""WITH cells AS (
         |  SELECT event_type AS et,
         |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
         |         AS BIGINT) AS day,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         |      AS c0
         |  FROM events GROUP BY 1, 2),
         |led AS (
         |  SELECT et, day, c0,
         |    $leadSql
         |  FROM cells
         |  WINDOW w AS (PARTITION BY et ORDER BY day)),
         |win AS (SELECT * FROM led WHERE d6 = day + 6),
         |pr AS MATERIALIZED (
         |  SELECT a.et, a.day AS sa, b.day AS sb, $d2 AS dist2
         |  FROM win a JOIN win b ON a.et = b.et
         |  WHERE a.day < b.day AND b.day - a.day >= 7),
         |motif AS (
         |  SELECT et, sa AS motif_s, sb AS motif_t,
         |    CAST(dist2 AS DOUBLE) AS motif_dist2
         |  FROM (SELECT *, row_number() OVER (PARTITION BY et
         |          ORDER BY dist2, sa, sb) AS rk FROM pr)
         |  WHERE rk = 1),
         |sym AS (SELECT et, sa AS w, dist2 FROM pr
         |        UNION ALL SELECT et, sb, dist2 FROM pr),
         |nn AS (SELECT et, w, min(dist2) AS nnd FROM sym GROUP BY 1, 2),
         |disc AS (
         |  SELECT et, w AS discord_s, CAST(nnd AS DOUBLE) AS discord_nnd
         |  FROM (SELECT *, row_number() OVER (PARTITION BY et
         |          ORDER BY nnd DESC, w) AS rk FROM nn)
         |  WHERE rk = 1)
         |SELECT m.et AS event_type, m.motif_s, m.motif_t, m.motif_dist2,
         |  d.discord_s, d.discord_nnd
         |FROM motif m JOIN disc d ON m.et = d.et
         |ORDER BY event_type""".stripMargin
    },

    // identical lifetimes + arm split + step table, then coxRound's
    // shared text unrolled through the bu0..bu3 chain
    "q326_cox_hazard" ->
      s"""WITH u AS (
         |  SELECT user_id, min(epoch_us(ts)) AS first_us,
         |    min(CASE WHEN event_type = 'purchase'
         |              AND CAST(json_extract_string(props, '$$.k')
         |                       AS BIGINT) < 5
         |             THEN epoch_us(ts) END) AS p_us,
         |    max(epoch_us(ts)) AS last_us
         |  FROM events GROUP BY user_id),
         |cut AS (SELECT max(last_us) AS cut_us FROM u),
         |life AS (
         |  SELECT CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS death,
         |    CASE WHEN p_us IS NOT NULL
         |         THEN (p_us - first_us) // 86400000000
         |         ELSE (cut_us - first_us) // 86400000000 END AS dur,
         |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
         |         THEN 0 ELSE 1 END AS a1
         |  FROM u CROSS JOIN cut),
         |vg AS (SELECT dur, count(*) AS ct, sum(death) AS dth,
         |         sum(a1) AS ct1, sum(death * a1) AS dth1
         |       FROM life GROUP BY dur),
         |st AS (SELECT dth, dth1,
         |    sum(ct) OVER () AS total,
         |    sum(ct1) OVER () AS total1,
         |    coalesce(sum(ct) OVER (ORDER BY dur
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cless,
         |    coalesce(sum(ct1) OVER (ORDER BY dur
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cless1
         |  FROM vg),
         |sp AS MATERIALIZED (SELECT dth, dth1,
         |    (total - cless) - (total1 - cless1) AS n0,
         |    total1 - cless1 AS n1
         |  FROM st WHERE dth > 0),
         |b0 AS (SELECT CAST(0.0 AS DOUBLE) AS b),
         |${coxRound(1, "sp", "b0")},
         |${coxRound(2, "sp", "bu1")},
         |${coxRound(3, "sp", "bu2")}
         |SELECT CAST(cox_round AS BIGINT) AS cox_round, beta,
         |  hazard_ratio, loglik
         |FROM (SELECT * FROM out1 UNION ALL SELECT * FROM out2
         |      UNION ALL SELECT * FROM out3)
         |ORDER BY cox_round""".stripMargin,

    // identical lifetimes + arm split; per-step hypergeometric e/v
    // terms rounded 6 dp into order-free decimal sums, same operand
    // chain for the variance product
    "q248_logrank" ->
      """WITH u AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_us,
        |    min(CASE WHEN event_type = 'purchase'
        |              AND CAST(json_extract_string(props, '$.k')
        |                       AS BIGINT) < 5
        |             THEN epoch_us(ts) END) AS p_us,
        |    max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY user_id),
        |cut AS (SELECT max(last_us) AS cut_us FROM u),
        |life AS (
        |  SELECT CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS death,
        |    CASE WHEN p_us IS NOT NULL
        |         THEN (p_us - first_us) // 86400000000
        |         ELSE (cut_us - first_us) // 86400000000 END AS dur,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
        |         THEN 0 ELSE 1 END AS a1
        |  FROM u CROSS JOIN cut),
        |vg AS (SELECT dur, count(*) AS ct, sum(death) AS dth,
        |         sum(a1) AS ct1, sum(death * a1) AS dth1
        |       FROM life GROUP BY dur),
        |st AS (SELECT dth, dth1,
        |    sum(ct) OVER () AS total,
        |    sum(ct1) OVER () AS total1,
        |    coalesce(sum(ct) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cless,
        |    coalesce(sum(ct1) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cless1
        |  FROM vg),
        |sp AS (SELECT dth, dth1, total, total1,
        |    total - cless AS n, total1 - cless1 AS n1
        |  FROM st WHERE dth > 0),
        |a AS (SELECT count(*) AS n_steps,
        |    CAST(max(total) AS BIGINT) AS users,
        |    CAST(max(total1) AS BIGINT) AS users1,
        |    CAST(sum(dth1) AS BIGINT) AS o1,
        |    sum(CAST(round(CAST(dth AS DOUBLE) * CAST(n1 AS DOUBLE) /
        |          CAST(n AS DOUBLE), 6) AS DECIMAL(28,6))) AS e1,
        |    sum(CAST(CASE WHEN n > 1 THEN
        |          round(CAST(dth AS DOUBLE) * CAST(n1 AS DOUBLE) /
        |                CAST(n AS DOUBLE) *
        |                (CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE)) /
        |                CAST(n AS DOUBLE) *
        |                (CAST(n AS DOUBLE) - CAST(dth AS DOUBLE)) /
        |                (CAST(n AS DOUBLE) - 1.0), 6)
        |          ELSE 0.0 END AS DECIMAL(28,6))) AS v
        |  FROM sp)
        |SELECT n_steps, users, users1, o1,
        |  round(CAST(e1 AS DOUBLE), 6) AS e1,
        |  round(CAST(v AS DOUBLE), 6) AS lr_var,
        |  round((CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE)) /
        |        sqrt(CAST(v AS DOUBLE)), 6) AS z,
        |  round((CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE)) *
        |        (CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE)) /
        |        CAST(v AS DOUBLE), 6) AS chi2
        |FROM a""".stripMargin,

    // same holding-interval weights: integer cents x integer micro-
    // second durations, decimal sums, one rounded division
    "q225_twap" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS tus,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    lead(epoch_us(ts)) OVER (PARTITION BY event_type
        |                             ORDER BY epoch_us(ts), event_id)
        |      AS next_us
        |  FROM events),
        |iv AS (SELECT event_type, cents, next_us - tus AS dur
        |       FROM e WHERE next_us IS NOT NULL)
        |SELECT event_type, count(*) AS n_intervals,
        |  round(CAST(sum(CAST(dur AS DECIMAL(28,0))) AS DOUBLE) /
        |        1000000.0, 6) AS span_sec,
        |  round(CAST(sum(CAST(cents AS DECIMAL(18,0)) * dur) AS DOUBLE) /
        |        CAST(sum(CAST(dur AS DECIMAL(28,0))) AS DOUBLE) /
        |        100.0, 6) AS twap,
        |  round(CAST(sum(CAST(cents AS DECIMAL(28,0))) AS DOUBLE) /
        |        count(*) / 100.0, 6) AS plain_avg
        |FROM iv GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q112_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |          / count(*), 6) AS avg_value
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT date_trunc('hour', min(ts)) AS h0,
        |                date_trunc('hour', max(ts)) AS h1 FROM events),
        |grid AS (
        |  SELECT t.event_type, g.hour
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |       (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
        |          AS hour FROM span) g)
        |SELECT g.event_type, g.hour,
        |  last_value(h.avg_value IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
        |  CAST(h.avg_value IS NULL AS INT) AS was_gap
        |FROM grid g LEFT JOIN hourly h
        |  ON g.event_type = h.event_type AND g.hour = h.hour
        |ORDER BY g.event_type, g.hour""".stripMargin,

    "q185_funnel_windowed" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view
        |        AND e.ts <= v.t_view + INTERVAL 1 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |        AND e.ts <= c.t_click + INTERVAL 1 HOUR GROUP BY 1)
        |SELECT
        |  (SELECT count(*) FROM v) AS viewed,
        |  (SELECT count(*) FROM c) AS clicked_1h,
        |  (SELECT count(*) FROM p) AS purchased_1h,
        |  round(CAST((SELECT count(*) FROM c) AS DOUBLE) /
        |        (SELECT count(*) FROM v), 6) AS click_rate,
        |  round(CAST((SELECT count(*) FROM p) AS DOUBLE) /
        |        (SELECT count(*) FROM c), 6) AS purchase_rate""".stripMargin,

    "q200_abandonment" ->
      """WITH c AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    min(CASE WHEN event_type = 'purchase'
        |             THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS np
        |  FROM events)
        |SELECT CAST(ts AS DATE) AS day, count(*) AS clicks,
        |  CAST(sum(CASE WHEN np IS NULL
        |                  OR np > epoch_us(ts) + 3600000000
        |                THEN 1 ELSE 0 END) AS BIGINT) AS abandoned,
        |  round(CAST(sum(CASE WHEN np IS NULL
        |                        OR np > epoch_us(ts) + 3600000000
        |                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
        |    AS abandon_rate
        |FROM c WHERE event_type = 'click'
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q204_pit_features" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS tus,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      OVER w AS views_7d,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER w AS clicks_7d,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      OVER w AS errors_7d,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |                      THEN cents END) OVER w, 0) AS spend_7d_cents
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |               RANGE BETWEEN 604800000000 PRECEDING
        |               AND 1 PRECEDING))
        |SELECT event_id, user_id, ts,
        |  CAST(views_7d AS BIGINT) AS views_7d,
        |  CAST(clicks_7d AS BIGINT) AS clicks_7d,
        |  CAST(errors_7d AS BIGINT) AS errors_7d,
        |  CAST(spend_7d_cents AS BIGINT) AS spend_7d_cents
        |FROM f WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q207_semi_additive" ->
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
        |b AS (
        |  SELECT user_id, ts, event_id,
        |    prefix - least(0, min(prefix)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING)) AS bal,
        |    date_trunc('week', ts) AS wk
        |  FROM pre),
        |snap AS (
        |  SELECT user_id, wk, bal FROM (
        |    SELECT user_id, wk, bal,
        |      row_number() OVER (PARTITION BY user_id, wk
        |                         ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM b) WHERE rn = 1),
        |grid AS (
        |  SELECT u.user_id, w.wk
        |  FROM (SELECT DISTINCT user_id FROM snap) u
        |  CROSS JOIN (SELECT DISTINCT wk FROM snap) w),
        |filled AS (
        |  SELECT g.user_id, g.wk,
        |    last_value(s.bal IGNORE NULLS)
        |      OVER (PARTITION BY g.user_id ORDER BY g.wk
        |            ROWS UNBOUNDED PRECEDING) AS fbal
        |  FROM grid g LEFT JOIN snap s
        |    ON g.user_id = s.user_id AND g.wk = s.wk)
        |SELECT CAST(wk AS DATE) AS week,
        |  count(fbal) AS users_reporting,
        |  CAST(sum(coalesce(fbal, 0)) AS BIGINT) AS total_points
        |FROM filled GROUP BY 1 ORDER BY week""".stripMargin,

    "q113_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
        |SELECT count(v.t_view) AS viewed, count(c.t_click) AS clicked,
        |  count(p.t_purchase) AS purchased,
        |  round(CAST(sum(CAST(epoch_us(c.t_click) - epoch_us(v.t_view)
        |                      AS DECIMAL(18,0))) AS DOUBLE)
        |        / count(c.t_click) / 3.6e9, 6) AS avg_hours_view_to_click
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON c.user_id = p.user_id""".stripMargin,

    // same integer-squares inequality; group stats via window so both
    // engines evaluate the identical exact arithmetic. HUGEINT operands
    // mirror the engine's decimal(38,0) widening: BIGINT squares
    // overflow at n·v > ~3e9.
    "q118_anomaly_flags" ->
      """WITH e AS (
        |  SELECT event_id, event_type, date_trunc('day', ts) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |g AS (
        |  SELECT *,
        |    CAST(count(*) OVER w AS HUGEINT) AS n,
        |    CAST(sum(CAST(v AS HUGEINT)) OVER w AS HUGEINT) AS s,
        |    CAST(sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) OVER w
        |         AS HUGEINT) AS q
        |  FROM e
        |  WINDOW w AS (PARTITION BY event_type, day))
        |SELECT event_id, event_type, day, v, CAST(n AS BIGINT) AS n
        |FROM g
        |WHERE (n * CAST(v AS HUGEINT) - s) * (n * CAST(v AS HUGEINT) - s)
        |      > 4 * (n * q - s * s)
        |ORDER BY event_id""".stripMargin,

    "q190_gap_screen" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id)) AS gap
        |  FROM events),
        |vg AS (SELECT event_type, gap, count(*) AS cnt FROM g
        |       WHERE gap IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT event_type, gap, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY gap
        |                   ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM vg)
        |SELECT event_type, CAST(min(n) AS BIGINT) AS n_gaps,
        |  min(CASE WHEN cum * 100 >= n * 50 THEN gap END) AS p50_us,
        |  min(CASE WHEN cum * 100 >= n * 90 THEN gap END) AS p90_us,
        |  min(CASE WHEN cum * 100 >= n * 99 THEN gap END) AS p99_us
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q186_wow_growth" ->
      """WITH wk AS (
        |  SELECT event_type, date_trunc('week', ts) AS wk,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, wk, cnt,
        |  lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY wk)
        |    AS prev_cnt,
        |  round(CAST(cnt - lag(cnt, 1) OVER (PARTITION BY event_type
        |                                     ORDER BY wk) AS DOUBLE)
        |        * 100 / lag(cnt, 1) OVER (PARTITION BY event_type
        |                                  ORDER BY wk), 6) AS wow_pct
        |FROM wk ORDER BY event_type, wk""".stripMargin,

    "q176_cumulative_distinct" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
        |fs AS (SELECT user_id, min(day) AS fd FROM ev GROUP BY 1),
        |np AS (SELECT fd AS day, count(*) AS new_users FROM fs GROUP BY 1),
        |days AS (SELECT DISTINCT day FROM ev)
        |SELECT days.day, coalesce(np.new_users, 0) AS new_users,
        |  CAST(sum(coalesce(np.new_users, 0)) OVER (
        |    ORDER BY days.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_users
        |FROM days LEFT JOIN np USING (day)
        |ORDER BY day""".stripMargin,

    "q135_rolling_dau" ->
      """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |            FROM events),
        |days AS (SELECT DISTINCT day AS d FROM ud),
        |dau AS (SELECT day AS d, count(DISTINCT user_id) AS dau
        |        FROM ud GROUP BY 1),
        |wau AS (SELECT days.d, count(DISTINCT ud.user_id) AS wau
        |        FROM days JOIN ud
        |          ON ud.day BETWEEN days.d - 6 AND days.d
        |        GROUP BY 1)
        |SELECT dau.d AS day, dau, wau,
        |  round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
        |FROM dau JOIN wau ON dau.d = wau.d ORDER BY day""".stripMargin,

    // the identical daily step table built in SQL, then holtBody
    // verbatim — the whole smoothing recursion is one shared string
    "q307_holt_forecast" ->
      s"""WITH RECURSIVE d0 AS (
         |  SELECT event_type AS et, CAST(ts AS DATE) AS day,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         |      AS yc
         |  FROM events GROUP BY 1, 2),
         |steps AS (
         |  SELECT et, day, yc,
         |    row_number() OVER (PARTITION BY et ORDER BY day) AS k
         |  FROM d0),
         |${holtBody("steps")}""".stripMargin,

    // the identical daily step table, then hwBody verbatim — the
    // whole triple-smoothing recursion is the shared string
    "q316_holt_winters" ->
      s"""WITH RECURSIVE d0 AS (
         |  SELECT event_type AS et, CAST(ts AS DATE) AS day,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         |      AS yc
         |  FROM events GROUP BY 1, 2),
         |steps AS (
         |  SELECT et, day, yc,
         |    row_number() OVER (PARTITION BY et ORDER BY day) AS k
         |  FROM d0),
         |${hwBody("steps")}""".stripMargin,

    // identical RLE reduction: runs via the same chg/run_id windows,
    // the same run-level leads, row_number after the pattern filter
    "q303_match_recognize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS c,
        |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id
        |                                    ORDER BY ts, event_id)
        |              = event_type
        |         THEN 0 ELSE 1 END AS chg
        |  FROM events),
        |r0 AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS run_id
        |  FROM e),
        |r1 AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, run_id
        |                               ORDER BY ts, event_id) AS rn_run
        |  FROM r0),
        |runs AS (
        |  SELECT user_id, run_id, max(event_type) AS typ, count(*) AS n,
        |    min(ts) AS t0, sum(c) AS csum,
        |    max(CASE WHEN rn_run = 1 THEN c END) AS c_first
        |  FROM r1 GROUP BY 1, 2),
        |m AS (
        |  SELECT user_id, run_id, typ, n, t0, csum,
        |    lead(typ, 1) OVER w AS t1, lead(typ, 2) OVER w AS t2,
        |    lead(n, 1) OVER w AS n_click,
        |    lead(csum, 1) OVER w AS click_csum,
        |    lead(t0, 2) OVER w AS p_ts,
        |    lead(c_first, 2) OVER w AS p_c
        |  FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY run_id))
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY run_id)
        |    AS match_no,
        |  t0 AS start_ts, p_ts AS purchase_ts, n AS n_view, n_click,
        |  round(CAST(csum + click_csum + p_c AS DOUBLE) / 100.0, 2)
        |    AS amount
        |FROM m
        |WHERE typ = 'view' AND t1 = 'click' AND t2 = 'purchase'
        |ORDER BY user_id, match_no""".stripMargin,

    "q191_path_trigrams" ->
      """WITH g AS (
        |  SELECT event_type,
        |    lag(event_type, 2) OVER (PARTITION BY user_id
        |                             ORDER BY ts, event_id) AS p1,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |                             ORDER BY ts, event_id) AS p2
        |  FROM events),
        |tri AS (SELECT p1 || '>' || p2 || '>' || event_type AS path,
        |          count(*) AS cnt
        |        FROM g WHERE p1 IS NOT NULL GROUP BY 1),
        |n AS (SELECT sum(cnt) AS n FROM tri)
        |SELECT path, cnt,
        |  round(CAST(cnt AS DOUBLE) / n.n, 6) AS share
        |FROM tri, n ORDER BY cnt DESC, path LIMIT 10""".stripMargin,

    "q130_session_paths" ->
      """WITH g AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events),
        |m AS (SELECT prev, event_type AS next, count(*) AS cnt
        |      FROM g WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev, next, cnt,
        |  round(CAST(cnt AS DOUBLE) /
        |        sum(cnt) OVER (PARTITION BY prev), 6) AS share
        |FROM m ORDER BY prev, next""".stripMargin,

    "q114_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY 1)
        |SELECT f.first_day AS cohort_day,
        |  CAST(floor(datediff('day', f.first_day, e.day) / 7) AS BIGINT)
        |    AS week_offset,
        |  count(DISTINCT e.user_id) AS users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, week_offset""".stripMargin,

    "q36_win_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS cnt
        |FROM events GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin,

    // Each event falls in exactly two 1h/30min sliding windows: the one
    // starting at its 30-min floor and the one 30 minutes earlier.
    "q37_win_sliding" ->
      """SELECT win_start, count(*) AS cnt FROM (
        |  SELECT unnest([
        |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
        |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000)
        |  ]) AS win_start
        |  FROM events)
        |GROUP BY win_start ORDER BY win_start""".stripMargin,

    // Gap-islands sessionization; Spark merges an event into the session
    // when its gap to the previous event is <= 30 min INCLUSIVE (verified
    // in CorrectnessSpec), so only a strictly greater gap opens a session.
    "q197_bounce_rate" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), se AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (SELECT min(ts) AS sess_start, count(*) AS cnt
        |         FROM se GROUP BY user_id, sid)
        |SELECT CAST((CAST(sess_start AS DATE) - DATE '1970-01-05') % 7
        |            AS BIGINT) AS dow,
        |  count(*) AS sessions,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS bounced,
        |  round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 6) AS bounce_rate
        |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin,

    "q38_win_session" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), se AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS sess_start, count(*) AS cnt,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |FROM se GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin,

    // identical gap-free windows and ×7-scale integer detrending;
    // per-weekday and grand means as exact sums + one rounded division
    "q337_stl_lite" ->
      """WITH cells AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |w AS (SELECT day, c,
        |    count(*) OVER w7 AS k,
        |    max(day) OVER w7 - min(day) OVER w7 AS span,
        |    sum(c) OVER w7 AS s7
        |  FROM cells
        |  WINDOW w7 AS (ORDER BY day
        |                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (SELECT
        |    CAST((day - DATE '1970-01-05') % 7 AS BIGINT) AS dow,
        |    7 * c - s7 AS det7
        |  FROM w WHERE k = 7 AND span = 6),
        |g AS (SELECT CAST(sum(CAST(det7 AS DECIMAL(38,0))) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE) AS g7 FROM det)
        |SELECT dow, count(*) AS n_days,
        |  round((CAST(sum(CAST(det7 AS DECIMAL(38,0))) AS DOUBLE) /
        |           CAST(count(*) AS DOUBLE) - g.g7) / 7.0, 6)
        |    AS seasonal_cents,
        |  round(sqrt(greatest(
        |      CAST(sum(CAST(det7 AS DECIMAL(38,0)) * det7) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE) -
        |      (CAST(sum(CAST(det7 AS DECIMAL(38,0))) AS DOUBLE) /
        |         CAST(count(*) AS DOUBLE)) *
        |      (CAST(sum(CAST(det7 AS DECIMAL(38,0))) AS DOUBLE) /
        |         CAST(count(*) AS DOUBLE)),
        |      0.0)) / 7.0, 6) AS resid_rms_cents
        |FROM det, g GROUP BY dow, g.g7 ORDER BY dow""".stripMargin,

    "q256_seasonal_index" ->
      """WITH cells AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |w AS (SELECT day, c,
        |    count(*) OVER w7 AS k,
        |    max(day) OVER w7 - min(day) OVER w7 AS span,
        |    sum(c) OVER w7 AS s7
        |  FROM cells
        |  WINDOW w7 AS (ORDER BY day
        |                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |r AS (SELECT
        |    CAST((day - DATE '1970-01-05') % 7 AS BIGINT) AS dow,
        |    CAST(round(CAST(c AS DOUBLE) * 7.0 / CAST(s7 AS DOUBLE), 6)
        |         AS DECIMAL(28,6)) AS ratio
        |  FROM w WHERE k = 7 AND span = 6)
        |SELECT dow, count(*) AS n_days,
        |  round(CAST(sum(ratio) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS seasonal_index
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q258_forecast_backtest" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS mxday FROM cells),
        |j AS (
        |  SELECT a.event_type, a.c, b.c AS f, abs(a.c - b.c) AS ae
        |  FROM cells a
        |  JOIN cells b ON a.event_type = b.event_type
        |               AND a.day = b.day + 7
        |  CROSS JOIN mx
        |  WHERE a.day > mx.mxday - 14)
        |SELECT event_type, count(*) AS n_days,
        |  CAST(sum(ae) AS BIGINT) AS abs_err_total,
        |  round(CAST(sum(ae) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS mae,
        |  round(CAST(sum(CAST(round(CAST(ae AS DOUBLE) /
        |                            CAST(c AS DOUBLE), 6)
        |                      AS DECIMAL(28,6))) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE), 6) AS mape,
        |  round(CAST(sum(CAST(round(CAST(ae AS DOUBLE) * 2.0 /
        |                            (CAST(c AS DOUBLE) +
        |                             CAST(f AS DOUBLE)), 6)
        |                      AS DECIMAL(28,6))) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE), 6) AS smape
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // same cleared-denominator integer estimator, HUGEINT folds
    "q291_acf" -> {
      val leads = (1 to 7).map(k =>
        s"CAST(lead(y, $k) OVER (ORDER BY day) AS HUGEINT) AS l$k")
        .mkString(",\n        |    ")
      val aggs = (1 to 7).map(k =>
        s"""sum(y * l$k) AS p$k,
           |    sum(CASE WHEN l$k IS NOT NULL THEN y END) AS a$k,
           |    sum(l$k) AS b$k""".stripMargin).mkString(",\n    ")
      val branches = (1 to 7).map(k =>
        s"SELECT $k AS lag, CAST(n - $k AS BIGINT) AS n_pairs, " +
        s"p$k AS p, a$k AS a, b$k AS b, n, s, q FROM ag")
        .mkString("\n  UNION ALL ")
      s"""WITH cells AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
         |  FROM orders GROUP BY 1),
         |led AS (
         |  SELECT CAST(y AS HUGEINT) AS y,
         |    $leads
         |  FROM cells),
         |ag AS (
         |  SELECT count(*) AS n, sum(y) AS s, sum(y * y) AS q,
         |    $aggs
         |  FROM led),
         |u AS (
         |  $branches)
         |SELECT lag, n_pairs,
         |  round(CAST(CAST(n AS HUGEINT) * n * p -
         |             CAST(n AS HUGEINT) * s * (a + b) +
         |             (n - lag) * s * s AS DOUBLE) /
         |        CAST(CAST(n AS HUGEINT) *
         |             (CAST(n AS HUGEINT) * q - s * s) AS DOUBLE), 6)
         |    AS acf
         |FROM u ORDER BY lag""".stripMargin
    },

    "q292_theil_sen" ->
      """WITH cells AS (
        |  SELECT CAST(datediff('day', DATE '1995-01-01',
        |                       CAST(o_orderdate AS DATE)) AS BIGINT)
        |    AS d,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
        |  FROM orders GROUP BY 1),
        |sl AS (
        |  SELECT a.d AS di, b.d AS dj,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS sl
        |  FROM cells a JOIN cells b ON a.d < b.d),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY sl, di, dj) AS rn,
        |    count(*) OVER () AS m
        |  FROM sl),
        |med AS (
        |  SELECT CAST(m AS BIGINT) AS n_pairs,
        |    round(sl / 100.0, 6) AS ts_slope
        |  FROM r WHERE rn = (m + 1) // 2),
        |ols AS (
        |  SELECT count(*) AS n, sum(CAST(d AS HUGEINT)) AS sx,
        |    sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(d AS HUGEINT) * d) AS sxx,
        |    sum(CAST(d AS HUGEINT) * y) AS sxy
        |  FROM cells)
        |SELECT CAST(n AS BIGINT) AS n_days, n_pairs, ts_slope,
        |  round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
        |        CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) /
        |        100.0, 6) AS ols_slope
        |FROM med, ols""".stripMargin,

    // plain two-table formulation: per-user per-type envelopes, pair
    // supported iff min(a) < max(b); denominator = distinct users
    // (identical to the marker-pair count — every user with an event
    // contributes exactly one marker)
    "q277_seq_2patterns" ->
      """WITH ut AS (
        |  SELECT user_id, event_type, min(ts) AS mn, max(ts) AS mx
        |  FROM events GROUP BY 1, 2),
        |pr AS (
        |  SELECT a.event_type AS first_type, b.event_type AS then_type
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.mn < b.mx),
        |cnt AS (
        |  SELECT first_type, then_type, count(*) AS support
        |  FROM pr GROUP BY 1, 2),
        |tot AS (SELECT count(DISTINCT user_id) AS tot FROM events)
        |SELECT first_type, then_type, support,
        |  round(CAST(support AS DOUBLE) / CAST(tot AS DOUBLE), 6)
        |    AS user_share
        |FROM cnt, tot ORDER BY 1, 2""".stripMargin
  )
}
