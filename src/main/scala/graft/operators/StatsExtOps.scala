package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical / analytical screens over the fact tables (SURVEY.md §2,
  * added r10): sweep-line concurrency, a single-pass correlation matrix,
  * an exact two-sample Kolmogorov–Smirnov distance, per-slice token
  * entropy, weighted reservoir sampling, and an exact chi-squared
  * independence screen. The family's shared discipline is q118's: keep
  * every aggregate EXACT (integer/decimal moments, denominators cleared)
  * for as long as possible and drop to double only for the final,
  * deterministically-ordered formula rounded to 6 dp — so statistical
  * outputs stay hash-checkable cross-engine.
  */
object StatsExtOps extends OpModule {

  /** q312's shared final chains over the 1-row stat table
    * (k, n, s = Σ⌊R_i²/n_i·1e6⌉, tt = Σ(t³−t)): identical text
    * selectExpr'd in Spark and interpolated into the oracle. */
  private object KwSolve {
    // per-group term R_i²/n_i = (2R_i)²/(4n_i), floor-quantized at
    // 1e-6 so the k-row sum is an order-free exact decimal
    val termExpr: String =
      "CAST(floor(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / 4e0 / " +
        "CAST(ni AS DOUBLE) * 1e6 + 5e-1) AS DECIMAL(38,0))"
    private val hRaw: String =
      "12e0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1e0)) * " +
        "(CAST(s AS DOUBLE) / 1e6) - 3e0 * (CAST(n AS DOUBLE) + 1e0)"
    private val tieCorr: String =
      "1e0 - CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE) * " +
        "CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))"
    val hExprs: Seq[String] = Seq(
      "CAST(k AS BIGINT) AS k_groups",
      "CAST(n AS BIGINT) AS n_total",
      s"round($hRaw, 6) AS h",
      s"round(($hRaw) / ($tieCorr), 6) AS h_corrected")
    val epsExpr: String =
      "round((h_corrected - CAST(k_groups AS DOUBLE) + 1e0) / " +
        "(CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE)), 6) " +
        "AS epsilon_sq"
  }

  /** Pearson r from exact moment sums, computed in double with a fixed
    * operand order (the oracle spells the identical order): given exact
    * inputs, each IEEE op is deterministic, so both engines produce the
    * same double before the 6 dp round. */
  private[operators] def corrOf(n: Column, sx: Column, sy: Column,
                                sxx: Column, syy: Column, sxy: Column): Column = {
    def d(c: Column) = c.cast("double")
    round((d(n) * d(sxy) - d(sx) * d(sy)) /
            sqrt((d(n) * d(sxx) - d(sx) * d(sx)) *
                 (d(n) * d(syy) - d(sy) * d(sy))), 6)
  }

  /** Per-supplier era revenue pair (va = cents shipped before 1998,
    * vb = after) shared by the rank-correlation pair q232 (Kendall) and
    * q249 (Spearman): ONE definition of the ranked universe is what
    * makes the two statistics comparable. One lineitem scan, pinned —
    * both consumers run window/pairwise stages on the SUPPLIER
    * aggregate, never the fact lineage. */
  private def supplierEraRev(s: SparkSession, d: String): DataFrame = {
    val rev = Tables(s, d, "lineitem")
      .select(col("l_suppkey").as("sk"), col("l_shipdate"),
              round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy("sk")
      .agg(sum(when(col("l_shipdate") < lit("1998-01-01").cast("timestamp"),
                    col("cents")).otherwise(0L).cast("decimal(38,0)"))
             .cast("long").as("va"),
           sum(when(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"),
                    col("cents")).otherwise(0L).cast("decimal(38,0)"))
             .cast("long").as("vb"))
    // pinBounded: one row per SUPPLIER (a dimension table — 1 000 rows
    // at sf0.1, sub-linear growth by the testdata contract), never
    // fact-scaled; the tag is what lets q232/q249's global rank
    // windows ride this pin past WindowBoundednessSpec
    val (r, h) = org.apache.spark.sql.graft.InternalPin.pinBounded(
      rev.select(col("sk"), col("va"), col("vb")))
    h.count(); graft.PinScope.retain(h)
    r
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Winsorized mean (added r12) — the robust location estimate a
    // metrics pipeline reports when q148's MAD screen says the tail is
    // contaminated: clamp each type's values into its own exact
    // [p5, p95] band, then average — outliers pull the band edge, not
    // the mean. Percentiles are the q190/q151 value-group discipline
    // (lower percentile via cum·100 ≥ n·p, cleared denominators); the
    // clamped SUM stays integer (Σ cnt·clamp(v) over value groups,
    // map-side combinable) and divides once into a rounded double.
    // One fact scan → (type, cents, count); the band table is
    // |types| rows and broadcasts back onto the value groups.
    "q192_winsorized_mean" -> { (s, d) =>
      val vg = Tables(s, d, "events")
        .select(col("event_type"),
                round(col("value") * 100).cast("long").as("v"))
        .groupBy("event_type", "v").agg(count(lit(1)).as("cnt"))
      val wT = Window.partitionBy("event_type")
      val wC = Window.partitionBy("event_type").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bands = vg
        .withColumn("cum", sum(col("cnt")).over(wC))
        .withColumn("n", sum(col("cnt")).over(wT))
        .groupBy("event_type")
        .agg(min(when(col("cum") * 100 >= col("n") * 5, col("v")))
               .as("p5"),
             min(when(col("cum") * 100 >= col("n") * 95, col("v")))
               .as("p95"),
             min(col("n")).as("n"))
      vg.join(broadcast(bands), Seq("event_type"))
        .groupBy("event_type")
        .agg(min(col("p5")).as("p5_cents"),
             min(col("p95")).as("p95_cents"),
             min(col("n")).as("n"),
             sum(col("cnt") *
                 least(greatest(col("v"), col("p5")), col("p95")))
               .as("clamped_sum"))
        .select(col("event_type"), col("p5_cents"), col("p95_cents"),
                col("n"),
                round(col("clamped_sum").cast("double") / col("n") / 100,
                      6).as("winsorized_mean"))
        .orderBy("event_type")
    },

    // Key-skew report (added r12) — the diagnostic that DECIDES
    // between the mitigation pair q60 (manual salt) and q162 (AQE
    // split): for each join key a pipeline is about to shuffle on,
    // the per-key row-count distribution — key count, max, mean,
    // exact p99 and the skew factor max/mean (cleared to the integer
    // comparison max·keys vs rows before the one rounded division).
    // Two-level reduction keeps it domain-bound: (key → cnt) is one
    // shuffle, then the COUNT-OF-COUNTS (cnt → freq) collapses to at
    // most |distinct counts| rows, and the p99 comes from the q190
    // cumulative discipline over that tiny table. Run here for the
    // two fact keys the suite actually joins on, union-tagged.
    "q193_key_skew" -> { (s, d) =>
      def report(df: DataFrame, key: String, tag: String): DataFrame = {
        val kc = df.groupBy(col(key).as("k"))
          .agg(count(lit(1)).as("cnt"))
        val cc = kc.groupBy("cnt").agg(count(lit(1)).as("freq"))
        val wC = Window.orderBy("cnt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(lit(0))
        cc.withColumn("cum", sum(col("freq")).over(wC))
          .withColumn("keys", sum(col("freq")).over(wAll))
          .withColumn("rows_", sum(col("cnt") * col("freq")).over(wAll))
          .groupBy(lit(tag).as("join_key"))
          .agg(min(col("keys")).as("n_keys"),
               min(col("rows_")).as("n_rows"),
               max(col("cnt")).as("max_per_key"),
               min(when(col("cum") * 100 >= col("keys") * 99, col("cnt")))
                 .as("p99_per_key"))
          .select(col("join_key"), col("n_keys"), col("n_rows"),
                  col("max_per_key"), col("p99_per_key"),
                  round(col("max_per_key").cast("double") *
                        col("n_keys") / col("n_rows"), 6)
                    .as("skew_factor"))
      }
      report(Tables(s, d, "lineitem"), "l_orderkey", "lineitem.l_orderkey")
        .unionByName(report(Tables(s, d, "orders"), "o_custkey",
                            "orders.o_custkey"))
        .unionByName(report(Tables(s, d, "events"), "user_id",
                            "events.user_id"))
        .orderBy("join_key")
    },

    // Join-size prediction report (added r12) — q193 prices a single
    // table's key skew; this prices the JOIN ITSELF before anyone runs
    // it: for each candidate equi-join, the EXACT output cardinality
    // Σ_k ca(k)·cb(k) plus its worst single-key term max ca·cb,
    // computed from the two per-key count tables alone — |keys|-bound
    // work, never the joined volume. This is the statistics tier a
    // cost-based planner (q165) consults, made a first-class audited
    // report: "this join emits 61× its probe side, and one key carries
    // X rows of that" is knowable for the cost of two count aggs and a
    // key-table join. The count-table join inherits both groupBys'
    // partitioning on k (no extra exchange), and the rollup is 1 row
    // per candidate.
    "q215_join_size_report" -> { (s, d) =>
      def report(name: String, lhs: DataFrame, rhs: DataFrame)
          : DataFrame = {
        val ca = lhs.groupBy("k").agg(count(lit(1)).as("ca"))
        val cb = rhs.groupBy("k").agg(count(lit(1)).as("cb"))
        ca.join(cb, Seq("k"))
          .agg(count(lit(1)).as("shared_keys"),
               sum(col("ca") * col("cb")).as("predicted_rows"),
               max(col("ca") * col("cb")).as("max_key_rows"))
          .crossJoin(lhs.agg(count(lit(1)).as("lhs_rows")))
          .crossJoin(rhs.agg(count(lit(1)).as("rhs_rows")))
          .select(lit(name).as("join_name"), col("lhs_rows"),
                  col("rhs_rows"), col("shared_keys"),
                  col("predicted_rows"), col("max_key_rows"))
      }
      report("customer_orders",
             Tables(s, d, "customer").select(col("c_custkey").as("k")),
             Tables(s, d, "orders").select(col("o_custkey").as("k")))
        .unionByName(report("events_self_user",
          Tables(s, d, "events").select(col("user_id").as("k")),
          Tables(s, d, "events").select(col("user_id").as("k"))))
        .unionByName(report("orders_lineitem",
          Tables(s, d, "orders").select(col("o_orderkey").as("k")),
          Tables(s, d, "lineitem").select(col("l_orderkey").as("k"))))
        .orderBy("join_name")
    },

    // PK-certified join-size shortcut (added r12) — closes q215's
    // documented planner gap: when the build side's key is AUDITED
    // unique (q203's FD check — count == distinct count, never an
    // assumed constraint), every ca(k) ≡ 1 and the Σ ca·cb prediction
    // degenerates to a SEMI-JOIN over the probe's count table — the
    // 100× q215 capture showed exactly what that saves (the 15 M ⋈
    // 15 M key-count join that spilled is skipped entirely; the
    // shortcut touches |probe keys| rows once). The audit result is a
    // 1-row scalar (bounded driver traffic, the PartitionedOps
    // precedent) and the operator BRANCHES on it: certified → semi
    // path, not certified → q215's general term join, so it never
    // assumes key-ness it hasn't proven. Both paths provably emit the
    // same numbers when PK holds — the oracle states the general
    // formula once and the spec asserts the equivalence directly.
    "q245_join_size_pk" -> { (s, d) =>
      def report(name: String, lhs: DataFrame, rhs: DataFrame)
          : DataFrame = {
        val a = lhs.agg(count(lit(1)).as("n"),
                        countDistinct("k").as("nk")).head()
        val (lhsRows, pk) = (a.getLong(0), a.getLong(0) == a.getLong(1))
        val cb = rhs.groupBy("k").agg(count(lit(1)).as("cb"))
        val core =
          if (pk)
            cb.join(lhs.select("k"), Seq("k"), "left_semi")
              .agg(count(lit(1)).as("shared_keys"),
                   sum(col("cb")).cast("long").as("predicted_rows"),
                   max(col("cb")).as("max_key_rows"))
          else {
            val ca = lhs.groupBy("k").agg(count(lit(1)).as("ca"))
            ca.join(cb, Seq("k"))
              .agg(count(lit(1)).as("shared_keys"),
                   sum(col("ca") * col("cb")).cast("long")
                     .as("predicted_rows"),
                   max(col("ca") * col("cb")).as("max_key_rows"))
          }
        core.crossJoin(rhs.agg(count(lit(1)).as("rhs_rows")))
          .select(lit(name).as("join_name"), lit(lhsRows).as("lhs_rows"),
                  col("rhs_rows"), lit(if (pk) 1L else 0L)
                    .as("pk_certified"),
                  col("shared_keys"), col("predicted_rows"),
                  col("max_key_rows"))
      }
      report("customer_orders",
             Tables(s, d, "customer").select(col("c_custkey").as("k")),
             Tables(s, d, "orders").select(col("o_custkey").as("k")))
        .unionByName(report("events_self_user",
          Tables(s, d, "events").select(col("user_id").as("k")),
          Tables(s, d, "events").select(col("user_id").as("k"))))
        .orderBy("join_name")
    },

    // Sweep-line max concurrency (added r10) — the capacity-planning
    // staple: each event holds a resource for 30 minutes; per
    // event_type, the peak number of simultaneously-open holds and
    // when it is first reached. Classic interval stabbing made
    // relational: every interval emits a +1 at its start and a −1 at
    // its (half-open) end, boundaries collapse to per-instant NET
    // deltas, and a running sum over time is the live count. With
    // half-open intervals, ends at an instant retire before starts
    // admit, so the running value only ever DIPS inside an instant
    // and the per-row maximum equals the per-instant maximum — the
    // oracle's per-instant netting and this per-row sweep provably
    // agree. Scale shape: ONE scan (boundaries come from an exploded
    // 2-struct array, not a self-union), ONE shuffle — the running
    // sum and the peak are stacked windows on the same (event_type)
    // partitioning and the final per-type agg reuses it (q113's
    // trick; plan-asserted). No self-join, no range join: O(n log n)
    // by sort, the optimal sweep. Within an instant all deltas of a
    // kind are equal, so the multiset of running values is
    // order-independent and the (max, first-peak-time) pair is
    // deterministic.
    "q139_max_concurrency" -> { (s, d) =>
      val bounds = Tables(s, d, "events")
        .select(col("event_type"), explode(array(
          struct(col("ts").as("t"), lit(1L).as("delta")),
          struct((col("ts") + expr("INTERVAL 30 MINUTES")).as("t"),
                 lit(-1L).as("delta")))).as("x"))
        .select(col("event_type"), col("x.t").as("t"),
                col("x.delta").as("delta"))
      val wRun = Window.partitionBy("event_type")
        .orderBy(col("t"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("event_type")
      bounds
        .withColumn("cur", sum(col("delta")).over(wRun))
        .withColumn("mx", max(col("cur")).over(wAll))
        .where(col("cur") === col("mx"))
        .groupBy("event_type")
        .agg(max(col("cur")).as("max_concurrent"),
             min(col("t")).as("peak_start"))
        .orderBy("event_type")
    },

    // Single-pass correlation matrix (added r10) — the feature-audit
    // companion to q86's profiler: Pearson r for every pair of the
    // four lineitem measures, from ONE scan. Each measure is made an
    // exact integer (cents: round(x·100), the q118 trick), so the 15
    // moment sums (4 sums, 4 sum-of-squares, 6 cross-products, count)
    // are EXACT decimal(38,0) accumulations — commutative, partial-agg
    // safe — and the whole matrix is one map-side-combined aggregate
    // producing a single row; r itself is then a fixed-order double
    // formula per pair ([[corrOf]]). At 100 TB this is the only shape
    // that works: no per-pair rescans (a naive corr(x,y) loop reads
    // the table 6×), no Welford state ordering issues — moments
    // commute, the optimizer combines partials, and the result is a
    // 6-row broadcast. Exact while a cross-product sum < 1e38
    // (n·(1e7)² < 1e38 ⟺ n < 1e24 rows — never binding).
    "q140_corr_matrix" -> { (s, d) =>
      def cents(c: String) = round(col(c) * 100).cast("long")
      def sq(a: Column, b: Column) =
        sum((a * b).cast("decimal(38,0)"))
      val v = Tables(s, d, "lineitem").select(
        cents("l_quantity").as("q"), cents("l_extendedprice").as("e"),
        cents("l_discount").as("dd"), cents("l_tax").as("t"))
      val m = v.agg(
        count(lit(1)).as("n"),
        sum(col("q").cast("decimal(38,0)")).as("sq"),
        sum(col("e").cast("decimal(38,0)")).as("se"),
        sum(col("dd").cast("decimal(38,0)")).as("sd"),
        sum(col("t").cast("decimal(38,0)")).as("st"),
        sq(col("q"), col("q")).as("sqq"), sq(col("e"), col("e")).as("see"),
        sq(col("dd"), col("dd")).as("sdd"), sq(col("t"), col("t")).as("stt"),
        sq(col("q"), col("e")).as("sqe"), sq(col("q"), col("dd")).as("sqd"),
        sq(col("q"), col("t")).as("sqt"), sq(col("e"), col("dd")).as("sed"),
        sq(col("e"), col("t")).as("set"), sq(col("dd"), col("t")).as("sdt"))
      def pair(nm: String, sx: String, sy: String, sxx: String,
               syy: String, sxy: String) =
        struct(lit(nm).as("pair"),
               corrOf(col("n"), col(sx), col(sy), col(sxx), col(syy),
                      col(sxy)).as("corr_r"))
      m.select(explode(array(
          pair("q_e", "sq", "se", "sqq", "see", "sqe"),
          pair("q_d", "sq", "sd", "sqq", "sdd", "sqd"),
          pair("q_t", "sq", "st", "sqq", "stt", "sqt"),
          pair("e_d", "se", "sd", "see", "sdd", "sed"),
          pair("e_t", "se", "st", "see", "stt", "set"),
          pair("d_t", "sd", "st", "sdd", "stt", "sdt"))).as("p"))
        .select(col("p.pair").as("pair"), col("p.corr_r").as("corr_r"))
        .orderBy("pair")
    },

    // Exact two-sample Kolmogorov–Smirnov distance (added r10) — the
    // drift detector: are URGENT and LOW order totals drawn from the
    // same distribution? D = max over observed values of
    // |F1(v) − F2(v)|, made EXACT by clearing denominators:
    // D·n1·n2 = max |cum1·n2 − cum2·n1| over integer cumulative
    // counts — a BIGINT, hash-checkable, no float CDFs (q118's
    // discipline applied to a two-sample test). Scale shape: the
    // cumulative counts are a DISTRIBUTED prefix sum — per-value
    // counts bucket by a min/max-derived range key (64 buckets),
    // per-bucket totals (64 rows) turn into exclusive prefix offsets
    // with one tiny window, and each bucket's interior cumsum runs
    // under partitionBy(bucket) in parallel; a global orderBy window
    // would funnel every distinct value through ONE reducer. Exact
    // while D·n1·n2 < 2^63 (n ≈ 3e9 per side) — beyond that the
    // numerator column widens to decimal, same plan.
    "q141_ks_test" -> { (s, d) =>
      val o = Tables(s, d, "orders")
        .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(round(col("o_totalprice") * 100).cast("long").as("v"),
                when(col("o_orderpriority") === "1-URGENT", 1L)
                  .otherwise(0L).as("in1"))
      val pv = o.groupBy("v")
        .agg(sum("in1").as("c1"), sum(lit(1L) - col("in1")).as("c2"))
      val rng = pv.agg(min("v").as("vmin"), max("v").as("vmax"))
      val bucketed = pv.crossJoin(broadcast(rng))
        .withColumn("b", expr("((v - vmin) * 64) div (vmax - vmin + 1)"))
      val bt = bucketed.groupBy("b")
        .agg(sum("c1").as("t1"), sum("c2").as("t2"))
      val wOff = Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1) // 64 rows: tiny
      val off = bt.select(col("b"),
        coalesce(sum("t1").over(wOff), lit(0L)).as("o1"),
        coalesce(sum("t2").over(wOff), lit(0L)).as("o2"))
      val wIn = Window.partitionBy("b").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = pv.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      bucketed.join(broadcast(off), Seq("b"))
        .withColumn("cum1", col("o1") + sum("c1").over(wIn))
        .withColumn("cum2", col("o2") + sum("c2").over(wIn))
        .crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"),
                abs(col("cum1").cast("decimal(38,0)") * col("n2") -
                    col("cum2").cast("decimal(38,0)") * col("n1")).as("dd"))
        .groupBy("n1", "n2").agg(max("dd").as("dmax"))
        .select(col("n1"), col("n2"),
                col("dmax").cast("long").as("d_num"),
                round(col("dmax").cast("double") /
                      (col("n1").cast("double") * col("n2").cast("double")),
                      6).as("ks_stat"))
    },

    // Per-language token entropy (added r10) — the corpus-diversity
    // diagnostic behind training-data mixing: Shannon entropy of each
    // language slice's token distribution (high = diverse text, low =
    // boilerplate/repetition) plus vocabulary size. H = ln n −
    // (Σ c·ln c)/n over per-(lang, token) counts c. The inner sum is
    // a DOUBLE sum, whose value would depend on partial-agg order —
    // so each term is rounded to 6 dp and accumulated as an exact
    // decimal (order-independent, mergeable), and only the final
    // formula divides and rounds: the q118 exactness discipline
    // applied to a logarithmic statistic. Scale shape: explode to
    // (lang, token) pairs, two-level hash agg (token counts, then
    // per-lang rollup) — the q50/q94 token pipeline with one extra
    // tiny agg; no windows, no joins.
    "q142_token_entropy" -> { (s, d) =>
      val tc = Tables(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      tc.groupBy("lang").agg(
          sum("c").as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(round(col("c").cast("double") * log(col("c").cast("double")),
                    6).cast("decimal(28,6)")).as("s"))
        .select(col("lang"), col("n_tokens"), col("vocab"),
                round(log(col("n_tokens").cast("double")) -
                      col("s").cast("double") /
                      col("n_tokens").cast("double"), 6).as("entropy_nats"))
        .orderBy("lang")
    },

    // Weighted reservoir sample (added r10) — Efraimidis–Spirtakis
    // A-ES: a length-weighted top-k per language (docs sampled
    // ∝ n_chars, the token-budget-proportional draw a mixing job
    // wants), with q67's no-RNG discipline: u ∈ (0,1) derives from
    // md5(doc_id) (stable under reshuffles/re-runs), and the A-ES key
    // u^(1/w) is ranked via the monotone-equivalent ln(u)/w — one ln
    // instead of a pow. The key is rounded to 6 dp BEFORE ranking
    // with doc_id as tie-break (q94's discipline), so the order is
    // engine-identical. Scale shape: pure map + per-lang top-20 —
    // the rank-filter pattern InferWindowGroupLimit rewrites to a
    // map-side WindowGroupLimit, so only ≤ 20 rows per lang per
    // partition ever shuffle (plan-asserted); A-ES keys are also
    // exactly the mergeable min-k summary q92's MinKByKeyAgg
    // implements if an aggregator shape is preferred.
    "q143_weighted_sample" -> { (s, d) =>
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8),
                    16, 10).cast("double") + 1.0) / 4294967297.0
      val keyed = Tables(s, d, "documents")
        .select(col("lang"), col("doc_id"), col("source"), col("n_chars"),
                round(log(u) / col("n_chars").cast("double"), 6)
                  .as("es_key"))
      keyed
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang")
            .orderBy(col("es_key").desc, col("doc_id"))))
        .where(col("rk") <= 20)
        .select(col("lang"), col("rk").cast("long").as("rk"),
                col("doc_id"), col("source"), col("n_chars"), col("es_key"))
        .orderBy("lang", "rk")
    },

    // Population Stability Index (added r10) — the ML-monitoring
    // drift metric (the production sibling of q141's KS): PSI =
    // Σ_bins (p_i − q_i)·ln(p_i/q_i) between the weekday and weekend
    // value distributions, over 10 equal-width bins from a broadcast
    // min/max. Laplace-smoothed shares ((c+1)/(n+10)) keep ln finite
    // on one-sided bins with pure integer+1 arithmetic — no epsilon
    // constants to mismatch across engines; bins empty on BOTH sides
    // produce no row (and under smoothing would contribute the same
    // near-zero term to either engine identically — the declared
    // semantic is over observed bins). Each bin term rounds to 6 dp
    // and the PSI total is an exact decimal sum of the rounded terms
    // (q142's order-safe discipline). Scale shape: ONE scan to a
    // ≤ 10-row cell table; totals and the PSI sum are windows over
    // the cells, never a fact rescan (q144's shape).
    "q145_psi_drift" -> { (s, d) =>
      val ev = Tables(s, d, "events")
        .select(col("value"),
                ((datediff(to_date(col("ts")),
                           to_date(lit("1970-01-05"))) % 7) < 5)
                  .cast("long").as("is_wk"))
      val rng = ev.agg(min("value").as("vmin"), max("value").as("vmax"))
      val wAll = Window.partitionBy(lit(0))
      ev.crossJoin(broadcast(rng))
        .select(least(lit(9L), floor((col("value") - col("vmin")) * 10.0 /
                                     (col("vmax") - col("vmin"))))
                  .as("bin"),
                col("is_wk"))
        .groupBy("bin")
        .agg(sum(col("is_wk")).as("a"),
             sum(lit(1L) - col("is_wk")).as("b"))
        .withColumn("na", sum("a").over(wAll))
        .withColumn("nb", sum("b").over(wAll))
        .withColumn("pa", (col("a") + 1).cast("double") /
                          (col("na") + 10).cast("double"))
        .withColumn("pb", (col("b") + 1).cast("double") /
                          (col("nb") + 10).cast("double"))
        .withColumn("term",
          round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6))
        .withColumn("psi", sum(col("term").cast("decimal(18,6)"))
          .over(wAll).cast("double"))
        .select(col("bin"), col("a"), col("b"), col("term"), col("psi"))
        .orderBy("bin")
    },

    // Distributed Gini coefficient (added r10) — the concentration
    // screen: how unequal are order totals within each priority tier?
    // G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) needs every row's RANK —
    // the one statistic here that looks like it demands a per-group
    // global sort (one reducer per group). Instead, ranks come from
    // q141's bucketed prefix sum, and a VALUE GROUP (v, count c,
    // exclusive rank r) contributes v·(c·r + c·(c+1)/2) — consecutive
    // ranks collapse in closed form, so Σ i·x is an exact decimal
    // aggregation over per-value rows with no row-level rank ever
    // materialized. Ties are rank-order independent (equal values,
    // any permutation of their ranks gives the same Σ i·x), so the
    // oracle's plain row_number formulation provably agrees.
    // Interior cumsums run partitionBy(prio, bucket) in parallel
    // (plan-asserted). Exact while v·n² < 1e38.
    "q146_gini" -> { (s, d) =>
      val pv = Tables(s, d, "orders")
        .select(col("o_orderpriority").as("prio"),
                round(col("o_totalprice") * 100).cast("long").as("v"))
        .groupBy("prio", "v").agg(count(lit(1)).as("c"))
      val rng = pv.groupBy("prio")
        .agg(min("v").as("vmin"), max("v").as("vmax"))
      val bucketed = pv.join(broadcast(rng), Seq("prio"))
        .withColumn("b", expr("((v - vmin) * 64) div (vmax - vmin + 1)"))
      val wOff = Window.partitionBy("prio").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = bucketed.groupBy("prio", "b").agg(sum("c").as("t"))
        .select(col("prio"), col("b"),
                coalesce(sum("t").over(wOff), lit(0L)).as("boff"))
      val wIn = Window.partitionBy("prio", "b").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      bucketed.join(broadcast(off), Seq("prio", "b"))
        .withColumn("r", col("boff") +
                         coalesce(sum("c").over(wIn), lit(0L)))
        .select(col("prio"), col("c"),
                (col("v").cast("decimal(38,0)") * col("c")).as("vc"),
                (col("v").cast("decimal(38,0)") *
                 (col("c").cast("decimal(38,0)") * col("r") +
                  expr("c * (c + 1) div 2"))).as("ix"))
        .groupBy("prio")
        .agg(sum("c").as("n"), sum("vc").as("sx"), sum("ix").as("six"))
        .select(col("prio"), col("n"),
                round((lit(2.0) * col("six").cast("double") -
                       (col("n").cast("double") + 1.0) *
                       col("sx").cast("double")) /
                      (col("n").cast("double") * col("sx").cast("double")),
                      6).as("gini"))
        .orderBy("prio")
    },

    // Exact chi-squared independence screen (added r10) — the DQ
    // forensic between q137's Benford audit and q116's rule gate: is
    // event_type independent of day-of-week? Per-cell deviation made
    // EXACT by clearing denominators — (O·N − R·C)² over decimal
    // integers (q118's squared-inequality trick as a reported
    // statistic, not a filter); the reported χ² contribution divides
    // once in double and rounds to 6 dp, and the total is an exact
    // decimal sum of the rounded cells (order-independent). Weekday
    // is days-since-a-known-Monday mod 7 — portable integer
    // arithmetic, immune to the Spark-vs-DuckDB dow() convention
    // split. Scale shape: one scan to a (type, dow) hash agg —
    // AT MOST types×7 cells regardless of corpus size — then row,
    // column and grand totals come from windows OVER THE CELL TABLE
    // (35 rows; never a fact rescan). Exact while (O·N − R·C)² <
    // 1e38, i.e. N ≲ 3e9 events; beyond that the cell counts
    // pre-scale (the statistic is invariant under uniform count
    // scaling) or the decimals widen.
    "q144_chi2_independence" -> { (s, d) =>
      val cells = Tables(s, d, "events")
        .select(col("event_type"),
                (datediff(to_date(col("ts")),
                          to_date(lit("1970-01-05"))) % 7)
                  .cast("long").as("dow"))
        .groupBy("event_type", "dow").agg(count(lit(1)).as("obs"))
      val dev = (col("obs").cast("decimal(38,0)") * col("n") -
                 col("r").cast("decimal(38,0)") * col("cc"))
      cells
        .withColumn("r", sum("obs").over(Window.partitionBy("event_type")))
        .withColumn("cc", sum("obs").over(Window.partitionBy("dow")))
        .withColumn("n", sum("obs").over(Window.partitionBy(lit(0))))
        .withColumn("cell_chi2",
          round((dev * dev).cast("double") /
                (col("r").cast("double") * col("cc").cast("double") *
                 col("n").cast("double")), 6))
        .withColumn("chi2_total",
          sum(col("cell_chi2").cast("decimal(18,6)"))
            .over(Window.partitionBy(lit(0))).cast("double"))
        .select(col("event_type"), col("dow"), col("obs"),
                col("cell_chi2"), col("chi2_total"))
        .orderBy("event_type", "dow")
    },

    // Interval UNION length (added r12) — q139's sweep line answers "how
    // many holds at once"; this answers the dual billing/utilization
    // question "how long was the user covered at all": per user, the
    // length of the union of the 30-minute holds, plus the count of
    // merged contiguous blocks. Exact integer microseconds, one window:
    // sorted by start within user, each interval contributes
    // max(0, end − max(start, max-prev-end)) — overlap is clipped by the
    // running max of earlier ends, so overlapping holds never double
    // count and a block starts exactly where the running max can't reach.
    // One shuffle on user_id, windows parallel across users; skew bound
    // is a single user's event count (same bound q80's sessionizer
    // already accepts).
    "q172_interval_union" -> { (s, d) =>
      val iv = Tables(s, d, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("st"))
        .withColumn("en", col("st") + lit(1800L * 1000000L))
      val wPrev = Window.partitionBy("user_id").orderBy("st", "en")
        .rowsBetween(Window.unboundedPreceding, -1)
      iv.withColumn("pmax", max(col("en")).over(wPrev))
        .withColumn("cov",
          greatest(lit(0L), col("en") -
            greatest(col("st"), coalesce(col("pmax"), col("st")))))
        .withColumn("blk",
          when(col("pmax").isNull || col("pmax") < col("st"), 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_holds"), sum("blk").as("blocks"),
             sum("cov").as("covered_us"))
        .orderBy("user_id")
    },

    // Mutual information screen (added r12) — the dependence measure a
    // feature-selection / drift pipeline wants when chi² (q144) says
    // "dependent" and the next question is "by how many bits": MI
    // between event type and the props payload bucket, plus both
    // marginal entropies and the normalized MI /= sqrt(Hx·Hy). The
    // q142 log discipline makes it hash-checkable: every per-cell term
    // c·ln(N·c/(cx·cy)) is rounded to 6 dp BEFORE the decimal sum
    // (order-free), margins are window sums over the types×buckets
    // cell table (≤ 50 rows — never a second fact scan), and each
    // final statistic is one fixed-order double formula rounded 6 dp.
    // Scale shape: ONE fact scan into a map-side-combined cell agg;
    // everything downstream is cell-table algebra.
    "q231_mutual_info" -> { (s, d) =>
      def dd(c: Column) = c.cast("double")
      val cells = Tables(s, d, "events")
        .select(col("event_type").as("x"),
                (get_json_object(col("props"), "$.k").cast("long") / 10)
                  .cast("long").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("c"))
      // margin-entropy terms ride the cells: since Σ_y c_xy = cx,
      // Σ_x cx·ln(cx) = Σ_cells c·ln(cx) — no margin row set to drop
      cells
        .withColumn("cx", sum("c").over(Window.partitionBy("x")))
        .withColumn("cy", sum("c").over(Window.partitionBy("y")))
        .withColumn("n", sum("c").over(Window.partitionBy(lit(1))))
        .agg(max("n").as("n"), count(lit(1)).as("cells"),
             sum(round(dd(col("c")) *
                       log(dd(col("n")) * dd(col("c")) /
                           (dd(col("cx")) * dd(col("cy")))), 6)
                   .cast("decimal(28,6)")).as("smi"),
             sum(round(dd(col("c")) * log(dd(col("cx"))), 6)
                   .cast("decimal(28,6)")).as("sx"),
             sum(round(dd(col("c")) * log(dd(col("cy"))), 6)
                   .cast("decimal(28,6)")).as("sy"))
        .select(col("n"), col("cells"),
                round(dd(col("smi")) / dd(col("n")), 6).as("mi_nats"),
                round(log(dd(col("n"))) - dd(col("sx")) / dd(col("n")), 6)
                  .as("h_type"),
                round(log(dd(col("n"))) - dd(col("sy")) / dd(col("n")), 6)
                  .as("h_bucket"),
                round((dd(col("smi")) / dd(col("n"))) /
                      sqrt((log(dd(col("n"))) - dd(col("sx")) / dd(col("n"))) *
                           (log(dd(col("n"))) - dd(col("sy")) / dd(col("n")))),
                      6).as("nmi"))
    },

    // Kendall tau-b rank correlation (added r12) — the
    // rank-stability question behind "did the supplier league table
    // actually change between eras?": concordance over PAIRS is robust
    // to any monotone transform of revenue, and tau-b's tie correction
    // handles zero-revenue clusters exactly. The fact side is ONE
    // lineitem scan into per-supplier conditional revenue sums (era A =
    // ships before 1998, era B = after); the pairwise stage then runs
    // on the SUPPLIER AGGREGATE — a dimension table, not the corpus —
    // as a broadcast self-join over ordered key pairs with integer
    // sign algebra (concordant/discordant/tie counts), so fact volume
    // never squares. For corpus-sized rankings the documented scale
    // path is C−D via merge-sort inversion counting (sort by a, count
    // inversions in b — O(n log n), shuffle-friendly); the pairwise
    // form is kept because it is exact, tie-complete, and
    // dimension-bound here. One sqrt+division rounded 6 at the end.
    "q232_kendall_tau" -> { (s, d) =>
      def dd(c: Column) = c.cast("double")
      val r = supplierEraRev(s, d)
      val pairs = r.as("p")
        .join(broadcast(r.as("q")), col("p.sk") < col("q.sk"))
        .select(signum(dd(col("p.va")) - dd(col("q.va"))).cast("int").as("sa"),
                signum(dd(col("p.vb")) - dd(col("q.vb"))).cast("int").as("sb"))
      pairs.agg(
          count(lit(1)).as("n_pairs"),
          sum(when(col("sa") * col("sb") === 1, 1L).otherwise(0L)).as("conc"),
          sum(when(col("sa") * col("sb") === -1, 1L).otherwise(0L)).as("disc"),
          sum(when(col("sa") === 0 && col("sb") =!= 0, 1L).otherwise(0L))
            .as("tie_a"),
          sum(when(col("sa") =!= 0 && col("sb") === 0, 1L).otherwise(0L))
            .as("tie_b"))
        .select(col("n_pairs"), col("conc"), col("disc"),
                col("tie_a"), col("tie_b"),
                when(col("conc") + col("disc") + col("tie_a") > 0 &&
                       col("conc") + col("disc") + col("tie_b") > 0,
                     round((dd(col("conc")) - dd(col("disc"))) /
                           sqrt(dd(col("conc") + col("disc") + col("tie_a")) *
                                dd(col("conc") + col("disc") + col("tie_b"))),
                           6)).as("tau_b"))
    },

    // Mann–Whitney U rank-sum test (added r12) — the non-parametric
    // companion to q159's Welch t: "do 'view' and 'purchase' draw
    // their values from the same distribution?" asked without any
    // normality assumption — the robust default when q148's MAD screen
    // says the tails are heavy. The whole test lives on the VALUE-GROUP
    // table (cents → per-arm counts, the q141/q151 discipline): tied
    // ranks are handled exactly by average-rank algebra kept in
    // INTEGERS via doubled ranks — 2·avgrank of a tied block is
    // 2·cum_before + t + 1, so the rank-sum, U and the tie-correction
    // term Σ(t³−t) are exact (decimal) sums over ≤|distinct cents|
    // rows. One fact scan, one cents-keyed agg; the global ordered
    // window runs on the value-group table, never the corpus. The
    // normal approximation z (the standard report at these n) is ONE
    // fixed-order double formula rounded 6 dp; the rank-biserial
    // effect size 2U/(na·nb)−1 likewise.
    // Kruskal–Wallis H (added r13) — the k-SAMPLE extension of q247's
    // two-sample Mann–Whitney (the rank-based one-way ANOVA q251
    // reaches for when normality fails): does event value differ in
    // distribution across ALL event types at once? Exactly q247's
    // value-group discipline generalized: ONE fact scan folds the
    // (type, cents, count) table; the global value-group cumulative
    // gives every tied cent its doubled average rank 2·cum + t + 1
    // (integer — the window runs over the DOMAIN-bound distinct-cents
    // table, never the corpus); per-type doubled rank sums are exact
    // decimals. H = [12/(N(N+1))·Σ R_i²/n_i − 3(N+1)] with the
    // standard tie correction 1 − Σ(t³−t)/(N³−N); each group's
    // R_i²/n_i term floor-quantizes at 1e-6 into an order-free
    // decimal sum (k-row table — the sum must not depend on group
    // order), the final chains are [[KwSolve]] strings both engines
    // run verbatim, ε² = (H_c − k + 1)/(N − k) reported from the
    // ROUNDED H_c (the RidgeSolve discipline). In-memory certified
    // against a textbook average-rank recomputation.
    "q312_kruskal_wallis" -> { (s, d) =>
      val vg = Tables(s, d, "events")
        .select(col("event_type").as("g"),
                round(col("value") * 100).cast("long").as("v"))
        .groupBy("g", "v").agg(count(lit(1)).as("c"))
      val (pv, h) = org.apache.spark.sql.graft.InternalPin.pin(vg)
      h.count(); graft.PinScope.retain(h)
      val tv = pv.groupBy("v").agg(sum("c").as("t"))
      val wPrev = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = tv
        .withColumn("cum", coalesce(sum("t").over(wPrev), lit(0L)))
      val grp = pv.join(cum, Seq("v"))
        .groupBy("g")
        .agg(sum("c").as("ni"),
             sum((col("c") * (lit(2L) * col("cum") + col("t") + 1L))
                   .cast("decimal(38,0)")).as("r2"))
      val ties = tv.agg(sum(col("t").cast("decimal(38,0)") * col("t") *
                              col("t") - col("t")).as("tt"))
      val st = grp
        .select(col("ni"), expr(KwSolve.termExpr).as("term"))
        .agg(count(lit(1)).as("k"), sum("ni").as("n"), sum("term").as("s"))
      st.crossJoin(broadcast(ties))
        .selectExpr(KwSolve.hExprs: _*)
        .selectExpr("*", KwSolve.epsExpr)
    },

    "q247_mann_whitney" -> { (s, d) =>
      def dd(c: Column) = c.cast("double")
      val vg = Tables(s, d, "events")
        .where(col("event_type").isin("view", "purchase"))
        .select(round(col("value") * 100).cast("long").as("v"),
                when(col("event_type") === "view", 1L).otherwise(0L)
                  .as("a"))
        .groupBy("v")
        .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
      val wPrev = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val agg = vg
        .withColumn("t", col("ca") + col("cb"))
        .withColumn("cum", coalesce(sum(col("t")).over(wPrev), lit(0L)))
        .agg(sum("ca").as("na"), sum("cb").as("nb"),
             sum((col("ca") * (lit(2L) * col("cum") + col("t") + 1L))
                   .cast("decimal(38,0)")).as("ra2"),
             sum(col("t").cast("decimal(38,0)") * col("t") * col("t")
                   - col("t")).as("tt"))
      agg
        .withColumn("u2", (col("ra2") - col("na").cast("decimal(38,0)") *
                             (col("na") + 1L)).cast("long"))
        .withColumn("n", col("na") + col("nb"))
        .select(col("na").as("n_a"), col("nb").as("n_b"), col("u2"),
                col("tt").cast("double").as("ties_term"),
                round(dd(col("u2")) / (dd(col("na")) * dd(col("nb"))) - 1.0,
                      6).as("rank_biserial"),
                round((dd(col("u2")) - dd(col("na")) * dd(col("nb"))) /
                        sqrt(dd(col("na")) * dd(col("nb")) *
                             (dd(col("n")) * dd(col("n")) * dd(col("n")) -
                              dd(col("n")) - col("tt").cast("double")) /
                             (dd(col("n")) * (dd(col("n")) - 1.0) * 3.0)),
                      6).as("z"))
    },

    // Spearman rank correlation (added r12) — completes the
    // rank-statistics triptych on q232's SHARED supplier era-revenue
    // universe (Pearson q140 measures linearity, Kendall q232 pairwise
    // concordance, Spearman monotonicity): Pearson over average ranks
    // with exact tie handling. Doubled average ranks keep everything
    // integer — 2·avgrank = 2·rank() + (ties−1), rank() and the tie
    // count being windows over the SUPPLIER aggregate (dimension-bound;
    // the fact side is the one pinned scan supplierEraRev already
    // paid). Moment sums are decimals (ranks ≤ 2n, products ≤ 4n² —
    // overflow-proof at any corpus), and the 2× scaling cancels in the
    // correlation, so rho needs no un-doubling. The L1 rank
    // displacement Σ|ra−rb| (Spearman's footrule, reported doubled to
    // stay integer) names WHERE the league table moved.
    "q249_spearman" -> { (s, d) =>
      val r = supplierEraRev(s, d)
      val ranked = r
        .withColumn("ta", count(lit(1)).over(Window.partitionBy("va")))
        .withColumn("tb", count(lit(1)).over(Window.partitionBy("vb")))
        .withColumn("ra2",
          lit(2L) * rank().over(Window.orderBy("va")) + col("ta") - 1L)
        .withColumn("rb2",
          lit(2L) * rank().over(Window.orderBy("vb")) + col("tb") - 1L)
      ranked
        .agg(count(lit(1)).as("n"),
             sum(col("ra2").cast("decimal(38,0)")).as("sx"),
             sum(col("rb2").cast("decimal(38,0)")).as("sy"),
             sum(col("ra2").cast("decimal(38,0)") * col("ra2")).as("sxx"),
             sum(col("rb2").cast("decimal(38,0)") * col("rb2")).as("syy"),
             sum(col("ra2").cast("decimal(38,0)") * col("rb2")).as("sxy"),
             sum(abs(col("ra2") - col("rb2"))).as("fr2"))
        .select(col("n"),
                corrOf(col("n"), col("sx"), col("sy"),
                       col("sxx"), col("syy"), col("sxy")).as("rho"),
                col("fr2").as("footrule2"))
    },

    // Lead-lag cross-correlation screen (added r12) — the "does
    // engagement TODAY predict purchases in k days?" question behind
    // every marketing-mix and capacity model: Pearson r between the
    // daily 'view' series and the 'purchase' series shifted by each
    // lag 0…6, plus the argmax flag. ONE fact scan collapses to the
    // daily cell table (2 conditional counts per day — pinned, |days|
    // rows); every lag is then a broadcast self-join of that tiny
    // table against its date-shifted self, so adding lags costs cell
    // algebra, not rescans. Counts are integers ⇒ per-lag moment sums
    // are exact decimals into the shared corrOf formula; only aligned
    // day pairs enter (inner join), so each lag's n is explicit in the
    // row. Best-lag tie-break is declared: smallest lag among the max
    // rounded r.
    "q250_lead_lag" -> { (s, d) =>
      val daily = Tables(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
               .as("x"),
             sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
               .as("y"))
      val (cell, h) = org.apache.spark.sql.graft.InternalPin.pin(daily)
      h.count(); graft.PinScope.retain(h)
      val lags = s.range(0, 7).select(col("id").cast("int").as("lag"))
      val perLag = lags
        .crossJoin(broadcast(cell.as("a")))
        .join(broadcast(cell.select(col("day").as("bday"),
                                    col("y").as("by"))),
              col("bday") === date_add(col("a.day"), col("lag")))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_days"),
             sum(col("x").cast("decimal(38,0)")).as("sx"),
             sum(col("by").cast("decimal(38,0)")).as("sy"),
             sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
             sum(col("by").cast("decimal(38,0)") * col("by")).as("syy"),
             sum(col("x").cast("decimal(38,0)") * col("by")).as("sxy"))
        .select(col("lag"), col("n_days"),
                corrOf(col("n_days"), col("sx"), col("sy"),
                       col("sxx"), col("syy"), col("sxy")).as("r"))
      val wAll = Window.partitionBy(lit(1))
      perLag
        .withColumn("rmax", max(col("r")).over(wAll))
        .withColumn("bestlag",
          min(when(col("r") === col("rmax"), col("lag"))).over(wAll))
        .select(col("lag"), col("n_days"), col("r"),
                (col("lag") === col("bestlag")).cast("int").as("is_best"))
        .orderBy("lag")
    }
  )

  def oracles: Map[String, String] = Map(

    // the general formula states both paths at once: when the lhs key
    // is unique every ca = 1 and sum(ca*cb) IS the semi-join count
    "q245_join_size_pk" -> {
      def one(name: String, lt: String, lk: String, rt: String,
              rk: String) =
        s"""SELECT '$name' AS join_name,
           |  (SELECT count(*) FROM $lt) AS lhs_rows,
           |  (SELECT count(*) FROM $rt) AS rhs_rows,
           |  (SELECT CAST(CASE WHEN count(*) = count(DISTINCT $lk)
           |          THEN 1 ELSE 0 END AS BIGINT)
           |   FROM $lt) AS pk_certified,
           |  count(*) AS shared_keys,
           |  CAST(sum(ca * cb) AS BIGINT) AS predicted_rows,
           |  CAST(max(ca * cb) AS BIGINT) AS max_key_rows
           |FROM (SELECT $lk AS k, count(*) AS ca FROM $lt GROUP BY 1) a
           |JOIN (SELECT $rk AS k, count(*) AS cb FROM $rt GROUP BY 1) b
           |  USING (k)""".stripMargin
      s"""${one("customer_orders", "customer", "c_custkey",
                "orders", "o_custkey")}
         |UNION ALL
         |${one("events_self_user", "events", "user_id",
                "events", "user_id")}
         |ORDER BY join_name""".stripMargin
    },

    // same value-group rank algebra: doubled average ranks keep ties
    // exact in integers; one fixed-order double formula for z
    // identical value-group rank fold and the identical KwSolve chains
    "q312_kruskal_wallis" ->
      s"""WITH vg AS (
         |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT)
         |    AS v, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |tv AS (SELECT v, sum(c) AS t FROM vg GROUP BY 1),
         |cu AS (SELECT v, t,
         |    coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM tv),
         |gr AS (SELECT g, sum(c) AS ni,
         |    sum(CAST(c * (2 * cum + t + 1) AS DECIMAL(38,0))) AS r2
         |  FROM vg JOIN cu USING (v) GROUP BY 1),
         |tx AS (SELECT sum(CAST(t AS DECIMAL(38,0)) * t * t - t) AS tt
         |       FROM tv),
         |tm AS (SELECT ni, ${KwSolve.termExpr} AS term FROM gr),
         |st AS (SELECT count(*) AS k, sum(ni) AS n, sum(term) AS s
         |       FROM tm),
         |hx AS (SELECT ${KwSolve.hExprs.mkString(",\n    ")}
         |       FROM st CROSS JOIN tx)
         |SELECT *, ${KwSolve.epsExpr} FROM hx""".stripMargin,

    "q247_mann_whitney" ->
      """WITH vg AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |w AS (
        |  SELECT ca, cb, ca + cb AS t,
        |    coalesce(sum(ca + cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum
        |  FROM vg),
        |a AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb,
        |    sum(CAST(ca AS HUGEINT) * (2 * cum + t + 1)) AS ra2,
        |    sum(CAST(t AS HUGEINT) * t * t - t) AS tt
        |  FROM w),
        |b AS (
        |  SELECT na, nb, na + nb AS n,
        |    CAST(ra2 - CAST(na AS HUGEINT) * (na + 1) AS BIGINT) AS u2,
        |    tt
        |  FROM a)
        |SELECT na AS n_a, nb AS n_b, u2,
        |  CAST(tt AS DOUBLE) AS ties_term,
        |  round(CAST(u2 AS DOUBLE) /
        |        (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) - 1.0, 6)
        |    AS rank_biserial,
        |  round((CAST(u2 AS DOUBLE) -
        |         CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) /
        |        sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) *
        |             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
        |              CAST(n AS DOUBLE) - CAST(n AS DOUBLE) -
        |              CAST(tt AS DOUBLE)) /
        |             (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) *
        |              3.0)), 6) AS z
        |FROM b""".stripMargin,

    // same doubled-average-rank windows over the supplier aggregate;
    // the corr formula is q140's operand order verbatim
    "q249_spearman" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS sk,
        |    CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
        |        THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |        ELSE 0 END) AS BIGINT) AS va,
        |    CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
        |        THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |        ELSE 0 END) AS BIGINT) AS vb
        |  FROM lineitem GROUP BY 1),
        |rk AS (
        |  SELECT
        |    2 * rank() OVER (ORDER BY va) +
        |      count(*) OVER (PARTITION BY va) - 1 AS ra2,
        |    2 * rank() OVER (ORDER BY vb) +
        |      count(*) OVER (PARTITION BY vb) - 1 AS rb2
        |  FROM rev),
        |a AS (
        |  SELECT count(*) AS n,
        |    sum(CAST(ra2 AS HUGEINT)) AS sx,
        |    sum(CAST(rb2 AS HUGEINT)) AS sy,
        |    sum(CAST(ra2 AS HUGEINT) * ra2) AS sxx,
        |    sum(CAST(rb2 AS HUGEINT) * rb2) AS syy,
        |    sum(CAST(ra2 AS HUGEINT) * rb2) AS sxy,
        |    CAST(sum(abs(ra2 - rb2)) AS BIGINT) AS fr2
        |  FROM rk)
        |SELECT n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |             (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |              CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |    AS rho,
        |  fr2 AS footrule2
        |FROM a""".stripMargin,

    // same daily cell table, per-lag date-shifted self-join, q140's
    // corr operand order, declared smallest-max-lag tie-break
    "q250_lead_lag" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS y
        |  FROM events GROUP BY 1),
        |lags AS (
        |  SELECT CAST(unnest(generate_series(0, 6)) AS INTEGER) AS lag),
        |m AS (
        |  SELECT l.lag, count(*) AS n_days,
        |    sum(CAST(a.x AS HUGEINT)) AS sx,
        |    sum(CAST(b.y AS HUGEINT)) AS sy,
        |    sum(CAST(a.x AS HUGEINT) * a.x) AS sxx,
        |    sum(CAST(b.y AS HUGEINT) * b.y) AS syy,
        |    sum(CAST(a.x AS HUGEINT) * b.y) AS sxy
        |  FROM lags l CROSS JOIN daily a
        |  JOIN daily b ON b.day = a.day + l.lag
        |  GROUP BY 1),
        |r AS (
        |  SELECT lag, n_days,
        |    round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |          sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |                CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |               (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) -
        |                CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |      AS r
        |  FROM m),
        |f AS (SELECT lag, n_days, r, max(r) OVER () AS rmax FROM r),
        |g AS (SELECT lag, n_days, r,
        |        min(CASE WHEN r = rmax THEN lag END) OVER () AS bestlag
        |      FROM f)
        |SELECT lag, n_days, r, CAST(lag = bestlag AS INT) AS is_best
        |FROM g ORDER BY lag""".stripMargin,

    // same cell-table algebra: per-cell 6dp-rounded log terms, decimal
    // sums, margins as window sums (sum_x cx ln cx = sum_cells c ln cx)
    "q231_mutual_info" ->
      """WITH cells AS (
        |  SELECT event_type AS x,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS y,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT c,
        |    sum(c) OVER (PARTITION BY x) AS cx,
        |    sum(c) OVER (PARTITION BY y) AS cy,
        |    sum(c) OVER () AS n
        |  FROM cells),
        |a AS (SELECT CAST(max(n) AS BIGINT) AS n, count(*) AS cells,
        |    sum(CAST(round(CAST(c AS DOUBLE) *
        |          ln(CAST(n AS DOUBLE) * CAST(c AS DOUBLE) /
        |             (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 6)
        |        AS DECIMAL(28,6))) AS smi,
        |    sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(cx AS DOUBLE)), 6)
        |        AS DECIMAL(28,6))) AS sx,
        |    sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(cy AS DOUBLE)), 6)
        |        AS DECIMAL(28,6))) AS sy
        |  FROM w)
        |SELECT n, cells,
        |  round(CAST(smi AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mi_nats,
        |  round(ln(CAST(n AS DOUBLE)) -
        |        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS h_type,
        |  round(ln(CAST(n AS DOUBLE)) -
        |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS h_bucket,
        |  round((CAST(smi AS DOUBLE) / CAST(n AS DOUBLE)) /
        |        sqrt((ln(CAST(n AS DOUBLE)) -
        |              CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
        |             (ln(CAST(n AS DOUBLE)) -
        |              CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS nmi
        |FROM a""".stripMargin,

    // same per-supplier era sums, ordered-pair sign algebra, tau-b with
    // tie corrections; pairwise runs on the supplier aggregate only
    "q232_kendall_tau" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS sk,
        |    CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
        |        THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |        ELSE 0 END) AS BIGINT) AS va,
        |    CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
        |        THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |        ELSE 0 END) AS BIGINT) AS vb
        |  FROM lineitem GROUP BY 1),
        |pr AS (SELECT
        |    CAST(sign(CAST(p.va AS DOUBLE) - CAST(q.va AS DOUBLE)) AS INT)
        |      AS sa,
        |    CAST(sign(CAST(p.vb AS DOUBLE) - CAST(q.vb AS DOUBLE)) AS INT)
        |      AS sb
        |  FROM rev p JOIN rev q ON p.sk < q.sk),
        |ag AS (SELECT count(*) AS n_pairs,
        |    CAST(sum(CASE WHEN sa * sb = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS conc,
        |    CAST(sum(CASE WHEN sa * sb = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS disc,
        |    CAST(sum(CASE WHEN sa = 0 AND sb <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tie_a,
        |    CAST(sum(CASE WHEN sa <> 0 AND sb = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tie_b
        |  FROM pr)
        |SELECT n_pairs, conc, disc, tie_a, tie_b,
        |  CASE WHEN conc + disc + tie_a > 0 AND conc + disc + tie_b > 0
        |    THEN round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE)) /
        |          sqrt(CAST(conc + disc + tie_a AS DOUBLE) *
        |               CAST(conc + disc + tie_b AS DOUBLE)), 6)
        |  END AS tau_b
        |FROM ag""".stripMargin,

    "q192_winsorized_mean" ->
      """WITH vg AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT *,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY v
        |                   ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM vg),
        |b AS (SELECT event_type,
        |    min(CASE WHEN cum * 100 >= n * 5 THEN v END) AS p5,
        |    min(CASE WHEN cum * 100 >= n * 95 THEN v END) AS p95,
        |    min(n) AS n
        |  FROM c GROUP BY 1)
        |SELECT vg.event_type, min(b.p5) AS p5_cents,
        |  min(b.p95) AS p95_cents, CAST(min(b.n) AS BIGINT) AS n,
        |  round(CAST(sum(vg.cnt * least(greatest(vg.v, b.p5), b.p95))
        |             AS DOUBLE) / min(b.n) / 100, 6) AS winsorized_mean
        |FROM vg JOIN b USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q215_join_size_report" -> {
      def rep(name: String, lt: String, lk: String, rt: String,
              rk: String) =
        s"""SELECT '$name' AS join_name,
           |  (SELECT count(*) FROM $lt) AS lhs_rows,
           |  (SELECT count(*) FROM $rt) AS rhs_rows,
           |  count(*) AS shared_keys,
           |  CAST(sum(ca * cb) AS BIGINT) AS predicted_rows,
           |  CAST(max(ca * cb) AS BIGINT) AS max_key_rows
           |FROM (SELECT $lk AS k, count(*) AS ca FROM $lt GROUP BY 1) a
           |JOIN (SELECT $rk AS k, count(*) AS cb FROM $rt GROUP BY 1) b
           |  USING (k)""".stripMargin
      Seq(rep("customer_orders", "customer", "c_custkey",
              "orders", "o_custkey"),
          rep("events_self_user", "events", "user_id",
              "events", "user_id"),
          rep("orders_lineitem", "orders", "o_orderkey",
              "lineitem", "l_orderkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY join_name")
    },

    "q193_key_skew" -> {
      def rep(tbl: String, key: String, tag: String) =
        s"""SELECT '$tag' AS join_key,
           |  CAST(min(keys) AS BIGINT) AS n_keys,
           |  CAST(min(rows_) AS BIGINT) AS n_rows,
           |  CAST(max(cnt) AS BIGINT) AS max_per_key,
           |  CAST(min(CASE WHEN cum * 100 >= keys * 99 THEN cnt END)
           |       AS BIGINT) AS p99_per_key,
           |  round(CAST(max(cnt) AS DOUBLE) * min(keys) / min(rows_), 6)
           |    AS skew_factor
           |FROM (
           |  SELECT cnt, freq,
           |    sum(freq) OVER (ORDER BY cnt ROWS UNBOUNDED PRECEDING)
           |      AS cum,
           |    sum(freq) OVER () AS keys,
           |    sum(cnt * freq) OVER () AS rows_
           |  FROM (SELECT cnt, count(*) AS freq FROM (
           |          SELECT $key AS k, count(*) AS cnt
           |          FROM $tbl GROUP BY 1) GROUP BY 1))""".stripMargin
      s"""${rep("lineitem", "l_orderkey", "lineitem.l_orderkey")}
         |UNION ALL
         |${rep("orders", "o_custkey", "orders.o_custkey")}
         |UNION ALL
         |${rep("events", "user_id", "events.user_id")}
         |ORDER BY join_key""".stripMargin
    },

    "q139_max_concurrency" ->
      """WITH b AS (
        |  SELECT event_type, ts AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT event_type, ts + INTERVAL 30 MINUTE, -1 FROM events),
        |net AS (SELECT event_type, t, sum(delta) AS net
        |        FROM b GROUP BY 1, 2),
        |c AS (SELECT event_type, t,
        |        sum(net) OVER (PARTITION BY event_type ORDER BY t
        |                       ROWS UNBOUNDED PRECEDING) AS cur
        |      FROM net),
        |m AS (SELECT event_type, t, cur,
        |        max(cur) OVER (PARTITION BY event_type) AS mx FROM c)
        |SELECT event_type, CAST(max(cur) AS BIGINT) AS max_concurrent,
        |  min(t) AS peak_start
        |FROM m WHERE cur = mx GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q140_corr_matrix" ->
      """WITH v AS (
        |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS e,
        |    CAST(round(l_discount * 100) AS BIGINT) AS dd,
        |    CAST(round(l_tax * 100) AS BIGINT) AS t
        |  FROM lineitem),
        |s AS (SELECT count(*) AS n,
        |    sum(CAST(q AS HUGEINT)) AS sq, sum(CAST(e AS HUGEINT)) AS se,
        |    sum(CAST(dd AS HUGEINT)) AS sd, sum(CAST(t AS HUGEINT)) AS st,
        |    sum(CAST(q AS HUGEINT) * q) AS sqq,
        |    sum(CAST(e AS HUGEINT) * e) AS see,
        |    sum(CAST(dd AS HUGEINT) * dd) AS sdd,
        |    sum(CAST(t AS HUGEINT) * t) AS stt,
        |    sum(CAST(q AS HUGEINT) * e) AS sqe,
        |    sum(CAST(q AS HUGEINT) * dd) AS sqd,
        |    sum(CAST(q AS HUGEINT) * t) AS sqt,
        |    sum(CAST(e AS HUGEINT) * dd) AS sed,
        |    sum(CAST(e AS HUGEINT) * t) AS set_,
        |    sum(CAST(dd AS HUGEINT) * t) AS sdt
        |  FROM v),
        |p AS (
        |  SELECT 'q_e' AS pair, sq AS sx, se AS sy, sqq AS sxx,
        |    see AS syy, sqe AS sxy, n FROM s
        |  UNION ALL SELECT 'q_d', sq, sd, sqq, sdd, sqd, n FROM s
        |  UNION ALL SELECT 'q_t', sq, st, sqq, stt, sqt, n FROM s
        |  UNION ALL SELECT 'e_d', se, sd, see, sdd, sed, n FROM s
        |  UNION ALL SELECT 'e_t', se, st, see, stt, set_, n FROM s
        |  UNION ALL SELECT 'd_t', sd, st, sdd, stt, sdt, n FROM s)
        |SELECT pair,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |             (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |              CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |    AS corr_r
        |FROM p ORDER BY pair""".stripMargin,

    "q141_ks_test" ->
      """WITH o AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS in1
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |pv AS (SELECT v, sum(in1) AS c1, sum(1 - in1) AS c2
        |       FROM o GROUP BY 1),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c2) AS BIGINT) AS n2 FROM pv),
        |c AS (SELECT
        |    sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1,
        |    sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum2
        |  FROM pv),
        |dm AS (SELECT max(abs(CAST(cum1 AS HUGEINT) * t.n2 -
        |                      CAST(cum2 AS HUGEINT) * t.n1)) AS dmax
        |       FROM c, t)
        |SELECT t.n1, t.n2, CAST(dm.dmax AS BIGINT) AS d_num,
        |  round(CAST(dm.dmax AS DOUBLE) /
        |        (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)), 6)
        |    AS ks_stat
        |FROM t, dm""".stripMargin,

    "q142_token_entropy" ->
      """WITH tk AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tc AS (SELECT lang, tok, count(*) AS c FROM tk
        |       WHERE len(tok) > 0 GROUP BY 1, 2),
        |ag AS (SELECT lang, sum(c) AS n_tokens, count(*) AS vocab,
        |    sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 6)
        |             AS DECIMAL(28,6))) AS s
        |  FROM tc GROUP BY 1)
        |SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(vocab AS BIGINT) AS vocab,
        |  round(ln(CAST(n_tokens AS DOUBLE)) -
        |        CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |    AS entropy_nats
        |FROM ag ORDER BY lang""".stripMargin,

    "q143_weighted_sample" ->
      """WITH k AS (
        |  SELECT lang, doc_id, source, n_chars,
        |    round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |                                   1, 8)) AS BIGINT) + 1.0) /
        |             4294967297.0) / CAST(n_chars AS DOUBLE), 6) AS es_key
        |  FROM documents),
        |r AS (SELECT lang, doc_id, source, n_chars, es_key,
        |        row_number() OVER (PARTITION BY lang
        |                           ORDER BY es_key DESC, doc_id) AS rk
        |      FROM k)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, source, n_chars,
        |  es_key
        |FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,

    "q145_psi_drift" ->
      """WITH ev AS (
        |  SELECT value,
        |    CASE WHEN (CAST(ts AS DATE) - DATE '1970-01-05') % 7 < 5
        |         THEN 1 ELSE 0 END AS is_wk
        |  FROM events),
        |rng AS (SELECT min(value) AS vmin, max(value) AS vmax FROM ev),
        |c AS (SELECT
        |    CAST(least(9, floor((value - vmin) * 10.0 / (vmax - vmin)))
        |         AS BIGINT) AS bin,
        |    CAST(sum(is_wk) AS BIGINT) AS a,
        |    CAST(sum(1 - is_wk) AS BIGINT) AS b
        |  FROM ev, rng GROUP BY 1),
        |x AS (SELECT bin, a, b,
        |    sum(a) OVER () AS na, sum(b) OVER () AS nb FROM c),
        |y AS (SELECT bin, a, b,
        |    round((CAST(a + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE) -
        |           CAST(b + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE)) *
        |          ln((CAST(a + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE)) /
        |             (CAST(b + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE))),
        |          6) AS term
        |  FROM x)
        |SELECT bin, a, b, term,
        |  CAST(sum(CAST(term AS DECIMAL(18,6))) OVER () AS DOUBLE) AS psi
        |FROM y ORDER BY bin""".stripMargin,

    "q146_gini" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders),
        |r AS (SELECT prio, v,
        |        row_number() OVER (PARTITION BY prio ORDER BY v) AS i
        |      FROM o),
        |a AS (SELECT prio, count(*) AS n, sum(CAST(v AS HUGEINT)) AS sx,
        |        sum(CAST(i AS HUGEINT) * v) AS six
        |      FROM r GROUP BY 1)
        |SELECT prio, CAST(n AS BIGINT) AS n,
        |  round((2.0 * CAST(six AS DOUBLE) -
        |         (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE)) /
        |        (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini
        |FROM a ORDER BY prio""".stripMargin,

    "q144_chi2_independence" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT)
        |      AS dow
        |  FROM events),
        |c AS (SELECT event_type, dow, count(*) AS obs FROM e GROUP BY 1, 2),
        |x AS (SELECT event_type, dow, obs,
        |    sum(obs) OVER (PARTITION BY event_type) AS r,
        |    sum(obs) OVER (PARTITION BY dow) AS cc,
        |    sum(obs) OVER () AS n
        |  FROM c),
        |y AS (SELECT event_type, dow, obs,
        |    round(CAST((CAST(obs AS HUGEINT) * n - CAST(r AS HUGEINT) * cc) *
        |               (CAST(obs AS HUGEINT) * n - CAST(r AS HUGEINT) * cc)
        |               AS DOUBLE) /
        |          (CAST(r AS DOUBLE) * CAST(cc AS DOUBLE) *
        |           CAST(n AS DOUBLE)), 6) AS cell_chi2
        |  FROM x)
        |SELECT event_type, dow, obs, cell_chi2,
        |  CAST(sum(CAST(cell_chi2 AS DECIMAL(18,6))) OVER () AS DOUBLE)
        |    AS chi2_total
        |FROM y ORDER BY event_type, dow""".stripMargin,

    "q172_interval_union" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS st,
        |                   epoch_us(ts) + 1800000000 AS en FROM events),
        |w AS (SELECT *, max(en) OVER (
        |        PARTITION BY user_id ORDER BY st, en
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |      FROM iv)
        |SELECT user_id, count(*) AS n_holds,
        |  CAST(sum(CASE WHEN pmax IS NULL OR pmax < st THEN 1 ELSE 0 END)
        |       AS BIGINT) AS blocks,
        |  CAST(sum(greatest(0, en - greatest(st, coalesce(pmax, st))))
        |       AS BIGINT) AS covered_us
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
