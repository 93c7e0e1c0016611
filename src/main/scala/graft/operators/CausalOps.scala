package graft.operators

import graft.{Det, OpModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Causal-inference / experiment-analysis family (added r12, wave 17):
  * the measurement layer a product analytics platform runs when the
  * treatment was NOT a clean randomized split — observational rollouts,
  * post-hoc score calibration, matched comparisons, and counterfactual
  * channel credit. Complements the randomized-experiment family
  * (q158 A/B readout, q252 CUPED, q251 ANOVA, q264 power) and the
  * heuristic attribution pair (q183 linear, q257 time-decay).
  *
  * Float discipline throughout is the house rule (graft.Det scaladoc):
  * facts fold to exact integer/decimal cells (cents longs, decimal(38,0)
  * squared sums), every IEEE division/sqrt happens once on identical
  * exact operands in both engines, and cross-row double sums go through
  * round-12dp-into-decimal (q142's trick) so partition order cannot leak.
  */
object CausalOps extends OpModule {

  private def pin(df: DataFrame) =
    org.apache.spark.sql.graft.InternalPin.pin(df)

  private def d(c: Column): Column = c.cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Difference-in-differences (added r12) — the observational
    // complement to q252's CUPED: the "treatment" is a REGIONAL rollout
    // (customers of ASIA nations), not a randomized arm, so a plain
    // post-period comparison confounds region with period; DiD cancels
    // both main effects under parallel trends. Unit = customer; outcome
    // = order spend cents pre/post the 1998-01-01 policy date; the
    // estimator is the two-sample t on per-customer deltas (post−pre) —
    // algebraically the DiD interaction coefficient, and it gives an
    // honest customer-level SE without a regression solve. ONE orders
    // scan aggregates (custkey, pre, post) cents; customer⋈nation⋈
    // region resolves the treatment flag via two broadcast dims; the
    // group roll-up is 2 cells pivoted to one row. Deltas/squares fold
    // in decimal(38,0) (exact to ~1e19-cent group sums — beyond any
    // corpus; q140's widening rule); the four cell means, SE, and t
    // each divide once in double and round 6 dp. 100 TB: the only
    // volume term is the orders groupBy(custkey) shuffle.
    // Uplift stump (added r13) — the HETEROGENEITY probe between
    // q159's single average effect and a full uplift model (Radcliffe
    // & Surry's uplift-tree split criterion at depth 1): for each
    // candidate split of a user covariate, which threshold maximizes
    // the DIFFERENCE in treatment effect between its two sides? The
    // question an experimentation team asks right after a significant
    // A/B: "for WHOM does it work?". Universe = q159's declared
    // experiment verbatim (md5-nibble arms, >150-cent high-value
    // conversion); covariates = user activity (events/10, capped 20)
    // and breadth (distinct event types). The q294/q308 cell
    // discipline: ONE user fold, covariates bucket to a ≤2-feature
    // cell table with per-cell (n, conversions)×(arm) exact counts,
    // candidate splits are cumulative windows per feature (complete
    // two-sided splits only — any empty arm×side cell drops the
    // candidate, declared), uplifts round 6 BEFORE the gain =
    // (uL − uR)² ranking (computed from the ROUNDED uplifts — the
    // RidgeSolve discipline; ties (feature, v)). Output: each
    // feature's best split with both sides' uplift — the top row of
    // the uplift tree a bandit/targeting policy would grow.
    "q318_uplift_stump" -> { (s, dir) =>
      val d = (c: Column) => c.cast("double")
      val pu = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("nev"),
             count_distinct(col("event_type")).as("ntypes"),
             max(when(col("event_type") === "purchase" &&
                        col("value") > 150, 1L).otherwise(0L)).as("y"))
        .withColumn("t",
          when(substring(md5(col("user_id").cast("string")), 1, 1) <= "7",
               0L).otherwise(1L))
        .withColumn("x1", least(expr("nev div 10"), lit(20L)))
        .withColumn("x2", col("ntypes"))
      val cells = pu.select(explode(array(
          struct(lit("activity").as("f"), col("x1").as("v")),
          struct(lit("breadth").as("f"), col("x2").as("v")))).as("fv"),
          col("t"), col("y"))
        .select(col("fv.f").as("f"), col("fv.v").as("v"),
                col("t"), col("y"))
        .groupBy("f", "v")
        .agg(sum(when(col("t") === 0L, 1L).otherwise(0L)).as("nc"),
             sum(when(col("t") === 0L, col("y")).otherwise(0L)).as("xc"),
             sum(when(col("t") === 1L, 1L).otherwise(0L)).as("nt"),
             sum(when(col("t") === 1L, col("y")).otherwise(0L)).as("xt"))
      val wCum = Window.partitionBy("f").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = cells.groupBy("f")
        .agg(sum("nc").as("tnc"), sum("xc").as("txc"),
             sum("nt").as("tnt"), sum("xt").as("txt"))
      val scored = cells
        .withColumn("cnc", sum("nc").over(wCum))
        .withColumn("cxc", sum("xc").over(wCum))
        .withColumn("cnt", sum("nt").over(wCum))
        .withColumn("cxt", sum("xt").over(wCum))
        .join(broadcast(tot), Seq("f"))
        .where(col("cnc") > 0 && col("cnt") > 0 &&
               col("tnc") - col("cnc") > 0 && col("tnt") - col("cnt") > 0)
        .withColumn("ul",
          round(d(col("cxt")) / d(col("cnt")) -
                d(col("cxc")) / d(col("cnc")), 6))
        .withColumn("ur",
          round(d(col("txt") - col("cxt")) / d(col("tnt") - col("cnt")) -
                d(col("txc") - col("cxc")) / d(col("tnc") - col("cnc")),
                6))
        .withColumn("gain",
          round((col("ul") - col("ur")) * (col("ul") - col("ur")), 6))
      val wBest = Window.partitionBy("f")
        .orderBy(col("gain").desc, col("v"))
      scored.withColumn("rn", row_number().over(wBest))
        .where(col("rn") === 1)
        .select(col("f").as("feature"), col("v").as("threshold"),
                (col("cnc") + col("cnt")).as("n_left"),
                (col("tnc") - col("cnc") + col("tnt") - col("cnt"))
                  .as("n_right"),
                col("ul").as("uplift_left"), col("ur").as("uplift_right"),
                col("gain"))
        .orderBy("feature")
    },

    "q271_diff_in_diff" -> { (s, dir) =>
      val b = lit("1998-01-01")
      val spend = Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(when(col("o_orderdate") < b,
                      round(col("o_totalprice") * 100).cast("long"))
               .otherwise(0L)).as("pre"),
             sum(when(col("o_orderdate") >= b,
                      round(col("o_totalprice") * 100).cast("long"))
               .otherwise(0L)).as("post"))
      val treatedNations = Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")
                .where(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = Tables(s, dir, "customer")
        .join(broadcast(treatedNations).withColumn("tr", lit(1L)),
              col("c_nationkey") === col("n_nationkey"), "left")
        .select(col("c_custkey"),
                coalesce(col("tr"), lit(0L)).as("treated"))
      val per = cust.join(spend, col("c_custkey") === col("o_custkey"),
                          "left")
        .select(col("treated"),
                coalesce(col("pre"), lit(0L)).as("pre"),
                coalesce(col("post"), lit(0L)).as("post"))
        .withColumn("delta", col("post") - col("pre"))
      val cells = per.groupBy("treated").agg(
        count(lit(1)).as("n"),
        sum(col("pre").cast("decimal(38,0)")).as("spre"),
        sum(col("post").cast("decimal(38,0)")).as("spost"),
        sum(col("delta").cast("decimal(38,0)")).as("sd"),
        sum(col("delta").cast("decimal(38,0)") * col("delta")).as("sdd"))
      def side(t: Int, c: String) =
        max(when(col("treated") === t, col(c))).as(s"${c}_$t")
      cells.agg(side(0, "n"), side(1, "n"), side(0, "spre"),
                side(1, "spre"), side(0, "spost"), side(1, "spost"),
                side(0, "sd"), side(1, "sd"), side(0, "sdd"),
                side(1, "sdd"))
        .withColumn("var0", d(col("n_0") * col("sdd_0") -
                              col("sd_0") * col("sd_0")) /
                            d(col("n_0") * (col("n_0") - 1)))
        .withColumn("var1", d(col("n_1") * col("sdd_1") -
                              col("sd_1") * col("sd_1")) /
                            d(col("n_1") * (col("n_1") - 1)))
        .select(
          col("n_0").as("n_control"), col("n_1").as("n_treated"),
          round(d(col("spre_0")) / d(col("n_0")) / 100.0, 6)
            .as("pre_control"),
          round(d(col("spost_0")) / d(col("n_0")) / 100.0, 6)
            .as("post_control"),
          round(d(col("spre_1")) / d(col("n_1")) / 100.0, 6)
            .as("pre_treated"),
          round(d(col("spost_1")) / d(col("n_1")) / 100.0, 6)
            .as("post_treated"),
          round((d(col("sd_1")) / d(col("n_1")) -
                 d(col("sd_0")) / d(col("n_0"))) / 100.0, 6).as("did"),
          round(sqrt(col("var1") / d(col("n_1")) +
                     col("var0") / d(col("n_0"))) / 100.0, 6).as("se"),
          round((d(col("sd_1")) / d(col("n_1")) -
                 d(col("sd_0")) / d(col("n_0"))) /
                sqrt(col("var1") / d(col("n_1")) +
                     col("var0") / d(col("n_0"))), 6).as("t_stat"))
    },

    // Isotonic calibration / PAV (added r12) — monotone recalibration
    // of a score against observed outcomes (the reliability step after
    // q229's AUC says the RANKING is fine but the PROBABILITIES are
    // not). Score = discount cents (11 distinct values), outcome =
    // return flag. The pool-adjacent-violators fit is computed by its
    // minimax identity iso(i) = max_{j≤i} min_{k≥j} rate(j..k) — which
    // turns an inherently sequential pooling algorithm into windows
    // and a self-join ON THE VALUE-GROUP TABLE: interval rates come
    // from cumulative-count differences (|bins|² pairs, domain-bound
    // at any corpus size — never fact rows), the inner min is a
    // group-by over pair rows, the outer max is one running-max window
    // over |bins| rows. All comparisons happen on exact-integer-
    // derived doubles (counts < 2^53 ⇒ the division operands are
    // exact, so both engines order identical doubles); the only
    // rounding is the 6 dp on output. ONE lineitem scan.
    "q272_isotonic_calibration" -> { (s, dir) =>
      // pinBounded: one row per discount-cent VALUE (≤ 101 cells at
      // any corpus size — value-resolution bounded, the q151
      // value-group discipline); the cumulative/PAVA windows below
      // ride this pin unpartitioned by design
      val (bins, h) = org.apache.spark.sql.graft.InternalPin.pinBounded(
        Tables(s, dir, "lineitem")
        .select(round(col("l_discount") * 100).cast("long").as("sc"),
                when(col("l_returnflag") === "R", 1L).otherwise(0L)
                  .as("y"))
        .groupBy("sc")
        .agg(count(lit(1)).as("w"), sum(col("y")).as("pos")))
      h.count(); graft.PinScope.retain(h)
      val wOrd = Window.orderBy("sc")
      val cum = bins
        .withColumn("cw", sum(col("w")).over(wOrd))
        .withColumn("cp", sum(col("pos")).over(wOrd))
        .withColumn("cw0", col("cw") - col("w"))
        .withColumn("cp0", col("cp") - col("pos"))
      val lo = cum.select(col("sc").as("j"), col("cw0"), col("cp0"))
      val hi = cum.select(col("sc").as("k"), col("cw").as("cwk"),
                          col("cp").as("cpk"))
      val suffixMin = lo.join(hi, col("j") <= col("k"))
        .withColumn("rate", d(col("cpk") - col("cp0")) /
                            d(col("cwk") - col("cw0")))
        .groupBy("j").agg(min(col("rate")).as("m"))
      val iso = suffixMin
        .withColumn("iso", max(col("m")).over(
          Window.orderBy("j")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      broadcast(bins).join(iso, col("sc") === col("j"))
        .select(col("sc").as("discount_cents"), col("w").as("n"),
                round(d(col("pos")) / d(col("w")), 6).as("raw_rate"),
                round(col("iso"), 6).as("iso_rate"))
        .orderBy("discount_cents")
    },

    // Propensity-style caliper matching (added r12) — the matched-
    // comparison estimator for a non-randomized exposure: each treated
    // unit (BUILDING-segment customer) is matched WITH REPLACEMENT to
    // its nearest control on a balance score within a ±$10 caliper,
    // and the treated-vs-matched-control spend gap is the ATT. The
    // nearest-neighbor search is the SORTED-MERGE pattern (q270's sort
    // discipline pointed at matching): one global sort of customers by
    // (score, key), then the nearest control on each side is a
    // last/first_value-ignore-nulls window fill — O(n log n), no
    // treated×control join ever materializes. Side choice and ties are
    // DECLARED: the strictly closer side wins, an exact tie keeps the
    // lower-score (preceding) side; within equal scores the fill
    // yields the (score, key)-order nearest by construction. Outcome
    // cents fold in decimal; ATT and match_rate divide once, 6 dp.
    // 100 TB: one sort + one orders groupBy shuffle; at cluster scale
    // the sort is a range partition and the fill needs only a
    // boundary-row exchange (q270's documented fact-scale form).
    "q273_propensity_match" -> { (s, dir) =>
      val spend = Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
               .as("sp"))
      val u = Tables(s, dir, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey").as("key"),
                round(col("c_acctbal") * 100).cast("long").as("score"),
                (col("c_mktsegment") === "BUILDING").as("tr"),
                coalesce(col("sp"), lit(0L)).as("out"))
      // r14: the four running nearest-control fills are BUCKET-
      // PARTITIONED ($100-resolution score buckets), with the seams
      // stitched through a |buckets|-row census (per bucket: its LAST
      // and FIRST control as struct max/min) — a row with no in-bucket
      // preceding/following control coalesces to the carry from the
      // nearest non-empty neighbor bucket. Bit-identical to the r12
      // unpartitioned running windows (which single-partition-sorted
      // the whole table — the q329 defect class, now guarded by
      // WindowBoundednessSpec); the only global windows left run over
      // the census aggregate. The "next control" fill stays a running
      // last() over the REVERSED sort: Spark executes an UNBOUNDED
      // FOLLOWING frame by rescanning the tail per row (O(n²): a flat
      // ~10 s at every SF in the r12 sweep).
      val b = u.withColumn("bk", expr("(score + 100000) DIV 10000"))
      val wPrev = Window.partitionBy("bk").orderBy("score", "key")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wNextRev = Window.partitionBy("bk")
        .orderBy(col("score").desc, col("key").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      def ctl(c: String) = when(!col("tr"), col(c))
      val census = b.groupBy("bk").agg(
        max(when(!col("tr"), struct(col("score"), col("key"),
                                    col("out")))).as("lc"),
        min(when(!col("tr"), struct(col("score"), col("key"),
                                    col("out")))).as("fc"))
      val carry = census
        .withColumn("pc", last("lc", ignoreNulls = true).over(
          Window.orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("nc", last("fc", ignoreNulls = true).over(
          Window.orderBy(col("bk").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("bk"), col("pc"), col("nc"))
      val filled = b
        .withColumn("ps", last(ctl("score"), ignoreNulls = true)
          .over(wPrev))
        .withColumn("po", last(ctl("out"), ignoreNulls = true)
          .over(wPrev))
        .withColumn("ns", last(ctl("score"), ignoreNulls = true)
          .over(wNextRev))
        .withColumn("no", last(ctl("out"), ignoreNulls = true)
          .over(wNextRev))
        .join(broadcast(carry), Seq("bk"))
        .withColumn("ps", coalesce(col("ps"), col("pc.score")))
        .withColumn("po", coalesce(col("po"), col("pc.out")))
        .withColumn("ns", coalesce(col("ns"), col("nc.score")))
        .withColumn("no", coalesce(col("no"), col("nc.out")))
        .where(col("tr"))
      val cal = lit(1000L)
      val matched = filled
        .withColumn("dp", when(col("ps").isNotNull,
                               col("score") - col("ps")))
        .withColumn("dn", when(col("ns").isNotNull,
                               col("ns") - col("score")))
        .withColumn("mo",
          when(col("dp").isNotNull &&
               (col("dn").isNull || col("dp") <= col("dn")), col("po"))
            .otherwise(col("no")))
        .withColumn("gap",
          when(col("dp").isNotNull &&
               (col("dn").isNull || col("dp") <= col("dn")), col("dp"))
            .otherwise(col("dn")))
        .withColumn("ok", col("gap").isNotNull && col("gap") <= cal)
      matched.agg(
        count(lit(1)).as("n_treated"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_matched"),
        round(d(sum(when(col("ok"), 1L).otherwise(0L))) /
              d(count(lit(1))), 6).as("match_rate"),
        round(d(sum(when(col("ok"),
                         (col("out") - col("mo")).cast("decimal(38,0)"))
                  .otherwise(lit(0).cast("decimal(38,0)")))) /
              d(sum(when(col("ok"), 1L).otherwise(0L))) / 100.0, 6)
          .as("att"),
        round(d(sum(when(col("ok"), col("gap").cast("decimal(38,0)"))
                  .otherwise(lit(0).cast("decimal(38,0)")))) /
              d(sum(when(col("ok"), 1L).otherwise(0L))), 6)
          .as("avg_gap_cents"))
    },

    // Shapley channel attribution (added r12) — the COUNTERFACTUAL
    // credit split the heuristic pair (q183 positional-linear, q257
    // time-decay) cannot provide: each channel's credit is its average
    // marginal lift of the observed conversion rate over all channel
    // subsets, the unique split satisfying efficiency/symmetry/dummy.
    // Unit = (user, day); channel set = the distinct non-purchase
    // event types that day; v(S) = conversion rate of units whose set
    // is EXACTLY S (empirical characteristic function; unobserved
    // subsets carry v=0 by declared convention). The fact scan folds
    // to ≤2^k signature cells (k = |channel domain| = 4), the subset
    // lattice is generated from one collected channel-domain row via
    // sequence+filter HOFs, and the Shapley sum runs over lattice×
    // channel pairs — EVERYTHING past the one (user, day) shuffle is
    // domain-bound (≤ 2^k·k rows) at any corpus size. Exact-count
    // divisions give bit-identical v's; the k!-weighted marginal terms
    // round 12 dp into decimal (q142) so the 8-term sum is order-free;
    // one final /k! division rounds 6 dp. Efficiency (Σφ = v(full) −
    // v(∅)) is spec-asserted.
    "q274_shapley_attribution" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"),
                col("event_type"))
      val units = ev.groupBy("user_id", "day")
        .agg(array_join(array_sort(collect_set(
               when(col("event_type") =!= "purchase",
                    col("event_type")))), ",").as("sig"),
             max(when(col("event_type") === "purchase", 1L)
               .otherwise(0L)).as("conv"))
      val (stats, h) = pin(units.groupBy("sig")
        .agg(count(lit(1)).as("units"), sum(col("conv")).as("convs")))
      h.count(); graft.PinScope.retain(h)
      // channel domain = the union of signature tokens (every observed
      // event type appears in at least one unit's signature), read off
      // the ≤2^k-row pinned cell table — NOT a second fact scan
      val chans = stats
        .select(explode(split(col("sig"), ",")).as("ch"))
        .where(col("ch") =!= "")
        .agg(array_sort(collect_set(col("ch"))).as("arr"))
        .withColumn("k", size(col("arr")))
      val lattice = chans
        .select(col("arr"), col("k"),
                explode(sequence(lit(0),
                  expr("cast(pow(2, size(arr)) as int) - 1"))).as("m"))
        .withColumn("sig", array_join(
          expr("filter(arr, (x, i) -> ((m div cast(pow(2, i) as int)) % 2) = 1)"),
          ","))
        .withColumn("sz", expr("bit_count(m)"))
      val pairs = lattice
        .select(col("arr"), col("k"), col("m"), col("sig"), col("sz"),
                posexplode(col("arr")).as(Seq("i", "channel")))
        .where(expr("(m div cast(pow(2, i) as int)) % 2 = 0"))
        .withColumn("sig1", array_join(
          expr("filter(arr, (x, j) -> ((m div cast(pow(2, j) as int)) % 2) = 1 or j = i)"),
          ","))
      def vOf(df: DataFrame, sigCol: String, as: String) =
        df.join(broadcast(stats).withColumnRenamed("sig", sigCol + "_s"),
                col(sigCol) === col(sigCol + "_s"), "left")
          .withColumn(as, coalesce(d(col("convs")) / d(col("units")),
                                   lit(0.0)))
          .drop(sigCol + "_s", "units", "convs")
      val terms = vOf(vOf(pairs, "sig", "v0"), "sig1", "v1")
        .withColumn("w", factorial(col("sz")) *
                         factorial(col("k") - col("sz") - 1))
        .withColumn("term",
          round(col("w") * (col("v1") - col("v0")), 12)
            .cast("decimal(28,12)"))
      terms.groupBy("channel")
        .agg(round(d(sum(col("term"))) /
                   d(max(factorial(col("k")))), 6).as("phi"))
        .orderBy("channel")
    },

    // McNemar paired-classifier test (added r12) — the comparison the
    // independent-sample family (q158/q251/q247) gets WRONG for two
    // models scored on the SAME rows: only the disagreement cells
    // carry information. Classifier A (discount ≥ 5%) vs classifier B
    // (quantity ≥ 25) predicting the return flag on every lineitem;
    // fold to the 2×2 paired-correctness cells in ONE map-side-combined
    // scan; χ² = (|b−c|−1)²/(b+c) with continuity correction — exact
    // integers until one division, 6 dp. The table is the standard
    // pre-launch "is the new model actually better on the same
    // traffic" readout.
    "q286_mcnemar" -> { (s, dir) =>
      val t = Tables(s, dir, "lineitem")
        .select((col("l_returnflag") === "R").as("y"),
                (col("l_discount") >= 0.05).as("pa"),
                (col("l_quantity") >= 25).as("pb"))
        .select((col("pa") === col("y")).as("ca"),
                (col("pb") === col("y")).as("cb"))
      t.agg(
          sum(when(col("ca") && col("cb"), 1L).otherwise(0L)).as("a"),
          sum(when(col("ca") && !col("cb"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("ca") && col("cb"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("ca") && !col("cb"), 1L).otherwise(0L)).as("dd"))
        .select(col("a"), col("b"), col("c"), col("dd").as("d"),
          round(d(col("a") + col("b")) /
                d(col("a") + col("b") + col("c") + col("dd")), 6)
            .as("acc_a"),
          round(d(col("a") + col("c")) /
                d(col("a") + col("b") + col("c") + col("dd")), 6)
            .as("acc_b"),
          round(d((abs(col("b") - col("c")) - 1).cast("decimal(38,0)") *
                  (abs(col("b") - col("c")) - 1)) /
                d(col("b") + col("c")), 6).as("chi2"))
    },

    // Cohen's kappa (added r12) — chance-corrected agreement between
    // two labelers over the SAME items: the QA statistic every
    // annotation pipeline reports before trusting its labels (raw
    // agreement flatters whenever the marginals are skewed). Two
    // deterministic document labelers — a length-class rater and a
    // quality-class rater, both into {0,1,2} — fold to the 3×3
    // confusion cells in one scan; po (observed agreement) and pe
    // (chance agreement from the marginal products) derive from exact
    // integer cells, each divides once 6 dp, and κ = (po−pe)/(1−pe)
    // recomputes from the two ROUNDED reported figures (q251's
    // reproducible-from-the-row-itself discipline).
    "q287_cohens_kappa" -> { (s, dir) =>
      val q = graft.operators.TextExtOps.qualityScore
      val t = Tables(s, dir, "documents")
        .select(when(col("n_chars") < 200, 0)
                  .when(col("n_chars") < 500, 1).otherwise(2).as("r1"),
                when(q < 0.4, 0).when(q < 0.6, 1).otherwise(2).as("r2"))
      val cells = t.groupBy("r1", "r2").agg(count(lit(1)).as("c"))
      val m = cells.agg(
        sum("c").as("n"),
        sum(when(col("r1") === col("r2"), col("c")).otherwise(0L))
          .as("agree"),
        sum(when(col("r1") === 0, col("c")).otherwise(0L)).as("ra0"),
        sum(when(col("r1") === 1, col("c")).otherwise(0L)).as("ra1"),
        sum(when(col("r1") === 2, col("c")).otherwise(0L)).as("ra2"),
        sum(when(col("r2") === 0, col("c")).otherwise(0L)).as("rb0"),
        sum(when(col("r2") === 1, col("c")).otherwise(0L)).as("rb1"),
        sum(when(col("r2") === 2, col("c")).otherwise(0L)).as("rb2"))
      m.select(col("n"),
          round(d(col("agree")) / d(col("n")), 6).as("po"),
          round(d(col("ra0").cast("decimal(38,0)") * col("rb0") +
                  col("ra1").cast("decimal(38,0)") * col("rb1") +
                  col("ra2").cast("decimal(38,0)") * col("rb2")) /
                d(col("n").cast("decimal(38,0)") * col("n")), 6)
            .as("pe"))
        .withColumn("kappa",
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6))
    },

    // Expected calibration error / reliability table (added r12) —
    // q272 RE-FITS a miscalibrated score; this MEASURES how far off it
    // is first (the order a pipeline actually runs). Pseudo-confidence
    // = discount×10 over its 11 exact value groups (the natural bins —
    // no binning knob), outcome = return flag: per bin n, mean
    // confidence, empirical accuracy, |gap|; ECE = Σ (n_b/N)·|gap_b|
    // with per-bin terms rounded 12 dp into decimal (q142's order-free
    // sum) and reported as a window over the 11-row bin table (the
    // windows-over-cells pattern — no second scan, no separate total
    // row). ONE lineitem scan.
    "q288_ece" -> { (s, dir) =>
      val bins = Tables(s, dir, "lineitem")
        .select(round(col("l_discount") * 100).cast("long").as("sc"),
                when(col("l_returnflag") === "R", 1L).otherwise(0L)
                  .as("y"))
        .groupBy("sc")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val wAll = Window.partitionBy(lit(1))
      bins
        .withColumn("conf", round(d(col("sc")) / 100.0, 6))
        .withColumn("acc", round(d(col("pos")) / d(col("n")), 6))
        .withColumn("gap", abs(col("acc") - col("conf")))
        .withColumn("nn", sum(col("n")).over(wAll))
        .withColumn("term",
          round(d(col("n")) / d(col("nn")) * col("gap"), 12)
            .cast("decimal(28,12)"))
        .withColumn("ece", round(sum(col("term")).over(wAll)
          .cast("double"), 6))
        .select(col("sc").as("conf_cents"), col("n"), col("conf"),
                col("acc"), round(col("gap"), 6).as("abs_gap"),
                col("ece"))
        .orderBy("conf_cents")
    },

    // Offline policy evaluation via inverse propensity scoring (added
    // r12) — the counterfactual EVALUATION member next to the
    // counterfactual ATTRIBUTION pair (q274/q279): estimate what a NEW
    // action policy would earn from logs collected under the OLD
    // behavior, without an experiment. Logged rounds = events (context
    // = hour of day, action = event type, reward = value cents);
    // behavior propensities are estimated from the logs themselves
    // (p̂(a|ctx) = exact cell counts via two windows on ONE
    // ctx-partitioned shuffle); target policy = the deterministic
    // hour rule (click before noon, view after). IPS = mean of
    // matched-round reward/p̂ and SNIPS = its self-normalized form;
    // per-row IEEE terms round 12 dp into decimal (q142's order-free
    // sum at row grain — q233's precedent), each estimator divides
    // once, 6 dp. ONE fact scan.
    "q290_ips_offline_eval" -> { (s, dir) =>
      val wCtx = Window.partitionBy("ctx")
      val wCell = Window.partitionBy("ctx", "action")
      val t = Tables(s, dir, "events")
        .select(hour(col("ts")).as("ctx"),
                col("event_type").as("action"),
                round(col("value") * 100).cast("long").as("r"))
        .withColumn("pi_a",
          when(col("ctx") < 12, "click").otherwise("view"))
        .withColumn("phat",
          d(count(lit(1)).over(wCell)) / d(count(lit(1)).over(wCtx)))
        .withColumn("m", (col("action") === col("pi_a")).cast("long"))
        .withColumn("w", d(col("m")) / col("phat"))
        .withColumn("wr",
          round(col("w") * d(col("r")) / 100.0, 12)
            .cast("decimal(28,12)"))
        .withColumn("wt", round(col("w"), 12).cast("decimal(28,12)"))
      t.agg(count(lit(1)).as("n"),
            sum(col("m")).as("n_matched"),
            round(d(sum(col("wr"))) / d(count(lit(1))), 6).as("ips"),
            round(d(sum(col("wr"))) / d(sum(col("wt"))), 6).as("snips"))
    },

    // k-anonymity / l-diversity audit (added r12) — the GOVERNANCE
    // gate a dataset passes before an export or a training run: under
    // the quasi-identifier set (nation, $100 balance band), how close
    // is each customer to unique? Report the equivalence-class-size
    // histogram (size-1 classes = directly re-identifiable rows; the
    // k in "k-anonymous" is the smallest size present) and, per size,
    // the worst-case l-diversity of the sensitive attribute (market
    // segment) — a class can be large yet leak the sensitive value if
    // all members share it (l=1, the homogeneity attack). ONE scan
    // folds rows to QI classes (exact counts + exact distinct), a
    // second cell-bound agg folds classes to the ≤|sizes| histogram;
    // shares divide exact counts once, 6 dp.
    "q293_k_anonymity" -> { (s, dir) =>
      val classes = Tables(s, dir, "customer")
        .select(col("c_nationkey").as("nat"),
                expr("(cast(round(c_acctbal * 100) as bigint) + 100000)" +
                     " div 10000").as("band"),
                col("c_mktsegment").as("sens"))
        .groupBy("nat", "band")
        .agg(count(lit(1)).as("sz"),
             countDistinct(col("sens")).as("l"))
      val wAll = Window.partitionBy(lit(1))
      classes.groupBy("sz")
        .agg(count(lit(1)).as("n_classes"),
             sum(col("sz")).cast("long").as("n_rows"),
             min(col("l")).as("l_min"))
        .withColumn("row_share",
          round(d(col("n_rows")) /
                d(sum(col("n_rows")).over(wAll)), 6))
        .select(col("sz").as("class_size"), col("n_classes"),
                col("n_rows"), col("l_min"), col("row_share"))
        .orderBy("class_size")
    },

    // ε-differentially-private count release (added r13) — the
    // RELEASE step after q293's k-anonymity audit: the histogram a
    // pipeline may actually publish. Per (market segment, nation)
    // cell, the customer count plus Laplace(1/ε) noise, ε = 1 —
    // count queries have sensitivity 1, so this is the textbook
    // Laplace mechanism (Dwork et al. 2006), and the integer rounding
    // + clamp-at-zero are post-processing (DP is closed under it).
    // Noise draws are md5-derived inverse-CDF samples keyed by the
    // CELL (the q67 no-RNG discipline: production seals a seed, the
    // hash stands in — reproducible release, engine-identical):
    // u = (h48 + 0.5)/2^48 ∈ (0,1), lap = −sign(u−½)·ln(1−2|u−½|)
    // rounded 6 BEFORE the add (the round-ln-once discipline), then
    // the floor(x+0.5) integer chain (q308: engine round() on doubles
    // diverges). ONE dim scan + broadcast nation join → ≤5×25 cells;
    // at any corpus the released table is domain-bound. The noisy
    // count is the ONLY count released; true counts never leave the
    // query (the spec recomputes them independently to certify noise
    // calibration).
    "q327_dp_release" -> { (s, dir) =>
      val cells = Tables(s, dir, "customer")
        .join(broadcast(Tables(s, dir, "nation")
                          .select(col("n_nationkey"), col("n_name"))),
              col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment").as("segment"),
                 col("n_name").as("nation"))
        .agg(count(lit(1)).as("cnt"))
      cells
        .withColumn("u",
          (conv(substring(md5(concat(col("segment"), lit(":"),
                                     col("nation"))), 1, 12),
                16, 10).cast("double") + lit(0.5)) /
            lit(281474976710656.0))
        .withColumn("lap6", expr(
          "round(-sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6)"))
        .select(col("segment"), col("nation"),
                greatest(expr(
                  "CAST(floor(CAST(cnt AS DOUBLE) + lap6 + 0.5) AS BIGINT)"),
                  lit(0L)).as("noisy_cnt"))
        .orderBy("segment", "nation")
    },

    // Decision-stump split search (added r12) — the primitive inside
    // every tree learner, as a first-class operator: for each feature
    // (discount cents, quantity), the threshold minimizing the
    // weighted Gini impurity of the return-flag label, with the
    // impurity gain over the unsplit parent. The search runs entirely
    // on VALUE-GROUP tables (q247's discipline): one unpivoted scan
    // folds both features' (feature, value) label counts, cumulative
    // windows turn each candidate threshold into exact (n_left,
    // pos_left) integers, and the weighted Gini is a fixed-order
    // double formula over those exact counts (bit-identical in both
    // engines ⇒ the argmin agrees; ties take the smaller threshold,
    // declared). Candidates are domain-bound (|values| per feature) at
    // any corpus size; the argmin is one row_number per feature.
    "q294_best_split" -> { (s, dir) =>
      val rows = Tables(s, dir, "lineitem")
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L)
                  .as("y"),
                round(col("l_discount") * 100).cast("long").as("disc"),
                col("l_quantity").cast("long").as("qty"))
        .select(expr("stack(2, 'discount_cents', disc, 'quantity', qty)" +
                     " AS (feature, v)"), col("y"))
      val vg = rows.groupBy("feature", "v")
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      val wOrd = Window.partitionBy("feature").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("feature")
      val cand = vg
        .withColumn("cn", sum("n").over(wOrd))
        .withColumn("cp", sum("pos").over(wOrd))
        .withColumn("nn", sum("n").over(wAll))
        .withColumn("pp", sum("pos").over(wAll))
        .where(col("cn") < col("nn")) // last boundary splits nothing
      def gini(n: Column, p: Column) =
        lit(1.0) - (d(p) / d(n)) * (d(p) / d(n)) -
          (d(n - p) / d(n)) * (d(n - p) / d(n))
      val scored = cand
        .withColumn("g_parent", gini(col("nn"), col("pp")))
        .withColumn("g_split",
          d(col("cn")) / d(col("nn")) * gini(col("cn"), col("cp")) +
          d(col("nn") - col("cn")) / d(col("nn")) *
            gini(col("nn") - col("cn"), col("pp") - col("cp")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("feature")
            .orderBy(col("g_split").asc, col("v").asc)))
      scored.where(col("rn") === 1)
        .select(col("feature"), col("v").as("threshold"),
                col("cn").as("n_left"),
                round(col("g_parent"), 6).as("parent_gini"),
                round(col("g_split"), 6).as("split_gini"),
                round(col("g_parent") - col("g_split"), 6).as("gain"))
        .orderBy("feature")
    },

    // Exact stratified train/test split (added r12) — the experiment-
    // prep step between q226's leakage-safe GROUP split and q240's
    // class-balance report: per stratum (market segment), EXACTLY
    // ⌈0.8·n⌉ units go to train (a Bernoulli hash split only hits the
    // ratio in expectation — a small stratum can land 70/30), chosen
    // by md5(key) rank so the assignment is deterministic, seedless,
    // and stable under re-runs/backfills (q67's membership discipline
    // applied to splitting). ⌈0.8n⌉ = (8n+9) div 10 in exact integers;
    // the per-stratum train-key checksum makes MEMBERSHIP (not just
    // counts) hash-checkable against the oracle. One dimension scan,
    // one stratum-partitioned rank window — at fact scale the window
    // partitions by stratum (parallel), never global.
    "q281_stratified_split" -> { (s, dir) =>
      val wr = Window.partitionBy("seg").orderBy("h", "k")
      val wn = Window.partitionBy("seg")
      Tables(s, dir, "customer")
        .select(col("c_custkey").as("k"),
                col("c_mktsegment").as("seg"),
                md5(col("c_custkey").cast("string")).as("h"))
        .withColumn("rn", row_number().over(wr).cast("long"))
        .withColumn("ns", count(lit(1)).over(wn))
        .withColumn("train", col("rn") <= expr("(ns * 8 + 9) div 10"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"),
             sum(when(col("train"), 1L).otherwise(0L)).as("n_train"),
             sum(when(!col("train"), 1L).otherwise(0L)).as("n_test"),
             round(d(sum(when(col("train"), 1L).otherwise(0L))) /
                   d(count(lit(1))), 6).as("train_frac"),
             sum(when(col("train"), col("k").cast("decimal(38,0)"))
               .otherwise(lit(0).cast("decimal(38,0)"))).cast("double")
               .as("train_key_sum"))
        .orderBy("seg")
    },

    // Gradient-boosted stumps (added r13) — q294 searches ONE best
    // split; this TRAINS the additive model that search primitive
    // exists for: 3 rounds of depth-1 gradient boosting on squared
    // loss (learning rate 0.5) predicting price from (qty, disc).
    // The scale insight: with depth-1 trees on two integer features,
    // every row's prediction is a function of its (qty, disc) CELL —
    // so ONE fact scan folds the corpus to the ≤|qty|×|disc| cell
    // table (n, Σy, Σy² exact decimals; ~550 cells here) and ALL
    // boosting rounds run as window algebra on that broadcast-sized
    // table: residual sums per cell, cumulative split scans per
    // feature, argmax, leaf means, prediction update — zero further
    // fact contact, no per-round rescans, no driver loop over data.
    // [[gbtBody]] is ONE statically-unrolled SQL string both engines
    // execute (the q307 discipline). Residual cell-sums grow with the
    // corpus, so NO fixed-dp `round()` of a double is cross-engine
    // safe here (sf0.001 found raw=91646.36499999999 identical in
    // both engines, with Spark's BigDecimal-HALF_UP round giving .36
    // and DuckDB's multiply-then-nearbyint giving .37) — instead
    // every quantization is the pure-IEEE chain
    // `floor(x * 1eK + 5e-1)` (declared half-toward-+inf), which is
    // bit-identical on any engine because it is nothing but IEEE
    // multiply/add/floor on identical operands. Residuals quantize to
    // exact CENTS decimals whose cum-sums are order-free; every split
    // score/leaf/update is a fixed-order double chain on identical
    // operands, argmax ties declared (feature name, then value).
    // Execution on the Spark side folds all three rounds in ONE task
    // over the pinned cell table (r19 — the q310 discipline; the
    // prior staged-per-round form still paid a pin + count + view per
    // round, 56 jobs for ~550 rows of state), replaying the IDENTICAL
    // operand chains [[gbtRound]] declares; the oracle runs the
    // unrolled gbtRound text. Output: per round, the chosen split,
    // leaf steps, and train RMSE after the update (monotone
    // decreasing — the trainer certification).
    "q308_gbt_stumps" -> { (s, dir) =>
      val (cells, ch) = pin(Tables(s, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("qty"),
                expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc"),
                expr("CAST(round(l_extendedprice) AS BIGINT)").as("y"))
        .groupBy("qty", "disc")
        .agg(count(lit(1)).as("n"),
             sum(col("y").cast("decimal(38,0)")).as("sy"),
             sum(col("y").cast("decimal(38,0)") * col("y")).as("syy")))
      ch.count(); graft.PinScope.retain(ch)
      // r19 optimization (the q310 fold applied to the boosting loop):
      // all three rounds are algebra over the ≤|qty|×|disc| cell table
      // (~550 rows), yet the staged form paid a pin + count + view per
      // round (56 jobs measured against 3.3 s of task time). The
      // rounds now fold in ONE task, replaying [[gbtRound]]'s chain
      // operation for operation in the same IEEE order: residuals
      // floor-quantize to exact cents (BigInt ≡ the decimal(28,0)
      // order-free sums), the per-feature cumulative split scans run
      // over v-ascending groups, the argmax keeps the declared
      // (score desc, feature, v) tie order, and every split score /
      // leaf / update / RMSE term is the same left-associative double
      // chain on identical operands. The oracle still runs the
      // unrolled gbtRound text, so any drift is caught by the hash.
      import s.implicits._
      cells.select(col("qty"), col("disc"), col("n"),
                   col("sy").cast("decimal(38,0)"),
                   col("syy").cast("decimal(38,0)"))
        .as[(Long, Long, Long, java.math.BigDecimal, java.math.BigDecimal)]
        .repartition(1)
        .mapPartitions { it =>
          val cs = it.toArray
          val nc = cs.length
          val (qty, disc) = (cs.map(_._1), cs.map(_._2))
          val n = cs.map(_._3)
          val syD = cs.map(_._4.doubleValue)
          val syyD = cs.map(_._5.doubleValue)
          val nD = n.map(_.toDouble)
          val syTot = cs.map(c => BigInt(c._4.toBigInteger)).sum
          val ntl = n.sum
          val nt = ntl.toDouble
          val p = Array.fill(nc)(syTot.toDouble / nt)
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Long, Double, Double, Double, Double)]
          for (m <- 1 to 3) {
            val sr = Array.tabulate(nc)(i =>
              BigInt(math.floor((syD(i) - nD(i) * p(i)) * 1e2 + 5e-1)
                .toLong))
            val st = sr.sum.toDouble
            // per-feature cumulative split scan: (feature, v, nld, sld)
            def scan(fv: Int => Long): Seq[(Long, Double, Double)] = {
              val g = (0 until nc).groupBy(fv)
                .map { case (v, is) =>
                  (v, is.map(n(_)).sum, is.map(sr(_)).sum) }
                .toSeq.sortBy(_._1)
              var (nl, sl) = (0L, BigInt(0))
              g.flatMap { case (v, fn, fs) =>
                nl += fn; sl += fs
                if (nl < ntl) Seq((v, nl.toDouble, sl.toDouble))
                else Seq.empty
              }
            }
            val cand =
              scan(i => disc(i)).map { case (v, nld, sld) =>
                ("disc", v, nld, sld) } ++
              scan(i => qty(i)).map { case (v, nld, sld) =>
                ("qty", v, nld, sld) }
            var best: (String, Long, Double, Double) = null
            var bestKey = Double.NegativeInfinity
            for ((f, v, nld, sld) <- cand) {
              val key = sld * sld / nld + (st - sld) * (st - sld) / (nt - nld)
              if (key > bestKey || (key == bestKey &&
                  (f < best._1 || (f == best._1 && v < best._2)))) {
                bestKey = key; best = (f, v, nld, sld)
              }
            }
            val (bf, bv, nld, sld) = (best._1, best._2, best._3, best._4)
            val gl = sld / nld
            val gr = (st - sld) / (nt - nld)
            val gain = math.floor((sld * sld / nld +
              (st - sld) * (st - sld) / (nt - nld) -
              st * st / nt) / nt / 1e4 * 1e6 + 5e-1) / 1e6
            var i = 0
            while (i < nc) {
              p(i) = p(i) + 5e-1 * (if ((bf == "qty" && qty(i) <= bv) ||
                                        (bf == "disc" && disc(i) <= bv))
                                      gl else gr) / 1e2
              i += 1
            }
            val msum = (0 until nc).map(i =>
              BigInt(math.floor((syyD(i) - 2e0 * p(i) * syD(i) +
                nD(i) * p(i) * p(i)) / nt * 1e4 + 5e-1).toLong)).sum
            val rmse = math.floor(
              math.sqrt(msum.toDouble / 1e4) * 1e6 + 5e-1) / 1e6
            out += ((m.toLong, bf, bv, gain,
                     math.floor(5e-1 * gl / 1e2 * 1e6 + 5e-1) / 1e6,
                     math.floor(5e-1 * gr / 1e2 * 1e6 + 5e-1) / 1e6,
                     rmse))
          }
          out.iterator
        }
        .toDF("boost_round", "feature", "threshold", "gain",
              "step_left", "step_right", "rmse")
        .orderBy("boost_round")
    })

  /** One boosting round's CTE block (residual fold → per-feature
    * cumulative split scan → argmax → prediction update → RMSE),
    * reading the previous round's cell table `prev` (qty, disc, n,
    * sy, syy, p). The SAME text serves the oracle's unrolled chain
    * (prev = the prior round's CTE) and Spark's staged execution
    * (prev = the prior round's pinned view) — one string, identical
    * operand chains, two materialization strategies. */
  private def gbtRound(m: Int, prev: String): String =
      s"""sr$m AS (
         |  SELECT qty, disc, n, sy, syy, p,
         |    CAST(floor((CAST(sy AS DOUBLE) - CAST(n AS DOUBLE) * p)
         |               * 1e2 + 5e-1) AS DECIMAL(28,0)) AS sr
         |  FROM $prev),
         |tot$m AS (
         |  SELECT CAST(sum(sr) AS DOUBLE) AS st,
         |         CAST(sum(n) AS DOUBLE) AS nt, sum(n) AS ntl
         |  FROM sr$m),
         |fq$m AS (SELECT qty AS v, sum(n) AS fn, sum(sr) AS fs
         |         FROM sr$m GROUP BY qty),
         |cq$m AS (
         |  SELECT v, sum(fn) OVER w AS nl, sum(fs) OVER w AS sl
         |  FROM fq$m
         |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         |               AND CURRENT ROW)),
         |fd$m AS (SELECT disc AS v, sum(n) AS fn, sum(sr) AS fs
         |         FROM sr$m GROUP BY disc),
         |cd$m AS (
         |  SELECT v, sum(fn) OVER w AS nl, sum(fs) OVER w AS sl
         |  FROM fd$m
         |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         |               AND CURRENT ROW)),
         |sc$m AS (
         |  SELECT feature, v, CAST(nl AS DOUBLE) AS nld,
         |         CAST(sl AS DOUBLE) AS sld, st, nt
         |  FROM (SELECT 'qty' AS feature, v, nl, sl FROM cq$m
         |        UNION ALL
         |        SELECT 'disc' AS feature, v, nl, sl FROM cd$m)
         |  CROSS JOIN tot$m WHERE nl < ntl),
         |bs$m AS (
         |  SELECT feature, v, sld / nld AS gl,
         |         (st - sld) / (nt - nld) AS gr,
         |         CAST(floor((sld * sld / nld +
         |                     (st - sld) * (st - sld) / (nt - nld) -
         |                     st * st / nt) / nt / 1e4 * 1e6 + 5e-1)
         |              AS DOUBLE) / 1e6 AS gain
         |  FROM sc$m
         |  ORDER BY sld * sld / nld +
         |           (st - sld) * (st - sld) / (nt - nld) DESC,
         |           feature, v
         |  LIMIT 1),
         |up$m AS (
         |  SELECT c.qty, c.disc, c.n, c.sy, c.syy,
         |    c.p + 5e-1 * (CASE WHEN (b.feature = 'qty' AND c.qty <= b.v)
         |                        OR (b.feature = 'disc' AND c.disc <= b.v)
         |                  THEN b.gl ELSE b.gr END) / 1e2 AS p
         |  FROM sr$m c CROSS JOIN bs$m b),
         |mt$m AS (
         |  SELECT CAST(floor(sqrt(CAST(sum(CAST(floor(
         |      (CAST(syy AS DOUBLE) - 2e0 * p * CAST(sy AS DOUBLE) +
         |       CAST(n AS DOUBLE) * p * p) / t.nt * 1e4 + 5e-1)
         |      AS DECIMAL(28,0))) AS DOUBLE) / 1e4) * 1e6 + 5e-1)
         |      AS DOUBLE) / 1e6 AS rmse
         |  FROM up$m CROSS JOIN tot$m t),
         |out$m AS (
         |  SELECT $m AS boost_round, b.feature,
         |    CAST(b.v AS BIGINT) AS threshold,
         |    b.gain,
         |    CAST(floor(5e-1 * b.gl / 1e2 * 1e6 + 5e-1) AS DOUBLE) / 1e6
         |      AS step_left,
         |    CAST(floor(5e-1 * b.gr / 1e2 * 1e6 + 5e-1) AS DOUBLE) / 1e6
         |      AS step_right, m.rmse
         |  FROM bs$m b CROSS JOIN mt$m m)""".stripMargin

  /** q308's full boosting body for the ORACLE: everything after
    * `WITH`, parameterized only by the cell table's name — three
    * statically-unrolled [[gbtRound]] blocks. Contract of `cells`:
    * (qty, disc, n BIGINT, sy, syy exact wide ints). */
  private def gbtBody(cells: String): String =
    s"""base AS (SELECT qty, disc, n, sy, syy FROM $cells),
       |g0 AS (SELECT CAST(sum(sy) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
       |         AS p0 FROM base),
       |pr0 AS (SELECT b.qty, b.disc, b.n, b.sy, b.syy, g0.p0 AS p
       |        FROM base b CROSS JOIN g0),
       |${gbtRound(1, "pr0")},
       |${gbtRound(2, "up1")},
       |${gbtRound(3, "up2")}
       |SELECT CAST(boost_round AS BIGINT) AS boost_round, feature,
       |  threshold, gain, step_left, step_right, rmse
       |FROM (SELECT * FROM out1 UNION ALL
       |      SELECT * FROM out2 UNION ALL
       |      SELECT * FROM out3)
       |ORDER BY boost_round""".stripMargin

  def oracles: Map[String, String] = Map(

    // identical user fold, cell table, cumulative split windows and
    // rounded-before-ranking uplift chain
    "q318_uplift_stump" ->
      """WITH pu AS (
        |  SELECT user_id, count(*) AS nev,
        |    count(DISTINCT event_type) AS ntypes,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |        THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |pt AS (
        |  SELECT least(nev // 10, 20) AS x1, ntypes AS x2, y,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
        |         THEN 0 ELSE 1 END AS t
        |  FROM pu),
        |fv AS (SELECT 'activity' AS f, x1 AS v, t, y FROM pt
        |       UNION ALL SELECT 'breadth', x2, t, y FROM pt),
        |cells AS (
        |  SELECT f, v,
        |    sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS nc,
        |    sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS xc,
        |    sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS nt,
        |    sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS xt
        |  FROM fv GROUP BY 1, 2),
        |cum AS (
        |  SELECT *, sum(nc) OVER w AS cnc, sum(xc) OVER w AS cxc,
        |    sum(nt) OVER w AS cnt, sum(xt) OVER w AS cxt
        |  FROM cells WINDOW w AS (PARTITION BY f ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT f, sum(nc) AS tnc, sum(xc) AS txc,
        |        sum(nt) AS tnt, sum(xt) AS txt FROM cells GROUP BY 1),
        |sc AS (
        |  SELECT c.f, c.v, c.cnc, c.cnt, t.tnc, t.tnt,
        |    round(CAST(c.cxt AS DOUBLE) / CAST(c.cnt AS DOUBLE) -
        |          CAST(c.cxc AS DOUBLE) / CAST(c.cnc AS DOUBLE), 6)
        |      AS ul,
        |    round(CAST(t.txt - c.cxt AS DOUBLE) /
        |          CAST(t.tnt - c.cnt AS DOUBLE) -
        |          CAST(t.txc - c.cxc AS DOUBLE) /
        |          CAST(t.tnc - c.cnc AS DOUBLE), 6) AS ur
        |  FROM cum c JOIN tot t USING (f)
        |  WHERE c.cnc > 0 AND c.cnt > 0 AND t.tnc - c.cnc > 0
        |    AND t.tnt - c.cnt > 0),
        |g AS (
        |  SELECT *, round((ul - ur) * (ul - ur), 6) AS gain,
        |    row_number() OVER (PARTITION BY f
        |      ORDER BY round((ul - ur) * (ul - ur), 6) DESC, v) AS rn
        |  FROM sc)
        |SELECT f AS feature, v AS threshold,
        |  CAST(cnc + cnt AS BIGINT) AS n_left,
        |  CAST(tnc - cnc + tnt - cnt AS BIGINT) AS n_right,
        |  ul AS uplift_left, ur AS uplift_right, gain
        |FROM g WHERE rn = 1 ORDER BY feature""".stripMargin,

    "q271_diff_in_diff" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |             THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |             ELSE 0 END) AS pre,
        |    sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |             THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |             ELSE 0 END) AS post
        |  FROM orders GROUP BY 1),
        |per AS (
        |  SELECT CASE WHEN r.r_name = 'ASIA' THEN 1 ELSE 0 END AS treated,
        |         COALESCE(s.pre, 0) AS pre, COALESCE(s.post, 0) AS post,
        |         COALESCE(s.post, 0) - COALESCE(s.pre, 0) AS delta
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  LEFT JOIN spend s ON c.c_custkey = s.o_custkey),
        |cells AS (
        |  SELECT treated, count(*) AS n,
        |    sum(CAST(pre AS DECIMAL(38,0))) AS spre,
        |    sum(CAST(post AS DECIMAL(38,0))) AS spost,
        |    sum(CAST(delta AS DECIMAL(38,0))) AS sd,
        |    sum(CAST(delta AS DECIMAL(38,0)) * delta) AS sdd
        |  FROM per GROUP BY 1),
        |p AS (
        |  SELECT
        |    max(CASE WHEN treated = 0 THEN n END) AS n_0,
        |    max(CASE WHEN treated = 1 THEN n END) AS n_1,
        |    max(CASE WHEN treated = 0 THEN spre END) AS spre_0,
        |    max(CASE WHEN treated = 1 THEN spre END) AS spre_1,
        |    max(CASE WHEN treated = 0 THEN spost END) AS spost_0,
        |    max(CASE WHEN treated = 1 THEN spost END) AS spost_1,
        |    max(CASE WHEN treated = 0 THEN sd END) AS sd_0,
        |    max(CASE WHEN treated = 1 THEN sd END) AS sd_1,
        |    max(CASE WHEN treated = 0 THEN sdd END) AS sdd_0,
        |    max(CASE WHEN treated = 1 THEN sdd END) AS sdd_1
        |  FROM cells),
        |v AS (
        |  SELECT *,
        |    CAST(n_0 * sdd_0 - sd_0 * sd_0 AS DOUBLE) /
        |      CAST(n_0 * (n_0 - 1) AS DOUBLE) AS var0,
        |    CAST(n_1 * sdd_1 - sd_1 * sd_1 AS DOUBLE) /
        |      CAST(n_1 * (n_1 - 1) AS DOUBLE) AS var1
        |  FROM p)
        |SELECT n_0 AS n_control, n_1 AS n_treated,
        |  round(CAST(spre_0 AS DOUBLE) / CAST(n_0 AS DOUBLE) / 100.0, 6)
        |    AS pre_control,
        |  round(CAST(spost_0 AS DOUBLE) / CAST(n_0 AS DOUBLE) / 100.0, 6)
        |    AS post_control,
        |  round(CAST(spre_1 AS DOUBLE) / CAST(n_1 AS DOUBLE) / 100.0, 6)
        |    AS pre_treated,
        |  round(CAST(spost_1 AS DOUBLE) / CAST(n_1 AS DOUBLE) / 100.0, 6)
        |    AS post_treated,
        |  round((CAST(sd_1 AS DOUBLE) / CAST(n_1 AS DOUBLE) -
        |         CAST(sd_0 AS DOUBLE) / CAST(n_0 AS DOUBLE)) / 100.0, 6)
        |    AS did,
        |  round(sqrt(var1 / CAST(n_1 AS DOUBLE) +
        |             var0 / CAST(n_0 AS DOUBLE)) / 100.0, 6) AS se,
        |  round((CAST(sd_1 AS DOUBLE) / CAST(n_1 AS DOUBLE) -
        |         CAST(sd_0 AS DOUBLE) / CAST(n_0 AS DOUBLE)) /
        |        sqrt(var1 / CAST(n_1 AS DOUBLE) +
        |             var0 / CAST(n_0 AS DOUBLE)), 6) AS t_stat
        |FROM v""".stripMargin,

    "q272_isotonic_calibration" ->
      """WITH bins AS (
        |  SELECT CAST(round(l_discount * 100) AS BIGINT) AS sc,
        |         count(*) AS w,
        |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT sc, w, pos,
        |    sum(w) OVER (ORDER BY sc) AS cw,
        |    sum(pos) OVER (ORDER BY sc) AS cp,
        |    sum(w) OVER (ORDER BY sc) - w AS cw0,
        |    sum(pos) OVER (ORDER BY sc) - pos AS cp0
        |  FROM bins),
        |sm AS (
        |  SELECT lo.sc AS j,
        |    min(CAST(hi.cp - lo.cp0 AS DOUBLE) /
        |        CAST(hi.cw - lo.cw0 AS DOUBLE)) AS m
        |  FROM cum lo JOIN cum hi ON lo.sc <= hi.sc
        |  GROUP BY 1),
        |iso AS (
        |  SELECT j, max(m) OVER (ORDER BY j
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iso
        |  FROM sm)
        |SELECT b.sc AS discount_cents, b.w AS n,
        |  round(CAST(b.pos AS DOUBLE) / CAST(b.w AS DOUBLE), 6)
        |    AS raw_rate,
        |  round(i.iso, 6) AS iso_rate
        |FROM bins b JOIN iso i ON b.sc = i.j
        |ORDER BY discount_cents""".stripMargin,

    "q273_propensity_match" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sp
        |  FROM orders GROUP BY 1),
        |u AS (
        |  SELECT c.c_custkey AS key,
        |    CAST(round(c.c_acctbal * 100) AS BIGINT) AS score,
        |    c.c_mktsegment = 'BUILDING' AS tr,
        |    COALESCE(s.sp, 0) AS outv
        |  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey),
        |filled AS (
        |  SELECT *,
        |    last_value(CASE WHEN NOT tr THEN score END IGNORE NULLS)
        |      OVER (ORDER BY score, key
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS ps,
        |    last_value(CASE WHEN NOT tr THEN outv END IGNORE NULLS)
        |      OVER (ORDER BY score, key
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS po,
        |    first_value(CASE WHEN NOT tr THEN score END IGNORE NULLS)
        |      OVER (ORDER BY score, key
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS ns,
        |    first_value(CASE WHEN NOT tr THEN outv END IGNORE NULLS)
        |      OVER (ORDER BY score, key
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS no
        |  FROM u),
        |m AS (
        |  SELECT *,
        |    CASE WHEN ps IS NOT NULL THEN score - ps END AS dp,
        |    CASE WHEN ns IS NOT NULL THEN ns - score END AS dn
        |  FROM filled WHERE tr),
        |sel AS (
        |  SELECT *,
        |    CASE WHEN dp IS NOT NULL AND (dn IS NULL OR dp <= dn)
        |         THEN po ELSE no END AS mo,
        |    CASE WHEN dp IS NOT NULL AND (dn IS NULL OR dp <= dn)
        |         THEN dp ELSE dn END AS gap
        |  FROM m),
        |f AS (
        |  SELECT *, gap IS NOT NULL AND gap <= 1000 AS ok FROM sel)
        |SELECT count(*) AS n_treated,
        |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_matched,
        |  round(CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE), 6) AS match_rate,
        |  round(CAST(sum(CASE WHEN ok
        |                      THEN CAST(outv - mo AS DECIMAL(38,0))
        |                      ELSE CAST(0 AS DECIMAL(38,0)) END)
        |             AS DOUBLE) /
        |        CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS DOUBLE) /
        |        100.0, 6) AS att,
        |  round(CAST(sum(CASE WHEN ok THEN CAST(gap AS DECIMAL(38,0))
        |                      ELSE CAST(0 AS DECIMAL(38,0)) END)
        |             AS DOUBLE) /
        |        CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS DOUBLE), 6)
        |    AS avg_gap_cents
        |FROM f""".stripMargin,

    "q274_shapley_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_type
        |  FROM events),
        |units AS (
        |  SELECT user_id, day,
        |    COALESCE(string_agg(DISTINCT
        |      CASE WHEN event_type <> 'purchase' THEN event_type END,
        |      ',' ORDER BY
        |      CASE WHEN event_type <> 'purchase' THEN event_type END),
        |      '') AS sig,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM ev GROUP BY 1, 2),
        |stats AS (
        |  SELECT sig, count(*) AS units, sum(conv) AS convs
        |  FROM units GROUP BY 1),
        |chans AS (
        |  SELECT list_sort(list(DISTINCT event_type)) AS arr,
        |         count(DISTINCT event_type) AS k
        |  FROM ev WHERE event_type <> 'purchase'),
        |masks AS (
        |  SELECT arr, k,
        |    unnest(range(0, CAST(pow(2, k) AS BIGINT))) AS m
        |  FROM chans),
        |lattice AS (
        |  SELECT arr, k, m,
        |    list_aggregate(list_filter(arr,
        |      (x, i) -> ((m // CAST(pow(2, i - 1) AS BIGINT)) % 2) = 1),
        |      'string_agg', ',') AS sig,
        |    bit_count(CAST(m AS BIGINT)) AS sz
        |  FROM masks),
        |px AS (
        |  SELECT arr, k, m, sig, sz,
        |    unnest(list_transform(arr,
        |      (x, i) -> {'channel': x, 'i': i - 1})) AS ci
        |  FROM lattice),
        |pairs AS (
        |  SELECT arr, k, m, sig, sz, ci.i AS i, ci.channel AS channel,
        |    list_aggregate(list_filter(arr,
        |      (x, j) -> ((m // CAST(pow(2, j - 1) AS BIGINT)) % 2) = 1
        |                OR j - 1 = ci.i),
        |      'string_agg', ',') AS sig1
        |  FROM px
        |  WHERE ((m // CAST(pow(2, ci.i) AS BIGINT)) % 2) = 0),
        |terms AS (
        |  SELECT p.channel, p.k,
        |    CAST(round(factorial(CAST(p.sz AS INT)) * factorial(CAST(p.k - p.sz - 1 AS INT)) *
        |      (COALESCE(CAST(s1.convs AS DOUBLE) /
        |                CAST(s1.units AS DOUBLE), 0.0) -
        |       COALESCE(CAST(s0.convs AS DOUBLE) /
        |                CAST(s0.units AS DOUBLE), 0.0)), 12)
        |      AS DECIMAL(28,12)) AS term
        |  FROM pairs p
        |  LEFT JOIN stats s0 ON COALESCE(p.sig, '') = s0.sig
        |  LEFT JOIN stats s1 ON p.sig1 = s1.sig)
        |SELECT channel,
        |  round(CAST(sum(term) AS DOUBLE) /
        |        CAST(max(factorial(CAST(k AS INT))) AS DOUBLE), 6) AS phi
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,

    "q286_mcnemar" ->
      """WITH t AS (
        |  SELECT (l_discount >= 0.05) = (l_returnflag = 'R') AS ca,
        |         (l_quantity >= 25) = (l_returnflag = 'R') AS cb
        |  FROM lineitem),
        |m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN ca AND cb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a,
        |    CAST(sum(CASE WHEN ca AND NOT cb THEN 1 ELSE 0 END)
        |         AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT ca AND cb THEN 1 ELSE 0 END)
        |         AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT ca AND NOT cb THEN 1 ELSE 0 END)
        |         AS BIGINT) AS d
        |  FROM t)
        |SELECT a, b, c, d,
        |  round(CAST(a + b AS DOUBLE) / CAST(a + b + c + d AS DOUBLE), 6)
        |    AS acc_a,
        |  round(CAST(a + c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE), 6)
        |    AS acc_b,
        |  round(CAST(CAST(abs(b - c) - 1 AS DECIMAL(38,0)) *
        |             (abs(b - c) - 1) AS DOUBLE) /
        |        CAST(b + c AS DOUBLE), 6) AS chi2
        |FROM m""".stripMargin,

    "q287_cohens_kappa" -> {
      val qs = graft.operators.TextExtOps.qualityScoreSql
      s"""WITH t AS (
         |  SELECT CASE WHEN n_chars < 200 THEN 0
         |              WHEN n_chars < 500 THEN 1 ELSE 2 END AS r1,
         |    CASE WHEN ($qs) < 0.4 THEN 0
         |         WHEN ($qs) < 0.6 THEN 1 ELSE 2 END AS r2
         |  FROM documents),
         |cells AS (SELECT r1, r2, count(*) AS c FROM t GROUP BY 1, 2),
         |m AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN r1 = r2 THEN c ELSE 0 END) AS BIGINT)
         |      AS agree,
         |    CAST(sum(CASE WHEN r1 = 0 THEN c ELSE 0 END) AS BIGINT)
         |      AS ra0,
         |    CAST(sum(CASE WHEN r1 = 1 THEN c ELSE 0 END) AS BIGINT)
         |      AS ra1,
         |    CAST(sum(CASE WHEN r1 = 2 THEN c ELSE 0 END) AS BIGINT)
         |      AS ra2,
         |    CAST(sum(CASE WHEN r2 = 0 THEN c ELSE 0 END) AS BIGINT)
         |      AS rb0,
         |    CAST(sum(CASE WHEN r2 = 1 THEN c ELSE 0 END) AS BIGINT)
         |      AS rb1,
         |    CAST(sum(CASE WHEN r2 = 2 THEN c ELSE 0 END) AS BIGINT)
         |      AS rb2
         |  FROM cells),
         |r AS (
         |  SELECT n,
         |    round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
         |    round(CAST(CAST(ra0 AS DECIMAL(38,0)) * rb0 +
         |               CAST(ra1 AS DECIMAL(38,0)) * rb1 +
         |               CAST(ra2 AS DECIMAL(38,0)) * rb2 AS DOUBLE) /
         |          CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE), 6)
         |      AS pe
         |  FROM m)
         |SELECT n, po, pe, round((po - pe) / (1.0 - pe), 6) AS kappa
         |FROM r""".stripMargin
    },

    "q288_ece" ->
      """WITH bins AS (
        |  SELECT CAST(round(l_discount * 100) AS BIGINT) AS sc,
        |    count(*) AS n,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
        |  FROM lineitem GROUP BY 1),
        |x AS (
        |  SELECT sc, n, pos,
        |    round(CAST(sc AS DOUBLE) / 100.0, 6) AS conf,
        |    round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc,
        |    sum(n) OVER () AS nn
        |  FROM bins),
        |y AS (
        |  SELECT *, abs(acc - conf) AS gap,
        |    CAST(round(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE) *
        |               abs(acc - conf), 12) AS DECIMAL(28,12)) AS term
        |  FROM x)
        |SELECT sc AS conf_cents, CAST(n AS BIGINT) AS n, conf, acc,
        |  round(gap, 6) AS abs_gap,
        |  round(CAST(sum(term) OVER () AS DOUBLE), 6) AS ece
        |FROM y ORDER BY conf_cents""".stripMargin,

    "q290_ips_offline_eval" ->
      """WITH t AS (
        |  SELECT CAST(hour(ts) AS INT) AS ctx, event_type AS action,
        |    CAST(round(value * 100) AS BIGINT) AS r
        |  FROM events),
        |w AS (
        |  SELECT *,
        |    CASE WHEN ctx < 12 THEN 'click' ELSE 'view' END AS pi_a,
        |    CAST(count(*) OVER (PARTITION BY ctx, action) AS DOUBLE) /
        |    CAST(count(*) OVER (PARTITION BY ctx) AS DOUBLE) AS phat
        |  FROM t),
        |x AS (
        |  SELECT *,
        |    CASE WHEN action = pi_a THEN 1 ELSE 0 END AS m,
        |    CAST(CASE WHEN action = pi_a THEN 1 ELSE 0 END AS DOUBLE) /
        |      phat AS wgt
        |  FROM w),
        |y AS (
        |  SELECT *,
        |    CAST(round(wgt * CAST(r AS DOUBLE) / 100.0, 12)
        |         AS DECIMAL(28,12)) AS wr,
        |    CAST(round(wgt, 12) AS DECIMAL(28,12)) AS wt
        |  FROM x)
        |SELECT count(*) AS n,
        |  CAST(sum(m) AS BIGINT) AS n_matched,
        |  round(CAST(sum(wr) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS ips,
        |  round(CAST(sum(wr) AS DOUBLE) / CAST(sum(wt) AS DOUBLE), 6)
        |    AS snips
        |FROM y""".stripMargin,

    // identical cell fold in SQL, then gbtBody verbatim — the entire
    // 3-round trainer is one shared string
    "q308_gbt_stumps" ->
      s"""WITH li AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS qty,
         |    CAST(round(l_discount * 100) AS BIGINT) AS disc,
         |    CAST(round(l_extendedprice) AS BIGINT) AS y
         |  FROM lineitem),
         |cells AS (
         |  SELECT qty, disc, count(*) AS n, sum(y) AS sy,
         |    sum(y * y) AS syy
         |  FROM li GROUP BY 1, 2),
         |${gbtBody("cells")}""".stripMargin,

    "q294_best_split" ->
      """WITH rows_ AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    CAST(round(l_discount * 100) AS BIGINT) AS disc,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |u AS (
        |  SELECT 'discount_cents' AS feature, disc AS v, y FROM rows_
        |  UNION ALL SELECT 'quantity', qty, y FROM rows_),
        |vg AS (
        |  SELECT feature, v, count(*) AS n, sum(y) AS pos
        |  FROM u GROUP BY 1, 2),
        |cand AS (
        |  SELECT *,
        |    sum(n) OVER (PARTITION BY feature ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
        |    sum(pos) OVER (PARTITION BY feature ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
        |    sum(n) OVER (PARTITION BY feature) AS nn,
        |    sum(pos) OVER (PARTITION BY feature) AS pp
        |  FROM vg),
        |scored AS (
        |  SELECT *,
        |    1.0 - (CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)) *
        |          (CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)) -
        |          (CAST(nn - pp AS DOUBLE) / CAST(nn AS DOUBLE)) *
        |          (CAST(nn - pp AS DOUBLE) / CAST(nn AS DOUBLE))
        |      AS g_parent,
        |    CAST(cn AS DOUBLE) / CAST(nn AS DOUBLE) *
        |      (1.0 - (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE)) *
        |             (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE)) -
        |             (CAST(cn - cp AS DOUBLE) / CAST(cn AS DOUBLE)) *
        |             (CAST(cn - cp AS DOUBLE) / CAST(cn AS DOUBLE))) +
        |    CAST(nn - cn AS DOUBLE) / CAST(nn AS DOUBLE) *
        |      (1.0 - (CAST(pp - cp AS DOUBLE) /
        |              CAST(nn - cn AS DOUBLE)) *
        |             (CAST(pp - cp AS DOUBLE) /
        |              CAST(nn - cn AS DOUBLE)) -
        |             (CAST((nn - cn) - (pp - cp) AS DOUBLE) /
        |              CAST(nn - cn AS DOUBLE)) *
        |             (CAST((nn - cn) - (pp - cp) AS DOUBLE) /
        |              CAST(nn - cn AS DOUBLE)))
        |      AS g_split
        |  FROM cand WHERE cn < nn),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY feature
        |    ORDER BY g_split ASC, v ASC) AS rn
        |  FROM scored)
        |SELECT feature, v AS threshold, CAST(cn AS BIGINT) AS n_left,
        |  round(g_parent, 6) AS parent_gini,
        |  round(g_split, 6) AS split_gini,
        |  round(g_parent - g_split, 6) AS gain
        |FROM r WHERE rn = 1 ORDER BY feature""".stripMargin,

    // identical cell fold, identical hash→uniform→Laplace chain
    // (DuckDB's hex cast replaces Spark's conv), identical floor-chain
    "q327_dp_release" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS segment, n_name AS nation,
        |    count(*) AS cnt
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |nz AS (SELECT segment, nation, cnt,
        |    (CAST(CAST(('0x' || substr(md5(segment || ':' || nation),
        |       1, 12)) AS BIGINT) AS DOUBLE) + 0.5) / 281474976710656.0
        |      AS u
        |  FROM cells),
        |lp AS (SELECT segment, nation, cnt,
        |    round(-sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6)
        |      AS lap6
        |  FROM nz)
        |SELECT segment, nation,
        |  greatest(CAST(floor(CAST(cnt AS DOUBLE) + lap6 + 0.5)
        |           AS BIGINT), 0) AS noisy_cnt
        |FROM lp ORDER BY segment, nation""".stripMargin,

    "q293_k_anonymity" ->
      """WITH classes AS (
        |  SELECT c_nationkey AS nat,
        |    (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 10000
        |      AS band,
        |    count(*) AS sz,
        |    count(DISTINCT c_mktsegment) AS l
        |  FROM customer GROUP BY 1, 2),
        |h AS (
        |  SELECT sz, count(*) AS n_classes,
        |    CAST(sum(sz) AS BIGINT) AS n_rows,
        |    CAST(min(l) AS BIGINT) AS l_min
        |  FROM classes GROUP BY 1)
        |SELECT sz AS class_size, n_classes, n_rows, l_min,
        |  round(CAST(n_rows AS DOUBLE) /
        |        CAST(sum(n_rows) OVER () AS DOUBLE), 6) AS row_share
        |FROM h ORDER BY class_size""".stripMargin,

    "q281_stratified_split" ->
      """WITH c AS (
        |  SELECT c_custkey AS k, c_mktsegment AS seg,
        |    md5(CAST(c_custkey AS VARCHAR)) AS h
        |  FROM customer),
        |r AS (
        |  SELECT k, seg,
        |    row_number() OVER (PARTITION BY seg ORDER BY h, k) AS rn,
        |    count(*) OVER (PARTITION BY seg) AS ns
        |  FROM c),
        |m AS (SELECT *, rn <= (ns * 8 + 9) // 10 AS train FROM r)
        |SELECT seg, count(*) AS n,
        |  CAST(sum(CASE WHEN train THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_train,
        |  CAST(sum(CASE WHEN NOT train THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_test,
        |  round(CAST(sum(CASE WHEN train THEN 1 ELSE 0 END) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE), 6) AS train_frac,
        |  CAST(sum(CASE WHEN train THEN CAST(k AS DECIMAL(38,0))
        |           ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE)
        |    AS train_key_sum
        |FROM m GROUP BY 1 ORDER BY seg""".stripMargin)
}
