package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second exact-statistics wave (SURVEY.md §2, added r10): per-group OLS
  * trend regression, robust median/MAD outlier screening, exact
  * distributed percentile bands, a smoothed bigram language-model
  * perplexity screen, and the event-audience overlap matrix. The family
  * keeps [[StatsExtOps]]'s discipline — exact integer/decimal moments and
  * order statistics for as long as possible, one deterministically-ordered
  * double formula rounded to 6 dp at the very end — and adds two scale
  * tools of its own:
  *
  *  - order statistics (median, MAD, arbitrary quantiles) come from
  *    VALUE-GROUP tables plus the q146 bucketed two-level prefix sum, so
  *    no per-group global sort (one-reducer-per-group) ever happens; the
  *    value-group table is domain-bound (distinct cents), not corpus-bound;
  *  - intermediates referenced by several downstream branches (the
  *    value-group table, the doc bigram table, the distinct user×type
  *    table) are pinned once via `InternalPin` (the q138 lesson), so the
  *    fact table is scanned ONCE per query regardless of how many order
  *    statistics derive from it. Handles are retained in [[graft.PinScope]]
  *    and drained by the harness after the result is consumed.
  */
object StatsModelOps extends OpModule {

  private def pin(df: DataFrame) = org.apache.spark.sql.graft.InternalPin.pin(df)

  private def d(c: Column): Column = c.cast("double")

  /** Inclusive cumulative counts over a per-value-group table
    * `(key, v, c)` without a per-key global sort (q146's shape): 64 range
    * buckets from the broadcast per-key min/max, exclusive bucket offsets
    * from a tiny per-bucket table, interior cumsums running
    * partitionBy(key, bucket) in parallel. Output: (key, v, c, cum, n).
    * Callers pass a PINNED pv so the two references read blocks. */
  private def cumCounts(pv: DataFrame, key: String): DataFrame = {
    val rng = pv.groupBy(key).agg(min("v").as("vmin"), max("v").as("vmax"))
    val bucketed = pv.join(broadcast(rng), Seq(key))
      .withColumn("b", expr("((v - vmin) * 64) div (vmax - vmin + 1)"))
    val wOff = Window.partitionBy(key).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = bucketed.groupBy(key, "b").agg(sum("c").as("t"))
      .select(col(key), col("b"),
              coalesce(sum("t").over(wOff), lit(0L)).as("boff"))
    val wIn = Window.partitionBy(key, "b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed.join(broadcast(off), Seq(key, "b"))
      .withColumn("cum", col("boff") + sum("c").over(wIn))
      .withColumn("n", sum("c").over(Window.partitionBy(key)))
      .select(col(key), col("v"), col("c"), col("cum"), col("n"))
  }

  /** Interpolated order statistics (h = (n−1)·q) from a cumulative
    * value-group table crossed with a tiny (q_label, q) list: the
    * positions v_⌊h⌋+1, v_⌈h⌉+1 are min-over-threshold picks, the
    * interpolation is one fixed-order double formula rounded 6 dp after
    * dividing by `unitDiv` (cents→dollars = 100, plain units = 1).
    * Output: (key, q_label, n, value_at_q). */
  private def bandsAt(cum: DataFrame, key: String, qdf: DataFrame,
                      unitDiv: Double): DataFrame =
    cum.crossJoin(broadcast(qdf))
      .withColumn("h", (col("n") - 1).cast("double") * col("q"))
      .withColumn("k", floor(col("h")).cast("long") + 1)
      .groupBy(key, "q_label").agg(
        max("n").as("n"), max("h").as("hh"),
        min(when(col("cum") >= col("k"), col("v"))).as("vlo"),
        min(when(col("cum") >= col("k") + 1, col("v"))).as("vhi"))
      .select(col(key), col("q_label"), col("n"),
        round((d(col("vlo")) +
               (col("hh") - floor(col("hh"))) *
               (d(coalesce(col("vhi"), col("vlo"))) - d(col("vlo")))) /
              lit(unitDiv), 6).as("value_at_q"))

  /** Exact median from a cumulative value-group table, as the INTEGER
    * lower+upper middle sum (2·median): odd n → both middles coincide,
    * even n → their mean is the textbook median. min-over-threshold picks
    * the order statistics without materializing row ranks. */
  private def medianM2(cum: DataFrame, key: String): DataFrame =
    cum.groupBy(key).agg(
      max("n").as("n"),
      (min(when(col("cum") >= expr("(n + 1) div 2"), col("v"))) +
       min(when(col("cum") >= expr("n div 2 + 1"), col("v")))).as("m2"))

  /** q304's closed-form 3×3 normal-equations solve. The SAME strings
    * are selectExpr'd on the Spark side and interpolated into the
    * DuckDB oracle, so both engines execute the identical fixed-order
    * IEEE chain over identical exact-integer-cast operands — the q294
    * argmin discipline applied to a linear solve. λ penalizes the two
    * feature diagonal entries (a22/a33), never the intercept (a11). */
  private object RidgeSolve {
    val lambda = 10000
    val castExprs: Seq[String] = Seq(
      "CAST(n AS DOUBLE) AS a11", "CAST(sx1 AS DOUBLE) AS a12",
      "CAST(sx2 AS DOUBLE) AS a13", "CAST(sx1 AS DOUBLE) AS a21",
      s"CAST(sx11 + $lambda AS DOUBLE) AS a22",
      "CAST(sx12 AS DOUBLE) AS a23", "CAST(sx2 AS DOUBLE) AS a31",
      "CAST(sx12 AS DOUBLE) AS a32",
      s"CAST(sx22 + $lambda AS DOUBLE) AS a33",
      "CAST(sy AS DOUBLE) AS b1", "CAST(sx1y AS DOUBLE) AS b2",
      "CAST(sx2y AS DOUBLE) AS b3",
      "CAST(sx11 AS DOUBLE) AS sx11d", "CAST(sx12 AS DOUBLE) AS sx12d",
      "CAST(sx22 AS DOUBLE) AS sx22d", "CAST(syy AS DOUBLE) AS syyd")
    // Cramer: det of A, then A with column i replaced by b (cofactor
    // expansion along the first row, fixed order)
    val detExprs: Seq[String] = Seq(
      "a11*(a22*a33 - a23*a32) - a12*(a21*a33 - a23*a31) + " +
        "a13*(a21*a32 - a22*a31) AS det",
      "b1*(a22*a33 - a23*a32) - a12*(b2*a33 - a23*b3) + " +
        "a13*(b2*a32 - a22*b3) AS det1",
      "a11*(b2*a33 - a23*b3) - b1*(a21*a33 - a23*a31) + " +
        "a13*(a21*b3 - b2*a31) AS det2",
      "a11*(a22*b3 - b2*a32) - a12*(a21*b3 - b2*a31) + " +
        "b1*(a21*a32 - a22*a31) AS det3")
    val wExprs: Seq[String] = Seq(
      "round(det1 / det, 6) AS w0", "round(det2 / det, 6) AS w1",
      "round(det3 / det, 6) AS w2")
    // R² from the same sufficient statistics (ŷ'ŷ and y'ŷ expand in
    // the UNPENALIZED Gram entries), using the already-rounded w's
    val r2Expr: String =
      "round(1.0 - (syyd - 2.0*(w0*b1 + w1*b2 + w2*b3) + " +
        "(w0*w0*a11 + w1*w1*sx11d + w2*w2*sx22d + 2.0*w0*w1*a12 + " +
        "2.0*w0*w2*a13 + 2.0*w1*w2*sx12d)) / (syyd - b1*b1/a11), 6) " +
        "AS r2"
  }

  /** q325's closed-form 2×2 per-user ALS solve (ridge normal
    * equations over the fixed item-factor matrix). Same shared-string
    * discipline as [[RidgeSolve]]: the strings are selectExpr'd in
    * Spark and interpolated into the DuckDB oracle, so both engines
    * run the identical fixed-order IEEE chain over identical
    * exact-integer-cast operands. λ rides the two diagonal entries. */
  private object AlsSolve {
    val lambda = 10000
    val castExprs: Seq[String] = Seq(
      s"CAST(s11 + $lambda AS DOUBLE) AS a11",
      "CAST(s12 AS DOUBLE) AS a12",
      s"CAST(s22 + $lambda AS DOUBLE) AS a22",
      "CAST(sr1 AS DOUBLE) AS b1", "CAST(sr2 AS DOUBLE) AS b2",
      "CAST(s11 AS DOUBLE) AS s11d", "CAST(s12 AS DOUBLE) AS s12d",
      "CAST(s22 AS DOUBLE) AS s22d", "CAST(srr AS DOUBLE) AS srrd",
      "CAST(n_items AS DOUBLE) AS nd")
    val solveExprs: Seq[String] = Seq(
      "a11*a22 - a12*a12 AS det",
      "round((b1*a22 - a12*b2) / (a11*a22 - a12*a12), 6) AS p1",
      "round((a11*b2 - b1*a12) / (a11*a22 - a12*a12), 6) AS p2")
    // train RMSE from the same sufficient statistics (residual sum
    // expands in the UNPENALIZED Gram entries), using the rounded p's
    val rmseExpr: String =
      "round(sqrt(greatest((srrd - 2.0*(p1*b1 + p2*b2) + " +
        "(p1*p1*s11d + 2.0*p1*p2*s12d + p2*p2*s22d)) / nd, 0.0)), 6) " +
        "AS train_rmse"
  }

  /** One gradient-descent round of q310's logistic trainer (σ fold →
    * exact-integer gradient → weight update → post-update log-loss),
    * reading the cell table `cells` (x1, x2, n, sy exact ints) and the
    * previous round's 1-row weight table `prev` (w0, w1, w2 doubles).
    * The SAME text serves the oracle's unrolled chain and Spark's
    * staged execution (prev = the prior round's pinned view) — the
    * q308 one-string/two-materializations discipline. Features enter
    * every chain normalized by /1.5e1 (so ‖x‖² ≤ 3 and the descent
    * lemma guarantees monotone loss at lr 0.5); σ quantizes through
    * the pure-IEEE `floor(x·1e8 + 5e-1)` chain into an exact integer,
    * so gradient sums are order-free decimals; weight updates and the
    * loss are fixed-order double chains floor-quantized at 1e-8/1e-6;
    * per-cell ln terms floor-quantize at 1e-6 before the exact
    * weighted sum (σ clamped to [1e-8, 1−1e-8] so ln never sees 0). */
  private def lrRound(m: Int, cells: String, prev: String): String =
    s"""sg$m AS (
       |  SELECT c.x1, c.x2, c.n, c.sy,
       |    CAST(c.sy AS DECIMAL(28,0)) * 100000000 -
       |      CAST(c.n AS DECIMAL(28,0)) *
       |      CAST(floor(1e8 / (1e0 + exp(0e0 - (w.w0 +
       |             w.w1 * (CAST(c.x1 AS DOUBLE) / 1.5e1) +
       |             w.w2 * (CAST(c.x2 AS DOUBLE) / 1.5e1)))) + 5e-1)
       |           AS DECIMAL(28,0)) AS sd
       |  FROM $cells c CROSS JOIN $prev w),
       |gr$m AS (
       |  SELECT CAST(sum(sd) AS DOUBLE) AS g0,
       |         CAST(sum(sd * x1) AS DOUBLE) AS g1,
       |         CAST(sum(sd * x2) AS DOUBLE) AS g2,
       |         CAST(sum(n) AS DOUBLE) AS nn
       |  FROM sg$m),
       |wu$m AS (
       |  SELECT
       |    CAST(floor((w.w0 + 5e-1 * g.g0 / 1e8 / g.nn) * 1e8 + 5e-1)
       |         AS DOUBLE) / 1e8 AS w0,
       |    CAST(floor((w.w1 + 5e-1 * g.g1 / 1.5e1 / 1e8 / g.nn) * 1e8
       |               + 5e-1) AS DOUBLE) / 1e8 AS w1,
       |    CAST(floor((w.w2 + 5e-1 * g.g2 / 1.5e1 / 1e8 / g.nn) * 1e8
       |               + 5e-1) AS DOUBLE) / 1e8 AS w2
       |  FROM $prev w CROSS JOIN gr$m g),
       |ls$m AS (
       |  SELECT c.n, c.sy,
       |    least(greatest(CAST(floor(1e8 / (1e0 + exp(0e0 - (w.w0 +
       |            w.w1 * (CAST(c.x1 AS DOUBLE) / 1.5e1) +
       |            w.w2 * (CAST(c.x2 AS DOUBLE) / 1.5e1)))) + 5e-1)
       |          AS DECIMAL(28,0)), CAST(1 AS DECIMAL(28,0))),
       |          CAST(99999999 AS DECIMAL(28,0))) AS sq
       |  FROM $cells c CROSS JOIN wu$m w),
       |ll$m AS (
       |  SELECT CAST(floor((0e0 - CAST(sum(
       |      CAST(sy AS DECIMAL(28,0)) *
       |        CAST(floor(ln(CAST(sq AS DOUBLE) / 1e8) * 1e6 + 5e-1)
       |             AS DECIMAL(28,0)) +
       |      (CAST(n AS DECIMAL(28,0)) - sy) *
       |        CAST(floor(ln(1e0 - CAST(sq AS DOUBLE) / 1e8) * 1e6
       |                   + 5e-1) AS DECIMAL(28,0))) AS DOUBLE)
       |      / 1e6 / g.nn) * 1e6 + 5e-1) AS DOUBLE) / 1e6 AS logloss
       |  FROM ls$m CROSS JOIN gr$m g
       |  GROUP BY g.nn),
       |out$m AS (
       |  SELECT $m AS gd_round, w.w0, w.w1, w.w2, l.logloss
       |  FROM wu$m w CROSS JOIN ll$m l)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Logistic-regression quality classifier (added r13) — the
    // fastText-style LINEAR CLASSIFIER every production data pipeline
    // trains to score documents (the CCNet/LLaMA "looks like the
    // curated tier" filter; q266's naive Bayes is the generative
    // cousin, this is the discriminative one trained by actual
    // optimization): 6 rounds of batch gradient descent on logistic
    // loss, label = curated source (idx < 5), features = length
    // buckets (n_chars/100, tokens/10, both capped at 15 and
    // normalized by /15 so ‖x‖² ≤ 3 — the descent lemma then
    // GUARANTEES monotone train loss at lr 0.5, which the spec
    // certifies). The q308 scale insight applies verbatim: with
    // integer-bucketed features every doc's score is a function of
    // its (x1, x2) CELL, so ONE corpus scan folds to the ≤16×16 cell
    // table (n, Σy exact) and ALL rounds run as 1-row×cells algebra —
    // zero further corpus contact, no per-round rescans, no driver
    // loop. [[lrRound]] is ONE SQL string both engines execute;
    // σ/weights/loss quantize through pure-IEEE floor-chains
    // (exp/ln evaluated once per cell per round — ~256 calls — then
    // immediately quantized; gradient and loss sums are exact
    // order-free decimals). Spark folds all six rounds in one task
    // over the pinned cell table (r19 — the identical IEEE chain,
    // see below); the oracle unrolls the lrRound text. Output per
    // round: weights + monotone-decreasing train log-loss (the
    // trainer certification).
    "q310_logreg_quality" -> { (s, dir) =>
      val (cells, ch) = pin(Tables(s, dir, "documents")
        .selectExpr("least(n_chars div 100, 15) AS x1",
                    "least(size(split(text, ' ')) div 10, 15) AS x2",
                    "CASE WHEN CAST(substring(source, 4) AS INT) < 5 " +
                      "THEN 1 ELSE 0 END AS y")
        .groupBy("x1", "x2")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy")))
      ch.count(); graft.PinScope.retain(ch)
      // r19 optimization (the batch-1 per-series discipline): the six
      // gradient rounds are 1-row × ≤16×16-cell algebra, yet the
      // staged form paid a pin + count + view per round (~57 jobs of
      // scheduler round-trips for ~256 exp/ln calls per round). The
      // rounds now fold in ONE task over the pinned cell table,
      // replaying [[lrRound]]'s chain OPERATION FOR OPERATION in the
      // same IEEE order: σ = floor(1e8/(1+exp(0−z))+0.5) with
      // z = w0 + w1·(x1/1.5e1) + w2·(x2/1.5e1); sd/gradient/loss sums
      // exact (BigInt ≡ the decimal(28,0) order-free sums); weight
      // updates and the loss through the same left-associative
      // divide-then-floor chains (Math.exp/Math.log are the exact
      // functions Catalyst codegen calls). The oracle still runs the
      // unrolled lrRound text, so any drift is caught by the hash.
      import s.implicits._
      cells.select(col("x1").cast("long"), col("x2").cast("long"),
                   col("n").cast("long"), col("sy").cast("long"))
        .as[(Long, Long, Long, Long)]
        .repartition(1)
        .mapPartitions { it =>
          val cs = it.toArray
          def sq(a0: Double, a1: Double, a2: Double,
                 x1: Long, x2: Long): Long =
            math.floor(1e8 / (1e0 + math.exp(0e0 -
              (a0 + a1 * (x1.toDouble / 1.5e1) +
               a2 * (x2.toDouble / 1.5e1)))) + 5e-1).toLong
          var (w0, w1, w2) = (0e0, 0e0, 0e0)
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Double, Double, Double, Double)]
          for (m <- 1 to 6) {
            var (g0s, g1s, g2s) = (BigInt(0), BigInt(0), BigInt(0))
            var nSum = 0L
            for ((x1, x2, n, sy) <- cs) {
              val sd = BigInt(sy) * 100000000L - BigInt(n) * sq(w0, w1, w2, x1, x2)
              g0s += sd; g1s += sd * x1; g2s += sd * x2; nSum += n
            }
            val (g0, g1, g2) = (g0s.toDouble, g1s.toDouble, g2s.toDouble)
            val nn = nSum.toDouble
            w0 = math.floor((w0 + 5e-1 * g0 / 1e8 / nn) * 1e8 + 5e-1) / 1e8
            w1 = math.floor((w1 + 5e-1 * g1 / 1.5e1 / 1e8 / nn) * 1e8 + 5e-1) / 1e8
            w2 = math.floor((w2 + 5e-1 * g2 / 1.5e1 / 1e8 / nn) * 1e8 + 5e-1) / 1e8
            var ls = BigInt(0)
            for ((x1, x2, n, sy) <- cs) {
              val q = math.min(math.max(sq(w0, w1, w2, x1, x2), 1L),
                               99999999L)
              val lt1 = math.floor(math.log(q.toDouble / 1e8) * 1e6 + 5e-1).toLong
              val lt0 = math.floor(math.log(1e0 - q.toDouble / 1e8) * 1e6 + 5e-1).toLong
              ls += BigInt(sy) * lt1 + BigInt(n - sy) * lt0
            }
            val logloss =
              math.floor((0e0 - ls.toDouble / 1e6 / nn) * 1e6 + 5e-1) / 1e6
            out += ((m.toLong, w0, w1, w2, logloss))
          }
          out.iterator
        }
        .toDF("gd_round", "w0", "w1", "w2", "logloss")
        .orderBy("gd_round")
    },

    // Grouped multi-feature RIDGE regression (added r13) — q147 fits
    // one slope; this is the d>1 model every feature pipeline actually
    // needs: per return flag, price_dollars ~ w0 + w1·qty +
    // w2·disc_cents with ridge λ=10000 on the feature block, by the
    // normal-equations SUFFICIENT-STATISTICS fold: the 3×3 Gram
    // matrix, X'y and y'y are ten exact decimal(38,0) sums —
    // commutative, map-side-combinable, ONE scan to ≤|flags| rows —
    // and the solve is closed-form Cramer in fixed-order doubles over
    // those exact sums ([[RidgeSolve]]: the same strings run in both
    // engines). R² expands in the same statistics — no second pass.
    // y is integer DOLLARS so every sum (y'y included) stays under
    // 2⁶³ at 1000× sf0.1 — both engines' wide-int→double casts are
    // then exact single conversions, not 128-bit double-roundings.
    // At 100 TB this is the canonical learn-on-cluster/solve-closed-
    // form shape: O(n·d²) map work, d²-bounded state, no driver
    // collect, no iteration; the d where a closed form stops fitting
    // one row hands over to q295's eigensolve boundary.
    "q304_ridge_regression" -> { (s, dir) =>
      val st = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
                col("l_quantity").cast("long").as("x1"),
                expr("CAST(round(l_discount * 100) AS BIGINT)").as("x2"),
                expr("CAST(round(l_extendedprice) AS BIGINT)").as("y"))
        .groupBy("flag").agg(
          count(lit(1)).as("n"),
          sum(col("x1").cast("decimal(38,0)")).as("sx1"),
          sum(col("x2").cast("decimal(38,0)")).as("sx2"),
          sum(col("x1").cast("decimal(38,0)") * col("x1")).as("sx11"),
          sum(col("x1").cast("decimal(38,0)") * col("x2")).as("sx12"),
          sum(col("x2").cast("decimal(38,0)") * col("x2")).as("sx22"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("x1").cast("decimal(38,0)") * col("y")).as("sx1y"),
          sum(col("x2").cast("decimal(38,0)") * col("y")).as("sx2y"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      st.selectExpr("flag" +: "n" +: RidgeSolve.castExprs: _*)
        .selectExpr("*" +: RidgeSolve.detExprs: _*)
        .selectExpr("*" +: RidgeSolve.wExprs: _*)
        .selectExpr("flag", "n", "w0 AS intercept", "w1 AS w_qty",
                    "w2 AS w_disc_cents", RidgeSolve.r2Expr)
        .orderBy("flag")
    },

    // One ALS half-step (added r13) — the collaborative-filtering
    // trainer kernel (Hu, Koren & Volinsky 2008; Zhou et al. 2008):
    // with item factors held fixed, every user's factor vector is an
    // INDEPENDENT 2×2 ridge solve — p_u = (Σ q_i q_iᵀ + λI)⁻¹ Σ r q_i
    // over that user's ratings — which is why ALS is THE factor model
    // that scales: at 100 TB the "training step" is millions of
    // per-key closed-form solves behind ONE user-keyed aggregation
    // (the q304 cell-collapse discipline fanned out per key; the
    // alternating half-step is this exact shape keyed by item).
    // Ratings = orders⋈lineitem (o_custkey, l_partkey, quantity) on
    // the un-hinted q210 fact-join discipline; item factors are the
    // deterministic integer-arithmetic matrix ((p·37)%97, (p·61+13)%89
    // — the q178 trained-model stand-in, engine-identical), so Gram/
    // rhs stats fold as EXACT decimals and [[AlsSolve]]'s shared
    // strings run the identical IEEE solve in both engines; train
    // RMSE expands in the same sufficient statistics with the ROUNDED
    // p's (the RidgeSolve r² discipline). Report: the 20 heaviest
    // users' factors + fit.
    "q325_als_user_step" -> { (s, dir) =>
      val f = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables(s, dir, "lineitem")
                .select(col("l_orderkey"), col("l_partkey"),
                        col("l_quantity").cast("long").as("r")),
              col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("custkey"),
                expr("(CAST(l_partkey AS BIGINT) * 37) % 97").as("q1"),
                expr("(CAST(l_partkey AS BIGINT) * 61 + 13) % 89")
                  .as("q2"),
                col("r"))
      val st = f.groupBy("custkey").agg(
        count(lit(1)).as("n_items"),
        sum(col("q1").cast("decimal(38,0)") * col("q1")).as("s11"),
        sum(col("q1").cast("decimal(38,0)") * col("q2")).as("s12"),
        sum(col("q2").cast("decimal(38,0)") * col("q2")).as("s22"),
        sum(col("r").cast("decimal(38,0)") * col("q1")).as("sr1"),
        sum(col("r").cast("decimal(38,0)") * col("q2")).as("sr2"),
        sum(col("r").cast("decimal(38,0)") * col("r")).as("srr"))
      st.selectExpr("custkey" +: "n_items" +: AlsSolve.castExprs: _*)
        .selectExpr("*" +: AlsSolve.solveExprs: _*)
        .selectExpr("custkey", "n_items", "p1", "p2", AlsSolve.rmseExpr)
        .orderBy(col("n_items").desc, col("custkey")).limit(20)
    },

    // Split-conformal prediction intervals (added r13) — the
    // UNCERTAINTY layer q147's point forecasts lack, by the only
    // method with a distribution-free finite-sample guarantee (Vovk;
    // Lei et al. 2018): fit on a train split, take the
    // ⌈0.9(n+1)⌉-th smallest absolute residual on a DISJOINT
    // calibration split as the interval half-width, and the marginal
    // coverage of ŷ ± q̂ on fresh data is ≥ 90% by exchangeability —
    // no normality, no variance model. Per event_type: q147's exact-
    // moment OLS chain on the train split (coefficients rounded 6
    // BEFORE any residual — deterministic model handoff), calibration
    // residuals quantize through the floor-chain to exact
    // hundredth-cent integers, and the conformal quantile is an EXACT
    // order statistic over the (type, residual)-value-group table via
    // [[cumCounts]] — domain-bound, never a per-type sort. The eval
    // split then reports honest empirical coverage (the ≥ 0.9
    // guarantee, spec-asserted with finite-sample slack). Splits =
    // md5 nibble of event_id: 0-9 train (~62%), a-c calibration,
    // d-f eval — key-only, engine-portable. ONE pinned fact scan
    // feeds all three splits.
    "q320_conformal" -> { (s, dir) =>
      val (ev, h) = pin(Tables(s, dir, "events")
        .select(col("event_type").as("et"),
                datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
                  .cast("long").as("x"),
                round(col("value") * 100).cast("long").as("y"),
                substring(md5(col("event_id").cast("string")), 1, 1)
                  .as("nib")))
      h.count(); graft.PinScope.retain(h)
      val m = ev.where(col("nib") <= "9").groupBy("et").agg(
        count(lit(1)).as("n_train"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
      val det = d(col("n_train")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
      val model = m.select(col("et"), col("n_train"),
        round((d(col("n_train")) * d(col("sxy")) -
               d(col("sx")) * d(col("sy"))) / det, 6).as("b"),
        round((d(col("sy")) * d(col("sxx")) -
               d(col("sx")) * d(col("sxy"))) / det, 6).as("a"))
      val rq = expr("CAST(floor(abs(CAST(y AS DOUBLE) - " +
        "(a + b * CAST(x AS DOUBLE))) * 1e2 + 5e-1) AS BIGINT)")
      val (pv, ph) = pin(ev.where(col("nib") >= "a" && col("nib") <= "c")
        .join(broadcast(model), Seq("et"))
        .select(col("et"), rq.as("v"))
        .groupBy("et", "v").agg(count(lit(1)).as("c")))
      ph.count(); graft.PinScope.retain(ph)
      val qhat = cumCounts(pv, "et")
        .withColumn("k", expr("(9 * (n + 1) + 9) div 10"))
        .groupBy("et")
        .agg(max("n").as("n_cal"),
             min(when(col("cum") >= col("k"), col("v"))).as("qh"))
      val cov = ev.where(col("nib") >= "d")
        .join(broadcast(model), Seq("et"))
        .join(broadcast(qhat), Seq("et"))
        .groupBy("et")
        .agg(count(lit(1)).as("n_eval"),
             sum(when(rq <= col("qh"), 1L).otherwise(0L)).as("nin"))
      model.join(qhat, Seq("et")).join(cov, Seq("et"))
        .select(col("et").as("event_type"), col("n_train"), col("n_cal"),
                col("n_eval"),
                round(col("qh").cast("double") / 1e4, 6)
                  .as("half_width_dollars"),
                round(col("nin").cast("double") /
                      col("n_eval").cast("double"), 6).as("coverage"))
        .orderBy("event_type")
    },

    // Per-group OLS trend regression (added r10) — the monitoring
    // companion to q140's correlation matrix: per event_type, regress
    // value (cents) on calendar day (epoch days) and report slope,
    // intercept and R² from EXACT moments. Same shape as q140: the six
    // moment sums (n, Σx, Σy, Σx², Σy², Σxy) are decimal(38,0)
    // accumulations — commutative, map-side-combinable — collected in
    // ONE scan, and the closed-form slope/intercept/R² are fixed-order
    // double formulas over the exact sums, rounded to 6 dp. At 100 TB
    // this is one hash agg to ≤|types| rows; nothing else moves.
    "q147_trend_regression" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("event_type"),
                datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
                  .cast("long").as("x"),
                round(col("value") * 100).cast("long").as("y"))
      val m = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
      val det = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
      val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
      m.select(col("event_type"), col("n"),
          round(num / det, 6).as("slope_cents_per_day"),
          round((d(col("sy")) * d(col("sxx")) -
                 d(col("sx")) * d(col("sxy"))) / det, 6)
            .as("intercept_cents"),
          round(num * num /
                (det * (d(col("n")) * d(col("syy")) -
                        d(col("sy")) * d(col("sy")))), 6).as("r2"))
        .orderBy("event_type")
    },

    // Robust outlier screen (added r10) — exact median + MAD (median
    // absolute deviation) of event value per type, and the count of rows
    // beyond the standard 3σ-equivalent fence (3·1.4826·MAD) — the
    // robust alternative to q118's mean/σ flags (a heavy tail inflates
    // σ and hides itself; the MAD fence doesn't move; here it flags
    // ~5.5% of each type). The trap this operator exists to avoid:
    // exact medians via a per-group sort put one group on one reducer,
    // and Spark's exact `percentile` buffers every value. Instead ONE
    // fact scan builds the (type, cents, count) value-group table —
    // domain-bound, not corpus-bound — which is pinned and reread:
    // median from the bucketed prefix sum, the DEVIATION value groups
    // derived from the value groups themselves (|v−med| weighted by
    // c — no second fact scan), MAD from a second prefix sum over
    // those, and the fence count a weighted filter-sum. All arithmetic
    // stays integral (2·median and 2·|v−med| clear the half-cent): the
    // only doubles are the final /200, /400 unit conversions and the
    // fence compare d > 2.2239·dm2 (= 3·1.4826/2 with both sides' ×2
    // scaling), all fixed-order. Exact at any scale; no sort, no value
    // buffering.
    "q148_mad_outliers" -> { (s, dir) =>
      import s.implicits._
      val (pv, h) = pin(Tables(s, dir, "events")
        .select(col("event_type").as("flag"),
                round(col("value") * 100).cast("long").as("v"))
        .groupBy("flag", "v").agg(count(lit(1)).as("c")))
      h.count(); graft.PinScope.retain(h)
      // r19 optimization (guide §1.2 step 1): everything past the one
      // fact scan operates on the DOMAIN-bounded (flag, cents, count)
      // value-group table, so the median, the deviation groups, the
      // MAD and the fence count fold in ONE task over the pin instead
      // of four distributed rereads (two bucketed-prefix-sum median
      // passes, three broadcasts, ~10 jobs). The integer algebra is
      // unchanged: m2 = lower+upper middle picks from cumulative
      // counts (cum ≥ (n+1) div 2 / cum ≥ n div 2 + 1 over v-ascending
      // groups — exactly medianM2 over cumCounts), deviation groups
      // are |v·2 − m2| re-aggregated, and the fence compare is the
      // same fixed-order double `|v·2 − m2| > 2.2239 · dm2`.
      val stats = pv.select(col("flag"), col("v"), col("c"))
        .as[(String, Long, Long)]
        .repartition(1)
        .mapPartitions { it =>
          def m2Of(groups: Array[(Long, Long)], tot: Long): Long = {
            val (k1, k2) = ((tot + 1) / 2, tot / 2 + 1)
            var (cum, lo, hi) = (0L, 0L, 0L)
            var (gotLo, gotHi) = (false, false)
            var i = 0
            while (i < groups.length && !gotHi) {
              cum += groups(i)._2
              if (!gotLo && cum >= k1) { lo = groups(i)._1; gotLo = true }
              if (!gotHi && cum >= k2) { hi = groups(i)._1; gotHi = true }
              i += 1
            }
            lo + hi
          }
          it.toArray.groupBy(_._1).iterator.map { case (flag, rows) =>
            val vg = rows.map(r => (r._2, r._3)).sortBy(_._1)
            val n = vg.iterator.map(_._2).sum
            val med2 = m2Of(vg, n)
            val dvm = vg.map { case (v, c) => (math.abs(v * 2 - med2), c) }
              .groupBy(_._1).view.mapValues(_.iterator.map(_._2).sum)
              .toArray.sortBy(_._1)
            val dm2 = m2Of(dvm, n)
            val nOut = vg.iterator.collect { case (v, c)
              if math.abs(v * 2 - med2).toDouble >
                 2.2239 * dm2.toDouble => c }.sum
            (flag, n, med2, dm2, nOut)
          }
        }
        .toDF("event_type", "n", "m2", "dm2", "n_out")
      stats.select(col("event_type"), col("n"),
          round(d(col("m2")) / lit(200.0), 6).as("median_value"),
          round(d(col("dm2")) / lit(400.0), 6).as("mad_value"),
          col("n_out").as("n_outliers"),
          round(d(col("n_out")) / d(col("n")), 6).as("outlier_pct"))
        .orderBy("event_type")
    },

    // Smoothed bigram LM perplexity screen (added r10) — the language-
    // model-based quality gate a training-data pipeline runs beside the
    // heuristic scores (q49): fit an add-one-smoothed per-language
    // bigram model ON the corpus, score every document's perplexity
    // under it, report per-language doc counts, mean and max perplexity
    // (gibberish and boilerplate both surface as tails). Tokens are the
    // q142 whitespace convention; docs with <2 tokens have no bigrams
    // and are out of scope by declared semantics. The doc-level bigram
    // table is pinned ONCE (q138's lesson — three downstream branches:
    // conditional counts, vocabulary, per-doc scoring; lazily each
    // would re-tokenize the corpus) so documents is scanned once. Model
    // probability p(w2|w1) = (c12+1)/(c1+V) with c1 a window sum over
    // the (lang,w1) partition of the model table and V the bigram-
    // participant vocabulary — both VOCABULARY-bound, not corpus-bound,
    // so the model join back to doc bigrams is a bounded-right-side
    // shuffle join at any corpus size. Cross-engine float discipline:
    // each bigram TYPE's log-prob rounds to 6 dp once, a doc's log-sum
    // is an exact decimal sum of those rounded terms (order-free), and
    // perplexity exp(−Σ/n) rounds to 6 dp; the per-lang mean decimal-
    // sums the rounded perplexities (q142's order-safe mean).
    "q149_bigram_lm" -> { (s, dir) =>
      // r19 (guide §2.4): the bigram emission paid a full token-stream
      // Exchange + sort (posexplode, then lead() over a doc_id window)
      // just to pair ADJACENT tokens — a per-row fact the doc's own
      // array already holds. Pair inside the array instead: filter
      // empties, zip each element with its successor, explode — a pure
      // codegen map, zero shuffles before the pin. Same multiset by
      // construction (lead over the original position order pairs
      // consecutive non-empty tokens; so does the filtered array).
      val (bg, h) = pin(Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
                expr("filter(split(text, ' '), x -> length(x) > 0)")
                  .as("fa"))
        .select(col("doc_id"), col("lang"),
                explode(expr(
                  """CASE WHEN size(fa) >= 2 THEN
                    |  transform(sequence(1, size(fa) - 1),
                    |            i -> struct(fa[i - 1] AS w1,
                    |                        fa[i] AS w2))
                    |ELSE array() END""".stripMargin)).as("pr"))
        .select(col("doc_id"), col("lang"),
                col("pr.w1").as("w1"), col("pr.w2").as("w2")))
      h.count(); graft.PinScope.retain(h)
      val model = bg.groupBy("lang", "w1", "w2")
        .agg(count(lit(1)).as("c12"))
        .withColumn("c1",
          sum("c12").over(Window.partitionBy("lang", "w1")))
      val vocab = bg.select(col("lang"), col("w1").as("w"))
        .unionAll(bg.select(col("lang"), col("w2").as("w")))
        .distinct().groupBy("lang").agg(count(lit(1)).as("vsz"))
      val lp = model.join(broadcast(vocab), Seq("lang"))
        .withColumn("lp",
          round(log(d(col("c12") + 1) / d(col("c1") + col("vsz"))), 6))
        .select("lang", "w1", "w2", "lp")
      val perDoc = bg.join(lp, Seq("lang", "w1", "w2"))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("nbg"),
             sum(col("lp").cast("decimal(28,6)")).as("lpsum"))
        .withColumn("ppl",
          round(exp(-d(col("lpsum")) / d(col("nbg"))), 6))
      perDoc.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          round(d(sum(col("ppl").cast("decimal(28,6)"))) /
                d(count(lit(1))), 6).as("avg_ppl"),
          max(col("ppl")).as("max_ppl"))
        .orderBy("lang")
    },

    // Audience overlap matrix (added r10) — which event types share
    // users: per ordered type pair, the exact overlap count and Jaccard
    // of the two user sets (the planning input for funnel design and
    // for q85-style mixture weighting). ONE scan to the distinct
    // (user, type) table — pinned, because both self-join sides and
    // the per-type sizes read it; lazily the distinct shuffle would run
    // three times — then a user_id-keyed self-join emits < |types|²/2
    // pairs per user and collapses to a ≤ C(|types|,2)-row matrix. The
    // per-type sizes broadcast back onto it. Pairs with zero overlap
    // never co-occur on a user and are absent by declared semantics.
    // Scale shape: distinct + one co-partitioned self-join, output
    // bounded by |types|², never by users or events.
    "q150_overlap_matrix" -> { (s, dir) =>
      val (ut, h) = pin(Tables(s, dir, "events")
        .select(col("user_id"), col("event_type")).distinct())
      h.count(); graft.PinScope.retain(h)
      val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("nu"))
      val a = ut.select(col("user_id"), col("event_type").as("type_a"))
      val b = ut.select(col("user_id"), col("event_type").as("type_b"))
      a.join(b, Seq("user_id")).where(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("users_both"))
        .join(broadcast(sizes.select(col("event_type").as("type_a"),
                                     col("nu").as("users_a"))),
              Seq("type_a"))
        .join(broadcast(sizes.select(col("event_type").as("type_b"),
                                     col("nu").as("users_b"))),
              Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("users_a"),
                col("users_b"), col("users_both"),
                round(d(col("users_both")) /
                      d(col("users_a") + col("users_b") -
                        col("users_both")), 6).as("jaccard"))
        .orderBy("type_a", "type_b")
    },

    // Audience-segment artifact (added r12) — q150 computes its overlap
    // matrix by scanning the event FACTS; the production shape for
    // "overlap of any audience over any date range, on demand" is a
    // PERSISTED daily-distinct table: (user_id, event_type, day),
    // exactly the segment/bitmap-index layer an audience platform
    // maintains. Built ONCE per corpus via BucketedCache (scratch +
    // atomic rename, two-writer safe), bucketed AND bucket-sorted on
    // user_id — so the self-join that intersects audiences needs no
    // exchange on either side, and a new day is an appended partition
    // (the q110/q128/q131 incremental-artifact discipline, here for
    // SETS). The declared probe answers a two-week window: re-distinct
    // over the range rides the bucket layout (grouping on (user_id,
    // type) is satisfied by the user_id distribution — no shuffle,
    // plan-asserted), then q150's pair shape over rows that are
    // per-day-distinct already — the fact table is never rescanned.
    "q206_audience_artifact" -> { (s, dir) =>
      val tbl = graft.BucketedCache.ensure(s, dir, "audience",
        "user_id BIGINT, event_type STRING, day DATE", "user_id", 8) {
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_type"),
                  to_date(col("ts")).as("day"))
          .distinct()
      }
      val (ut, h) = pin(s.table(tbl)
        .where(col("day").between(lit("2024-01-08"), lit("2024-01-21")))
        .select("user_id", "event_type").distinct())
      h.count(); graft.PinScope.retain(h)
      val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("nu"))
      val a = ut.select(col("user_id"), col("event_type").as("type_a"))
      val b = ut.select(col("user_id"), col("event_type").as("type_b"))
      a.join(b, Seq("user_id")).where(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("users_both"))
        .join(broadcast(sizes.select(col("event_type").as("type_a"),
                                     col("nu").as("users_a"))),
              Seq("type_a"))
        .join(broadcast(sizes.select(col("event_type").as("type_b"),
                                     col("nu").as("users_b"))),
              Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("users_a"),
                col("users_b"), col("users_both"),
                round(d(col("users_both")) /
                      d(col("users_a") + col("users_b") -
                        col("users_both")), 6).as("jaccard"))
        .orderBy("type_a", "type_b")
    },

    // Incremental audience maintenance (added r12) — the DECLARED form
    // of q206's "a new day is an appended partition" claim: the
    // persisted audience artifact covers only the HISTORY (days ≤
    // 01-21); the new days arrive as a batch whose daily-distinct
    // triples are disjoint from the artifact BY CONSTRUCTION (the day
    // column partitions the key space), so maintenance is a pure
    // append — no merge, no re-dedup against history, no rescan of the
    // historical facts. The probe then answers the FULL-RANGE overlap
    // matrix from artifact ∪ batch and must equal q150's fact-scan
    // matrix exactly — one oracle text, two data paths (q82/q102's
    // two-algorithms-one-answer discipline, applied to artifact
    // maintenance). The only fact-scan volume term is the batch.
    "q213_incremental_audience" -> { (s, dir) =>
      def daily(df: DataFrame): DataFrame = df
        .select(col("user_id"), col("event_type"),
                to_date(col("ts")).as("day"))
        .distinct()
      val baseT = graft.BucketedCache.ensure(s, dir, "audiencebase",
        "user_id BIGINT, event_type STRING, day DATE", "user_id", 8)(
        daily(Tables(s, dir, "events")
                .where(to_date(col("ts")) <= lit("2024-01-21"))))
      val batch = daily(Tables(s, dir, "events")
        .where(to_date(col("ts")) > lit("2024-01-21")))
      val (ut, h) = pin(s.table(baseT).unionByName(batch)
        .select("user_id", "event_type").distinct())
      h.count(); graft.PinScope.retain(h)
      val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("nu"))
      val a = ut.select(col("user_id"), col("event_type").as("type_a"))
      val b = ut.select(col("user_id"), col("event_type").as("type_b"))
      a.join(b, Seq("user_id")).where(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("users_both"))
        .join(broadcast(sizes.select(col("event_type").as("type_a"),
                                     col("nu").as("users_a"))),
              Seq("type_a"))
        .join(broadcast(sizes.select(col("event_type").as("type_b"),
                                     col("nu").as("users_b"))),
              Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("users_a"),
                col("users_b"), col("users_both"),
                round(d(col("users_both")) /
                      d(col("users_a") + col("users_b") -
                        col("users_both")), 6).as("jaccard"))
        .orderBy("type_a", "type_b")
    },

    // Exact percentile bands (added r10) — P50/P95/P99 of event value
    // per type with textbook linear interpolation (h = (n−1)·q), the
    // latency-SLO screen, EXACT at any scale: the same pinned value-
    // group + bucketed-prefix-sum machinery as q148 (the generalization
    // of its median to arbitrary q), so there is no per-group sort and
    // no approx sketch — the value-group table is domain-bound and the
    // order statistics v_⌊h⌋+1, v_⌈h⌉+1 are min-over-threshold picks
    // from the cumulative table crossed with the 3-row quantile list.
    // The interpolation (v_lo + frac·(v_hi−v_lo))/100 is the one
    // fixed-order double formula, rounded to 6 dp. Contrast q77 (the
    // declared-◐ approx sketch): this is the exact path production
    // monitors need for SLO attestation.
    "q151_percentile_bands" -> { (s, dir) =>
      import s.implicits._
      val (pv, h) = pin(Tables(s, dir, "events")
        .select(col("event_type"),
                round(col("value") * 100).cast("long").as("v"))
        .groupBy("event_type", "v").agg(count(lit(1)).as("c")))
      h.count(); graft.PinScope.retain(h)
      val qdf = Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))
        .toDF("q_label", "q")
      bandsAt(cumCounts(pv, "event_type"), "event_type", qdf, 100.0)
        .orderBy("event_type", "q_label")
    },

    // Incremental exact-moments artifact (added r10) — q131's
    // materialized-view discipline applied to STATISTICS: the q140
    // correlation matrix maintained without rescanning history.
    // Moment sums (n, Σx, Σx², Σxy …) are ADDITIVE, so per-shipdate
    // 15-moment partials are a persisted artifact (all days strictly
    // before the corpus's last ship day), the daily job aggregates
    // only the last day's slice, and the merge is a plain decimal sum
    // over ≤ |days| rows — exact to the last bit, unlike the q110/q128
    // sketch artifacts which trade exactness for fixed size (moments
    // need no such trade: 15 numbers per day). Output = q140's matrix
    // verbatim; the oracle recomputes from the facts, so the artifact
    // must be semantically invisible. Plan-asserted: artifact scanned,
    // lineitem scanned ONCE (the last-day slice).
    "q152_moments_daily_union" -> { (s, dir) =>
      def cents(c: String) = round(col(c) * 100).cast("long")
      def sq(a: Column, b: Column) = sum((a * b).cast("decimal(38,0)"))
      def moments(df: DataFrame) = df.groupBy("day").agg(
        count(lit(1)).as("n"),
        sum(col("q").cast("decimal(38,0)")).as("sq"),
        sum(col("e").cast("decimal(38,0)")).as("se"),
        sum(col("dd").cast("decimal(38,0)")).as("sd"),
        sum(col("t").cast("decimal(38,0)")).as("st"),
        sq(col("q"), col("q")).as("sqq"), sq(col("e"), col("e")).as("see"),
        sq(col("dd"), col("dd")).as("sdd"), sq(col("t"), col("t")).as("stt"),
        sq(col("q"), col("e")).as("sqe"), sq(col("q"), col("dd")).as("sqd"),
        sq(col("q"), col("t")).as("sqt"), sq(col("e"), col("dd")).as("sed"),
        sq(col("e"), col("t")).as("sset"), sq(col("dd"), col("t")).as("sdt"))
      def li = Tables(s, dir, "lineitem").select(
        to_date(col("l_shipdate")).as("day"),
        cents("l_quantity").as("q"), cents("l_extendedprice").as("e"),
        cents("l_discount").as("dd"), cents("l_tax").as("t"))
      val histT = graft.BucketedCache.ensure(s, dir, "momidx",
          "day DATE, n BIGINT, sq DECIMAL(38,0), se DECIMAL(38,0), " +
          "sd DECIMAL(38,0), st DECIMAL(38,0), sqq DECIMAL(38,0), " +
          "see DECIMAL(38,0), sdd DECIMAL(38,0), stt DECIMAL(38,0), " +
          "sqe DECIMAL(38,0), sqd DECIMAL(38,0), sqt DECIMAL(38,0), " +
          "sed DECIMAL(38,0), sset DECIMAL(38,0), sdt DECIMAL(38,0)",
          "day", 2) {
        val last = li.agg(max("day").as("last_day"))
        moments(li.crossJoin(broadcast(last))
          .where(col("day") < col("last_day")))
      }
      val last = li.agg(max("day").as("last_day"))
      val batch = moments(li.crossJoin(broadcast(last))
        .where(col("day") === col("last_day")))
      val m = s.table(histT).unionByName(batch).agg(
        sum("n").as("n"), sum("sq").as("sq"), sum("se").as("se"),
        sum("sd").as("sd"), sum("st").as("st"), sum("sqq").as("sqq"),
        sum("see").as("see"), sum("sdd").as("sdd"), sum("stt").as("stt"),
        sum("sqe").as("sqe"), sum("sqd").as("sqd"), sum("sqt").as("sqt"),
        sum("sed").as("sed"), sum("sset").as("sset"), sum("sdt").as("sdt"))
      def pair(nm: String, sx: String, sy: String, sxx: String,
               syy: String, sxy: String) =
        struct(lit(nm).as("pair"),
               StatsExtOps.corrOf(col("n"), col(sx), col(sy), col(sxx),
                                  col(syy), col(sxy)).as("corr_r"))
      m.select(explode(array(
          pair("q_e", "sq", "se", "sqq", "see", "sqe"),
          pair("q_d", "sq", "sd", "sqq", "sdd", "sqd"),
          pair("q_t", "sq", "st", "sqq", "stt", "sqt"),
          pair("e_d", "se", "sd", "see", "sdd", "sed"),
          pair("e_t", "se", "st", "see", "stt", "sset"),
          pair("d_t", "sd", "st", "sdd", "stt", "sdt"))).as("p"))
        .select(col("p.pair").as("pair"), col("p.corr_r").as("corr_r"))
        .orderBy("pair")
    },

    // Burst detection (added r10) — the LOCAL-baseline anomaly screen
    // beside q118's global one: an hour bursts when its event count
    // exceeds 1.5× the mean of the previous 24 OBSERVED hourly buckets
    // (a heavy day inflates a global σ and hides itself; a trailing
    // frame adapts). Denominators cleared (q118's discipline):
    // cnt > 1.5·(trail/24) ⟺ 16·cnt > trail — pure BIGINT compare, no
    // doubles anywhere but the reported ratio. Scale shape: ONE scan
    // to a (type, hour) cell table — bounded by types×hours, not
    // events — then one window over the cells; rows-based frame =
    // "previous 24 observed buckets" by declared semantics (identical
    // frame in the oracle), warm-up rows (fewer than 24 priors)
    // excluded exactly.
    "q153_burst_flags" -> { (s, dir) =>
      val cells = Tables(s, dir, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .groupBy("event_type", "hr").agg(count(lit(1)).as("cnt"))
      val wTrail = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(-24, -1)
      cells
        .withColumn("trail", sum("cnt").over(wTrail))
        .withColumn("k", count(lit(1)).over(wTrail))
        .where(col("k") === 24 && col("cnt") * 16 > col("trail"))
        .select(col("event_type"), col("hr"), col("cnt"), col("trail"),
                round(d(col("cnt") * 24) / d(col("trail")), 6)
                  .as("burst_ratio"))
        .orderBy("event_type", "hr")
    },

    // Equal-FREQUENCY binning spec (added r12) — the quantile-binned
    // feature transform next to q154's equal-WIDTH histogram: per
    // event_type, decile bins each holding ~n/10 values, emitted as
    // the (bin → [lo, hi], count) spec a training pipeline ships with
    // the model. NTILE is the naive surface but is RANK-based: ties
    // split across bins by arbitrary row order, which is
    // nondeterministic across engines AND across Spark runs — so the
    // bin is assigned per VALUE GROUP by its exclusive cumulative
    // count (bin = cum_before·10 div n, all ties land in one bin,
    // pure integers). Shape: the q148/q154 value-group reduction — one
    // fact scan into (type, cents, count), windows over domain-bounded
    // value groups reusing the type partitioning, never corpus rows.
    "q179_freq_bins" -> { (s, dir) =>
      val vg = Tables(s, dir, "events")
        .select(col("event_type"),
                round(col("value") * 100).cast("long").as("v"))
        .groupBy("event_type", "v").agg(count(lit(1)).as("cnt"))
      val wT = Window.partitionBy("event_type")
      val wC = Window.partitionBy("event_type").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      vg.withColumn("n", sum(col("cnt")).over(wT))
        .withColumn("cumb", sum(col("cnt")).over(wC) - col("cnt"))
        .withColumn("bin", expr("cumb * 10 div n"))
        .groupBy("event_type", "bin")
        .agg(sum(col("cnt")).as("cnt"),
             min(col("v")).as("lo_cents"), max(col("v")).as("hi_cents"))
        .orderBy("event_type", "bin")
    },

    // Offline CUSUM change-point screen (added r12) — q153 flags
    // transient BURSTS against a trailing baseline; this locates the
    // single largest LEVEL SHIFT in each series (the "when did this
    // event's rate permanently change" question behind regression
    // hunts and pipeline-drift forensics). Statistic: the classic
    // cumulative-sum deviation S_k = Σ_{i≤k}(x_i − x̄) over the per-day
    // counts, maximized over k — computed with CLEARED DENOMINATORS
    // (D·prefix_k − k·total, the q118/q141 integer discipline) so both
    // engines compare identical BIGINTs, no float mean. Shape: one
    // (type, day) count shuffle, then prefix/total/argmax windows all
    // on the SAME event_type partitioning over CALENDAR-bounded rows
    // (days/type, never corpus rows) — the whole screen costs one
    // narrow shuffle. BIGINT headroom: D·total < 9e18 ⇒ exact to
    // ~2.5e14 daily events over a decade; widen the products to
    // decimal(38,0) beyond (q140's rule).
    "q177_cusum_change" -> { (s, dir) =>
      val daily = Tables(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
      val wType = Window.partitionBy("event_type")
      val wOrd = Window.partitionBy("event_type").orderBy("day")
      val wPre = wOrd.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)
      daily
        .withColumn("k", row_number().over(wOrd).cast("long"))
        .withColumn("pre", sum(col("cnt")).over(wPre))
        .withColumn("total", sum(col("cnt")).over(wType))
        .withColumn("dd", count(lit(1)).over(wType))
        .withColumn("st", abs(col("dd") * col("pre") -
                              col("k") * col("total")))
        .withColumn("mx", max(col("st")).over(wType))
        .where(col("st") === col("mx"))
        .groupBy("event_type")
        .agg(min(col("day")).as("change_day"),
             max(col("st")).as("cusum_stat"),
             min(col("dd")).as("days"),
             min(col("total")).as("total_events"))
        .orderBy("event_type")
    },

    // Equal-width value histogram (added r10) — the generic
    // distribution profile q145's PSI bins and q151's bands both lean
    // on, as a first-class operator: per event_type, 20 equal-width
    // bins over the type's own [min, max] (broadcast 2-row range),
    // count, share and cumulative share per OBSERVED bin (empty bins
    // absent by declared semantics). Bin index is pure integer
    // arithmetic ((v−vmin)·20 div (range+1) — the q146 bucket map), so
    // membership is engine-exact; shares divide the exact counts once
    // in double and round 6 dp; the cumulative share divides the exact
    // cumulative count (not a sum of rounded shares — order-free by
    // construction). ONE fact scan builds the (type, cents, count)
    // value-group table (pinned, q148's discipline — r10 scanned the
    // facts twice: once for the range, once for the binning join);
    // range, binning and windows all derive from the domain-bound
    // value groups, never from fact volume.
    "q154_value_histogram" -> { (s, dir) =>
      val (pv, h) = pin(Tables(s, dir, "events")
        .select(col("event_type"),
                round(col("value") * 100).cast("long").as("v"))
        .groupBy("event_type", "v").agg(count(lit(1)).as("c")))
      h.count(); graft.PinScope.retain(h)
      val rng = pv.groupBy("event_type")
        .agg(min("v").as("vmin"), max("v").as("vmax"))
      pv.join(broadcast(rng), Seq("event_type"))
        .withColumn("bin", expr("((v - vmin) * 20) div (vmax - vmin + 1)"))
        .groupBy("event_type", "bin").agg(sum("c").as("cnt"))
        .withColumn("n",
          sum("cnt").over(Window.partitionBy("event_type")))
        .withColumn("cum",
          sum("cnt").over(Window.partitionBy("event_type").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("event_type"), col("bin"), col("cnt"),
                round(d(col("cnt")) / d(col("n")), 6).as("share"),
                round(d(col("cum")) / d(col("n")), 6).as("cum_share"))
        .orderBy("event_type", "bin")
    },

    // Conversion-lag percentile bands (added r10) — product analytics'
    // "how long from first view to first purchase", composed from the
    // funnel family's conditional-min shape (q113) and q151's exact
    // quantile machinery: per user, first view and first purchase
    // timestamps from ONE scan + one user_id hash agg; converters
    // (purchase strictly after view) yield an integer lag in whole
    // seconds (µs difference div 1e6 — ts is µs-grained, so Spark's
    // unix_micros and the oracle's epoch_us agree exactly); the lag
    // value-group table (bounded by the time-range domain, not by
    // users) is pinned and P50/P90/P99 come from the bucketed
    // prefix-sum order statistics — no per-user-population sort.
    "q155_conversion_lag" -> { (s, dir) =>
      import s.implicits._
      val lags = Tables(s, dir, "events")
        .where(col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("v"),
             min(when(col("event_type") === "purchase", col("ts")))
               .as("p"))
        .where(col("v").isNotNull && col("p").isNotNull &&
               col("p") > col("v"))
        .select(expr("(unix_micros(p) - unix_micros(v)) div 1000000")
                  .as("lag_s"))
      val (pv, h) = pin(lags.select(lit(0L).as("g"),
                                    col("lag_s").as("v"))
        .groupBy("g", "v").agg(count(lit(1)).as("c")))
      h.count(); graft.PinScope.retain(h)
      val qdf = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
        .toDF("q_label", "q")
      bandsAt(cumCounts(pv, "g"), "g", qdf, 1.0)
        .select(col("q_label"), col("n").as("n_converters"),
                col("value_at_q").as("lag_seconds"))
        .orderBy("q_label")
    },

    // Last-touch attribution (added r10) — for every purchase, the
    // user's most recent PRIOR non-purchase event type (ignore-nulls
    // last over a history frame), rolled up to purchases/users/share
    // per attributed source; purchases with no prior event attribute
    // to 'none'. The classic marketing-attribution operator, and the
    // ignore-nulls window is the idiomatic Spark form — no self-join,
    // no as-of join against a filtered copy (q13's machinery is for
    // TWO tables; within one stream the window frame IS the as-of).
    // Deterministic under ties by the (ts, event_id) order. Scale
    // shape: ONE scan, ONE user_id shuffle for the window (the filter
    // cannot precede it — history includes non-purchases), then a
    // ≤|types|+1-row rollup; share divides exact counts over a window
    // on that tiny result.
    "q156_attribution" -> { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
                col("event_type"))
        .withColumn("src",
          last(when(col("event_type") =!= "purchase", col("event_type")),
               ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .groupBy(coalesce(col("src"), lit("none")).as("attributed_type"))
        .agg(count(lit(1)).as("purchases"),
             countDistinct(col("user_id")).as("users"))
        .withColumn("share",
          round(d(col("purchases")) /
                d(sum("purchases").over(Window.partitionBy(lit(0)))), 6))
        .orderBy("attributed_type")
    },

    // ONBOARDING behavioral signatures (added r12) — segmentation by
    // WHICH features a user touches in their first 72 hours, next to
    // q160's RFM (segmentation by how much): each user reduces to the
    // sorted comma-joined set of event types fired within 72h of
    // their FIRST event ("click,view" vs the full five-type signature
    // separates lurkers from instant converters — over a long-enough
    // horizon every signature saturates, which is why the product
    // question is always windowed to onboarding). Set-valued
    // aggregation made deterministic: collect_set has no order, so
    // sort_array pins the signature string (DuckDB mirrors with
    // list_sort); the signature space is 2^|types|−1-bounded (31
    // here) — a domain-bound aggregate at any corpus size. Two
    // user_id-keyed aggs (first event, then signature) share one
    // shuffle key; the 72h cut is exact integer µs; shares divide
    // exact counts once.
    "q194_behavior_signatures" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
      val first = ev.groupBy("user_id").agg(min(col("ts")).as("t0"))
      val sig = ev.join(first, Seq("user_id"))
        .where(unix_micros(col("ts")) <=
               unix_micros(col("t0")) + lit(259200000000L))
        .select(col("user_id"), col("event_type")).distinct()
        .groupBy("user_id")
        .agg(concat_ws(",", sort_array(collect_set(col("event_type"))))
               .as("signature"))
      val tot = sig.agg(count(lit(1)).as("tot"))
      sig.groupBy("signature").agg(count(lit(1)).as("users"))
        .crossJoin(broadcast(tot))
        .select(col("signature"), col("users"),
                round(col("users").cast("double") / col("tot"), 6)
                  .as("share"))
        .orderBy("signature")
    },

    // Linear multi-touch attribution (added r12) — q156 gives the last
    // touch ALL the credit; marketing reality splits it: each purchase
    // distributes its credit EQUALLY across every non-purchase touch by
    // the same user in the 7 days before it. Made exact and conserved
    // with integer MICRO-CREDITS: each purchase carries exactly
    // 1 000 000 µcredits, each touch gets 1e6 div n, and the division
    // REMAINDER goes to the earliest touch (declared rule) — so
    // Σ credit ≡ 1e6 × purchases, auditable to the unit, no float
    // fractions whose sum order matters. Touchless purchases credit a
    // 'none' bucket (left join), keeping the audit total conserved.
    // Scale shape: a user_id equi join with the 7-day window as
    // residual — fan-out is Σ_u purchases_u × touches_u(7d), bounded
    // by per-user activity in the lookback (the q80/q172 skew bound;
    // the lookback IS the cap), never corpus-quadratic; the per-
    // purchase windows ride the same user_id shuffle.
    "q183_attribution_linear" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
                col("event_type"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
                col("ts").as("p_ts"))
      val touches = ev.where(col("event_type") =!= "purchase")
        .select(col("user_id").as("t_uid"), col("event_id").as("t_id"),
                col("ts").as("t_ts"), col("event_type").as("touch_type"))
      // the lookback lives IN the join condition: a purchase whose
      // touches all fall outside the window must keep its null row
      // (crediting 'none'), not vanish through a post-filter
      val joined = purchases.join(touches,
        col("user_id") === col("t_uid") &&
          col("t_ts") < col("p_ts") &&
          col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"),
        "left")
      val wP = Window.partitionBy("p_id")
      val wOrd = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
      joined
        .withColumn("n", count(col("t_id")).over(wP))
        .withColumn("idx", row_number().over(wOrd))
        .withColumn("credit",
          when(col("n") === 0, lit(1000000L))
            .otherwise(expr("1000000 div n") +
                       when(col("idx") === 1, expr("1000000 % n"))
                         .otherwise(lit(0L))))
        .groupBy(coalesce(col("touch_type"), lit("none"))
                   .as("attributed_type"))
        .agg(sum(col("credit")).as("credit_micros"),
             countDistinct(col("p_id")).as("purchases_touched"))
        .orderBy("attributed_type")
    },

    // Exact weighted median (added r12) — q148's median treats every
    // row equally; procurement and pricing questions weight by VOLUME:
    // the quantity-weighted median unit price per return flag (half
    // the shipped units cost less, half more). Lower weighted median,
    // declared: smallest cents value v with 2·cumweight(≤v) ≥
    // totalweight — pure integers end to end. Same scale shape as
    // q148/q179: one fact scan into (flag, cents, weight-sum) value
    // groups, cumulative/total windows on the flag partitioning over
    // domain-bounded groups, min(v) over the qualifying suffix. No
    // sort of fact rows, no value buffering.
    "q184_weighted_median" -> { (s, dir) =>
      import s.implicits._
      val vg = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
                round(col("l_extendedprice") * 100).cast("long").as("v"),
                round(col("l_quantity") * 100).cast("long").as("wq"))
        .groupBy("l_returnflag", "v").agg(sum(col("wq")).as("wsum"))
      // r19 (q148's fold, guide §1.2 step 1): past the one fact scan
      // everything rides the DOMAIN-bounded (flag, cents, weight)
      // value groups, but the two flag-partitioned windows sorted
      // ~200k groups across only 3 partitions — single-threaded per
      // flag, two window passes. The fold below walks each flag's
      // v-ascending groups once in ONE task: the first v whose
      // 2·cumweight ≥ totalweight IS min(v) over the qualifying
      // suffix (cum is monotone in v) — the identical integer rule.
      vg.as[(String, Long, Long)]
        .repartition(1)
        .mapPartitions { it =>
          it.toArray.groupBy(_._1).iterator.map { case (flag, rows) =>
            val g = rows.map(r => (r._2, r._3)).sortBy(_._1)
            val tot = g.iterator.map(_._2).sum
            var (cum, i, med) = (0L, 0, 0L)
            var found = false
            while (i < g.length && !found) {
              cum += g(i)._2
              if (cum * 2 >= tot) { med = g(i)._1; found = true }
              i += 1
            }
            (flag, med, tot)
          }
        }
        .toDF("l_returnflag", "wmedian_cents", "total_weight")
        .orderBy("l_returnflag")
    },

    // Per-type churn screen (added r10) — for each event type, how
    // many of its ever-active users have gone QUIET on it (no event of
    // that type in the final 7 days of the corpus). The retention
    // complement to q114's cohort matrix, reduced to the operational
    // number a growth dashboard tracks per feature — and unlike a
    // whole-user churn cut (degenerate on an always-on population,
    // which this corpus is), the per-type cut surfaces real attrition
    // (~2–5%/type here). Churn is an integer datediff against the
    // broadcast corpus-end day (q144's portable-calendar discipline).
    // Scale shape: ONE scan, one (type, user) hash agg with map-side
    // combine, a ≤|types|-row rollup.
    "q157_churn_screen" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("event_type"), col("user_id"),
                to_date(col("ts")).as("day"))
      val end = ev.agg(max("day").as("end_day"))
      ev.groupBy("event_type", "user_id")
        .agg(max("day").as("last_day"))
        .crossJoin(broadcast(end))
        .withColumn("quiet",
          (datediff(col("end_day"), col("last_day")) > 7).cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("users"), sum("quiet").as("quiet_users"))
        .withColumn("quiet_rate",
          round(d(col("quiet_users")) / d(col("users")), 6))
        .orderBy("event_type")
    },

    // Pareto / 80-20 concentration CURVE (added r12) — q158 reports
    // one point (the top-p% share); the full curve is what the
    // assortment review reads: parts ranked by revenue, split into
    // population deciles, each decile's exact revenue share and the
    // cumulative share ("decile 0 = X% of revenue, top half = Y%").
    // Rank is row_number over (revenue desc, partkey) — the unique
    // key makes tie order deterministic; revenue stays integer cents
    // until the two share divisions (each from exact sums, round 6;
    // the CUMULATIVE share divides the exact cumulative cents, never
    // sums rounded shares). The ranking window's input is the PART
    // aggregate (dimension-sized, not fact-sized); at a scale where
    // even parts outgrow one partition the rank swaps to the q141/
    // q146 bucketed prefix sum — same downstream arithmetic.
    "q199_pareto_curve" -> { (s, dir) =>
      val rev = Tables(s, dir, "lineitem")
        .select(col("l_partkey"),
                round(col("l_extendedprice") * 100).cast("long")
                  .as("cents"))
        .groupBy("l_partkey").agg(sum(col("cents")).as("cents"))
      val wR = Window.orderBy(col("cents").desc, col("l_partkey"))
      val wAll = Window.partitionBy(lit(0))
      val wCum = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev
        .withColumn("rk", row_number().over(wR))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("decile", expr("(rk - 1) * 10 div n"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"))
        .withColumn("total", sum(col("cents")).over(wAll))
        .withColumn("cum_cents", sum(col("cents")).over(wCum))
        .select(col("decile"), col("n_parts"),
                round(col("cents").cast("double") / col("total"), 6)
                  .as("rev_share"),
                round(col("cum_cents").cast("double") / col("total"), 6)
                  .as("cum_share"))
        .orderBy("decile")
    },

    // Hash-Poisson bootstrap CI (added r12) — the "error bars without
    // resampling" operator: a bootstrap resample draws each row
    // Poisson(1)-many times, so instead of materializing 32 copies of
    // the corpus, each row carries a DETERMINISTIC per-replicate weight
    // w ∈ {0..5} read off one md5 byte against the Poisson(1) pmf
    // quantized to /256ths (94/94/47/16/4/1 — exact cumulative 256;
    // thresholds compared in HEX-STRING space, '5e'/'bc'/'eb'/'fb'/'ff',
    // because lowercase-hex lexicographic order IS numeric order in
    // both engines — no hex→int conversion exists portably). One scan
    // explodes 32 replicate ids; the weighted sums map-combine to a
    // 32-ROW table (never 32 corpus copies in flight); replicate-mean
    // order statistics (min / median / max of 32) come from windows
    // over those 32 rows. Exact integer weighted cents under the sums;
    // each mean is one double division rounded 6 dp. The point estimate
    // rides the same scan. This is the BLB-family pattern a 100 TB
    // job uses for any CI — cost = one scan × 32 md5s per row.
    "q208_bootstrap_ci" -> { (s, dir) =>
      val w32 = Window.partitionBy(lit(0)).orderBy("mean_r")
      val reps = Tables(s, dir, "orders")
        .select(col("o_orderkey"),
                round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("rep", explode(sequence(lit(0), lit(31))))
        .withColumn("b",
          substring(md5(concat(col("o_orderkey").cast("string"), lit("#"),
                               col("rep").cast("string"))), 1, 2))
        .withColumn("w",
          when(col("b") < "5e", 0L).when(col("b") < "bc", 1L)
            .when(col("b") < "eb", 2L).when(col("b") < "fb", 3L)
            .when(col("b") < "ff", 4L).otherwise(5L))
        .groupBy("rep")
        .agg(sum(col("w")).as("n_r"),
             sum(col("w") * col("cents")).as("sum_r"))
        .withColumn("mean_r",
          round(col("sum_r").cast("double") / col("n_r") / 100.0, 6))
      val point = Tables(s, dir, "orders")
        .agg(count(lit(1)).as("n"),
             sum(round(col("o_totalprice") * 100).cast("long")).as("sc"))
        .select(round(col("sc").cast("double") / col("n") / 100.0, 6)
                  .as("point_mean"))
      reps
        .withColumn("rk", row_number().over(w32))
        .agg(min(col("mean_r")).as("boot_lo"),
             max(col("mean_r")).as("boot_hi"),
             round((sum(when(col("rk") === 16, col("mean_r"))) +
                    sum(when(col("rk") === 17, col("mean_r")))) / 2.0, 6)
               .as("boot_median"))
        .crossJoin(point)
        .select("point_mean", "boot_lo", "boot_median", "boot_hi")
    },

    // Revenue-decile migration matrix (added r12) — the "movers and
    // shakers" report: each customer's revenue decile in the first half
    // of the order history (orders before 1998-07-01) vs the second,
    // counted as a ≤12×12 transition matrix (decile −1 = absent from
    // that half: new / churned customers as first-class buckets).
    // Deciles use the EXPLICIT rank formula ((rank−1)·10) div n over
    // (cents desc, custkey) — ntile's remainder placement is engine-
    // convention; this formula is integer arithmetic both engines run
    // identically. The ranking window's input is the per-customer
    // AGGREGATE (dimension-sized — q199's discipline; at a scale where
    // customers outgrow a partition the rank swaps to the q146
    // bucketed prefix sum). One fact scan → pinned (cust, half, cents)
    // → two dimension-sized windows → full-outer self-merge → matrix.
    "q209_decile_migration" -> { (s, dir) =>
      val (ch, h) = pin(Tables(s, dir, "orders")
        .select(col("o_custkey"),
                when(col("o_orderdate") < lit("1998-07-01"), 1L)
                  .otherwise(2L).as("half"),
                round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy("o_custkey", "half").agg(sum(col("cents")).as("cents")))
      h.count(); graft.PinScope.retain(h)
      // per-half global revenue rank through GlobalOrder's bucket-rank
      // (r15: the r14 WindowBoundednessSpec hardening surfaced this
      // site's single-partition row_number over the per-(customer,
      // half) pin — customers are a dimension TODAY, but a global
      // rank funnel over them is exactly the q329-class shape that
      // breaks first when dims grow; bucket = revenue at $10k
      // resolution, monotone in the cents-desc order, bit-identical
      // ranks). The decile denominator is a 1-row aggregate crossed
      // back, not a window.
      def deciles(half: Long): DataFrame = {
        val hc = ch.where(col("half") === half)
        val ranked = GlobalOrder.rank(
          hc, expr("-(cents div 1000000)"),
          Seq(col("cents").desc, col("o_custkey")))
        ranked
          .crossJoin(broadcast(hc.agg(count(lit(1)).as("n"))))
          .select(col("o_custkey"),
                  expr(s"(grn - 1) * 10 div n").as(s"d$half"))
      }
      deciles(1L).join(deciles(2L), Seq("o_custkey"), "full_outer")
        .select(coalesce(col("d1"), lit(-1L)).as("decile_h1"),
                coalesce(col("d2"), lit(-1L)).as("decile_h2"))
        .groupBy("decile_h1", "decile_h2")
        .agg(count(lit(1)).as("customers"))
        .orderBy("decile_h1", "decile_h2")
    },

    // Cohort LTV curve (added r12) — the growth team's core economic
    // series: average cumulative purchase revenue per signed-up user at
    // 0/7/14/21/28 days after THEIR OWN signup (event-time aligned, not
    // calendar-aligned — each user's clock starts at their first signup
    // event). Distinct from q114's retention (presence) and q155's
    // conversion lag (latency): this is cumulative VALUE per cohort
    // member. One scan: a conditional-min window pins each user's
    // signup instant on the same user_id shuffle the purchases ride;
    // qualifying purchase cents cross the broadcast 5-row horizon
    // table; the mean divides by the FULL signup-cohort size (users
    // who never purchase drag the average down — that is the metric's
    // meaning) — exact integers until one rounded division per row.
    "q216_ltv_curve" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy("user_id")
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
                unix_micros(col("ts")).as("tus"),
                round(col("value") * 100).cast("long").as("cents"))
        .withColumn("signup_us",
          min(when(col("event_type") === "signup", col("tus"))).over(w))
        .where(col("signup_us").isNotNull)
      val cohort = ev.where(col("event_type") === "signup")
        .agg(countDistinct(col("user_id")).as("cohort_users"))
      val horizons = Seq(0L, 7L, 14L, 21L, 28L).toDF("horizon_days")
      ev.where(col("event_type") === "purchase" &&
               col("tus") >= col("signup_us"))
        .crossJoin(broadcast(horizons))
        .where(col("tus") <=
               col("signup_us") + col("horizon_days") * lit(86400000000L))
        .groupBy("horizon_days")
        .agg(sum(col("cents")).as("rev_cents"),
             countDistinct(col("user_id")).as("buyers"))
        .join(broadcast(horizons), Seq("horizon_days"), "right")
        .crossJoin(broadcast(cohort))
        .select(col("horizon_days"), col("cohort_users"),
                coalesce(col("buyers"), lit(0L)).as("buyers"),
                round(coalesce(col("rev_cents"), lit(0L)).cast("double") /
                      col("cohort_users") / 100.0, 6).as("avg_ltv"))
        .orderBy("horizon_days")
    },

    // Trained Naive Bayes language classifier (added r12) — the first
    // LEARNED classifier in the model family: fit an add-one-smoothed
    // multinomial NB on the corpus (class = lang, features = token
    // counts) and score every document back, reporting the confusion
    // matrix — the separability readout that tells a curator whether
    // token distributions actually distinguish the declared languages
    // (q48's heuristic lang-id has no training step; q149's bigram LM
    // is generative scoring, not classification). Model size is
    // VOCABULARY×|classes|-bound, never corpus-bound: token counts per
    // (lang, tok) + per-class totals + one global vocab count. Scoring
    // never materializes the dense vocab×class table — the sparse
    // (doc, tok, cnt)⋈(class, tok) join covers seen tokens (one
    // tok-keyed shuffle), and each class's unseen-token mass folds in
    // CLOSED FORM: (ntok − matched) · lp0(class), with the ≤|classes|-
    // row prior/lp0 table broadcast onto the per-doc fan-out.
    // Cross-engine float discipline is q149's: each log-prob rounds to
    // 6 dp ONCE, becomes an exact DECIMAL, and every sum/multiply/
    // compare after that is exact decimal arithmetic — so the argmax
    // (score desc, class asc declared tie-break) is partition-order-
    // free AND engine-portable, which a raw double log-sum is not.
    "q220_nb_classifier" -> { (s, dir) =>
      val (tk, h) = pin(Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
                explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0))
      h.count(); graft.PinScope.retain(h)
      val dtc = tk.groupBy("doc_id", "lang", "tok")
        .agg(count(lit(1)).as("cnt"))
      val mdl = tk.groupBy(col("lang").as("mlang"), col("tok"))
        .agg(count(lit(1)).as("clt"))
      val ct = mdl.groupBy("mlang").agg(sum("clt").as("cl"))
      val voc = tk.select("tok").distinct().agg(count(lit(1)).as("vsz"))
      val docs = Tables(s, dir, "documents")
      val pri = docs.groupBy(col("lang").as("mlang"))
        .agg(count(lit(1)).as("ndocs"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
        .select(col("mlang"),
                round(log(d(col("ndocs")) / d(col("n"))), 6)
                  .cast("decimal(28,6)").as("plp"))
      val lp = mdl.join(broadcast(ct), Seq("mlang"))
        .crossJoin(broadcast(voc))
        .select(col("mlang"), col("tok"),
                round(log(d(col("clt") + 1) / d(col("cl") + col("vsz"))), 6)
                  .cast("decimal(28,6)").as("lp"))
      val classes = ct.crossJoin(broadcast(voc))
        .select(col("mlang"),
                round(log(lit(1.0) / d(col("cl") + col("vsz"))), 6)
                  .cast("decimal(28,6)").as("lp0"))
        .join(pri, Seq("mlang"))
      val m = dtc.join(lp, Seq("tok"))
        .groupBy("doc_id", "mlang")
        .agg(sum(col("cnt").cast("decimal(9,0)") * col("lp")).as("sum_lp"),
             sum("cnt").as("cnt_m"))
      val nd = dtc.groupBy("doc_id", "lang")
        .agg(sum("cnt").as("ntok"))
      val zero = lit(BigDecimal(0)).cast("decimal(38,6)")
      val sc = nd.crossJoin(broadcast(classes))
        .join(m, Seq("doc_id", "mlang"), "left")
        .withColumn("score",
          col("plp") + coalesce(col("sum_lp"), zero) +
            (col("ntok") - coalesce(col("cnt_m"), lit(0L)))
              .cast("decimal(9,0)") * col("lp0"))
      sc.withColumn("rn", row_number().over(
            Window.partitionBy("doc_id")
              .orderBy(col("score").desc, col("mlang"))))
        .where(col("rn") === 1)
        .groupBy(col("lang"), col("mlang").as("predicted"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "predicted")
    },

    // Fulfillment-SLA report (added r12) — the order-to-ship latency
    // attestation ops teams publish: per order priority, exact
    // p50/p90/p99 of the ship lag in DAYS (l_shipdate − o_orderdate)
    // plus the late rate (lag > 60 d). First operator to price the
    // orders⋈lineitem latency pair: the join is an UN-HINTED shuffle
    // join on l_orderkey (both sides fact-sized at 100 TB — q94's
    // discipline; AQE may broadcast at test scale, threshold-driven),
    // collapsing immediately to a (priority, lag-day) VALUE-GROUP
    // table — domain-bound, ≈ priorities × distinct lag days — which
    // the pinned q151 cumulative-prefix machinery turns into exact
    // interpolated percentiles with no per-group sort. The synthetic
    // feed's negative lags are reported as-is (a real DQ signal this
    // report exists to surface, already caught by q116-style gates).
    "q210_fulfillment_sla" -> { (s, dir) =>
      import s.implicits._
      val (pv, h) = pin(Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(Tables(s, dir, "orders")
                .select(col("o_orderkey").as("l_orderkey"),
                        col("o_orderdate"), col("o_orderpriority")),
              Seq("l_orderkey"))
        .select(col("o_orderpriority").as("prio"),
                datediff(col("l_shipdate"), col("o_orderdate"))
                  .cast("long").as("v"))
        .groupBy("prio", "v").agg(count(lit(1)).as("c")))
      h.count(); graft.PinScope.retain(h)
      val qdf = Seq(("p50", 0.50), ("p90", 0.90), ("p99", 0.99))
        .toDF("q_label", "q")
      val late = pv.groupBy("prio")
        .agg(sum(when(col("v") > 60, col("c")).otherwise(0L)).as("late"),
             sum(col("c")).as("tot"))
        .select(col("prio"),
                round(col("late").cast("double") / col("tot"), 6)
                  .as("late_rate"))
      bandsAt(cumCounts(pv, "prio"), "prio", qdf, 1.0)
        .withColumnRenamed("value_at_q", "lag_days_at_q")
        .join(broadcast(late), Seq("prio"))
        .select(col("prio").as("o_orderpriority"), col("q_label"),
                col("n"), col("lag_days_at_q"), col("late_rate"))
        .orderBy("o_orderpriority", "q_label")
    },

    // Item co-visitation (added r12) — the "users who touched X also
    // touched Y" table that seeds every collaborative-filter /
    // related-items surface. Items come from the event props JSON
    // (`$.k`). The scale discipline is the per-user CAP: each user
    // contributes only their 20 EARLIEST-first-seen distinct items
    // (row_number over (first_us, item) — declared, deterministic), so
    // the per-user pair fan-out is ≤ C(20,2) = 190 rows no matter how
    // hyperactive the user — the standard co-visitation guard against
    // the power-law user who would otherwise emit millions of pairs.
    // Shape: one scan → (user, item) first-seen agg → capped set PINNED
    // once (three downstream reads, one materialization) → self-join on
    // user_id (both sides share the pinned partitioning) → pair counts
    // (|items|²-bounded, map-side combinable) → two broadcast joins
    // against the item-frequency table for the Jaccard denominator →
    // bounded top-30 (TakeOrderedAndProject, fully-ordered tie-break).
    "q201_covisitation" -> { (s, dir) =>
      val wFirst = Window.partitionBy("user_id")
        .orderBy(col("first_us"), col("item"))
      val (items, h) = pin(Tables(s, dir, "events")
        .select(col("user_id"),
                get_json_object(col("props"), "$.k").cast("long").as("item"),
                unix_micros(col("ts")).as("us"))
        .where(col("item").isNotNull)
        .groupBy("user_id", "item").agg(min(col("us")).as("first_us"))
        .withColumn("rn", row_number().over(wFirst))
        .where(col("rn") <= 20)
        .select("user_id", "item"))
      h.count(); graft.PinScope.retain(h)
      val itemUsers = items.groupBy("item").agg(count(lit(1)).as("iu"))
      val pairs = items.as("a").join(items.as("b"), "user_id")
        .where(col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
        .agg(count(lit(1)).as("pair_users"))
      pairs
        .join(broadcast(itemUsers.select(col("item").as("item_a"),
                                         col("iu").as("ua"))), Seq("item_a"))
        .join(broadcast(itemUsers.select(col("item").as("item_b"),
                                         col("iu").as("ub"))), Seq("item_b"))
        .withColumn("jaccard",
          round(col("pair_users").cast("double") /
                (col("ua") + col("ub") - col("pair_users")), 6))
        .select("item_a", "item_b", "pair_users", "ua", "ub", "jaccard")
        .orderBy(col("pair_users").desc, col("item_a"), col("item_b"))
        .limit(30)
    },

    // Top-share concentration (added r10) — what share of revenue the
    // top 1% / top 10% of orders carry, per priority tier: the Pareto
    // companion to q146's Gini, EXACT from the same pinned value-group
    // + prefix-sum machinery. For threshold k = ⌈p·n⌉, a value group
    // (v, c) with cumAbove = n − cum rows strictly above it
    // contributes v·max(0, min(c, k − cumAbove)) — the boundary group
    // enters PARTIALLY, in closed form, so no row-level rank and no
    // per-group sort exist anywhere. Numerator and denominator are
    // exact decimal sums; one fixed-order double division per output
    // row, rounded 6 dp. Ties inside the boundary group are
    // share-invariant (equal v), so the oracle's identical arithmetic
    // provably agrees.
    "q158_top_share" -> { (s, dir) =>
      import s.implicits._
      val (pv, h) = pin(Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"),
                round(col("o_totalprice") * 100).cast("long").as("v"))
        .groupBy("prio", "v").agg(count(lit(1)).as("c")))
      h.count(); graft.PinScope.retain(h)
      val tot = pv.groupBy("prio")
        .agg(sum(col("v").cast("decimal(38,0)") * col("c")).as("rev"))
      val qdf = Seq(("top1", 1L, 100L), ("top10", 1L, 10L))
        .toDF("p_label", "num", "den")
      cumCounts(pv, "prio").crossJoin(broadcast(qdf))
        .withColumn("k", expr("(n * num + den - 1) div den"))
        .withColumn("taken",
          greatest(lit(0L), least(col("c"),
            col("k") - (col("n") - col("cum")))))
        .groupBy("prio", "p_label").agg(
          max("n").as("n"), max("k").as("k"),
          sum(col("v").cast("decimal(38,0)") * col("taken")).as("top_rev"))
        .join(broadcast(tot), Seq("prio"))
        .select(col("prio").as("o_orderpriority"), col("p_label"),
                col("n"), col("k"),
                round(d(col("top_rev")) / d(col("rev")), 6)
                  .as("top_share"))
        .orderBy("o_orderpriority", "p_label")
    },

    // Sequential A/B monitor (added r13) — the DAILY-PEEKING
    // companion to q159's fixed-horizon readout: recompute the pooled
    // two-proportion z after every day and compare against a
    // Haybittle–Peto group-sequential boundary (|z| > 3.0 at every
    // interim look, 1.96 at the final look — the closed-form boundary
    // clinical trials and experimentation platforms use precisely
    // because it needs no K-dependent constant table), flagging the
    // first crossing. This is the operator that answers "could we
    // have stopped early?" without the peeking bias a naive daily
    // 1.96 test incurs. Shape: ONE fact scan folds per-user (arm,
    // first-seen day, first-conversion day) — q159's arms and
    // >150-cent conversion verbatim — then daily cumulative counts
    // per arm ride a ≤|days| window table and each day's z is q159's
    // exact chain over the cumulative integers. Undefined-z days
    // (either arm still empty or pooled rate 0/1) report NULL and
    // never cross, declared. Output per day: cumulative n/x per arm,
    // z, boundary, crossed, plus the running first-crossing day.
    "q321_sequential_ab" -> { (s, dir) =>
      val pu = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("d0"),
             min(when(col("event_type") === "purchase" &&
                        col("value") > 150, to_date(col("ts"))))
               .as("dc"))
        .withColumn("arm",
          when(substring(md5(col("user_id").cast("string")), 1, 1) <= "7",
               "c").otherwise("t"))
      val (pp, h) = pin(pu); h.count(); graft.PinScope.retain(h)
      // per-day INCREMENTS then window cums over the ≤|days| table —
      // never a days×users range join (the fact side folds once)
      val inc = pp.groupBy(col("d0").as("day")).agg(
        sum(when(col("arm") === "c", 1L).otherwise(0L)).as("an_c"),
        sum(when(col("arm") === "t", 1L).otherwise(0L)).as("an_t"))
      val incx = pp.where(col("dc").isNotNull)
        .groupBy(col("dc").as("day")).agg(
          sum(when(col("arm") === "c", 1L).otherwise(0L)).as("ax_c"),
          sum(when(col("arm") === "t", 1L).otherwise(0L)).as("ax_t"))
      val W = Window.orderBy("day")
      val wc = W.rowsBetween(Window.unboundedPreceding, 0)
      val byDay = inc.join(incx, Seq("day"), "full_outer")
        .select(col("day"),
                coalesce(col("an_c"), lit(0L)).as("an_c"),
                coalesce(col("an_t"), lit(0L)).as("an_t"),
                coalesce(col("ax_c"), lit(0L)).as("ax_c"),
                coalesce(col("ax_t"), lit(0L)).as("ax_t"))
        .select(col("day"),
                sum("an_c").over(wc).as("n_c"),
                sum("an_t").over(wc).as("n_t"),
                sum("ax_c").over(wc).as("x_c"),
                sum("ax_t").over(wc).as("x_t"))
      val lastDay = byDay.agg(max("day").as("mxd"))
      val zExpr = expr(
        "CASE WHEN n_c > 0 AND n_t > 0 AND x_c + x_t > 0 " +
          "AND x_c + x_t < n_c + n_t THEN " +
          "round((CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE) - " +
          "CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE)) / " +
          "sqrt(CAST(x_c + x_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE) * " +
          "(1e0 - CAST(x_c + x_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE)) * " +
          "(1e0 / CAST(n_c AS DOUBLE) + 1e0 / CAST(n_t AS DOUBLE))), 6) " +
          "ELSE NULL END")
      byDay.crossJoin(broadcast(lastDay))
        .withColumn("day_idx",
          row_number().over(W).cast("long"))
        .withColumn("z", zExpr)
        .withColumn("boundary",
          when(col("day") === col("mxd"), 1.96).otherwise(3.0))
        .withColumn("crossed",
          col("z").isNotNull && abs(col("z")) > col("boundary"))
        .withColumn("first_crossing",
          min(when(col("crossed"), col("day_idx"))).over(
            W.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("day_idx"), col("n_c"), col("n_t"), col("x_c"),
                col("x_t"), col("z"), col("boundary"), col("crossed"),
                col("first_crossing"))
        .orderBy("day_idx")
    },

    // A/B experiment readout (added r10) — the statistical-inference
    // operator an experimentation platform runs nightly: users hash-
    // split 50/50 into arms by the q67 md5-nibble discipline (first
    // nibble <= '7' — deterministic, key-only, independent of q67's
    // train bit which reads the same nibble of doc_id, a different key
    // space), conversion = user made a HIGH-VALUE purchase (value >
    // 150 — raw purchase incidence is 100% on this always-buying
    // corpus, which degenerates the z to 0/0; the thresholded event is
    // ~45% and non-degenerate at every SF), revenue = the user's total
    // purchase cents (exact BIGINT). Per arm: exact n / x /
    // Σrev / Σrev² (decimal), then the two classical statistics as ONE
    // fixed-order double formula each, rounded 6 dp: the pooled
    // two-proportion z on conversion and Welch's t on revenue-per-user
    // (variance from exact moments — the s₁² cross term is formed in
    // double AFTER the exact decimal sums, so no decimal overflow).
    // Scale shape: ONE scan, one user_id hash agg with map-side
    // combine, a 2-row arm table, a 1-row result.
    "q159_ab_test" -> { (s, dir) =>
      val perUser = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" &&
                        col("value") > 150, 1L)
                   .otherwise(0L)).as("conv"),
             sum(when(col("event_type") === "purchase",
                   round(col("value") * 100).cast("long"))
                   .otherwise(0L)).as("rev"))
        .withColumn("arm",
          when(substring(md5(col("user_id").cast("string")), 1, 1) <= "7",
               "control").otherwise("treatment"))
      val arms = perUser.groupBy("arm").agg(
        count(lit(1)).as("n"), sum("conv").as("x"),
        sum(col("rev").cast("decimal(38,0)")).as("s1"),
        sum(col("rev").cast("decimal(38,0)") * col("rev")).as("s2"))
      def side(a: String, c: String) =
        max(when(col("arm") === a, col(c))).as(s"${c}_${a.head}")
      arms.agg(side("control", "n"), side("treatment", "n"),
               side("control", "x"), side("treatment", "x"),
               side("control", "s1"), side("treatment", "s1"),
               side("control", "s2"), side("treatment", "s2"))
        .withColumn("p_c", d(col("x_c")) / d(col("n_c")))
        .withColumn("p_t", d(col("x_t")) / d(col("n_t")))
        .withColumn("pp",
          d(col("x_c") + col("x_t")) / d(col("n_c") + col("n_t")))
        .withColumn("m_c", d(col("s1_c")) / d(col("n_c")))
        .withColumn("m_t", d(col("s1_t")) / d(col("n_t")))
        .withColumn("v_c",
          (d(col("s2_c")) - d(col("s1_c")) * d(col("s1_c")) / d(col("n_c"))) /
            d(col("n_c") - 1))
        .withColumn("v_t",
          (d(col("s2_t")) - d(col("s1_t")) * d(col("s1_t")) / d(col("n_t"))) /
            d(col("n_t") - 1))
        .select(col("n_c"), col("n_t"), col("x_c"), col("x_t"),
          round(col("p_c"), 6).as("rate_c"),
          round(col("p_t"), 6).as("rate_t"),
          round((col("p_t") - col("p_c")) /
            sqrt(col("pp") * (lit(1.0) - col("pp")) *
                 (lit(1.0) / d(col("n_c")) + lit(1.0) / d(col("n_t")))), 6)
            .as("z_conv"),
          round((col("m_t") - col("m_c")) /
            sqrt(col("v_c") / d(col("n_c")) + col("v_t") / d(col("n_t"))), 6)
            .as("t_rev"))
    },

    // RFM customer segmentation (added r10) — the classic marketing
    // cut: per customer recency (days since last order vs the
    // broadcast corpus-end day), frequency (orders), monetary (exact
    // cents); each dimension quartile-scored 1–4 and customers rolled
    // up per R-F-M segment. The scores are TIE-SAFE and FP-free:
    // s = (4·cum + n − 1) div n over the dimension's VALUE-GROUP
    // cumulative table (every customer sharing a value shares a score
    // — ntile's row-position tie-break would make boundary scores
    // layout-dependent and unoracleable), and the cumulative counts
    // come from the q146 bucketed two-level prefix sum, so no
    // one-reducer-per-dimension sort exists. Scale shape: ONE orders
    // scan → pinned per-customer table; the unioned 3-dimension
    // value-group table is domain-bound; three broadcast score-map
    // joins; a ≤64-row rollup.
    "q160_rfm_segments" -> { (s, dir) =>
      val od = Tables(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"),
                round(col("o_totalprice") * 100).cast("long").as("cents"))
      val end = od.agg(max("day").as("end_day"))
      val (pc, h) = pin(od.crossJoin(broadcast(end))
        .groupBy("o_custkey")
        .agg(min(datediff(col("end_day"), col("day"))).cast("long")
               .as("rec"),
             count(lit(1)).as("freq"), sum("cents").as("mon")))
      h.count(); graft.PinScope.retain(h)
      val pv = pc.select(explode(array(
          struct(lit("r").as("k"), col("rec").as("v")),
          struct(lit("f").as("k"), col("freq").as("v")),
          struct(lit("m").as("k"), col("mon").as("v")))).as("e"))
        .select(col("e.k").as("k"), col("e.v").as("v"))
        .groupBy("k", "v").agg(count(lit(1)).as("c"))
      val (sm, h2) = pin(cumCounts(pv, "k")
        .withColumn("s", expr("(4 * cum + n - 1) div n"))
        .select(col("k"), col("v"), col("s")))
      h2.count(); graft.PinScope.retain(h2)
      def scoreMap(k: String, vName: String, sName: String) =
        broadcast(sm.where(col("k") === k)
          .select(col("v").as(vName), col("s").as(sName)))
      pc.join(scoreMap("r", "rec", "rs"), Seq("rec"))
        .join(scoreMap("f", "freq", "fs"), Seq("freq"))
        .join(scoreMap("m", "mon", "ms"), Seq("mon"))
        .withColumn("segment",
          concat_ws("-", col("rs"), col("fs"), col("ms")))
        .withColumn("label",
          when(col("rs") <= 2 && col("fs") >= 3 && col("ms") >= 3,
               "champion")
            .when(col("rs") <= 2 && col("ms") >= 3, "big_spender")
            .when(col("rs") >= 3 && col("fs") >= 3, "at_risk")
            .when(col("rs") >= 3, "hibernating")
            .otherwise("regular"))
        .groupBy("segment", "label")
        .agg(count(lit(1)).as("customers"),
             round(d(sum(col("mon").cast("decimal(38,0)"))) /
                   d(count(lit(1))) / lit(100.0), 6).as("avg_monetary"))
        .orderBy("segment")
    },

    // Seasonal-naive forecast screen (added r10) — the forecasting
    // team's first sanity metric over any daily series: per event
    // type, is the series better explained by weekly seasonality
    // (forecast day d with day d−7) or by simple persistence
    // (forecast with day d−1)? Both one-step error sums are EXACT
    // integer Σ|Δcount| over the (type, day) cell table, restricted
    // to days where BOTH lags exist so numerator and denominator
    // cover the identical day set; the ratio (a MASE-style statistic
    // — <1 ⇒ weekly structure beats persistence) is the only double,
    // one fixed-order division rounded 6 dp, null-guarded when the
    // naive error is zero (a constant series). Scale shape: ONE
    // facts scan into a (type, day) map-side-combined agg, PINNED
    // (q148's discipline — r10 left the cell table lazy, so its three
    // plan references re-scanned the facts three times); the cell
    // table is types×days-bound, so the two shifted self-joins and
    // the rollup never touch fact volume.
    "q161_forecast_screen" -> { (s, dir) =>
      val (cells, h) = pin(Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c")))
      h.count(); graft.PinScope.retain(h)
      def shifted(n: Int, as: String) =
        cells.select(col("event_type"),
                     date_add(col("day"), n).as("day"), col("c").as(as))
      cells.join(shifted(1, "cp"), Seq("event_type", "day"))
        .join(shifted(7, "cs"), Seq("event_type", "day"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
             sum(abs(col("c") - col("cs"))).as("err_seasonal"),
             sum(abs(col("c") - col("cp"))).as("err_naive"))
        .withColumn("mase",
          when(col("err_naive") > 0,
               round(d(col("err_seasonal")) / d(col("err_naive")), 6)))
        .orderBy("event_type")
    },

    // Exact ROC-AUC via rank statistics (added r12) — the model-eval
    // primitive every offline scoring pipeline ends in: does a score
    // (order total, in cents) rank positives (orders containing a
    // returned lineitem) above negatives? AUC is the Mann–Whitney
    // statistic with the textbook average-rank tie correction, and the
    // whole computation is INTEGER until one final division: per
    // (group, score) value-group counts (n, positives), exclusive
    // cumulative counts from the q146 bucketed prefix sum (no per-group
    // single-reducer sort — the value-group table is distinct-cents
    // bound, not corpus bound), then 2·Σ rank_pos =
    // Σ npos·(2·cum_less + cnt + 1) and
    // AUC = (2R − n_pos(n_pos+1)) / (2 n_pos n_neg), decimal-summed
    // (order-free), one rounded division. Degenerate single-class
    // groups yield null by guard. Scale shape: ONE orders⋈lineitem
    // fact join (key shuffle, AQE-sized) into a map-side-combined
    // per-order label agg; everything after lives on the domain-bound
    // value-group table.
    "q229_auc_rank" -> { (s, dir) =>
      // r19 optimization (guide §2.3, aggregate before you shuffle):
      // the label was aggregated AFTER the fact join — 600k joined
      // rows carrying (prio, v) shuffled into the per-order groupBy.
      // The per-order flag only needs lineitem: reduce it to one
      // map-side-combined row per order first, then join orders —
      // the join output IS `lab`, one row per order with ≥1 lineitem,
      // identical by construction (pos = max over the order's lines,
      // prio/v are order attributes).
      val pos = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
               .as("pos"))
      val lab = Tables(s, dir, "orders")
        .join(pos, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
                round(col("o_totalprice") * 100).cast("long").as("v"),
                col("pos"))
      val (pv, h) = pin(lab.groupBy("prio", "v")
        .agg(count(lit(1)).as("c"), sum("pos").as("npos")))
      h.count(); graft.PinScope.retain(h)
      cumCounts(pv.select(col("prio"), col("v"), col("c")), "prio")
        .join(pv.select(col("prio"), col("v"), col("npos")),
              Seq("prio", "v"))
        .withColumn("cless", col("cum") - col("c"))
        .groupBy("prio")
        .agg(sum(col("npos").cast("decimal(38,0)")).as("np"),
             sum((col("c") - col("npos")).cast("decimal(38,0)")).as("nn"),
             sum((col("npos") * (lit(2) * col("cless") + col("c") + lit(1)))
                   .cast("decimal(38,0)")).as("r2"))
        .select(col("prio"),
                col("np").cast("long").as("n_pos"),
                col("nn").cast("long").as("n_neg"),
                when(col("np") > 0 && col("nn") > 0,
                     round((col("r2") - col("np") * (col("np") + lit(1)))
                             .cast("double") /
                           (col("np") * col("nn") * lit(2)).cast("double"),
                           6)).as("auc"))
        .orderBy("prio")
    },

    // Leakage-safe K-fold target encoding (added r12) — the
    // feature-engineering step that silently overfits when done
    // naively: encoding a categorical column (market segment) with the
    // mean of the target (order total) must EXCLUDE each row's own
    // fold, or the label leaks into the feature. The out-of-fold mean
    // has a closed form over per-(segment, fold) aggregates —
    // (sum_seg − sum_fold)/(cnt_seg − cnt_fold) — so the entire
    // operator is ONE fact scan into a segments×folds cell table
    // (map-side combined), segment totals as window sums over those
    // ≤ 25 cells, zero self-joins. The m-estimate smoothed variant
    // blends the leakage-safe GLOBAL per-fold prior with weight m=20
    // (small categories shrink toward the prior — the standard
    // high-cardinality guard). Integer cents, decimal sums, rounded
    // divisions at the end. The fold is md5-derived from the order key
    // (q67's no-RNG discipline: stable under reshuffles and re-runs).
    "q230_target_encoding" -> { (s, dir) =>
      val wSeg = Window.partitionBy("segment")
      val wAll = Window.partitionBy(lit(1))
      Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")
                          .select(col("c_custkey"), col("c_mktsegment"))),
              col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
                (conv(substring(md5(col("o_orderkey").cast("string")), 1, 4),
                      16, 10).cast("long") % 5).as("fold"),
                round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy("segment", "fold")
        .agg(count(lit(1)).as("cnt"),
             sum(col("cents").cast("decimal(38,0)")).as("sm"))
        .withColumn("cnt_seg", sum("cnt").over(wSeg))
        .withColumn("sum_seg", sum("sm").over(wSeg))
        .withColumn("cnt_all", sum("cnt").over(wAll))
        .withColumn("sum_all", sum("sm").over(wAll))
        .select(col("segment"), col("fold"), col("cnt"),
                round((col("sum_seg") - col("sm")).cast("double") /
                      (col("cnt_seg") - col("cnt")).cast("double") / 100.0,
                      6).as("enc_oof"),
                round(((col("sum_seg") - col("sm")).cast("double") +
                       lit(20.0) *
                       ((col("sum_all") - col("sum_seg")).cast("double") /
                        (col("cnt_all") - col("cnt_seg")).cast("double"))) /
                      (col("cnt_seg") - col("cnt") + lit(20)).cast("double") /
                      100.0, 6).as("enc_smooth"))
        .orderBy("segment", "fold")
    },

    // Association rules over order baskets (added r12) — the
    // market-basket classic next to q201's per-user co-visitation:
    // baskets are ORDERS, items are part brands, and the deliverable is
    // the rule metrics (support, confidence both directions, lift) for
    // every pair above min-support 5, ranked by lift with a declared
    // total tie order. Pair generation is per-basket ARRAY algebra, not
    // a fact self-join: collect each order's sorted distinct brands
    // (one key shuffle) and explode the in-array ordered pairs — pair
    // volume is Σ basket² (order-linear, TPC-H ≤ 7 items ⇒ ≤ 21/order)
    // and nothing corpus-sized is ever cached (the first cut PINNED the
    // distinct (order,brand) table for its three consumers and OOMed
    // the 100× sweep JVM — q219's pin-artifacts-never-corpora lesson,
    // relearned; the shipped form re-derives three cheap single-purpose
    // scans instead). The rule table is brand²-bounded, so supports
    // broadcast onto it and the rank sorts a cell table. Counts exact;
    // confidence/lift are fixed-order double divisions rounded 6.
    "q234_basket_rules" -> { (s, dir) =>
      def items = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part"),
              col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      val sup = items.distinct().groupBy("b").agg(count(lit(1)).as("s"))
      val nOrders = items.agg(countDistinct("ok").as("n_orders"))
      items.groupBy("ok")
        .agg(sort_array(collect_set(col("b"))).as("bs"))
        .select(explode(expr(
          """flatten(transform(bs, (x, i) ->
            |  transform(slice(bs, i + 2, size(bs) - i - 1),
            |            y -> struct(x AS b1, y AS b2))))""".stripMargin))
          .as("pr"))
        .select(col("pr.b1").as("b1"), col("pr.b2").as("b2"))
        .groupBy("b1", "b2")
        .agg(count(lit(1)).as("sup_ab"))
        .where(col("sup_ab") >= 5)
        .join(broadcast(sup.select(col("b").as("b1"), col("s").as("sup_a"))),
              Seq("b1"))
        .join(broadcast(sup.select(col("b").as("b2"), col("s").as("sup_b"))),
              Seq("b2"))
        .crossJoin(broadcast(nOrders))
        .select(col("b1"), col("b2"), col("sup_ab"), col("sup_a"),
                col("sup_b"),
                round(d(col("sup_ab")) / d(col("sup_a")), 6).as("conf_fwd"),
                round(d(col("sup_ab")) / d(col("sup_b")), 6).as("conf_rev"),
                round(d(col("sup_ab")) * d(col("n_orders")) /
                      (d(col("sup_a")) * d(col("sup_b"))), 6).as("lift"))
        .orderBy(col("lift").desc, col("b1"), col("b2"))
        .limit(20)
    },

    // Feature hashing audit (added r12) — the hashing trick that keeps
    // a model's input dimension FIXED while the categorical vocabulary
    // grows without bound (the streaming/online-learning contract: no
    // dictionary to build, ship, or version). Each (feature=value)
    // string hashes to one of 64 buckets via md5 (q67's portable no-RNG
    // hash — stable across engines, partitionings, and runs); the audit
    // reports per-bucket load, how many DISTINCT feature-values share
    // the bucket (the collision count that silently aliases model
    // weights), and the target mass landing there. ONE fact scan with a
    // broadcast dim join, a 3-way explode (rows ×3, still linear), one
    // 64-cell map-side-combined agg — the whole audit is scan-bound at
    // any corpus size because the output dimension is the CONSTANT the
    // trick exists to enforce.
    "q236_feature_hash" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")
                .select(col("c_custkey"), col("c_mktsegment"),
                        col("c_nationkey"))),
              col("o_custkey") === col("c_custkey"))
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
                explode(array(
                  concat(lit("seg="), col("c_mktsegment")),
                  concat(lit("nat="), col("c_nationkey").cast("string")),
                  concat(lit("pri="), col("o_orderpriority")))).as("fv"))
        .withColumn("bucket",
          conv(substring(md5(col("fv")), 1, 4), 16, 10).cast("long") % 64)
        .groupBy("bucket")
        .agg(count(lit(1)).as("rows_in"),
             countDistinct(col("fv")).as("distinct_fv"),
             round(sum(col("cents").cast("decimal(38,0)")).cast("double") /
                   100.0, 6).as("target_mass"))
        .withColumn("collided",
          when(col("distinct_fv") > 1, 1L).otherwise(0L))
        .orderBy("bucket")
    },

    // Quantile normalization (added r12) — the distribution-alignment
    // feature transform: map every supplier balance onto the CUSTOMER
    // balance distribution at the same quantile (the cross-population
    // calibration genomics normalizes arrays with and feature stores
    // use to make one signal comparable across segments). Entirely
    // INTEGER by cleared denominators: source rank cum_s maps to
    // target order statistic k = ⌈cum_s·n_c/n_s⌉ = (cum_s·n_c+n_s−1)
    // div n_s, and the lookup "min target value with cum_c ≥ k" is a
    // MERGE STAIRCASE — union the k-positions with the target cum
    // steps, one co-sort, forward-fill the next step value — so the
    // mapping costs one sort of |vg_s|+|vg_c| VALUE-GROUP rows (domain-
    // bound, both distributions collapse to distinct cents first), not
    // a range join and never row volume. The two fact scans are
    // dimension reads; divisions by 100 happen only at emission.
    "q239_quantile_norm" -> { (s, dir) =>
      def vg(t: String, c: String) = Tables(s, dir, t)
        .select(round(col(c) * 100).cast("long").as("v"))
        .groupBy("v").agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(lit(1))
      def cum(df: DataFrame) = df
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(wAll))
      val cs = cum(vg("supplier", "s_acctbal"))
      val cc = cum(vg("customer", "c_acctbal"))
      val kq = cs.crossJoin(broadcast(cc.agg(max("n").as("n_c"))))
        .select(col("v").as("v_s"), col("c").as("cnt"),
                expr("(cum * n_c + n - 1) div n").as("pos"))
      val u = kq.select(col("pos"), lit(1L).as("isq"), col("v_s"),
                        col("cnt"), lit(null).cast("long").as("cv"))
        .unionAll(cc.select(col("cum").as("pos"), lit(0L).as("isq"),
                            lit(null).cast("long").as("v_s"),
                            lit(null).cast("long").as("cnt"),
                            col("v").as("cv")))
      // tie order: query rows (isq=1) BEFORE the target step (isq=0) at
      // equal pos, so cum_c = k stays inside the at-or-after frame —
      // the inclusive ≥ the rank map requires. Computed as the running
      // last() over the REVERSED sort: Spark executes an UNBOUNDED
      // FOLLOWING frame by rescanning the tail per row (O(n²) — a flat
      // ~10 s on the ~140k-row value-group union, r12's slowest bench
      // line), while the reversed running frame is one O(n) pass; the
      // frame includes the current row, matching the original
      // currentRow→following bound exactly
      val wNextRev = Window.orderBy(col("pos").desc, col("isq").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("mv", last(col("cv"), ignoreNulls = true).over(wNextRev))
        .where(col("isq") === 1)
        .select(round(d(col("v_s")) / 100.0, 6).as("src_bal"), col("cnt"),
                round(d(col("mv")) / 100.0, 6).as("mapped_bal"))
        .orderBy("src_bal")
    },

    // One-way ANOVA F test (added r12) — the k-group generalization of
    // q159's two-arm comparison: do the five event types draw their
    // values from populations with one mean? SSB/SSW decompose from the
    // per-group moment sums alone — no residual pass: per-group
    // (n, Σv, Σv²) in exact decimals (ONE map-side-combined scan to
    // ≤|types| cells), A = Σ_g S_g²/n_g with each group's term rounded
    // to 6 dp and accumulated as an exact decimal (order-free, the q142
    // log-sum discipline applied to a division), then
    // SSB = A − S²/N and SSW = T − A as fixed-order double formulas.
    // F = (SSB/(k−1))/(SSW/(N−k)) and η² = SSB/(SSB+SSW) derive from
    // the ROUNDED reported SS values, so every emitted figure is
    // reproducible from the two before it. Values in cents² (declared
    // unit — scale-invariance of F makes the unit a reporting choice).
    "q251_anova" -> { (s, dir) =>
      val g = Tables(s, dir, "events")
        .select(col("event_type"),
                round(col("value") * 100).cast("long").as("v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum(col("v").cast("decimal(38,0)")).as("sv"),
             sum(col("v").cast("decimal(38,0)") * col("v")).as("svv"))
      g.agg(count(lit(1)).as("k"), sum("n").as("n_total"),
            sum("sv").as("sall"), sum("svv").as("tall"),
            sum(round(d(col("sv")) * d(col("sv")) / d(col("n")), 6)
                  .cast("decimal(38,6)")).as("a"))
        .withColumn("ssb",
          round(d(col("a")) -
                d(col("sall")) * d(col("sall")) / d(col("n_total")), 6))
        .withColumn("ssw", round(d(col("tall")) - d(col("a")), 6))
        .select(col("k"), col("n_total"),
                col("ssb").as("ss_between"), col("ssw").as("ss_within"),
                round((col("ssb") / d(col("k") - 1)) /
                      (col("ssw") / d(col("n_total") - col("k"))), 6)
                  .as("f_stat"),
                round(col("ssb") / (col("ssb") + col("ssw")), 6)
                  .as("eta_sq"))
    },

    // CUPED variance-reduced A/B readout (added r12) — the experiment
    // methodology standard: adjust each user's post-period revenue by
    // their PRE-period revenue (θ·(x − x̄), θ = cov(x,y)/var(x) pooled
    // across arms — pre-period data is assignment-independent, so the
    // adjustment is unbiased) and the treatment-effect estimate keeps
    // its mean while shedding the between-user variance the covariate
    // explains (factor 1−ρ²). Closed form over per-arm moment cells:
    // diff_cuped = (m_ty − m_cy) − θ·(m_tx − m_cx) — no per-row
    // adjusted column materializes. ONE events scan → per-user
    // (pre, post) purchase cents (user_id shuffle, the q159 universe
    // with its md5 house split) → 2 arm cells of exact decimal moments
    // (n, Σx, Σy, Σx², Σy², Σxy) → one row of fixed-order double
    // formulas; θ and ρ² come from the POOLED (arm-summed) moments and
    // the reported diff_cuped uses the ROUNDED θ, so the printed
    // figures recompose exactly. Boundary 2024-01-16 splits the feed's
    // observed month; at 100 TB the pre-period aggregate is an
    // artifact the experiment platform already maintains.
    "q252_cuped" -> { (s, dir) =>
      val b = lit("2024-01-16").cast("timestamp")
      val pu = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase" && col("ts") < b,
                      round(col("value") * 100).cast("long")).otherwise(0L))
               .as("x"),
             sum(when(col("event_type") === "purchase" && col("ts") >= b,
                      round(col("value") * 100).cast("long")).otherwise(0L))
               .as("y"))
        .withColumn("arm",
          when(substring(md5(col("user_id").cast("string")), 1, 1) <= "7",
               "c").otherwise("t"))
      val arms = pu.groupBy("arm").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
      def side(a: String, c: String) =
        max(when(col("arm") === a, col(c))).as(s"${c}_$a")
      arms.agg(side("c", "n"), side("t", "n"), side("c", "sx"),
               side("t", "sx"), side("c", "sy"), side("t", "sy"),
               side("c", "sxx"), side("t", "sxx"), side("c", "syy"),
               side("t", "syy"), side("c", "sxy"), side("t", "sxy"))
        .withColumn("nn", d(col("n_c") + col("n_t")))
        .withColumn("px", d(col("sx_c") + col("sx_t")))
        .withColumn("py", d(col("sy_c") + col("sy_t")))
        .withColumn("pxx", d(col("sxx_c") + col("sxx_t")))
        .withColumn("pyy", d(col("syy_c") + col("syy_t")))
        .withColumn("pxy", d(col("sxy_c") + col("sxy_t")))
        .withColumn("cxy", col("nn") * col("pxy") - col("px") * col("py"))
        .withColumn("vx", col("nn") * col("pxx") - col("px") * col("px"))
        .withColumn("vy", col("nn") * col("pyy") - col("py") * col("py"))
        .withColumn("theta", round(col("cxy") / col("vx"), 6))
        .select(col("n_c"), col("n_t"),
          round((d(col("sy_t")) / d(col("n_t")) -
                 d(col("sy_c")) / d(col("n_c"))) / 100.0, 6).as("diff_raw"),
          col("theta"),
          round((d(col("sy_t")) / d(col("n_t")) -
                 d(col("sy_c")) / d(col("n_c")) -
                 col("theta") * (d(col("sx_t")) / d(col("n_t")) -
                                 d(col("sx_c")) / d(col("n_c")))) / 100.0,
                6).as("diff_cuped"),
          round(col("cxy") * col("cxy") / (col("vx") * col("vy")), 6)
            .as("var_reduction"))
    },

    // PR-AUC / average precision (added r12) — q229's ROC-AUC twin for
    // the IMBALANCED regime, where ROC flatters a classifier (the
    // false-positive rate divides by the huge negative class): AP
    // weights each recall slice by the precision reached there, per
    // priority tier on the same orders⋈lineitem label universe. Tied
    // scores are handled by a DECLARED block convention — a tie block
    // is atomic and contributes npos_blk · (cumPos/cumTot) at the
    // block's END (the pessimistic step; no within-block ordering
    // exists to exploit) — so the statistic is engine-identical: block
    // terms round 6 dp into an order-free decimal sum (q142), one
    // division by n_pos at the end. The cumulative window runs on the
    // VALUE-GROUP table (distinct-cents bound, q247's discipline),
    // never the corpus; the only fact term is the one AQE-sized label
    // join q229 already prices.
    "q253_avg_precision" -> { (s, dir) =>
      // r19 optimization: q229's aggregate-before-the-join reshape
      // (guide §2.3) — the per-order label reduces map-side on
      // lineitem alone; `lab` is identical by construction.
      val pos = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
               .as("pos"))
      val lab = Tables(s, dir, "orders")
        .join(pos, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
                round(col("o_totalprice") * 100).cast("long").as("v"),
                col("pos"))
      val pv = lab.groupBy("prio", "v")
        .agg(count(lit(1)).as("c"), sum("pos").as("npos"))
      val w = Window.partitionBy("prio").orderBy(col("v").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pv.withColumn("cp", sum("npos").over(w))
        .withColumn("ct", sum("c").over(w))
        .groupBy("prio")
        .agg(sum(col("npos").cast("decimal(38,0)")).as("np"),
             sum(col("c").cast("decimal(38,0)")).as("nt"),
             sum(round(d(col("npos")) * d(col("cp")) / d(col("ct")), 6)
                   .cast("decimal(38,6)")).as("apsum"))
        .select(col("prio"), col("np").cast("long").as("n_pos"),
                col("nt").cast("long").as("n_total"),
                round(d(col("np")) / d(col("nt")), 6).as("prevalence"),
                when(col("np") > 0,
                     round(d(col("apsum")) / d(col("np")), 6))
                  .as("avg_precision"))
        .orderBy("prio")
    },

    // Benjamini–Hochberg FDR screen (added r12) — the multiple-testing
    // control that makes segment scanning honest: testing 25 nations
    // for an unusual high-value-order rate at α=0.05 EACH expects ~1
    // false alarm by chance; BH bounds the expected FALSE-DISCOVERY
    // fraction instead. Per nation: segment-vs-rest two-proportion z
    // from exact counts (rest = broadcast-window complement, so no
    // self-join), two-sided p via the Abramowitz–Stegun 26.2.17 normal
    // tail (Horner form, identical literal constants both engines —
    // the exp() ulp caveat is q142's accepted ln() one, and p rounds
    // to 6 dp BEFORE any comparison), then the step-up: rank by
    // (p, nation), crit_i = i·α/m exactly, discovery_i =
    // max_{j≥i}(p_j ≤ crit_j) as a suffix-max window. Everything after
    // the one orders-scan agg lives on the 25-row cell table. At
    // 100 TB the m in play is thousands of metric×segment cells — the
    // entire BH stage stays m-bound, which is the point.
    "q254_bh_fdr" -> { (s, dir) =>
      val cells = Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")
                          .select(col("c_custkey"), col("c_nationkey"))),
              col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")
                          .select(col("n_nationkey"), col("n_name"))),
              col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"),
             sum(when(col("o_totalprice") > 450000, 1L).otherwise(0L))
               .as("x"))
      val wAll = Window.partitionBy(lit(1))
      val p = cells
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("nr", sum("n").over(wAll) - col("n"))
        .withColumn("xr", sum("x").over(wAll) - col("x"))
        .withColumn("pp", (d(col("x")) + d(col("xr"))) /
                          (d(col("n")) + d(col("nr"))))
        .withColumn("z",
          (d(col("x")) / d(col("n")) - d(col("xr")) / d(col("nr"))) /
            sqrt(col("pp") * (lit(1.0) - col("pp")) *
                 (lit(1.0) / d(col("n")) + lit(1.0) / d(col("nr")))))
        .withColumn("az", abs(col("z")))
        .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.2316419) * col("az")))
        .withColumn("pval", round(
          lit(2.0) * exp(col("az") * col("az") * lit(-0.5)) *
            lit(0.3989422804014327) *
            ((((lit(1.330274429) * col("tt") + lit(-1.821255978)) *
                 col("tt") + lit(1.781477937)) * col("tt") +
                lit(-0.356563782)) * col("tt") + lit(0.319381530)) *
            col("tt"), 6))
      val wRank = Window.partitionBy(lit(1))
        .orderBy(col("pval").asc, col("n_name").asc)
      val wSuf = wRank.rowsBetween(Window.currentRow,
                                   Window.unboundedFollowing)
      p.withColumn("bh_rank", row_number().over(wRank))
        .withColumn("flag",
          when(col("pval") <= d(col("bh_rank")) * lit(0.05) / d(col("m")),
               1).otherwise(0))
        .withColumn("discovery", max("flag").over(wSuf))
        .select(col("n_name"), col("n"), col("x"),
                round(d(col("x")) / d(col("n")), 6).as("rate"),
                round(col("z"), 6).as("z"), col("pval").as("p_value"),
                col("bh_rank"), col("discovery"))
        .orderBy("bh_rank")
    },

    // Price-elasticity regression (added r12) — q147's OLS machinery
    // pointed at the pricing question: per brand, the log-log slope of
    // quantity on unit price IS the elasticity (d ln q / d ln p), the
    // number a demand model starts from. Log terms are the one
    // unavoidable transcendental: each factor rounds to 6 dp and
    // becomes an exact DECIMAL(18,6), so the moment products and sums
    // are exact decimal algebra (order-free, map-side-combinable; the
    // q142 ln discipline extended to second moments) and slope/R²
    // close over them as fixed-order double formulas. Unit price =
    // extendedprice/quantity in double BEFORE rounding to cents — one
    // deterministic division per row. ONE lineitem⋈part join (the
    // q234 un-hinted fact join; AQE sizes it) → ≤|brands| moment
    // cells; nothing else moves.
    "q255_elasticity" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part"),
              col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
                round(log(round(col("l_extendedprice") /
                                col("l_quantity") * 100)), 6)
                  .cast("decimal(18,6)").as("x"),
                round(log(col("l_quantity")), 6)
                  .cast("decimal(18,6)").as("y"))
      li.groupBy("brand")
        .agg(count(lit(1)).as("n"),
             sum(col("x")).as("sx"), sum(col("y")).as("sy"),
             sum(col("x") * col("x")).as("sxx"),
             sum(col("y") * col("y")).as("syy"),
             sum(col("x") * col("y")).as("sxy"))
        .withColumn("cxy", d(col("n")) * d(col("sxy")) -
                           d(col("sx")) * d(col("sy")))
        .withColumn("vx", d(col("n")) * d(col("sxx")) -
                          d(col("sx")) * d(col("sx")))
        .withColumn("vy", d(col("n")) * d(col("syy")) -
                          d(col("sy")) * d(col("sy")))
        .select(col("brand"), col("n"),
                round(col("cxy") / col("vx"), 6).as("elasticity"),
                round(col("cxy") * col("cxy") /
                      (col("vx") * col("vy")), 6).as("r2"))
        .orderBy("brand")
    },

    // Time-decay attribution (added r12) — completes the attribution
    // triptych (q156 last-touch = the final click takes all, q183
    // linear = every touch equal): each view/click in the 7 days
    // before a purchase earns weight 2^(−Δdays/7) — credit halves per
    // week of distance, the standard recency compromise. Weights round
    // to 6 dp and become exact decimals, so the per-purchase
    // normalization (a sum window keyed by the purchase id) and the
    // channel rollup are order-free decimal algebra; shares round
    // BEFORE summing (q142). The purchases⋈touches join is USER-keyed
    // with the time band as a residual predicate — per-user activity²
    // bounds the pair volume (q80's accepted skew bound), never
    // corpus². Purchases with no in-window touch are unattributed by
    // declared convention (they have no touchpoints to credit).
    "q257_attribution_decay" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
                col("ts").as("pts"))
      val touches = ev.where(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_type").as("channel"),
                col("ts").as("tts"))
      val wP = Window.partitionBy("pid")
      purchases.join(touches, Seq("user_id"))
        .where(col("tts") < col("pts") &&
               col("tts") >= col("pts") - expr("INTERVAL 7 DAYS"))
        .withColumn("dday",
          floor((unix_micros(col("pts")) - unix_micros(col("tts"))) /
                lit(86400000000L)).cast("long"))
        .withColumn("w",
          round(pow(lit(0.5), d(col("dday")) / lit(7.0)), 6)
            .cast("decimal(28,6)"))
        .withColumn("wsum", sum("w").over(wP))
        .withColumn("share",
          round(d(col("w")) / d(col("wsum")), 6).cast("decimal(28,6)"))
        .groupBy("channel")
        .agg(count(lit(1)).as("touches"),
             countDistinct("pid").as("purchases_touched"),
             round(d(sum("share")), 6).as("credit"))
        .orderBy("channel")
    },

    // Cochran–Mantel–Haenszel stratified test (added r12) — the
    // Simpson's-paradox guard the flat q254-style z test lacks: is the
    // arm (q159's md5 split, keyed on the CUSTOMER) associated with
    // high-value ordering once MARKET SEGMENT is controlled for? A
    // pooled 2×2 can reverse sign when arms are unevenly distributed
    // across segments; CMH sums the per-stratum evidence instead:
    // Σ(a − r1·c1/n) against variance Σ r1·c1(n−r1)(n−c1)/(n²(n−1)),
    // plus the Mantel–Haenszel common odds ratio ΣR/ΣS. Per-stratum
    // terms are fixed-order double formulas over EXACT counts, rounded
    // 6 dp into order-free decimal sums (q248's discipline). ONE
    // orders scan + broadcast customer dim → |segments| 2×2 cells →
    // one row; at 100 TB the strata table is still |segments|-bound.
    "q263_cmh_test" -> { (s, dir) =>
      val cells = Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")
                          .select(col("c_custkey"), col("c_mktsegment"))),
              col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
                when(substring(md5(col("c_custkey").cast("string")), 1, 1)
                       <= "7", 1L).otherwise(0L).as("arm"),
                when(col("o_totalprice") > 450000, 1L).otherwise(0L)
                  .as("hi"))
        .groupBy("seg")
        .agg(sum(col("arm") * col("hi")).as("a"),
             sum(col("arm") * (lit(1L) - col("hi"))).as("b"),
             sum((lit(1L) - col("arm")) * col("hi")).as("c"),
             sum((lit(1L) - col("arm")) * (lit(1L) - col("hi"))).as("e"))
        .withColumn("n", col("a") + col("b") + col("c") + col("e"))
        .withColumn("r1", col("a") + col("b"))
        .withColumn("c1", col("a") + col("c"))
      cells
        .agg(count(lit(1)).as("n_strata"),
             sum("a").cast("long").as("a_sum"),
             sum(round(d(col("r1")) * d(col("c1")) / d(col("n")), 6)
                   .cast("decimal(28,6)")).as("e_sum"),
             sum(round(d(col("r1")) * d(col("c1")) / d(col("n")) *
                       (d(col("n")) - d(col("r1"))) / d(col("n")) *
                       (d(col("n")) - d(col("c1"))) /
                       (d(col("n")) - 1.0), 6)
                   .cast("decimal(28,6)")).as("v_sum"),
             sum(round(d(col("a")) * d(col("e")) / d(col("n")), 6)
                   .cast("decimal(28,6)")).as("r_sum"),
             sum(round(d(col("b")) * d(col("c")) / d(col("n")), 6)
                   .cast("decimal(28,6)")).as("s_sum"))
        .select(col("n_strata"), col("a_sum"),
                round(d(col("e_sum")), 6).as("e_sum"),
                round(d(col("v_sum")), 6).as("v_sum"),
                round((d(col("a_sum")) - d(col("e_sum"))) /
                      sqrt(d(col("v_sum"))), 6).as("z"),
                round((d(col("a_sum")) - d(col("e_sum"))) *
                      (d(col("a_sum")) - d(col("e_sum"))) /
                      d(col("v_sum")), 6).as("chi2"),
                round(d(col("r_sum")) / d(col("s_sum")), 6).as("or_mh"))
    },

    // A/B power analysis (added r12) — the question every experiment
    // REVIEW starts with, answered from the platform's own data
    // instead of a webform: at the observed baseline conversion and
    // traffic, how many users per arm (and how many days) does each
    // minimum-detectable-effect need at α=0.05 two-sided / 80% power?
    // n = (z_{α/2}+z_β)²·(p0(1−p0)+p1(1−p1))/Δ² over a broadcast MDE
    // grid; z literals are spelled identically in both engines, the
    // baseline p0 rounds 6 dp BEFORE entering the formula (recompose
    // discipline), and ceil makes the report integers. ONE events scan
    // for the q159 user universe (p0 + users + observed days); the
    // grid algebra is 4 rows of arithmetic. At 100 TB the baseline
    // cell comes from the experiment platform's maintained artifact.
    "q264_power_analysis" -> { (s, dir) =>
      import s.implicits._
      val base = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" &&
                        col("value") > 150, 1L).otherwise(0L)).as("conv"))
        .agg(count(lit(1)).as("users"), sum("conv").as("convs"))
      val days = Tables(s, dir, "events")
        .agg(countDistinct(to_date(col("ts"))).as("n_days"))
      val grid = Seq(0.01, 0.02, 0.05, 0.10).toDF("mde")
      grid.crossJoin(broadcast(base)).crossJoin(broadcast(days))
        .withColumn("p0", round(d(col("convs")) / d(col("users")), 6))
        .withColumn("p1", col("p0") + col("mde"))
        .withColumn("n_per_arm",
          ceil((lit(1.959964) + lit(0.841621)) *
               (lit(1.959964) + lit(0.841621)) *
               (col("p0") * (lit(1.0) - col("p0")) +
                col("p1") * (lit(1.0) - col("p1"))) /
               (col("mde") * col("mde"))).cast("long"))
        .withColumn("upd",
          round(d(col("users")) / d(col("n_days")), 6))
        .select(col("mde"), col("p0"), round(col("p1"), 6).as("p1"),
                col("n_per_arm"),
                ceil(d(col("n_per_arm")) * 2.0 / col("upd"))
                  .cast("long").as("days_needed"))
        .orderBy("mde")
    },

    // K-fold cross-validated Naive Bayes (added r12) — the evaluation
    // q220's self-scored confusion matrix CANNOT give (scoring
    // training data flatters every model): 5-fold CV where each doc is
    // scored by a model trained WITHOUT its fold. The out-of-fold
    // model needs no 5× retraining pass — every OOF count is a
    // SUBTRACTION over the fold-dimensioned cell tables (q230's OOF
    // closed form applied to a classifier): clt_oof = clt − clt_fold,
    // class totals and priors likewise; missing (cell, fold) pairs
    // materialize from a broadcast 5-row fold list, and zero-OOF
    // token rows drop because their smoothed log-prob EQUALS the
    // unseen-token lp0 the closed-form scoring already charges.
    // Vocabulary is the GLOBAL token set by declared contract (the
    // tokenizer's vocab ships fixed; only counts are fold-masked).
    // Scoring is q220's sparse join + lp0 fold-in, per fold, with the
    // same round-log-once-then-exact-decimal discipline; the argmax
    // tie-break (score desc, class) is total. ONE pinned corpus scan
    // feeds every cell table; model size is vocab×classes×folds.
    "q266_crossval_nb" -> { (s, dir) =>
      import s.implicits._
      def fold5(k: Column) =
        (conv(substring(md5(k.cast("string")), 1, 4), 16, 10)
           .cast("long") % 5)
      val (tk, h) = pin(Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
                fold5(col("doc_id")).as("fold"),
                explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0))
      h.count(); graft.PinScope.retain(h)
      val folds = Seq(0L, 1L, 2L, 3L, 4L).toDF("fold")
      val mdlTot = tk.groupBy(col("lang").as("mlang"), col("tok"))
        .agg(count(lit(1)).as("ct"))
      val mdlF = tk.groupBy(col("lang").as("mlang"), col("tok"),
                            col("fold")).agg(count(lit(1)).as("cf"))
      val ctOof = mdlTot.groupBy("mlang").agg(sum("ct").as("cl"))
        .crossJoin(broadcast(folds))
        .join(mdlF.groupBy("mlang", "fold").agg(sum("cf").as("clf")),
              Seq("mlang", "fold"), "left")
        .withColumn("cloof", col("cl") - coalesce(col("clf"), lit(0L)))
      val voc = tk.select("tok").distinct().agg(count(lit(1)).as("vsz"))
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
                fold5(col("doc_id")).as("fold"))
      val priOof = docs.groupBy(col("lang").as("mlang"))
        .agg(count(lit(1)).as("nd"))
        .crossJoin(broadcast(folds))
        .join(docs.groupBy(col("lang").as("mlang"), col("fold"))
                .agg(count(lit(1)).as("ndf")),
              Seq("mlang", "fold"), "left")
        .join(broadcast(docs.groupBy("fold")
                          .agg(count(lit(1)).as("nf"))), Seq("fold"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
        .select(col("mlang"), col("fold"),
                round(log(d(col("nd") - coalesce(col("ndf"), lit(0L))) /
                          d(col("n") - col("nf"))), 6)
                  .cast("decimal(28,6)").as("plp"))
      val lp = mdlTot.crossJoin(broadcast(folds))
        .join(mdlF, Seq("mlang", "tok", "fold"), "left")
        .withColumn("coof", col("ct") - coalesce(col("cf"), lit(0L)))
        .where(col("coof") > 0)
        .join(ctOof.select("mlang", "fold", "cloof"),
              Seq("mlang", "fold"))
        .crossJoin(broadcast(voc))
        .select(col("mlang"), col("tok"), col("fold"),
                round(log(d(col("coof") + 1) /
                          d(col("cloof") + col("vsz"))), 6)
                  .cast("decimal(28,6)").as("lp"))
      val classes = ctOof.crossJoin(broadcast(voc))
        .select(col("mlang"), col("fold"),
                round(log(lit(1.0) / d(col("cloof") + col("vsz"))), 6)
                  .cast("decimal(28,6)").as("lp0"))
        .join(priOof, Seq("mlang", "fold"))
      val dtc = tk.groupBy("doc_id", "lang", "fold", "tok")
        .agg(count(lit(1)).as("cnt"))
      val m = dtc.join(lp, Seq("tok", "fold"))
        .groupBy("doc_id", "fold", "mlang")
        .agg(sum(col("cnt").cast("decimal(9,0)") * col("lp"))
               .as("sum_lp"),
             sum("cnt").as("cnt_m"))
      val ndk = dtc.groupBy("doc_id", "lang", "fold")
        .agg(sum("cnt").as("ntok"))
      val zero = lit(BigDecimal(0)).cast("decimal(38,6)")
      val sc = ndk.join(broadcast(classes), Seq("fold"))
        .join(m, Seq("doc_id", "fold", "mlang"), "left")
        .withColumn("score",
          col("plp") + coalesce(col("sum_lp"), zero) +
            (col("ntok") - coalesce(col("cnt_m"), lit(0L)))
              .cast("decimal(9,0)") * col("lp0"))
      sc.withColumn("rn", row_number().over(
            Window.partitionBy("doc_id")
              .orderBy(col("score").desc, col("mlang"))))
        .where(col("rn") === 1)
        .groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("mlang") === col("lang"), 1L).otherwise(0L))
               .cast("long").as("correct"))
        .select(col("fold"), col("n_docs"), col("correct"),
                round(d(col("correct")) / d(col("n_docs")), 6)
                  .as("accuracy"))
        .orderBy("fold")
    },

    // Optimizer-statistics artifact (added r12) — the table the CBO
    // tier (q163/q165) consumes, built as a first-class query instead
    // of a side effect of ANALYZE: for a column, row count, NDV,
    // min/max, and EXACT equi-depth decile boundaries — the histogram
    // that prices range predicates and join selectivities. Boundaries
    // come from the q151 machinery (value groups → q146 bucketed
    // prefix sums → interpolated order statistics), so no global sort
    // and no sampling error: the stats object a 100 TB planner reads
    // is computed at fact scale for one scan + one cents agg. Summary
    // stats ride the SAME pinned value-group table (plan-asserted no
    // rescan); ship-from-ingest is the q163 docstring's contract.
    "q268_stats_artifact" -> { (s, dir) =>
      import s.implicits._
      val (pv, h) = pin(Tables(s, dir, "orders")
        .select(lit("o_totalprice").as("col_name"),
                round(col("o_totalprice") * 100).cast("long").as("v"))
        .groupBy("col_name", "v").agg(count(lit(1)).as("c")))
      h.count(); graft.PinScope.retain(h)
      val qdf = (1 to 9).map(i => (s"d$i", i / 10.0)).toDF("q_label", "q")
      val bands = bandsAt(cumCounts(pv, "col_name"), "col_name",
                          qdf, 100.0)
      val summary = pv.groupBy("col_name")
        .agg(count(lit(1)).as("ndv"), sum("c").cast("long").as("n_rows"),
             round(d(min("v")) / 100.0, 6).as("min_val"),
             round(d(max("v")) / 100.0, 6).as("max_val"))
      bands.join(broadcast(summary), Seq("col_name"))
        .select(col("col_name"), col("q_label"), col("n_rows"),
                col("ndv"), col("min_val"), col("max_val"),
                col("value_at_q").as("boundary"))
        .orderBy("q_label")
    },

    // Item-kNN recommender (added r12) — the co-occurrence recommender
    // one step past q234's rule metrics: each brand's top-3 neighbors
    // by COSINE over basket membership, cos(i,j) = c_ij/√(c_i·c_j) —
    // the normalization that stops ubiquitous items from being
    // everyone's neighbor (q234's lift divides by both supports and
    // over-rewards rare coincidences; cosine is the retrieval
    // convention). Pair counts reuse q234's per-basket array pair-gen
    // (pair volume Σ basket², order-linear, nothing corpus-sized
    // cached); the symmetrized pair table is |brands|²-bounded, item
    // counts broadcast onto it, and the per-item top-3 is the
    // rank-filter InferWindowGroupLimit rewrites map-side. Declared
    // tie order (cosine desc, neighbor) makes the shortlist total.
    "q269_item_knn" -> { (s, dir) =>
      // r19 optimization: `items` was a def — the brand-count branch
      // and the basket-pair branch each re-ran the lineitem⋈part join
      // (two full fact scans), and the pair branch shipped every
      // occurrence into collect_set to dedup inside the aggregate.
      // ONE pinned distinct (order, brand) frame feeds both: the
      // brand counts group its b column, and collect_set over the
      // already-distinct rows builds the identical basket set (guide
      // §2.3 aggregate-before-shuffle + §2.4 share one derivation).
      val (items, ih) = pin(Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part"),
              col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
        .distinct())
      ih.count(); graft.PinScope.retain(ih)
      val cnt = items.groupBy("b").agg(count(lit(1)).as("cb"))
      val pairs = items.groupBy("ok")
        .agg(sort_array(collect_set(col("b"))).as("bs"))
        .select(explode(expr(
          """flatten(transform(bs, (x, i) ->
            |  transform(slice(bs, i + 2, size(bs) - i - 1),
            |            y -> struct(x AS b1, y AS b2))))""".stripMargin))
          .as("pr"))
        .select(col("pr.b1").as("b1"), col("pr.b2").as("b2"))
        .groupBy("b1", "b2")
        .agg(count(lit(1)).as("cij"))
      val sym = pairs.select(col("b1").as("b"), col("b2").as("nb"),
                             col("cij"))
        .unionAll(pairs.select(col("b2").as("b"), col("b1").as("nb"),
                               col("cij")))
      sym
        .join(broadcast(cnt.select(col("b"), col("cb").as("ci"))),
              Seq("b"))
        .join(broadcast(cnt.select(col("b").as("nb"), col("cb").as("cj"))),
              Seq("nb"))
        .withColumn("cosine",
          round(d(col("cij")) / sqrt(d(col("ci")) * d(col("cj"))), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy("b")
            .orderBy(col("cosine").desc, col("nb"))))
        .where(col("rn") <= 3)
        .select(col("b").as("brand"), col("nb").as("neighbor"),
                col("cij").as("support"), col("cosine"),
                col("rn").as("rank"))
        .orderBy("brand", "rank")
    },

    // Generalized-ESD iterative outlier screen (added r12) — the
    // MASKING-robust tier above q148's MAD flags: one extreme day can
    // inflate the variance enough to hide a second (masking), so ESD
    // removes the most extreme point and RE-ESTIMATES before testing
    // the next. Three unrolled rounds over the pinned daily-revenue
    // cell table (calendar-bounded, q139's discipline): each round's
    // argmax |x−mean| is the EXACT integer comparison |x·n − Σx|
    // (same ordering, no division — engine-identical; ties take the
    // earlier day, declared), the removal is an anti-join against the
    // 1-row pick, and mean/sd re-derive from exact decimal folds with
    // the R statistic's divide-and-sqrt happening once per round.
    // Flag = R > 3.0 (the fixed-z form; the t-quantile lambda needs an
    // inverse-t a SQL oracle lacks — declared). Rounds are plan-
    // unrolled (no driver loop state), everything after the one orders
    // fold is ≤3 broadcast-sized subtrees at any corpus size.
    "q276_esd_outliers" -> { (s, dir) =>
      val (cells, h) = pin(Tables(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
               .as("x")))
      h.count(); graft.PinScope.retain(h)
      // r19 (guide §1.2 step 1 — the q292/q148 fold): the three ESD
      // rounds ran as staged agg + argmax + anti-join plans whose
      // union re-derived every earlier round per branch — 84 Exchanges
      // over a ≤|days| cell table. The fold below replays the chain
      // operation for operation in ONE task over the pinned cells:
      // dev = |x·n − sx| exact (BigInt ≡ decimal(38,0)), argmax by
      // (dev desc, day asc), r_stat's double chain in the identical
      // cast order (each decimal → double exactly once), round 6 via
      // BigDecimal HALF_UP = Spark's own round.
      import s.implicits._
      cells.select(col("day"), col("x")).as[(java.sql.Date, Long)]
        .repartition(1)
        .mapPartitions { it =>
          def r6(v: Double) = java.math.BigDecimal.valueOf(v)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
          var rem = it.toArray
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Int, java.sql.Date, Double, Double, Boolean)]
          var r = 1
          while (r <= 3 && rem.nonEmpty) {
            val n = rem.length.toLong
            var sx = BigInt(0); var sxx = BigInt(0)
            for ((_, x) <- rem) { sx += x; sxx += BigInt(x) * x }
            var bi = 0
            var bdev = BigInt(-1)
            var i = 0
            while (i < rem.length) {
              val dev = (BigInt(rem(i)._2) * n - sx).abs
              if (dev > bdev ||
                  (dev == bdev &&
                   rem(i)._1.getTime < rem(bi)._1.getTime)) {
                bdev = dev; bi = i
              }
              i += 1
            }
            val (day, x) = rem(bi)
            val rStat = r6((bdev.toDouble / n.toDouble) /
              math.sqrt((n * sxx - sx * sx).toDouble /
                        (n * (n - 1)).toDouble))
            out += ((r, day, r6(x.toDouble / 100.0), rStat,
                     rStat > 3.0))
            rem = rem.patch(bi, Nil, 1)
            r += 1
          }
          out.iterator
        }
        .toDF("esd_round", "day", "revenue", "r_stat", "flagged")
        .orderBy("esd_round")
    },

    // Markov removal-effect attribution (added r12) — the THIRD
    // counterfactual pillar next to q274's Shapley and the heuristic
    // pair (q183/q257): model the (user, day) journey as a first-order
    // Markov chain (q130's matrix with START/CONV/NULL absorbing
    // states), then credit each channel by how much the chain's
    // conversion probability DROPS when that channel is removed
    // (removed state's inbound transitions divert to NULL — the
    // standard removal counterfactual). Absorption probabilities come
    // from 12 value-iteration steps in ×1e9 integer FIXED-POINT
    // (q115's arithmetic discipline: exact products, one integer
    // division per state per step — bit-identical in both engines, so
    // an iterative linear-system solve becomes hash-checkable;
    // truncation after 12 steps is the declared contract, monotone
    // from below). ONE (user, day) shuffle builds the ≤(|types|+2)²
    // matrix (pinned); the solve itself runs on the driver (see the
    // in-body note). The oracle re-derives everything with 12
    // generated CTEs over variant-keyed removal matrices.
    "q279_markov_attribution" -> { (s, dir) =>
      import s.implicits._
      val Scale = 1000000000L
      val units = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"),
                col("ts"), col("event_id"), col("event_type"))
        .groupBy("user_id", "day")
        .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
               col("event_type").as("et")))).as("es"),
             max(when(col("event_type") === "purchase", 1).otherwise(0))
               .as("conv"))
        .withColumn("path",
          expr("filter(transform(es, e -> e.et), t -> t != 'purchase')"))
        .withColumn("endState",
          when(col("conv") === 1, "CONV").otherwise("NULL"))
      val (m, h) = pin(units.select(explode(expr(
          """concat(
            |  array(named_struct('f', 'START',
            |    't', coalesce(try_element_at(path, 1), endState))),
            |  zip_with(slice(path, 1, greatest(size(path) - 1, 0)),
            |           slice(path, 2, greatest(size(path) - 1, 0)),
            |           (a, b) -> named_struct('f', a, 't', b)),
            |  filter(array(named_struct('f', try_element_at(path, -1),
            |                            't', endState)),
            |         x -> x.f IS NOT NULL))""".stripMargin)).as("tr"))
        .groupBy(col("tr.f").as("f"), col("tr.t").as("t"))
        .agg(count(lit(1)).as("cnt")))
      h.count(); graft.PinScope.retain(h)
      // The ≤(|types|+2)² matrix is an AGGREGATE smaller than the
      // output — collect it once from the pin and run the 12-step
      // value iteration as driver arithmetic (BigInt — the identical
      // ×1e9 fixed-point the oracle's unrolled CTEs compute). The
      // r12 sweep measured the fully-relational formulation at a flat
      // ~10 s: 12 steps × 5 variants of broadcast-join-agg over ≤49
      // rows is pure stage overhead, not distributed work. The one
      // genuinely distributed term — the fact fold — is unchanged;
      // this is the q55 driver-fold contract applied to a solved
      // linear system, not a .collect() of data rows.
      val rows = m.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2)))
      val channels = rows.map(_._1).filter(_ != "START").distinct.sorted
      val tot = rows.groupBy(_._1).map { case (f, g) =>
        f -> g.map(_._3).sum }
      def absorb(rm: String): BigInt = {
        val mm = rows.filter(_._1 != rm)
          .map { case (f, t, c) => ((f, if (t == rm) "NULL" else t), c) }
          .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
        val byF = mm.toSeq.groupBy(_._1._1)
        var v = Map("CONV" -> BigInt(Scale), "NULL" -> BigInt(0))
        for (_ <- 1 to 12) {
          val nv = byF.map { case (f, es) =>
            f -> es.map { case ((_, t), c) =>
              BigInt(c) * v.getOrElse(t, BigInt(0)) }.sum / tot(f)
          }
          v = nv ++ Map("CONV" -> BigInt(Scale), "NULL" -> BigInt(0))
        }
        v("START")
      }
      val p0 = absorb("none")
      val drops = channels.map(c => (c, p0 - absorb(c)))
      val dtot = drops.map(_._2).sum
      drops.map { case (c, dr) =>
        (c, p0.toLong, (p0 - dr).toLong, dr.toLong, dtot.toLong) }
        .toSeq.toDF("channel", "p0", "pc", "drop", "dtot")
        .select(col("channel"),
                round(d(col("p0")) / Scale.toDouble, 6).as("p_full"),
                round(d(col("pc")) / Scale.toDouble, 6).as("p_removed"),
                round(d(col("drop")) / d(col("p0")), 6)
                  .as("removal_effect"),
                round(d(col("drop")) / d(col("dtot")), 6).as("share"))
        .orderBy("channel")
    }
  )

  def oracles: Map[String, String] = Map(

    // identical sufficient statistics (DuckDB's BIGINT sums widen to
    // HUGEINT; every value stays under 2⁶³ so the double casts are
    // exact), then the SAME RidgeSolve strings verbatim
    // identical cell fold, then six statically-unrolled [[lrRound]]
    // blocks — the entire trainer is the shared string; MATERIALIZED
    // pins the cell fold the way Spark's InternalPin does
    "q310_logreg_quality" ->
      s"""WITH cells AS MATERIALIZED (
         |  SELECT least(n_chars // 100, 15) AS x1,
         |    least(len(string_split(text, ' ')) // 10, 15) AS x2,
         |    count(*) AS n,
         |    sum(CASE WHEN CAST(substr(source, 4) AS INT) < 5
         |        THEN 1 ELSE 0 END) AS sy
         |  FROM documents GROUP BY 1, 2),
         |wz AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
         |       CAST(0 AS DOUBLE) AS w2),
         |${lrRound(1, "cells", "wz")},
         |${lrRound(2, "cells", "wu1")},
         |${lrRound(3, "cells", "wu2")},
         |${lrRound(4, "cells", "wu3")},
         |${lrRound(5, "cells", "wu4")},
         |${lrRound(6, "cells", "wu5")}
         |SELECT CAST(gd_round AS BIGINT) AS gd_round, w0, w1, w2, logloss
         |FROM (SELECT * FROM out1 UNION ALL SELECT * FROM out2
         |      UNION ALL SELECT * FROM out3 UNION ALL SELECT * FROM out4
         |      UNION ALL SELECT * FROM out5 UNION ALL SELECT * FROM out6)
         |ORDER BY gd_round""".stripMargin,

    // identical item-factor arithmetic, identical decimal folds, then
    // AlsSolve's shared strings verbatim
    "q325_als_user_step" ->
      s"""WITH f AS (SELECT o_custkey AS custkey,
         |    (CAST(l_partkey AS BIGINT) * 37) % 97 AS q1,
         |    (CAST(l_partkey AS BIGINT) * 61 + 13) % 89 AS q2,
         |    CAST(l_quantity AS BIGINT) AS r
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |st AS (SELECT custkey, count(*) AS n_items,
         |    sum(CAST(q1 AS DECIMAL(38,0)) * q1) AS s11,
         |    sum(CAST(q1 AS DECIMAL(38,0)) * q2) AS s12,
         |    sum(CAST(q2 AS DECIMAL(38,0)) * q2) AS s22,
         |    sum(CAST(r AS DECIMAL(38,0)) * q1) AS sr1,
         |    sum(CAST(r AS DECIMAL(38,0)) * q2) AS sr2,
         |    sum(CAST(r AS DECIMAL(38,0)) * r) AS srr
         |  FROM f GROUP BY custkey),
         |c AS (SELECT custkey, n_items,
         |    ${AlsSolve.castExprs.mkString(",\n    ")} FROM st),
         |sol AS (SELECT *,
         |    ${AlsSolve.solveExprs.mkString(",\n    ")} FROM c)
         |SELECT custkey, n_items, p1, p2, ${AlsSolve.rmseExpr}
         |FROM sol ORDER BY n_items DESC, custkey LIMIT 20""".stripMargin,

    "q304_ridge_regression" ->
      s"""WITH li AS (
         |  SELECT l_returnflag AS flag,
         |    CAST(l_quantity AS BIGINT) AS x1,
         |    CAST(round(l_discount * 100) AS BIGINT) AS x2,
         |    CAST(round(l_extendedprice) AS BIGINT) AS y
         |  FROM lineitem),
         |st AS (
         |  SELECT flag, count(*) AS n,
         |    sum(x1) AS sx1, sum(x2) AS sx2,
         |    sum(x1 * x1) AS sx11, sum(x1 * x2) AS sx12,
         |    sum(x2 * x2) AS sx22,
         |    sum(y) AS sy, sum(x1 * y) AS sx1y, sum(x2 * y) AS sx2y,
         |    sum(y * y) AS syy
         |  FROM li GROUP BY 1),
         |cs AS (SELECT flag, n,
         |    ${RidgeSolve.castExprs.mkString(",\n    ")}
         |  FROM st),
         |dt AS (SELECT *,
         |    ${RidgeSolve.detExprs.mkString(",\n    ")}
         |  FROM cs),
         |wv AS (SELECT *, ${RidgeSolve.wExprs.mkString(", ")} FROM dt)
         |SELECT flag, n, w0 AS intercept, w1 AS w_qty,
         |  w2 AS w_disc_cents, ${RidgeSolve.r2Expr}
         |FROM wv ORDER BY flag""".stripMargin,

    // identical user fold (q159's arms/conversion), per-day increment
    // tables, ≤|days| window cums and the identical z chain; the
    // Haybittle–Peto boundary picks 1.96 only on the final day
    "q321_sequential_ab" ->
      """WITH pu AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS d0,
        |    min(CASE WHEN event_type = 'purchase' AND value > 150
        |        THEN CAST(ts AS DATE) END) AS dc
        |  FROM events GROUP BY 1),
        |pa AS (SELECT *, CASE WHEN substr(md5(CAST(user_id AS VARCHAR)),
        |         1, 1) <= '7' THEN 'c' ELSE 't' END AS arm FROM pu),
        |inc AS (SELECT d0 AS day,
        |    sum(CASE WHEN arm = 'c' THEN 1 ELSE 0 END) AS an_c,
        |    sum(CASE WHEN arm = 't' THEN 1 ELSE 0 END) AS an_t
        |  FROM pa GROUP BY 1),
        |incx AS (SELECT dc AS day,
        |    sum(CASE WHEN arm = 'c' THEN 1 ELSE 0 END) AS ax_c,
        |    sum(CASE WHEN arm = 't' THEN 1 ELSE 0 END) AS ax_t
        |  FROM pa WHERE dc IS NOT NULL GROUP BY 1),
        |bd AS (SELECT coalesce(inc.day, incx.day) AS day,
        |    coalesce(an_c, 0) AS an_c, coalesce(an_t, 0) AS an_t,
        |    coalesce(ax_c, 0) AS ax_c, coalesce(ax_t, 0) AS ax_t
        |  FROM inc FULL OUTER JOIN incx ON inc.day = incx.day),
        |cm AS (SELECT day,
        |    sum(an_c) OVER w AS n_c, sum(an_t) OVER w AS n_t,
        |    sum(ax_c) OVER w AS x_c, sum(ax_t) OVER w AS x_t
        |  FROM bd WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW)),
        |mx AS (SELECT max(day) AS mxd FROM cm),
        |zz AS (SELECT day, n_c, n_t, x_c, x_t,
        |    CASE WHEN n_c > 0 AND n_t > 0 AND x_c + x_t > 0
        |      AND x_c + x_t < n_c + n_t THEN
        |      round((CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE) -
        |      CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE)) /
        |      sqrt(CAST(x_c + x_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE) *
        |      (1e0 - CAST(x_c + x_t AS DOUBLE) /
        |       CAST(n_c + n_t AS DOUBLE)) *
        |      (1e0 / CAST(n_c AS DOUBLE) + 1e0 / CAST(n_t AS DOUBLE))), 6)
        |      ELSE NULL END AS z,
        |    CASE WHEN day = mx.mxd THEN CAST(1.96 AS DOUBLE)
        |         ELSE CAST(3.0 AS DOUBLE) END AS boundary,
        |    row_number() OVER (ORDER BY day) AS day_idx
        |  FROM cm CROSS JOIN mx),
        |cr AS (SELECT *,
        |    (z IS NOT NULL AND abs(z) > boundary) AS crossed FROM zz)
        |SELECT CAST(day_idx AS BIGINT) AS day_idx,
        |  CAST(n_c AS BIGINT) AS n_c, CAST(n_t AS BIGINT) AS n_t,
        |  CAST(x_c AS BIGINT) AS x_c, CAST(x_t AS BIGINT) AS x_t,
        |  z, boundary, crossed,
        |  CAST(min(CASE WHEN crossed THEN day_idx END)
        |       OVER (ORDER BY day_idx ROWS BETWEEN UNBOUNDED PRECEDING
        |             AND CURRENT ROW) AS BIGINT) AS first_crossing
        |FROM cr ORDER BY day_idx""".stripMargin,

    // identical split rule, q147 moment chain (coefficients rounded 6
    // before any residual), floor-chain residual quantization, exact
    // value-group order statistic and coverage count
    "q320_conformal" ->
      """WITH ev AS (
        |  SELECT event_type AS et,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    CAST(round(value * 100) AS BIGINT) AS y,
        |    substr(md5(CAST(event_id AS VARCHAR)), 1, 1) AS nib
        |  FROM events),
        |m AS (SELECT et, count(*) AS n_train, sum(x) AS sx, sum(y) AS sy,
        |       sum(x * x) AS sxx, sum(x * y) AS sxy
        |      FROM ev WHERE nib <= '9' GROUP BY 1),
        |md AS (SELECT et, n_train,
        |    round((CAST(n_train AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |          (CAST(n_train AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |           CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS b,
        |    round((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |           CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE)) /
        |          (CAST(n_train AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |           CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS a
        |  FROM m),
        |cal AS (
        |  SELECT ev.et,
        |    CAST(floor(abs(CAST(y AS DOUBLE) -
        |      (a + b * CAST(x AS DOUBLE))) * 1e2 + 5e-1) AS BIGINT) AS v
        |  FROM ev JOIN md ON ev.et = md.et
        |  WHERE nib >= 'a' AND nib <= 'c'),
        |vg AS (SELECT et, v, count(*) AS c FROM cal GROUP BY 1, 2),
        |cu AS (SELECT et, v,
        |    sum(c) OVER (PARTITION BY et ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY et) AS n
        |  FROM vg),
        |qh AS (SELECT et, max(n) AS n_cal,
        |    min(CASE WHEN cum >= (9 * (n + 1) + 9) // 10 THEN v END)
        |      AS qh
        |  FROM cu GROUP BY et),
        |cov AS (
        |  SELECT ev.et, count(*) AS n_eval,
        |    sum(CASE WHEN CAST(floor(abs(CAST(y AS DOUBLE) -
        |      (a + b * CAST(x AS DOUBLE))) * 1e2 + 5e-1) AS BIGINT)
        |      <= qh.qh THEN 1 ELSE 0 END) AS nin
        |  FROM ev JOIN md ON ev.et = md.et JOIN qh ON ev.et = qh.et
        |  WHERE nib >= 'd' GROUP BY 1)
        |SELECT md.et AS event_type, md.n_train,
        |  CAST(qh.n_cal AS BIGINT) AS n_cal, cov.n_eval,
        |  round(CAST(qh.qh AS DOUBLE) / 1e4, 6) AS half_width_dollars,
        |  round(CAST(cov.nin AS DOUBLE) / CAST(cov.n_eval AS DOUBLE), 6)
        |    AS coverage
        |FROM md JOIN qh ON md.et = qh.et JOIN cov ON md.et = cov.et
        |ORDER BY event_type""".stripMargin,

    "q147_trend_regression" ->
      """WITH v AS (
        |  SELECT event_type,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |m AS (SELECT event_type, count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM v GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
        |    AS slope_cents_per_day,
        |  round((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE)) /
        |        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
        |    AS intercept_cents,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
        |        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        |FROM m ORDER BY event_type""".stripMargin,

    "q148_mad_outliers" ->
      """WITH pv AS (
        |  SELECT event_type AS flag,
        |    CAST(round(value * 100) AS BIGINT) AS v,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT flag, v, c,
        |    sum(c) OVER (PARTITION BY flag ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY flag) AS n
        |  FROM pv),
        |med AS (SELECT flag, max(n) AS n,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) +
        |    min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS m2
        |  FROM cum GROUP BY flag),
        |dv AS (SELECT pv.flag, abs(2 * pv.v - med.m2) AS v,
        |    sum(c) AS c
        |  FROM pv JOIN med ON pv.flag = med.flag GROUP BY 1, 2),
        |cum2 AS (SELECT flag, v, c,
        |    sum(c) OVER (PARTITION BY flag ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY flag) AS n
        |  FROM dv),
        |mad AS (SELECT flag,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) +
        |    min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS dm2
        |  FROM cum2 GROUP BY flag),
        |outl AS (SELECT pv.flag, sum(c) AS n_out
        |  FROM pv JOIN med ON pv.flag = med.flag
        |          JOIN mad ON pv.flag = mad.flag
        |  WHERE CAST(abs(2 * pv.v - med.m2) AS DOUBLE) >
        |        2.2239 * CAST(mad.dm2 AS DOUBLE)
        |  GROUP BY 1)
        |SELECT med.flag AS event_type, CAST(med.n AS BIGINT) AS n,
        |  round(CAST(med.m2 AS DOUBLE) / 200.0, 6) AS median_value,
        |  round(CAST(mad.dm2 AS DOUBLE) / 400.0, 6) AS mad_value,
        |  CAST(coalesce(outl.n_out, 0) AS BIGINT) AS n_outliers,
        |  round(CAST(coalesce(outl.n_out, 0) AS DOUBLE) /
        |        CAST(med.n AS DOUBLE), 6) AS outlier_pct
        |FROM med JOIN mad ON med.flag = mad.flag
        |  LEFT JOIN outl ON med.flag = outl.flag
        |ORDER BY event_type""".stripMargin,

    "q149_bigram_lm" ->
      """WITH tk0 AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split(text, ' ')) AS tok,
        |    generate_subscripts(string_split(text, ' '), 1) AS p
        |  FROM documents),
        |tk AS (SELECT * FROM tk0 WHERE len(tok) > 0),
        |bg AS (SELECT doc_id, lang, tok AS w1,
        |    lead(tok) OVER (PARTITION BY doc_id ORDER BY p) AS w2
        |  FROM tk QUALIFY w2 IS NOT NULL),
        |mdl AS (SELECT lang, w1, w2, count(*) AS c12
        |        FROM bg GROUP BY 1, 2, 3),
        |mdl2 AS (SELECT *,
        |    sum(c12) OVER (PARTITION BY lang, w1) AS c1 FROM mdl),
        |voc AS (SELECT lang, count(*) AS vsz FROM (
        |    SELECT lang, w1 AS w FROM bg
        |    UNION SELECT lang, w2 FROM bg) GROUP BY 1),
        |lp AS (SELECT m.lang, w1, w2,
        |    round(ln(CAST(c12 + 1 AS DOUBLE) /
        |             CAST(c1 + vsz AS DOUBLE)), 6) AS lp
        |  FROM mdl2 m JOIN voc ON m.lang = voc.lang),
        |pd AS (SELECT doc_id, bg.lang, count(*) AS nbg,
        |    sum(CAST(lp.lp AS DECIMAL(28,6))) AS lpsum
        |  FROM bg JOIN lp ON bg.lang = lp.lang AND bg.w1 = lp.w1
        |                 AND bg.w2 = lp.w2
        |  GROUP BY 1, 2),
        |pd2 AS (SELECT *,
        |    round(exp(-CAST(lpsum AS DOUBLE) / CAST(nbg AS DOUBLE)), 6)
        |      AS ppl
        |  FROM pd)
        |SELECT lang, count(*) AS n_docs,
        |  round(CAST(sum(CAST(ppl AS DECIMAL(28,6))) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE), 6) AS avg_ppl,
        |  max(ppl) AS max_ppl
        |FROM pd2 GROUP BY lang ORDER BY lang""".stripMargin,

    "q150_overlap_matrix" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |s AS (SELECT event_type, count(*) AS nu FROM ut GROUP BY 1),
        |b AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS users_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |                     AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.nu AS users_a, sb.nu AS users_b,
        |  users_both,
        |  round(CAST(users_both AS DOUBLE) /
        |        CAST(sa.nu + sb.nu - users_both AS DOUBLE), 6) AS jaccard
        |FROM b JOIN s sa ON sa.event_type = type_a
        |       JOIN s sb ON sb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,

    // the maintained artifact must be invisible: q150's full-corpus
    // fact-scan oracle verbatim — one oracle, two data paths
    "q213_incremental_audience" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |s AS (SELECT event_type, count(*) AS nu FROM ut GROUP BY 1),
        |b AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS users_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |                     AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.nu AS users_a, sb.nu AS users_b,
        |  users_both,
        |  round(CAST(users_both AS DOUBLE) /
        |        CAST(sa.nu + sb.nu - users_both AS DOUBLE), 6) AS jaccard
        |FROM b JOIN s sa ON sa.event_type = type_a
        |       JOIN s sb ON sb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,

    "q206_audience_artifact" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08'
        |                             AND DATE '2024-01-21'),
        |s AS (SELECT event_type, count(*) AS nu FROM ut GROUP BY 1),
        |b AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS users_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |                     AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.nu AS users_a, sb.nu AS users_b,
        |  users_both,
        |  round(CAST(users_both AS DOUBLE) /
        |        CAST(sa.nu + sb.nu - users_both AS DOUBLE), 6) AS jaccard
        |FROM b JOIN s sa ON sa.event_type = type_a
        |       JOIN s sb ON sb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,

    "q151_percentile_bands" ->
      """WITH pv AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, v, c,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM pv),
        |qs(q_label, q) AS (VALUES ('p50', 0.5), ('p95', 0.95),
        |                          ('p99', 0.99)),
        |j AS (SELECT cum.*, q_label, q,
        |    CAST(n - 1 AS DOUBLE) * q AS h,
        |    CAST(floor(CAST(n - 1 AS DOUBLE) * q) AS BIGINT) + 1 AS k
        |  FROM cum CROSS JOIN qs),
        |sel AS (SELECT event_type, q_label, max(n) AS n, max(h) AS hh,
        |    min(CASE WHEN cum >= k THEN v END) AS vlo,
        |    min(CASE WHEN cum >= k + 1 THEN v END) AS vhi
        |  FROM j GROUP BY 1, 2)
        |SELECT event_type, q_label, CAST(n AS BIGINT) AS n,
        |  round((CAST(vlo AS DOUBLE) +
        |         (hh - floor(hh)) *
        |         (CAST(coalesce(vhi, vlo) AS DOUBLE) -
        |          CAST(vlo AS DOUBLE))) / 100.0, 6) AS value_at_q
        |FROM sel ORDER BY event_type, q_label""".stripMargin,

    // the artifact must be invisible: q140's full-recompute oracle
    "q152_moments_daily_union" ->
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

    "q153_burst_flags" ->
      """WITH cells AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, hr, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY hr
        |                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |      AS trail,
        |    count(*) OVER (PARTITION BY event_type ORDER BY hr
        |                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |      AS k
        |  FROM cells)
        |SELECT event_type, hr, cnt, CAST(trail AS BIGINT) AS trail,
        |  round(CAST(cnt * 24 AS DOUBLE) / CAST(trail AS DOUBLE), 6)
        |    AS burst_ratio
        |FROM w WHERE k = 24 AND cnt * 16 > trail
        |ORDER BY event_type, hr""".stripMargin,

    "q179_freq_bins" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |vg AS (SELECT event_type, v, count(*) AS cnt FROM ev GROUP BY 1, 2),
        |c AS (SELECT event_type, v, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY v
        |                   ROWS UNBOUNDED PRECEDING) - cnt AS cumb
        |  FROM vg)
        |SELECT event_type, CAST(cumb * 10 // n AS BIGINT) AS bin,
        |  CAST(sum(cnt) AS BIGINT) AS cnt,
        |  min(v) AS lo_cents, max(v) AS hi_cents
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q177_cusum_change" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, day, cnt,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY day
        |                   ROWS UNBOUNDED PRECEDING) AS pre,
        |    sum(cnt) OVER (PARTITION BY event_type) AS total,
        |    count(*) OVER (PARTITION BY event_type) AS dd
        |  FROM daily),
        |s AS (SELECT *, abs(dd * pre - k * total) AS st FROM t),
        |m AS (SELECT *, max(st) OVER (PARTITION BY event_type) AS mx
        |      FROM s)
        |SELECT event_type, min(day) AS change_day,
        |  CAST(max(st) AS BIGINT) AS cusum_stat,
        |  CAST(min(dd) AS BIGINT) AS days,
        |  CAST(min(total) AS BIGINT) AS total_events
        |FROM m WHERE st = mx GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q154_value_histogram" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |rng AS (SELECT event_type, min(v) AS vmin, max(v) AS vmax
        |        FROM ev GROUP BY 1),
        |cells AS (SELECT ev.event_type,
        |    ((v - vmin) * 20) // (vmax - vmin + 1) AS bin,
        |    count(*) AS cnt
        |  FROM ev JOIN rng ON ev.event_type = rng.event_type
        |  GROUP BY 1, 2),
        |w AS (SELECT event_type, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
        |                   ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM cells)
        |SELECT event_type, bin, cnt,
        |  round(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share,
        |  round(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS cum_share
        |FROM w ORDER BY event_type, bin""".stripMargin,

    "q155_conversion_lag" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(ts) FILTER (WHERE event_type = 'view') AS v,
        |    min(ts) FILTER (WHERE event_type = 'purchase') AS p
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |lag_t AS (SELECT (epoch_us(p) - epoch_us(v)) // 1000000 AS v
        |  FROM u WHERE v IS NOT NULL AND p IS NOT NULL AND p > v),
        |pv AS (SELECT v, count(*) AS c FROM lag_t GROUP BY 1),
        |cum AS (SELECT v, c,
        |    sum(c) OVER (ORDER BY v) AS cum,
        |    sum(c) OVER () AS n
        |  FROM pv),
        |qs(q_label, q) AS (VALUES ('p50', 0.5), ('p90', 0.9),
        |                          ('p99', 0.99)),
        |j AS (SELECT cum.*, q_label, q,
        |    CAST(n - 1 AS DOUBLE) * q AS h,
        |    CAST(floor(CAST(n - 1 AS DOUBLE) * q) AS BIGINT) + 1 AS k
        |  FROM cum CROSS JOIN qs),
        |sel AS (SELECT q_label, max(n) AS n, max(h) AS hh,
        |    min(CASE WHEN cum >= k THEN v END) AS vlo,
        |    min(CASE WHEN cum >= k + 1 THEN v END) AS vhi
        |  FROM j GROUP BY 1)
        |SELECT q_label, CAST(n AS BIGINT) AS n_converters,
        |  round((CAST(vlo AS DOUBLE) +
        |         (hh - floor(hh)) *
        |         (CAST(coalesce(vhi, vlo) AS DOUBLE) -
        |          CAST(vlo AS DOUBLE))) / 1.0, 6) AS lag_seconds
        |FROM sel ORDER BY q_label""".stripMargin,

    "q199_pareto_curve" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT cents,
        |    row_number() OVER (ORDER BY cents DESC, l_partkey) AS rk,
        |    count(*) OVER () AS n
        |  FROM rev),
        |d AS (SELECT (rk - 1) * 10 // n AS decile, count(*) AS n_parts,
        |        sum(cents) AS cents
        |      FROM r GROUP BY 1),
        |t AS (SELECT *, sum(cents) OVER () AS total,
        |        sum(cents) OVER (ORDER BY decile
        |                         ROWS UNBOUNDED PRECEDING) AS cum_cents
        |      FROM d)
        |SELECT CAST(decile AS BIGINT) AS decile, n_parts,
        |  round(CAST(cents AS DOUBLE) / total, 6) AS rev_share,
        |  round(CAST(cum_cents AS DOUBLE) / total, 6) AS cum_share
        |FROM t ORDER BY decile""".stripMargin,

    "q208_bootstrap_ci" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (SELECT o.o_orderkey, o.cents, g.rep
        |      FROM o CROSS JOIN generate_series(0, 31) AS g(rep)),
        |wts AS (
        |  SELECT rep, cents,
        |    CASE WHEN b < '5e' THEN 0 WHEN b < 'bc' THEN 1
        |         WHEN b < 'eb' THEN 2 WHEN b < 'fb' THEN 3
        |         WHEN b < 'ff' THEN 4 ELSE 5 END AS w
        |  FROM (SELECT rep, cents,
        |          substr(md5(o_orderkey || '#' || rep), 1, 2) AS b
        |        FROM r)),
        |m AS (SELECT rep, sum(w) AS n_r, sum(w * cents) AS sum_r
        |      FROM wts GROUP BY 1),
        |mm AS (SELECT rep,
        |    round(CAST(sum_r AS DOUBLE) / n_r / 100.0, 6) AS mean_r
        |  FROM m),
        |rkd AS (SELECT mean_r,
        |    row_number() OVER (ORDER BY mean_r) AS rk FROM mm)
        |SELECT
        |  (SELECT round(CAST(sum(cents) AS DOUBLE) / count(*) / 100.0, 6)
        |   FROM o) AS point_mean,
        |  min(mean_r) AS boot_lo,
        |  round((sum(CASE WHEN rk = 16 THEN mean_r END) +
        |         sum(CASE WHEN rk = 17 THEN mean_r END)) / 2.0, 6)
        |    AS boot_median,
        |  max(mean_r) AS boot_hi
        |FROM rkd""".stripMargin,

    "q209_decile_migration" ->
      """WITH ch AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_orderdate < TIMESTAMP '1998-07-01'
        |         THEN 1 ELSE 2 END AS half,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1, 2),
        |d1 AS (SELECT o_custkey,
        |    ((row_number() OVER (ORDER BY cents DESC, o_custkey)) - 1)
        |      * 10 // (count(*) OVER ()) AS d
        |  FROM ch WHERE half = 1),
        |d2 AS (SELECT o_custkey,
        |    ((row_number() OVER (ORDER BY cents DESC, o_custkey)) - 1)
        |      * 10 // (count(*) OVER ()) AS d
        |  FROM ch WHERE half = 2)
        |SELECT CAST(coalesce(d1.d, -1) AS BIGINT) AS decile_h1,
        |  CAST(coalesce(d2.d, -1) AS BIGINT) AS decile_h2,
        |  count(*) AS customers
        |FROM d1 FULL OUTER JOIN d2 ON d1.o_custkey = d2.o_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q216_ltv_curve" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id) AS signup_us
        |  FROM events),
        |cohort AS (
        |  SELECT count(DISTINCT user_id) AS cohort_users FROM e
        |  WHERE event_type = 'signup'),
        |h(horizon_days) AS (VALUES (0), (7), (14), (21), (28)),
        |p AS (
        |  SELECT h.horizon_days, e.user_id, e.cents
        |  FROM e CROSS JOIN h
        |  WHERE e.event_type = 'purchase' AND e.signup_us IS NOT NULL
        |    AND e.tus >= e.signup_us
        |    AND e.tus <= e.signup_us + h.horizon_days * 86400000000),
        |agg AS (
        |  SELECT horizon_days, sum(cents) AS rev_cents,
        |    count(DISTINCT user_id) AS buyers
        |  FROM p GROUP BY 1)
        |SELECT CAST(h.horizon_days AS BIGINT) AS horizon_days,
        |  c.cohort_users,
        |  CAST(coalesce(agg.buyers, 0) AS BIGINT) AS buyers,
        |  round(CAST(coalesce(agg.rev_cents, 0) AS DOUBLE) /
        |        c.cohort_users / 100.0, 6) AS avg_ltv
        |FROM h LEFT JOIN agg ON h.horizon_days = agg.horizon_days
        |CROSS JOIN cohort c
        |ORDER BY horizon_days""".stripMargin,

    // identical model: add-one smoothing over the global vocab, the
    // same 6-dp-rounded log-probs as exact decimals, the same closed-
    // form unseen-token mass, the same (score DESC, class ASC) argmax
    "q220_nb_classifier" ->
      """WITH tk0 AS (SELECT doc_id, lang,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |tk AS (SELECT * FROM tk0 WHERE len(tok) > 0),
        |dtc AS (SELECT doc_id, lang, tok, count(*) AS cnt
        |        FROM tk GROUP BY 1, 2, 3),
        |mdl AS (SELECT lang AS mlang, tok, count(*) AS clt
        |        FROM tk GROUP BY 1, 2),
        |ct AS (SELECT mlang, CAST(sum(clt) AS BIGINT) AS cl
        |       FROM mdl GROUP BY 1),
        |voc AS (SELECT count(DISTINCT tok) AS vsz FROM tk),
        |tot AS (SELECT count(*) AS n FROM documents),
        |pri AS (SELECT lang AS mlang,
        |    CAST(round(ln(CAST(count(*) AS DOUBLE) / CAST(n AS DOUBLE)),
        |               6) AS DECIMAL(28,6)) AS plp
        |  FROM documents, tot GROUP BY 1, n),
        |lp AS (SELECT m.mlang, m.tok,
        |    CAST(round(ln(CAST(clt + 1 AS DOUBLE) /
        |                  CAST(cl + vsz AS DOUBLE)), 6)
        |         AS DECIMAL(28,6)) AS lp
        |  FROM mdl m JOIN ct ON m.mlang = ct.mlang, voc),
        |cls AS (SELECT ct.mlang,
        |    CAST(round(ln(1.0 / CAST(cl + vsz AS DOUBLE)), 6)
        |         AS DECIMAL(28,6)) AS lp0, plp
        |  FROM ct, voc JOIN pri ON pri.mlang = ct.mlang),
        |m AS (SELECT dtc.doc_id, lp.mlang,
        |    sum(CAST(dtc.cnt AS DECIMAL(9,0)) * lp.lp) AS sum_lp,
        |    CAST(sum(dtc.cnt) AS BIGINT) AS cnt_m
        |  FROM dtc JOIN lp ON dtc.tok = lp.tok GROUP BY 1, 2),
        |nd AS (SELECT doc_id, lang, CAST(sum(cnt) AS BIGINT) AS ntok
        |       FROM dtc GROUP BY 1, 2),
        |sc AS (SELECT nd.doc_id, nd.lang, c.mlang,
        |    c.plp + coalesce(m.sum_lp, CAST(0 AS DECIMAL(38,6))) +
        |      CAST(nd.ntok - coalesce(m.cnt_m, 0) AS DECIMAL(9,0)) * c.lp0
        |      AS score
        |  FROM nd CROSS JOIN cls c
        |  LEFT JOIN m ON m.doc_id = nd.doc_id AND m.mlang = c.mlang),
        |pred AS (SELECT doc_id, lang, mlang AS predicted,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY score DESC, mlang) AS rn
        |  FROM sc)
        |SELECT lang, predicted, count(*) AS n_docs
        |FROM pred WHERE rn = 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q210_fulfillment_sla" ->
      """WITH pv AS (
        |  SELECT o_orderpriority AS prio,
        |    datediff('day', o_orderdate, l_shipdate) AS v,
        |    count(*) AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |cum AS (SELECT prio, v, c,
        |    sum(c) OVER (PARTITION BY prio ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY prio) AS n
        |  FROM pv),
        |late AS (SELECT prio,
        |    round(CAST(sum(CASE WHEN v > 60 THEN c ELSE 0 END) AS DOUBLE)
        |          / sum(c), 6) AS late_rate
        |  FROM pv GROUP BY 1),
        |qs(q_label, q) AS (VALUES ('p50', 0.5), ('p90', 0.90),
        |                          ('p99', 0.99)),
        |j AS (SELECT cum.*, q_label, q,
        |    CAST(n - 1 AS DOUBLE) * q AS h,
        |    CAST(floor(CAST(n - 1 AS DOUBLE) * q) AS BIGINT) + 1 AS k
        |  FROM cum CROSS JOIN qs),
        |sel AS (SELECT prio, q_label, max(n) AS n, max(h) AS hh,
        |    min(CASE WHEN cum >= k THEN v END) AS vlo,
        |    min(CASE WHEN cum >= k + 1 THEN v END) AS vhi
        |  FROM j GROUP BY 1, 2)
        |SELECT sel.prio AS o_orderpriority, q_label,
        |  CAST(n AS BIGINT) AS n,
        |  round((CAST(vlo AS DOUBLE) +
        |         (hh - floor(hh)) *
        |         (CAST(coalesce(vhi, vlo) AS DOUBLE) -
        |          CAST(vlo AS DOUBLE))) / 1.0, 6) AS lag_days_at_q,
        |  late.late_rate
        |FROM sel JOIN late ON sel.prio = late.prio
        |ORDER BY o_orderpriority, q_label""".stripMargin,

    "q201_covisitation" ->
      """WITH fi AS (
        |  SELECT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    min(epoch_us(ts)) AS first_us
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL
        |  GROUP BY 1, 2),
        |capped AS (
        |  SELECT user_id, item FROM (
        |    SELECT user_id, item,
        |      row_number() OVER (PARTITION BY user_id
        |                         ORDER BY first_us, item) AS rn
        |    FROM fi) WHERE rn <= 20),
        |iu AS (SELECT item, count(*) AS iu FROM capped GROUP BY 1),
        |pr AS (SELECT a.item AS item_a, b.item AS item_b,
        |         count(*) AS pair_users
        |       FROM capped a JOIN capped b
        |         ON a.user_id = b.user_id AND a.item < b.item
        |       GROUP BY 1, 2)
        |SELECT item_a, item_b, pair_users, ua.iu AS ua, ub.iu AS ub,
        |  round(CAST(pair_users AS DOUBLE) /
        |        (ua.iu + ub.iu - pair_users), 6) AS jaccard
        |FROM pr
        |JOIN iu ua ON pr.item_a = ua.item
        |JOIN iu ub ON pr.item_b = ub.item
        |ORDER BY pair_users DESC, item_a, item_b LIMIT 30""".stripMargin,

    "q194_behavior_signatures" ->
      """WITH f AS (SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1),
        |s AS (
        |  SELECT e.user_id,
        |    array_to_string(list_sort(list(DISTINCT e.event_type)), ',')
        |      AS signature
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE epoch_us(e.ts) <= epoch_us(f.t0) + 259200000000
        |  GROUP BY 1),
        |t AS (SELECT count(*) AS tot FROM s)
        |SELECT signature, count(*) AS users,
        |  round(CAST(count(*) AS DOUBLE) / t.tot, 6) AS share
        |FROM s, t GROUP BY signature, t.tot
        |ORDER BY signature""".stripMargin,

    "q183_attribution_linear" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id AS t_uid, event_id AS t_id, ts AS t_ts,
        |        event_type AS touch_type
        |      FROM events WHERE event_type <> 'purchase'),
        |j AS (SELECT p.p_id, t.t_id, t.t_ts, t.touch_type
        |      FROM p LEFT JOIN t ON p.user_id = t.t_uid
        |        AND t.t_ts < p.p_ts
        |        AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
        |w AS (SELECT *,
        |    count(t_id) OVER (PARTITION BY p_id) AS n,
        |    row_number() OVER (PARTITION BY p_id
        |                       ORDER BY t_ts, t_id) AS idx
        |  FROM j),
        |c AS (SELECT p_id, touch_type,
        |    CASE WHEN n = 0 THEN 1000000
        |         ELSE 1000000 // n +
        |              CASE WHEN idx = 1 THEN 1000000 % n ELSE 0 END
        |    END AS credit
        |  FROM w)
        |SELECT coalesce(touch_type, 'none') AS attributed_type,
        |  CAST(sum(credit) AS BIGINT) AS credit_micros,
        |  count(DISTINCT p_id) AS purchases_touched
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q184_weighted_median" ->
      """WITH vg AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    sum(CAST(round(l_quantity * 100) AS BIGINT)) AS wsum
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, v, wsum,
        |    sum(wsum) OVER (PARTITION BY l_returnflag ORDER BY v
        |                    ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(wsum) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM vg)
        |SELECT l_returnflag, min(v) AS wmedian_cents,
        |  CAST(min(tot) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= tot GROUP BY 1 ORDER BY 1""".stripMargin,

    "q156_attribution" ->
      """WITH a AS (
        |  SELECT user_id, event_type,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |                    THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS src
        |  FROM events),
        |g AS (SELECT coalesce(src, 'none') AS attributed_type,
        |    count(*) AS purchases,
        |    count(DISTINCT user_id) AS users
        |  FROM a WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT attributed_type, purchases, users,
        |  round(CAST(purchases AS DOUBLE) /
        |        CAST(sum(purchases) OVER () AS DOUBLE), 6) AS share
        |FROM g ORDER BY attributed_type""".stripMargin,

    "q157_churn_screen" ->
      """WITH ev AS (
        |  SELECT event_type, user_id, CAST(ts AS DATE) AS d
        |  FROM events),
        |e AS (SELECT max(d) AS end_day FROM ev),
        |u AS (SELECT event_type, user_id, max(d) AS last_day
        |      FROM ev GROUP BY 1, 2),
        |c AS (SELECT event_type,
        |    CASE WHEN datediff('day', last_day, e.end_day) > 7
        |         THEN 1 ELSE 0 END AS quiet
        |  FROM u, e)
        |SELECT event_type, count(*) AS users,
        |  CAST(sum(quiet) AS BIGINT) AS quiet_users,
        |  round(CAST(sum(quiet) AS DOUBLE) /
        |        CAST(count(*) AS DOUBLE), 6) AS quiet_rate
        |FROM c GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q158_top_share" ->
      """WITH pv AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    count(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |tot AS (SELECT prio, sum(CAST(v AS HUGEINT) * c) AS rev
        |        FROM pv GROUP BY 1),
        |cum AS (SELECT prio, v, c,
        |    sum(c) OVER (PARTITION BY prio ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY prio) AS n
        |  FROM pv),
        |qs(p_label, num, den) AS (VALUES ('top1', 1, 100),
        |                                 ('top10', 1, 10)),
        |j AS (SELECT cum.*, p_label,
        |    (n * num + den - 1) // den AS k
        |  FROM cum CROSS JOIN qs),
        |t AS (SELECT prio, p_label, max(n) AS n, max(k) AS k,
        |    sum(CAST(v AS HUGEINT) *
        |        greatest(0, least(c, k - (n - cum)))) AS top_rev
        |  FROM j GROUP BY 1, 2)
        |SELECT t.prio AS o_orderpriority, p_label,
        |  CAST(t.n AS BIGINT) AS n, CAST(t.k AS BIGINT) AS k,
        |  round(CAST(top_rev AS DOUBLE) / CAST(rev AS DOUBLE), 6)
        |    AS top_share
        |FROM t JOIN tot ON t.prio = tot.prio
        |ORDER BY o_orderpriority, p_label""".stripMargin,

    "q159_ab_test" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |             THEN 1 ELSE 0 END) AS conv,
        |    sum(CASE WHEN event_type = 'purchase'
        |             THEN CAST(round(value * 100) AS BIGINT)
        |             ELSE 0 END) AS rev
        |  FROM events GROUP BY 1),
        |a AS (SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |                       <= '7'
        |                  THEN 'control' ELSE 'treatment' END AS arm,
        |             conv, rev
        |      FROM pu),
        |g AS (SELECT arm, count(*) AS n, sum(conv) AS x,
        |             sum(CAST(rev AS HUGEINT)) AS s1,
        |             sum(CAST(rev AS HUGEINT) * rev) AS s2
        |      FROM a GROUP BY 1),
        |w AS (SELECT
        |    max(CASE WHEN arm = 'control' THEN n END) AS n_c,
        |    max(CASE WHEN arm = 'treatment' THEN n END) AS n_t,
        |    max(CASE WHEN arm = 'control' THEN x END) AS x_c,
        |    max(CASE WHEN arm = 'treatment' THEN x END) AS x_t,
        |    max(CASE WHEN arm = 'control' THEN s1 END) AS s1_c,
        |    max(CASE WHEN arm = 'treatment' THEN s1 END) AS s1_t,
        |    max(CASE WHEN arm = 'control' THEN s2 END) AS s2_c,
        |    max(CASE WHEN arm = 'treatment' THEN s2 END) AS s2_t
        |  FROM g),
        |f AS (SELECT *,
        |    CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS p_c,
        |    CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS p_t,
        |    CAST(x_c + x_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE) AS pp,
        |    CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS m_c,
        |    CAST(s1_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS m_t,
        |    (CAST(s2_c AS DOUBLE) -
        |     CAST(s1_c AS DOUBLE) * CAST(s1_c AS DOUBLE) /
        |       CAST(n_c AS DOUBLE)) / CAST(n_c - 1 AS DOUBLE) AS v_c,
        |    (CAST(s2_t AS DOUBLE) -
        |     CAST(s1_t AS DOUBLE) * CAST(s1_t AS DOUBLE) /
        |       CAST(n_t AS DOUBLE)) / CAST(n_t - 1 AS DOUBLE) AS v_t
        |  FROM w)
        |SELECT CAST(n_c AS BIGINT) AS n_c, CAST(n_t AS BIGINT) AS n_t,
        |  CAST(x_c AS BIGINT) AS x_c, CAST(x_t AS BIGINT) AS x_t,
        |  round(p_c, 6) AS rate_c, round(p_t, 6) AS rate_t,
        |  round((p_t - p_c) /
        |        sqrt(pp * (1.0 - pp) *
        |             (1.0 / CAST(n_c AS DOUBLE) +
        |              1.0 / CAST(n_t AS DOUBLE))), 6) AS z_conv,
        |  round((m_t - m_c) /
        |        sqrt(v_c / CAST(n_c AS DOUBLE) +
        |             v_t / CAST(n_t AS DOUBLE)), 6) AS t_rev
        |FROM f""".stripMargin,

    "q160_rfm_segments" ->
      """WITH od AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |e AS (SELECT max(day) AS ed FROM od),
        |pc AS (SELECT o_custkey,
        |    CAST(min(datediff('day', day, ed)) AS BIGINT) AS rec,
        |    count(*) AS freq, sum(cents) AS mon
        |  FROM od, e GROUP BY 1),
        |pv AS (SELECT 'r' AS k, rec AS v FROM pc
        |  UNION ALL SELECT 'f', CAST(freq AS BIGINT) FROM pc
        |  UNION ALL SELECT 'm', mon FROM pc),
        |g AS (SELECT k, v, count(*) AS c FROM pv GROUP BY 1, 2),
        |cum AS (SELECT k, v,
        |    sum(c) OVER (PARTITION BY k ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY k) AS n
        |  FROM g),
        |sm AS (SELECT k, v, (4 * cum + n - 1) // n AS s FROM cum),
        |sc AS (SELECT pc.mon, r.s AS rs, f.s AS fs, m.s AS ms FROM pc
        |  JOIN sm r ON r.k = 'r' AND r.v = pc.rec
        |  JOIN sm f ON f.k = 'f' AND f.v = pc.freq
        |  JOIN sm m ON m.k = 'm' AND m.v = pc.mon),
        |seg AS (SELECT
        |    concat(rs, '-', fs, '-', ms) AS segment,
        |    CASE WHEN rs <= 2 AND fs >= 3 AND ms >= 3 THEN 'champion'
        |         WHEN rs <= 2 AND ms >= 3 THEN 'big_spender'
        |         WHEN rs >= 3 AND fs >= 3 THEN 'at_risk'
        |         WHEN rs >= 3 THEN 'hibernating'
        |         ELSE 'regular' END AS label, mon
        |  FROM sc)
        |SELECT segment, label, count(*) AS customers,
        |  round(CAST(sum(CAST(mon AS HUGEINT)) AS DOUBLE) /
        |        count(*) / 100.0, 6) AS avg_monetary
        |FROM seg GROUP BY 1, 2 ORDER BY segment""".stripMargin,

    "q161_forecast_screen" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT b.event_type, b.c, p.c AS cp, s.c AS cs
        |  FROM cells b
        |  JOIN cells p ON p.event_type = b.event_type
        |              AND p.day + 1 = b.day
        |  JOIN cells s ON s.event_type = b.event_type
        |              AND s.day + 7 = b.day)
        |SELECT event_type, count(*) AS n_days,
        |  CAST(sum(abs(c - cs)) AS BIGINT) AS err_seasonal,
        |  CAST(sum(abs(c - cp)) AS BIGINT) AS err_naive,
        |  CASE WHEN sum(abs(c - cp)) > 0
        |       THEN round(CAST(sum(abs(c - cs)) AS DOUBLE) /
        |                  CAST(sum(abs(c - cp)) AS DOUBLE), 6) END AS mase
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // same integer rank algebra: per-(group, score-cents) value groups,
    // exclusive cumulative counts, 2.R = sum npos*(2*cless + cnt + 1),
    // AUC = (2R - npos(npos+1)) / (2 npos nneg), one rounded division
    "q229_auc_rank" ->
      """WITH lab AS (
        |  SELECT o.o_orderpriority AS prio,
        |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS v,
        |    max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_totalprice),
        |vg AS (SELECT prio, v, count(*) AS cnt, sum(pos) AS npos
        |       FROM lab GROUP BY prio, v),
        |cw AS (SELECT prio, cnt, npos,
        |    coalesce(sum(cnt) OVER (PARTITION BY prio ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cless
        |  FROM vg)
        |SELECT prio,
        |  CAST(sum(npos) AS BIGINT) AS n_pos,
        |  CAST(sum(cnt - npos) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(npos) > 0 AND sum(cnt - npos) > 0 THEN
        |    round(CAST(sum(npos * (2 * cless + cnt + 1)) -
        |               sum(npos) * (sum(npos) + 1) AS DOUBLE) /
        |          CAST(sum(npos) * sum(cnt - npos) * 2 AS DOUBLE), 6)
        |  END AS auc
        |FROM cw GROUP BY prio ORDER BY prio""".stripMargin,

    // same closed-form out-of-fold means over the segments x folds cell
    // table; md5-derived fold; identical double-op order for the
    // m-estimate blend
    "q230_target_encoding" ->
      """WITH cells AS (
        |  SELECT c.c_mktsegment AS segment,
        |    CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 4))
        |         AS BIGINT) % 5 AS fold,
        |    count(*) AS cnt,
        |    sum(CAST(CAST(round(o.o_totalprice * 100) AS BIGINT)
        |             AS HUGEINT)) AS sm
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |w AS (SELECT segment, fold, cnt, sm,
        |    sum(cnt) OVER (PARTITION BY segment) AS cnt_seg,
        |    sum(sm)  OVER (PARTITION BY segment) AS sum_seg,
        |    sum(cnt) OVER () AS cnt_all,
        |    sum(sm)  OVER () AS sum_all
        |  FROM cells)
        |SELECT segment, fold, cnt,
        |  round(CAST(sum_seg - sm AS DOUBLE) /
        |        CAST(cnt_seg - cnt AS DOUBLE) / 100.0, 6) AS enc_oof,
        |  round((CAST(sum_seg - sm AS DOUBLE) +
        |         20.0 * (CAST(sum_all - sum_seg AS DOUBLE) /
        |                 CAST(cnt_all - cnt_seg AS DOUBLE))) /
        |        CAST(cnt_seg - cnt + 20 AS DOUBLE) / 100.0, 6)
        |    AS enc_smooth
        |FROM w ORDER BY segment, fold""".stripMargin,

    // same distinct-basket pair algebra, min-support 5, declared
    // (lift desc, b1, b2) top-20
    "q234_basket_rules" ->
      """WITH it AS (
        |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |sup AS (SELECT b, count(*) AS s FROM it GROUP BY b),
        |no AS (SELECT count(DISTINCT ok) AS n_orders FROM it),
        |pr AS (
        |  SELECT x.b AS b1, y.b AS b2, count(*) AS sup_ab
        |  FROM it x JOIN it y ON x.ok = y.ok AND x.b < y.b
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT b1, b2, sup_ab, sa.s AS sup_a, sb.s AS sup_b,
        |  round(CAST(sup_ab AS DOUBLE) / CAST(sa.s AS DOUBLE), 6)
        |    AS conf_fwd,
        |  round(CAST(sup_ab AS DOUBLE) / CAST(sb.s AS DOUBLE), 6)
        |    AS conf_rev,
        |  round(CAST(sup_ab AS DOUBLE) * CAST(no.n_orders AS DOUBLE) /
        |        (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)), 6) AS lift
        |FROM pr
        |JOIN sup sa ON sa.b = pr.b1
        |JOIN sup sb ON sb.b = pr.b2
        |CROSS JOIN no
        |ORDER BY lift DESC, b1, b2 LIMIT 20""".stripMargin,

    // same md5 bucket hash, same 3-way feature explode via UNION ALL
    "q236_feature_hash" ->
      """WITH fv AS (
        |  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
        |    'seg=' || c.c_mktsegment AS fv
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT),
        |    'nat=' || CAST(c.c_nationkey AS VARCHAR)
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT),
        |    'pri=' || o.o_orderpriority
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT CAST(('0x' || substr(md5(fv), 1, 4)) AS BIGINT) % 64
        |    AS bucket,
        |  count(*) AS rows_in,
        |  count(DISTINCT fv) AS distinct_fv,
        |  round(CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) /
        |        100.0, 6) AS target_mass,
        |  CAST(CASE WHEN count(DISTINCT fv) > 1 THEN 1 ELSE 0 END
        |       AS BIGINT) AS collided
        |FROM fv GROUP BY bucket ORDER BY bucket""".stripMargin,

    // same cleared-denominator rank map + merge staircase; the
    // forward-fill is first_value IGNORE NULLS over the co-sort
    "q239_quantile_norm" ->
      """WITH sb AS (SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS v,
        |              count(*) AS c FROM supplier GROUP BY 1),
        |cb AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS v,
        |         count(*) AS c FROM customer GROUP BY 1),
        |cs AS (SELECT v, c,
        |    sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |                 AND CURRENT ROW) AS cum,
        |    sum(c) OVER () AS n FROM sb),
        |cc AS (SELECT v, c,
        |    sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |                 AND CURRENT ROW) AS cum,
        |    sum(c) OVER () AS n FROM cb),
        |kq AS (SELECT v AS v_s, c AS cnt,
        |    (cum * (SELECT max(n) FROM cc) + n - 1) // n AS pos
        |  FROM cs),
        |u AS (
        |  SELECT pos, 1 AS isq, v_s, cnt, CAST(NULL AS BIGINT) AS cv
        |  FROM kq
        |  UNION ALL
        |  SELECT cum, 0, NULL, NULL, v FROM cc),
        |m AS (SELECT *,
        |    first_value(cv IGNORE NULLS) OVER (
        |      ORDER BY pos ASC, isq DESC
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS mv
        |  FROM u)
        |SELECT round(CAST(v_s AS DOUBLE) / 100.0, 6) AS src_bal, cnt,
        |  round(CAST(mv AS DOUBLE) / 100.0, 6) AS mapped_bal
        |FROM m WHERE isq = 1 ORDER BY src_bal""".stripMargin,

    "q251_anova" ->
      """WITH g AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
        |      AS sv,
        |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) *
        |        CAST(round(value * 100) AS BIGINT)) AS svv
        |  FROM events GROUP BY 1),
        |t AS (SELECT count(*) AS k, sum(n) AS n_total,
        |    sum(sv) AS sall, sum(svv) AS tall,
        |    sum(CAST(round(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) /
        |                   CAST(n AS DOUBLE), 6) AS DECIMAL(38,6))) AS a
        |  FROM g),
        |f AS (SELECT k, n_total,
        |    round(CAST(a AS DOUBLE) -
        |          CAST(sall AS DOUBLE) * CAST(sall AS DOUBLE) /
        |          CAST(n_total AS DOUBLE), 6) AS ssb,
        |    round(CAST(tall AS DOUBLE) - CAST(a AS DOUBLE), 6) AS ssw
        |  FROM t)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n_total AS BIGINT) AS n_total,
        |  ssb AS ss_between, ssw AS ss_within,
        |  round((ssb / CAST(k - 1 AS DOUBLE)) /
        |        (ssw / CAST(n_total - k AS DOUBLE)), 6) AS f_stat,
        |  round(ssb / (ssb + ssw), 6) AS eta_sq
        |FROM f""".stripMargin,

    "q252_cuped" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase'
        |              AND ts < TIMESTAMP '2024-01-16'
        |             THEN CAST(round(value * 100) AS BIGINT)
        |             ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'purchase'
        |              AND ts >= TIMESTAMP '2024-01-16'
        |             THEN CAST(round(value * 100) AS BIGINT)
        |             ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |a AS (SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |                       <= '7' THEN 'c' ELSE 't' END AS arm, x, y
        |      FROM pu),
        |g AS (SELECT arm, count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM a GROUP BY 1),
        |w AS (SELECT
        |    max(CASE WHEN arm = 'c' THEN n END) AS n_c,
        |    max(CASE WHEN arm = 't' THEN n END) AS n_t,
        |    max(CASE WHEN arm = 'c' THEN sx END) AS sx_c,
        |    max(CASE WHEN arm = 't' THEN sx END) AS sx_t,
        |    max(CASE WHEN arm = 'c' THEN sy END) AS sy_c,
        |    max(CASE WHEN arm = 't' THEN sy END) AS sy_t,
        |    max(CASE WHEN arm = 'c' THEN sxx END) AS sxx_c,
        |    max(CASE WHEN arm = 't' THEN sxx END) AS sxx_t,
        |    max(CASE WHEN arm = 'c' THEN syy END) AS syy_c,
        |    max(CASE WHEN arm = 't' THEN syy END) AS syy_t,
        |    max(CASE WHEN arm = 'c' THEN sxy END) AS sxy_c,
        |    max(CASE WHEN arm = 't' THEN sxy END) AS sxy_t
        |  FROM g),
        |f AS (SELECT *,
        |    CAST(n_c + n_t AS DOUBLE) AS nn,
        |    CAST(sx_c + sx_t AS DOUBLE) AS px,
        |    CAST(sy_c + sy_t AS DOUBLE) AS py,
        |    CAST(sxx_c + sxx_t AS DOUBLE) AS pxx,
        |    CAST(syy_c + syy_t AS DOUBLE) AS pyy,
        |    CAST(sxy_c + sxy_t AS DOUBLE) AS pxy
        |  FROM w),
        |f2 AS (SELECT *,
        |    nn * pxy - px * py AS cxy,
        |    nn * pxx - px * px AS vx,
        |    nn * pyy - py * py AS vy
        |  FROM f),
        |f3 AS (SELECT *, round(cxy / vx, 6) AS theta FROM f2)
        |SELECT CAST(n_c AS BIGINT) AS n_c, CAST(n_t AS BIGINT) AS n_t,
        |  round((CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) -
        |         CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)) / 100.0, 6)
        |    AS diff_raw,
        |  theta,
        |  round((CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) -
        |         CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE) -
        |         theta * (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE) -
        |                  CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE))) /
        |        100.0, 6) AS diff_cuped,
        |  round(cxy * cxy / (vx * vy), 6) AS var_reduction
        |FROM f3""".stripMargin,

    "q253_avg_precision" ->
      """WITH lab AS (
        |  SELECT o.o_orderkey, o.o_orderpriority AS prio,
        |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS v,
        |    max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2, 3),
        |pv AS (SELECT prio, v, count(*) AS c, sum(pos) AS npos
        |  FROM lab GROUP BY 1, 2),
        |cw AS (SELECT prio, v, c, npos,
        |    sum(npos) OVER (PARTITION BY prio ORDER BY v DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
        |    sum(c) OVER (PARTITION BY prio ORDER BY v DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
        |  FROM pv),
        |g AS (SELECT prio, sum(CAST(npos AS HUGEINT)) AS np,
        |    sum(CAST(c AS HUGEINT)) AS nt,
        |    sum(CAST(round(CAST(npos AS DOUBLE) * CAST(cp AS DOUBLE) /
        |                   CAST(ct AS DOUBLE), 6) AS DECIMAL(38,6)))
        |      AS apsum
        |  FROM cw GROUP BY 1)
        |SELECT prio, CAST(np AS BIGINT) AS n_pos,
        |  CAST(nt AS BIGINT) AS n_total,
        |  round(CAST(np AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS prevalence,
        |  CASE WHEN np > 0
        |       THEN round(CAST(apsum AS DOUBLE) / CAST(np AS DOUBLE), 6)
        |  END AS avg_precision
        |FROM g ORDER BY prio""".stripMargin,

    "q254_bh_fdr" ->
      """WITH cells AS (
        |  SELECT n.n_name, count(*) AS n,
        |    sum(CASE WHEN o.o_totalprice > 450000 THEN 1 ELSE 0 END) AS x
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1),
        |w AS (SELECT *, count(*) OVER () AS m,
        |    sum(n) OVER () - n AS nr, sum(x) OVER () - x AS xr
        |  FROM cells),
        |z AS (SELECT *,
        |    (CAST(x AS DOUBLE) + CAST(xr AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) + CAST(nr AS DOUBLE)) AS pp,
        |    (CAST(x AS DOUBLE) / CAST(n AS DOUBLE) -
        |     CAST(xr AS DOUBLE) / CAST(nr AS DOUBLE)) /
        |    sqrt(((CAST(x AS DOUBLE) + CAST(xr AS DOUBLE)) /
        |          (CAST(n AS DOUBLE) + CAST(nr AS DOUBLE))) *
        |         (1.0 - (CAST(x AS DOUBLE) + CAST(xr AS DOUBLE)) /
        |                (CAST(n AS DOUBLE) + CAST(nr AS DOUBLE))) *
        |         (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(nr AS DOUBLE)))
        |      AS zz
        |  FROM w),
        |pv AS (SELECT *, abs(zz) AS az,
        |    1.0 / (1.0 + 0.2316419 * abs(zz)) AS tt
        |  FROM z),
        |pp2 AS (SELECT *,
        |    round(2.0 * exp(az * az * -0.5) * 0.3989422804014327 *
        |          ((((1.330274429 * tt + -1.821255978) * tt +
        |             1.781477937) * tt + -0.356563782) * tt +
        |           0.319381530) * tt, 6) AS pval
        |  FROM pv),
        |r AS (SELECT *,
        |    row_number() OVER (ORDER BY pval ASC, n_name ASC) AS bh_rank
        |  FROM pp2),
        |fl AS (SELECT *,
        |    CASE WHEN pval <= CAST(bh_rank AS DOUBLE) * 0.05 /
        |                      CAST(m AS DOUBLE)
        |         THEN 1 ELSE 0 END AS flag
        |  FROM r),
        |dd AS (SELECT *,
        |    max(flag) OVER (ORDER BY bh_rank
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS discovery
        |  FROM fl)
        |SELECT n_name, n, CAST(x AS BIGINT) AS x,
        |  round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |  round(zz, 6) AS z, pval AS p_value, bh_rank, discovery
        |FROM dd ORDER BY bh_rank""".stripMargin,

    "q255_elasticity" ->
      """WITH v AS (
        |  SELECT p.p_brand AS brand,
        |    CAST(round(ln(round(l.l_extendedprice / l.l_quantity
        |                        * 100)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(l.l_quantity), 6) AS DECIMAL(18,6)) AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |m AS (SELECT brand, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        |    sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM v GROUP BY 1),
        |f AS (SELECT *,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
        |  FROM m)
        |SELECT brand, n, round(cxy / vx, 6) AS elasticity,
        |  round(cxy * cxy / (vx * vy), 6) AS r2
        |FROM f ORDER BY brand""".stripMargin,

    "q257_attribution_decay" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS pid, ts AS pts FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, event_type AS channel, ts AS tts FROM events
        |  WHERE event_type IN ('view', 'click')),
        |j AS (
        |  SELECT p.pid, t.channel,
        |    CAST(floor((epoch_us(p.pts) - epoch_us(t.tts)) /
        |               86400000000) AS BIGINT) AS dday
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE t.tts < p.pts AND t.tts >= p.pts - INTERVAL 7 DAY),
        |w AS (SELECT pid, channel,
        |    CAST(round(pow(0.5, CAST(dday AS DOUBLE) / 7.0), 6)
        |         AS DECIMAL(28,6)) AS w
        |  FROM j),
        |sh AS (SELECT channel, pid,
        |    CAST(round(CAST(w AS DOUBLE) /
        |               CAST(sum(w) OVER (PARTITION BY pid) AS DOUBLE), 6)
        |         AS DECIMAL(28,6)) AS share
        |  FROM w)
        |SELECT channel, count(*) AS touches,
        |  count(DISTINCT pid) AS purchases_touched,
        |  round(CAST(sum(share) AS DOUBLE), 6) AS credit
        |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin,

    "q263_cmh_test" ->
      """WITH cells AS (
        |  SELECT c.c_mktsegment AS seg,
        |    sum(arm * hi) AS a, sum(arm * (1 - hi)) AS b,
        |    sum((1 - arm) * hi) AS c, sum((1 - arm) * (1 - hi)) AS e
        |  FROM (
        |    SELECT o_custkey,
        |      CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1)
        |                <= '7' THEN 1 ELSE 0 END AS arm,
        |      CASE WHEN o_totalprice > 450000 THEN 1 ELSE 0 END AS hi
        |    FROM orders) o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1),
        |t AS (SELECT seg, a, b, c, e, a + b + c + e AS n,
        |    a + b AS r1, a + c AS c1 FROM cells),
        |g AS (SELECT count(*) AS n_strata,
        |    CAST(sum(a) AS BIGINT) AS a_sum,
        |    sum(CAST(round(CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE) /
        |                   CAST(n AS DOUBLE), 6) AS DECIMAL(28,6)))
        |      AS e_sum,
        |    sum(CAST(round(CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE) /
        |                   CAST(n AS DOUBLE) *
        |                   (CAST(n AS DOUBLE) - CAST(r1 AS DOUBLE)) /
        |                   CAST(n AS DOUBLE) *
        |                   (CAST(n AS DOUBLE) - CAST(c1 AS DOUBLE)) /
        |                   (CAST(n AS DOUBLE) - 1.0), 6)
        |             AS DECIMAL(28,6))) AS v_sum,
        |    sum(CAST(round(CAST(a AS DOUBLE) * CAST(e AS DOUBLE) /
        |                   CAST(n AS DOUBLE), 6) AS DECIMAL(28,6)))
        |      AS r_sum,
        |    sum(CAST(round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) /
        |                   CAST(n AS DOUBLE), 6) AS DECIMAL(28,6)))
        |      AS s_sum
        |  FROM t)
        |SELECT n_strata, a_sum,
        |  round(CAST(e_sum AS DOUBLE), 6) AS e_sum,
        |  round(CAST(v_sum AS DOUBLE), 6) AS v_sum,
        |  round((CAST(a_sum AS DOUBLE) - CAST(e_sum AS DOUBLE)) /
        |        sqrt(CAST(v_sum AS DOUBLE)), 6) AS z,
        |  round((CAST(a_sum AS DOUBLE) - CAST(e_sum AS DOUBLE)) *
        |        (CAST(a_sum AS DOUBLE) - CAST(e_sum AS DOUBLE)) /
        |        CAST(v_sum AS DOUBLE), 6) AS chi2,
        |  round(CAST(r_sum AS DOUBLE) / CAST(s_sum AS DOUBLE), 6)
        |    AS or_mh
        |FROM g""".stripMargin,

    "q264_power_analysis" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |             THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1),
        |base AS (SELECT count(*) AS users, sum(conv) AS convs FROM pu),
        |dd AS (SELECT count(DISTINCT CAST(ts AS DATE)) AS n_days
        |       FROM events),
        |grid AS (SELECT unnest(CAST([0.01, 0.02, 0.05, 0.10]
        |                            AS DOUBLE[])) AS mde),
        |f AS (SELECT mde,
        |    round(CAST(convs AS DOUBLE) / CAST(users AS DOUBLE), 6)
        |      AS p0, users, n_days
        |  FROM grid, base, dd),
        |f2 AS (SELECT mde, p0, p0 + mde AS p1,
        |    CAST(ceil((CAST(1.959964 AS DOUBLE) +
        |               CAST(0.841621 AS DOUBLE)) *
        |              (CAST(1.959964 AS DOUBLE) +
        |               CAST(0.841621 AS DOUBLE)) *
        |              (p0 * (1.0 - p0) + (p0 + mde) *
        |               (1.0 - (p0 + mde))) / (mde * mde)) AS BIGINT)
        |      AS n_per_arm,
        |    round(CAST(users AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
        |      AS upd
        |  FROM f)
        |SELECT mde, p0, round(p1, 6) AS p1, n_per_arm,
        |  CAST(ceil(CAST(n_per_arm AS DOUBLE) * 2.0 / upd) AS BIGINT)
        |    AS days_needed
        |FROM f2 ORDER BY mde""".stripMargin,

    "q266_crossval_nb" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |         AS BIGINT) % 5 AS fold,
        |    tok
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  WHERE len(tok) > 0),
        |folds AS (SELECT unnest([0, 1, 2, 3, 4]) AS fold),
        |mdl_tot AS (SELECT lang AS mlang, tok, count(*) AS ct
        |  FROM tk GROUP BY 1, 2),
        |mdl_f AS (SELECT lang AS mlang, tok, fold, count(*) AS cf
        |  FROM tk GROUP BY 1, 2, 3),
        |ct_oof AS (
        |  SELECT t.mlang, f.fold,
        |    CAST(t.cl - coalesce(g.clf, 0) AS BIGINT) AS cloof
        |  FROM (SELECT mlang, sum(ct) AS cl FROM mdl_tot GROUP BY 1) t
        |  CROSS JOIN folds f
        |  LEFT JOIN (SELECT mlang, fold, sum(cf) AS clf
        |             FROM mdl_f GROUP BY 1, 2) g
        |    ON t.mlang = g.mlang AND f.fold = g.fold),
        |voc AS (SELECT count(DISTINCT tok) AS vsz FROM tk),
        |dc AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |         AS BIGINT) % 5 AS fold
        |  FROM documents),
        |nf AS (SELECT fold, count(*) AS nf FROM dc GROUP BY 1),
        |ntot AS (SELECT count(*) AS n FROM dc),
        |pri_oof AS (
        |  SELECT p.mlang, f.fold,
        |    CAST(round(ln(CAST(p.nd - coalesce(g.ndf, 0) AS DOUBLE) /
        |                  CAST(ntot.n - nf.nf AS DOUBLE)), 6)
        |         AS DECIMAL(28,6)) AS plp
        |  FROM (SELECT lang AS mlang, count(*) AS nd
        |        FROM dc GROUP BY 1) p
        |  CROSS JOIN folds f
        |  LEFT JOIN (SELECT lang AS mlang, fold, count(*) AS ndf
        |             FROM dc GROUP BY 1, 2) g
        |    ON p.mlang = g.mlang AND f.fold = g.fold
        |  JOIN nf ON nf.fold = f.fold, ntot),
        |lp AS (
        |  SELECT t.mlang, t.tok, f.fold,
        |    CAST(round(ln(CAST(t.ct - coalesce(g.cf, 0) + 1 AS DOUBLE) /
        |                  CAST(c.cloof + voc.vsz AS DOUBLE)), 6)
        |         AS DECIMAL(28,6)) AS lp
        |  FROM mdl_tot t
        |  CROSS JOIN folds f
        |  LEFT JOIN mdl_f g ON t.mlang = g.mlang AND t.tok = g.tok
        |                    AND f.fold = g.fold
        |  JOIN ct_oof c ON c.mlang = t.mlang AND c.fold = f.fold, voc
        |  WHERE t.ct - coalesce(g.cf, 0) > 0),
        |cls AS (
        |  SELECT c.mlang, c.fold,
        |    CAST(round(ln(1.0 / CAST(c.cloof + voc.vsz AS DOUBLE)), 6)
        |         AS DECIMAL(28,6)) AS lp0, p.plp
        |  FROM ct_oof c JOIN pri_oof p
        |    ON p.mlang = c.mlang AND p.fold = c.fold, voc),
        |dtc AS (SELECT doc_id, lang, fold, tok, count(*) AS cnt
        |  FROM tk GROUP BY 1, 2, 3, 4),
        |m AS (SELECT dtc.doc_id, dtc.fold, lp.mlang,
        |    sum(CAST(dtc.cnt AS DECIMAL(9,0)) * lp.lp) AS sum_lp,
        |    CAST(sum(dtc.cnt) AS BIGINT) AS cnt_m
        |  FROM dtc JOIN lp ON dtc.tok = lp.tok AND dtc.fold = lp.fold
        |  GROUP BY 1, 2, 3),
        |nd AS (SELECT doc_id, lang, fold,
        |    CAST(sum(cnt) AS BIGINT) AS ntok
        |  FROM dtc GROUP BY 1, 2, 3),
        |sc AS (SELECT nd.doc_id, nd.lang, nd.fold, c.mlang,
        |    c.plp + coalesce(m.sum_lp, CAST(0 AS DECIMAL(38,6))) +
        |      CAST(nd.ntok - coalesce(m.cnt_m, 0) AS DECIMAL(9,0)) *
        |        c.lp0 AS score
        |  FROM nd JOIN cls c ON c.fold = nd.fold
        |  LEFT JOIN m ON m.doc_id = nd.doc_id AND m.fold = nd.fold
        |              AND m.mlang = c.mlang),
        |pred AS (SELECT doc_id, lang, fold, mlang,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY score DESC, mlang) AS rn
        |  FROM sc)
        |SELECT fold, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN mlang = lang THEN 1 ELSE 0 END) AS BIGINT)
        |    AS correct,
        |  round(CAST(sum(CASE WHEN mlang = lang THEN 1 ELSE 0 END)
        |             AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS accuracy
        |FROM pred WHERE rn = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q268_stats_artifact" ->
      """WITH pv AS (
        |  SELECT 'o_totalprice' AS col_name,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    count(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |cum AS (SELECT col_name, v, c,
        |    sum(c) OVER (PARTITION BY col_name ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY col_name) AS n
        |  FROM pv),
        |qs(q_label, q) AS (VALUES ('d1', 0.1), ('d2', 0.2), ('d3', 0.3),
        |    ('d4', 0.4), ('d5', 0.5), ('d6', 0.6), ('d7', 0.7),
        |    ('d8', 0.8), ('d9', 0.9)),
        |j AS (SELECT cum.*, q_label, q,
        |    CAST(n - 1 AS DOUBLE) * q AS h,
        |    CAST(floor(CAST(n - 1 AS DOUBLE) * q) AS BIGINT) + 1 AS k
        |  FROM cum CROSS JOIN qs),
        |sel AS (SELECT col_name, q_label, max(n) AS n, max(h) AS hh,
        |    min(CASE WHEN cum >= k THEN v END) AS vlo,
        |    min(CASE WHEN cum >= k + 1 THEN v END) AS vhi
        |  FROM j GROUP BY 1, 2),
        |summ AS (SELECT col_name, count(*) AS ndv,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    round(CAST(min(v) AS DOUBLE) / 100.0, 6) AS min_val,
        |    round(CAST(max(v) AS DOUBLE) / 100.0, 6) AS max_val
        |  FROM pv GROUP BY 1)
        |SELECT sel.col_name, q_label, n_rows, ndv, min_val, max_val,
        |  round((CAST(vlo AS DOUBLE) +
        |         (hh - floor(hh)) *
        |         (CAST(coalesce(vhi, vlo) AS DOUBLE) -
        |          CAST(vlo AS DOUBLE))) / 100.0, 6) AS boundary
        |FROM sel JOIN summ ON sel.col_name = summ.col_name
        |ORDER BY q_label""".stripMargin,

    "q269_item_knn" ->
      """WITH items AS (
        |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |cnt AS (SELECT b, count(*) AS cb FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.b AS b1, bb.b AS b2, count(*) AS cij
        |  FROM items a JOIN items bb ON a.ok = bb.ok AND a.b < bb.b
        |  GROUP BY 1, 2),
        |sym AS (
        |  SELECT b1 AS b, b2 AS nb, cij FROM pairs
        |  UNION ALL
        |  SELECT b2 AS b, b1 AS nb, cij FROM pairs),
        |sc AS (SELECT sym.b, sym.nb, sym.cij,
        |    round(CAST(sym.cij AS DOUBLE) /
        |          sqrt(CAST(x.cb AS DOUBLE) * CAST(y.cb AS DOUBLE)), 6)
        |      AS cosine
        |  FROM sym JOIN cnt x ON sym.b = x.b
        |           JOIN cnt y ON sym.nb = y.b),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY b
        |                       ORDER BY cosine DESC, nb) AS rn
        |  FROM sc)
        |SELECT b AS brand, nb AS neighbor, cij AS support, cosine,
        |  CAST(rn AS INTEGER) AS rank
        |FROM r WHERE rn <= 3 ORDER BY brand, rank""".stripMargin,

    "q276_esd_outliers" ->
      """WITH cells AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
        |  FROM orders GROUP BY 1),
        |a1 AS (
        |  SELECT count(*) AS n, sum(CAST(x AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
        |  FROM cells),
        |p1 AS (
        |  SELECT day, x, abs(CAST(x AS DECIMAL(38,0)) * n - sx) AS dev,
        |    n, sx, sxx
        |  FROM cells, a1 ORDER BY dev DESC, day LIMIT 1),
        |o1 AS (
        |  SELECT 1 AS esd_round, day, x,
        |    round((CAST(dev AS DOUBLE) / CAST(n AS DOUBLE)) /
        |          sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
        |               CAST(n * (n - 1) AS DOUBLE)), 6) AS r_stat
        |  FROM p1),
        |c2 AS (SELECT * FROM cells
        |       WHERE day NOT IN (SELECT day FROM p1)),
        |a2 AS (
        |  SELECT count(*) AS n, sum(CAST(x AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
        |  FROM c2),
        |p2 AS (
        |  SELECT day, x, abs(CAST(x AS DECIMAL(38,0)) * n - sx) AS dev,
        |    n, sx, sxx
        |  FROM c2, a2 ORDER BY dev DESC, day LIMIT 1),
        |o2 AS (
        |  SELECT 2 AS esd_round, day, x,
        |    round((CAST(dev AS DOUBLE) / CAST(n AS DOUBLE)) /
        |          sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
        |               CAST(n * (n - 1) AS DOUBLE)), 6) AS r_stat
        |  FROM p2),
        |c3 AS (SELECT * FROM c2
        |       WHERE day NOT IN (SELECT day FROM p2)),
        |a3 AS (
        |  SELECT count(*) AS n, sum(CAST(x AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
        |  FROM c3),
        |p3 AS (
        |  SELECT day, x, abs(CAST(x AS DECIMAL(38,0)) * n - sx) AS dev,
        |    n, sx, sxx
        |  FROM c3, a3 ORDER BY dev DESC, day LIMIT 1),
        |o3 AS (
        |  SELECT 3 AS esd_round, day, x,
        |    round((CAST(dev AS DOUBLE) / CAST(n AS DOUBLE)) /
        |          sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
        |               CAST(n * (n - 1) AS DOUBLE)), 6) AS r_stat
        |  FROM p3),
        |u AS (SELECT * FROM o1 UNION ALL SELECT * FROM o2
        |      UNION ALL SELECT * FROM o3)
        |SELECT esd_round, day,
        |  round(CAST(x AS DOUBLE) / 100.0, 6) AS revenue,
        |  r_stat, r_stat > 3.0 AS flagged
        |FROM u ORDER BY esd_round""".stripMargin,

    // 12 unrolled value-iteration CTEs over the variant-keyed removal
    // matrices — the same ×1e9 fixed-point arithmetic, independently
    // re-derived (q115's unrolled-rounds oracle discipline)
    "q279_markov_attribution" -> {
      val steps = (1 to 12).map { i =>
        s"""v$i AS (
           |  SELECT m.rm, m.f AS st,
           |    CAST(CAST(sum(CAST(m.cnt AS DECIMAL(38,0)) *
           |              COALESCE(p.value, 0)) AS HUGEINT) // m.tot
           |         AS BIGINT) AS value
           |  FROM mv m LEFT JOIN v${i - 1} p
           |    ON m.rm = p.rm AND m.t2 = p.st
           |  GROUP BY m.rm, m.f, m.tot
           |  UNION ALL SELECT * FROM v0)""".stripMargin
      }.mkString(",\n")
      s"""WITH sq AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
         |    event_type
         |  FROM events),
         |un AS (
         |  SELECT user_id, day,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS conv
         |  FROM sq GROUP BY 1, 2),
         |np AS (
         |  SELECT s.user_id, s.day, s.event_type,
         |    CASE WHEN u.conv = 1 THEN 'CONV' ELSE 'NULL' END
         |      AS endState,
         |    row_number() OVER w AS rn,
         |    lead(s.event_type) OVER w AS nxt
         |  FROM sq s JOIN un u
         |    ON s.user_id = u.user_id AND s.day = u.day
         |  WHERE s.event_type <> 'purchase'
         |  WINDOW w AS (PARTITION BY s.user_id, s.day
         |               ORDER BY s.ts, s.event_id)),
         |trans AS (
         |  SELECT 'START' AS f, event_type AS t FROM np WHERE rn = 1
         |  UNION ALL
         |  SELECT event_type, COALESCE(nxt, endState) FROM np
         |  UNION ALL
         |  SELECT 'START', CASE WHEN u.conv = 1 THEN 'CONV'
         |                       ELSE 'NULL' END
         |  FROM un u WHERE NOT EXISTS (
         |    SELECT 1 FROM np
         |    WHERE np.user_id = u.user_id AND np.day = u.day)),
         |m0 AS (SELECT f, t, count(*) AS cnt FROM trans GROUP BY 1, 2),
         |chan AS (SELECT DISTINCT f FROM m0 WHERE f <> 'START'),
         |var_ AS (SELECT f AS rm FROM chan UNION ALL SELECT 'none'),
         |tot AS (SELECT f, sum(cnt) AS tot FROM m0 GROUP BY 1),
         |mv AS (
         |  SELECT x.rm, x.f, x.t2, x.cnt, t.tot
         |  FROM (SELECT v.rm, m.f,
         |          CASE WHEN m.t = v.rm THEN 'NULL' ELSE m.t END AS t2,
         |          sum(m.cnt) AS cnt
         |        FROM m0 m, var_ v WHERE m.f <> v.rm
         |        GROUP BY 1, 2, 3) x
         |  JOIN tot t ON x.f = t.f),
         |v0 AS (
         |  SELECT rm, 'CONV' AS st, CAST(1000000000 AS BIGINT) AS value
         |  FROM var_
         |  UNION ALL SELECT rm, 'NULL', 0 FROM var_),
         |$steps,
         |ps AS (SELECT rm, value FROM v12 WHERE st = 'START'),
         |pf AS (SELECT value AS p0 FROM ps WHERE rm = 'none'),
         |re AS (
         |  SELECT rm, value, p0, p0 - value AS drop_
         |  FROM ps, pf WHERE rm <> 'none'),
         |rt AS (SELECT sum(drop_) AS dtot FROM re)
         |SELECT rm AS channel,
         |  round(CAST(p0 AS DOUBLE) / 1000000000.0, 6) AS p_full,
         |  round(CAST(value AS DOUBLE) / 1000000000.0, 6) AS p_removed,
         |  round(CAST(drop_ AS DOUBLE) / CAST(p0 AS DOUBLE), 6)
         |    AS removal_effect,
         |  round(CAST(drop_ AS DOUBLE) / CAST(dtot AS DOUBLE), 6)
         |    AS share
         |FROM re, rt ORDER BY channel""".stripMargin
    }
  )
}
