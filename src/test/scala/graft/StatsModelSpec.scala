package graft

import org.apache.spark.sql.functions._

/** Independent recomputation of the r10 StatsModelOps family at sf0.001
  * (SURVEY.md §5.2 item 2): Scala-collections brute force for the order
  * statistics and the LM pipeline, Spark's own regression/percentile
  * aggregates for q147/q151 — none of it shares code with the operators
  * under test. Pinned queries drain [[PinScope]] after the consume. */
class StatsModelSpec extends SparkSpecBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exact lower+upper-middle median doubled (2·median), brute force. */
  private def m2Of(vs: Seq[Long]): Long = {
    val s = vs.sorted; val n = s.length
    s((n + 1) / 2 - 1) + s(n / 2 + 1 - 1)
  }

  test("q148 median/MAD/fence match a Scala brute force") {
    val rows = Tables(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.map { case (t, g) =>
      val vs = g.map(_._2)
      val m2 = m2Of(vs)
      val dm2 = m2Of(vs.map(v => math.abs(2 * v - m2)))
      val nOut = vs.count(v => math.abs(2 * v - m2).toDouble > 2.2239 * dm2)
      (t, vs.length.toLong, round6(m2 / 200.0), round6(dm2 / 400.0),
       nOut.toLong, round6(nOut.toDouble / vs.length))
    }.sortBy(_._1)
    val got =
      try q("q148_mad_outliers")
        .as[(String, Long, Double, Double, Long, Double)].collect().toSeq
      finally PinScope.drain()
    assert(got == expected)
    assert(got.exists(_._5 > 0L), "fence never fired — screen untested")
  }

  test("q151 percentile bands match Spark's exact percentile aggregate") {
    val got = try q("q151_percentile_bands")
        .as[(String, String, Long, Double)].collect().toSeq
      finally PinScope.drain()
    val ref = Tables(spark, sf, "events")
      .select(col("event_type"),
              round(col("value") * 100).cast("long").as("v"))
      .groupBy("event_type")
      .agg(expr("percentile(v, array(0.5, 0.95, 0.99))").as("ps"))
      .as[(String, Seq[Double])].collect()
      .flatMap { case (t, ps) =>
        Seq("p50", "p95", "p99").zip(ps).map { case (l, p) =>
          (t, l) -> p / 100.0 }
      }.toMap
    assert(got.nonEmpty)
    got.foreach { case (t, l, _, v) =>
      assert(math.abs(v - ref((t, l))) < 1e-6,
             s"$t/$l: $v vs percentile ${ref((t, l))}")
    }
  }

  test("q147 OLS agrees with Spark's regr_slope/regr_intercept/regr_r2") {
    val ref = Tables(spark, sf, "events")
      .select(col("event_type"),
              datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
                .cast("double").as("x"),
              round(col("value") * 100).cast("double").as("y"))
      .groupBy("event_type")
      .agg(expr("regr_slope(y, x)").as("sl"),
           expr("regr_intercept(y, x)").as("ic"),
           expr("regr_r2(y, x)").as("r2"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val got = q("q147_trend_regression")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, _, sl, ic, r2) =>
      val (rsl, ric, rr2) = ref(t)
      assert(math.abs(sl - rsl) < 1e-4, s"$t slope $sl vs $rsl")
      assert(math.abs(ic - ric) < math.abs(ric) * 1e-4 + 1e-4,
             s"$t intercept $ic vs $ric")
      assert(math.abs(r2 - rr2) < 1e-4, s"$t r2 $r2 vs $rr2")
    }
  }

  test("q149 perplexities match a Scala LM brute force") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSeq
    val bg = docs.flatMap { case (id, lang, text) =>
      val tk = text.split(" ", -1).filter(_.nonEmpty)
      tk.zip(tk.drop(1)).map { case (a, b) => (id, lang, a, b) }
    }
    val c12 = bg.groupBy(t => (t._2, t._3, t._4)).map { case (k, g) =>
      k -> g.size.toLong }
    val c1 = c12.groupBy { case ((l, w1, _), _) => (l, w1) }
      .map { case (k, g) => k -> g.values.sum }
    val vsz = bg.flatMap(t => Seq((t._2, t._3), (t._2, t._4)))
      .distinct.groupBy(_._1).map { case (l, g) => l -> g.size.toLong }
    val lp = c12.map { case (k @ (l, w1, _), c) =>
      k -> round6(math.log((c + 1).toDouble / (c1((l, w1)) + vsz(l)))) }
    val ppl = bg.groupBy(t => (t._1, t._2)).toSeq.collect {
      case ((_, l), g) if g.nonEmpty =>
        val sum = g.map(t => BigDecimal(lp((t._2, t._3, t._4)))
                    .setScale(6)).sum
        l -> round6(math.exp(-sum.toDouble / g.size))
    }.toSeq
    val expected = ppl.groupBy(_._1).toSeq.map { case (l, g) =>
      val avg = round6(
        g.map(p => BigDecimal(p._2).setScale(6)).sum.toDouble / g.size)
      (l, g.size.toLong, avg, g.map(_._2).max)
    }.sortBy(_._1)
    val got = try q("q149_bigram_lm")
        .as[(String, Long, Double, Double)].collect().toSeq
      finally PinScope.drain()
    assert(got == expected)
  }

  test("q150 overlap matrix matches a Scala brute force") {
    val ut = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .as[(Long, String)].collect().toSeq
    val byType = ut.groupBy(_._2).map { case (t, g) =>
      t -> g.map(_._1).toSet }
    val types = byType.keys.toSeq.sorted
    val expected = (for {
      a <- types; b <- types if a < b
      both = (byType(a) & byType(b)).size if both > 0
    } yield (a, b, byType(a).size.toLong, byType(b).size.toLong,
             both.toLong,
             round6(both.toDouble /
                    (byType(a).size + byType(b).size - both))))
      .sortBy(t => (t._1, t._2))
    val got = try q("q150_overlap_matrix")
        .as[(String, String, Long, Long, Long, Double)].collect().toSeq
      finally PinScope.drain()
    assert(got == expected)
  }

  test("q152 merged-artifact matrix equals q140's single-scan matrix") {
    // artifact invisibility, asserted against the in-repo q140 as well
    // as the SQL oracle: same pairs, same 6-dp correlations
    val got = q("q152_moments_daily_union")
      .as[(String, Double)].collect().toSeq.sortBy(_._1)
    val full = q("q140_corr_matrix")
      .as[(String, Double)].collect().toSeq.sortBy(_._1)
    assert(got == full)
  }

  test("q152 plan scans the artifact plus ONE fact slice") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q152_moments_daily_union")(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val p = plan.toString
      assert(p.contains("graft_momidx"),
             s"q152 does not scan the moment artifact:\n$p")
      // lineitem appears exactly twice: the last-day slice + the 1-row
      // max-day subquery — never a third scan recomputing history
      val factScans = plan.collectWithSubqueries {
        case sc: FileSourceScanExec
          if sc.toString.contains("lineitem.parquet") => sc }
      assert(factScans.length == 2,
             s"expected batch-slice + max-day scans, got ${factScans.length}:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q153 burst flags match a Scala brute force") {
    val cells = Tables(spark, sf, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")))
      .as[(String, java.sql.Timestamp)].collect().toSeq
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val expected = cells.groupBy(_._1._1).toSeq.flatMap { case (t, g) =>
      val hrs = g.toSeq.map { case ((_, hr), c) => (hr, c) }
        .sortBy(_._1.getTime)
      hrs.indices.collect {
        case i if i >= 24 =>
          val trail = hrs.slice(i - 24, i).map(_._2).sum
          (t, hrs(i)._1, hrs(i)._2, trail)
      }.collect { case (tt, hr, cnt, trail) if cnt * 16 > trail =>
        (tt, hr, cnt, trail, round6(cnt * 24.0 / trail))
      }
    }.sortBy(r => (r._1, r._2.getTime))
    val got = q("q153_burst_flags")
      .as[(String, java.sql.Timestamp, Long, Long, Double)]
      .collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "no bursts at sf0.001 — screen untested")
  }

  test("q154 histogram shares are consistent and cover every row") {
    val got = q("q154_value_histogram")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    val totals = Tables(spark, sf, "events")
      .groupBy("event_type").agg(count(lit(1)))
      .as[(String, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (t, bins) =>
      assert(bins.map(_._3).sum == totals(t), s"$t: counts wrong")
      assert(bins.maxBy(_._2)._5 == 1.0, s"$t: last cum_share != 1")
      assert(bins.forall(b => b._2 >= 0 && b._2 <= 19))
    }
  }

  test("q155 conversion lags match a Scala brute force") {
    val ev = Tables(spark, sf, "events")
      .where(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"),
              expr("unix_micros(ts)"))
      .as[(Long, String, Long)].collect().toSeq
    val lags = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val vs = g.collect { case (_, "view", us) => us }
      val ps = g.collect { case (_, "purchase", us) => us }
      for (v <- vs.minOption; p <- ps.minOption if p > v)
        yield (p - v) / 1000000L
    }.sorted
    val n = lags.length
    def at(qq: Double): Double = {
      val h = (n - 1).toDouble * qq
      val lo = lags(math.floor(h).toInt)
      val hi = lags(math.min(n - 1, math.floor(h).toInt + 1))
      round6(lo + (h - math.floor(h)) * (hi - lo) / 1.0)
    }
    val expected = Seq(("p50", n.toLong, at(0.5)),
                       ("p90", n.toLong, at(0.9)),
                       ("p99", n.toLong, at(0.99)))
    val got = try q("q155_conversion_lag")
        .as[(String, Long, Double)].collect().toSeq
      finally PinScope.drain()
    assert(got == expected)
  }

  test("q156 attribution matches a Scala brute force") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)"),
              col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSeq
    val att = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      var src: String = null
      g.sortBy(e => (e._3, e._2)).flatMap { case (u, _, _, t) =>
        val out = if (t == "purchase")
          Some((Option(src).getOrElse("none"), u)) else None
        if (t != "purchase") src = t
        out
      }
    }
    val byType = att.groupBy(_._1)
    val total = att.size
    val expected = byType.toSeq.map { case (t, g) =>
      (t, g.size.toLong, g.map(_._2).distinct.size.toLong,
       round6(g.size.toDouble / total))
    }.sortBy(_._1)
    val got = q("q156_attribution")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("q157 churn screen matches a Scala brute force") {
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"), col("user_id"),
              datediff(to_date(col("ts")), lit("1970-01-01")))
      .as[(String, Long, Int)].collect().toSeq
    val end = ev.map(_._3).max
    val expected = ev.groupBy(e => (e._1, e._2)).toSeq
      .map { case ((t, _), g) => (t, end - g.map(_._3).max > 7) }
      .groupBy(_._1).toSeq.map { case (t, g) =>
        val quiet = g.count(_._2).toLong
        (t, g.size.toLong, quiet, round6(quiet.toDouble / g.size))
      }.sortBy(_._1)
    val got = q("q157_churn_screen")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._3).sum > 0, "no quiet users — screen untested")
  }

  test("q158 top shares match a Scala brute force") {
    val rows = Tables(spark, sf, "orders")
      .select(col("o_orderpriority"),
              round(col("o_totalprice") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (p, g) =>
      val vs = g.map(_._2).sorted(Ordering[Long].reverse)
      val total = vs.map(BigDecimal(_)).sum
      Seq(("top1", 100L), ("top10", 10L)).map { case (l, den) =>
        val k = (vs.length + den - 1) / den
        val top = vs.take(k.toInt).map(BigDecimal(_)).sum
        (p, l, vs.length.toLong, k,
         round6(top.toDouble / total.toDouble))
      }
    }.sortBy(t => (t._1, t._2))
    val got = try q("q158_top_share")
        .as[(String, String, Long, Long, Double)].collect().toSeq
      finally PinScope.drain()
    assert(got == expected)
  }

  test("q159 A/B readout matches a Scala brute force") {
    val rows = Tables(spark, sf, "events")
      .select(col("user_id"),
        substring(md5(col("user_id").cast("string")), 1, 1) <= "7",
        col("event_type") === "purchase" && col("value") > 150,
        when(col("event_type") === "purchase",
             round(col("value") * 100).cast("long")).otherwise(0L))
      .as[(Long, Boolean, Boolean, Long)].collect().toSeq
    val perUser = rows.groupBy(_._1).toSeq.map { case (_, g) =>
      (g.head._2, g.exists(_._3), g.map(_._4).sum)
    }
    def stats(ctrl: Boolean) = {
      val a = perUser.filter(_._1 == ctrl)
      (a.size.toLong, a.count(_._2).toLong,
       a.map(r => BigInt(r._3)).sum,
       a.map(r => BigInt(r._3) * BigInt(r._3)).sum)
    }
    val (nc, xc, s1c, s2c) = stats(true)
    val (nt, xt, s1t, s2t) = stats(false)
    val (pc, pt) = (xc.toDouble / nc, xt.toDouble / nt)
    val pp = (xc + xt).toDouble / (nc + nt)
    val (mc, mt) = (s1c.toDouble / nc, s1t.toDouble / nt)
    val vc = (s2c.toDouble - s1c.toDouble * s1c.toDouble / nc) / (nc - 1)
    val vt = (s2t.toDouble - s1t.toDouble * s1t.toDouble / nt) / (nt - 1)
    val z = (pt - pc) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / nc + 1.0 / nt))
    val t = (mt - mc) / math.sqrt(vc / nc + vt / nt)
    val expected = (nc, nt, xc, xt, round6(pc), round6(pt),
                    round6(z), round6(t))
    val got = q("q159_ab_test")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(got == expected)
    assert(xc > 0 && xc < nc && xt > 0 && xt < nt,
           "degenerate conversion — z untested")
  }

  test("q160 RFM segments match a Scala brute force") {
    val rows = Tables(spark, sf, "orders")
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")),
        round(col("o_totalprice") * 100).cast("long"))
      .as[(Long, Int, Long)].collect().toSeq
    val end = rows.map(_._2).max
    val pc = rows.groupBy(_._1).toSeq.map { case (c, g) =>
      (c, (end - g.map(_._2).max).toLong, g.size.toLong, g.map(_._3).sum)
    }
    def scores(vs: Seq[Long]): Map[Long, Long] = {
      val n = vs.size.toLong
      var cum = 0L
      vs.groupBy(identity).toSeq.sortBy(_._1).map { case (v, g) =>
        cum += g.size; v -> ((4 * cum + n - 1) / n)
      }.toMap
    }
    val (rs, fs, ms) =
      (scores(pc.map(_._2)), scores(pc.map(_._3)), scores(pc.map(_._4)))
    val seg = pc.map { case (_, r, f, m) =>
      val (a, b, c) = (rs(r), fs(f), ms(m))
      val label =
        if (a <= 2 && b >= 3 && c >= 3) "champion"
        else if (a <= 2 && c >= 3) "big_spender"
        else if (a >= 3 && b >= 3) "at_risk"
        else if (a >= 3) "hibernating" else "regular"
      (s"$a-$b-$c", label, m)
    }
    val expected = seg.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((sg, lb), g) =>
        (sg, lb, g.size.toLong,
         round6(g.map(x => BigDecimal(x._3)).sum.toDouble / g.size / 100.0))
      }.sortBy(_._1)
    val got = try q("q160_rfm_segments")
        .as[(String, String, Long, Double)].collect().toSeq
      finally PinScope.drain()
    assert(got == expected)
    assert(expected.map(_._2).distinct.size >= 3,
           "label CASE under-exercised")
  }

  test("q161 forecast screen matches a Scala brute force") {
    val rows = Tables(spark, sf, "events")
      .select(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")))
      .as[(String, Int)].collect().toSeq
    val cells = rows.groupBy(identity).map { case ((t, dy), g) =>
      (t, dy, g.size.toLong)
    }.toSeq
    val byTD = cells.map { case (t, dy, c) => (t, dy) -> c }.toMap
    val expected = cells.groupBy(_._1).toSeq.map { case (t, g) =>
      val triples = g.flatMap { case (_, dy, c) =>
        for (cp <- byTD.get((t, dy - 1)); cs <- byTD.get((t, dy - 7)))
          yield (c, cp, cs)
      }
      val es = triples.map(x => math.abs(x._1 - x._3)).sum
      val en = triples.map(x => math.abs(x._1 - x._2)).sum
      (t, triples.size.toLong, es, en,
       if (en > 0) Some(round6(es.toDouble / en.toDouble)) else None)
    }.sortBy(_._1)
    val got = q("q161_forecast_screen")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == expected)
    assert(expected.exists(_._2 > 0), "no lag-complete days — untested")
  }

  test("q183 conserves exactly 1e6 micro-credits per purchase") {
    // the integer-remainder design's whole point: credit is auditable
    // to the unit — Σ credit_micros ≡ 1 000 000 × purchases, with the
    // 'none' bucket absorbing touchless purchases
    val purchases = Tables(spark, sf, "events")
      .where(col("event_type") === "purchase").count()
    val credited = q("q183_attribution_linear")
      .agg(sum("credit_micros")).as[Long].head()
    assert(credited == 1000000L * purchases,
           s"credited $credited != 1e6 x $purchases purchases")
  }

  test("q184 weighted median matches a Scala brute force") {
    val rows = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"),
              round(col("l_extendedprice") * 100).cast("long"),
              round(col("l_quantity") * 100).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.map { case (f, g) =>
      val tot = g.map(_._3).sum
      val byV = g.groupBy(_._2).toSeq.map { case (v, r) =>
        (v, r.map(_._3).sum) }.sortBy(_._1)
      var cum = 0L
      val med = byV.collectFirst {
        case (v, w) if { cum += w; 2 * cum >= tot } => v }.get
      (f, med, tot)
    }.sortBy(_._1)
    val got = q("q184_weighted_median")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q208 hash-Poisson weights average ~1 and the CI brackets the point") {
    // the /256ths pmf quantization must keep E[w] ≈ 1 (exact pmf mean
    // = (94·0+94·1+47·2+16·3+4·4+1·5)/256 = 257/256 ≈ 1.004) — check
    // the md5-byte draw empirically over a fixed key grid
    val md = java.security.MessageDigest.getInstance("MD5")
    val draws = for (k <- 1 to 2000; r <- 0 until 32) yield {
      val b = md.digest(s"$k#$r".getBytes("UTF-8"))(0) & 0xff
      if (b < 0x5e) 0 else if (b < 0xbc) 1 else if (b < 0xeb) 2
      else if (b < 0xfb) 3 else if (b < 0xff) 4 else 5
    }
    val mean = draws.sum.toDouble / draws.size
    assert(mean > 0.95 && mean < 1.06, s"weight mean $mean")
    val row = q("q208_bootstrap_ci").collect().head
    val (point, lo, med, hi) = (row.getDouble(0), row.getDouble(1),
                                row.getDouble(2), row.getDouble(3))
    assert(lo <= med && med <= hi, s"order: $lo $med $hi")
    assert(lo <= point && point <= hi,
           s"32-replicate envelope should bracket the point: $lo $point $hi")
  }

  test("q209 per-half decile sizes are balanced by the rank formula") {
    // ((rank-1)*10) div n puts ⌊n/10⌋ or ⌈n/10⌉ customers in every
    // decile — check both marginals of the migration matrix
    val m = q("q209_decile_migration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((col, name) <- Seq((m.groupBy(_._1), "h1"), (m.groupBy(_._2), "h2"))) {
      val sizes = col.filter { case (k, _) => k >= 0 }
        .map(_._2.map(_._3).sum).toSeq
      assert(sizes.size == 10, s"$name deciles: ${sizes.size}")
      assert(sizes.max - sizes.min <= 1, s"$name imbalance: $sizes")
    }
  }

  test("q211 totals are consistent and the report is non-vacuous") {
    val rows = q("q211_dup_rate_by_source").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables(spark, sf, "documents").count()
    assert(rows.map(_._1).sum == docs)
    rows.foreach { case (d, c, red) =>
      assert(red <= c && c <= d, s"ordering violated: $d $c $red") }
    assert(rows.map(_._3).sum > 0, "no redundant docs anywhere — vacuous")
  }

  test("q212 shares close at 1.0 and its token total equals q101's") {
    val rows = q("q212_token_budget").collect()
    val cum = rows.map(_.getDouble(5)).max
    assert(math.abs(cum - 1.0) < 1e-6, s"cum_share tops at $cum")
    val total212 = rows.map(_.getLong(3)).sum
    val total101 = q("q101_bpe_tokens").collect().map(_.getLong(3)).sum
    assert(total212 == total101,
           s"token budgets disagree: $total212 vs $total101")
  }

  test("q220 NB confusion matrix matches a Scala brute force") {
    // independent NB: same declared model (add-one over the global
    // vocab, 6-dp-rounded log-probs as exact decimals, closed-form
    // unseen mass, score-desc/class-asc argmax), Scala collections
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq
      .map { case (id, lang, t) =>
        (id, lang, t.split(" ", -1).toSeq.filter(_.nonEmpty)) }
    def lp6(x: Double): BigDecimal =
      BigDecimal(math.log(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val langs = docs.map(_._2).distinct.sorted
    val clt = docs.flatMap { case (_, l, ts) => ts.map((l, _)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cl = clt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vsz = docs.flatMap(_._3).distinct.size.toLong
    val prior = docs.groupBy(_._2).view
      .mapValues(g => lp6(g.size.toDouble / docs.size)).toMap
    // scored set = docs with ≥1 token (the query's nd derives from the
    // token stream); priors still count every document
    val expected = docs.filter(_._3.nonEmpty).map { case (_, lang, ts) =>
      val cnts = ts.groupBy(identity).view.mapValues(_.size.toLong)
      val pred = langs.map { m =>
        val score = prior(m) + cnts.map { case (tok, c) =>
          BigDecimal(c) * lp6((clt.getOrElse((m, tok), 0L) + 1).toDouble /
                              (cl(m) + vsz))
        }.sum
        (m, score)
      }.maxBy { case (m, sc) => (sc, langs.indexOf(m) * -1) }(
        Ordering.Tuple2(Ordering[BigDecimal], Ordering[Int]))._1
      (lang, pred)
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.map { case ((l, p), n) => (l, p, n) }.sortBy(t => (t._1, t._2))
    val got = try q("q220_nb_classifier")
        .as[(String, String, Long)].collect().toSeq
      finally PinScope.drain()
    assert(got == expected)
    val correct = got.filter(r => r._1 == r._2).map(_._3).sum
    assert(correct > 0L, "classifier never right — matrix vacuous")
  }

  test("q148/q151 returned plans read pinned blocks, not parquet") {
    // the pin is the scale guarantee: ONE fact scan (materialized at pin
    // time), every downstream order-statistic branch reads blocks — the
    // returned plan must contain no parquet scan at all
    for (name <- Seq("q148_mad_outliers", "q151_percentile_bands",
                     "q150_overlap_matrix")) {
      try {
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(!plan.contains("FileScan") && !plan.contains("ParquetScan"),
               s"$name replans the fact scan instead of reading the pin")
      } finally PinScope.drain()
    }
  }
}
