package graft

/** Every declared query runs at sf0.001, yields a sane schema, and the
  * flagship entry returns rows (the driver's t1 smoke condition). */
class OperatorSmokeSpec extends SparkSpecBase {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an id and every oracle has a query") {
    assert(SparkEntry.queries.nonEmpty)
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("only the six documented ◐ queries lack an oracle") {
    // the correctness contract (SURVEY.md §2): every declared query is
    // DuckDB-oracled except the approx sketches (never hash-match by
    // nature — q110's/q128's/q164's DataSketches binary images
    // included) and the layout-dependent seeded sample
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled ==
             Set("q21_agg_approx", "q68_sample", "q77_agg_approx_pct",
                 "q110_hll_daily_union", "q128_kll_daily_union",
                 "q164_stream_sketch_union"),
           s"undeclared oracle gap: $unoracled")
  }

  test("every declared query appears in SURVEY §2 (the correctness contract)") {
    // SURVEY §2 "IS the correctness contract": a query landing in the
    // registry without a §2 row is contract drift (it happened in r6 —
    // q90-q95 shipped green but undeclared). Parse the §2 section and
    // require every registry key to appear in it.
    val f = Seq("SURVEY.md", "../SURVEY.md", "/root/repo/SURVEY.md")
      .map(new java.io.File(_)).find(_.exists())
    assert(f.isDefined, "SURVEY.md not found from test working directory")
    val src = scala.io.Source.fromFile(f.get, "UTF-8")
    val text = try src.mkString finally src.close()
    val (s2start, s2end) = (text.indexOf("## §2"), text.indexOf("## §3"))
    assert(s2start >= 0 && s2end > s2start, "SURVEY §2/§3 headings missing")
    val s2 = text.substring(s2start, s2end)
    val undeclared = SparkEntry.queries.keySet.filterNot(s2.contains)
    assert(undeclared.isEmpty,
           s"queries missing from SURVEY §2 (contract drift): $undeclared")
    // the footnote's declared total must track the registry too — the
    // r8 verdict caught "103 rows → 101 queries" two rounds stale:
    // membership was guarded but the prose count was not
    val total = """(\d+) `SparkEntry.queries` entries""".r
      .findFirstMatchIn(s2)
    assert(total.isDefined, "SURVEY §2 footnote query total not found")
    assert(total.get.group(1).toInt == SparkEntry.queries.size,
           s"SURVEY §2 footnote says ${total.get.group(1)} queries, " +
             s"registry has ${SparkEntry.queries.size} — footnote stale")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      try {
        val df = fn(spark, sf)
        assert(df.schema.fieldNames.nonEmpty)
        assert(df.count() >= 0)
      } finally PinScope.drain() // release pins AFTER the consume
    }
  }
}
