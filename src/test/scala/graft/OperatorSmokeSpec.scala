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

  test("only the three documented ◐ queries lack an oracle") {
    // the correctness contract (SURVEY.md §2): every declared query is
    // DuckDB-oracled except the approx sketches (never hash-match by
    // nature) and the layout-dependent seeded sample
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled ==
             Set("q21_agg_approx", "q68_sample", "q77_agg_approx_pct"),
           s"undeclared oracle gap: $unoracled")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.schema.fieldNames.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
