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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.schema.fieldNames.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
