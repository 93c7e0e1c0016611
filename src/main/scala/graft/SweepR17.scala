package graft
import org.apache.spark.sql.SparkSession

/** Round-17 scale sweep (BASELINE.md): the round's new declared
  * operators over the three volumes (SweepR16's protocol — local[32],
  * cold = first consumption including artifact builds, warm = second
  * consumption, row count after the timed region).
  *
  * What the rows must show (the r16 verdict's done-conditions):
  *  - q369 (the two-level assigner at the FULL-corpus hybrid
  *    geometry) collapsing the measured 49.6 s @100× of flat argmin
  *    (the r16 q367 first-cut note) to the (1+R)·√k regime;
  *  - q370 pricing the certification pass (both assigners on the
  *    declared slice — the flat half dominates, by design);
  *  - the re-keyed q345 (two-level online gate) against q356's √n
  *    flat-gate line — same drain, assigner swapped;
  *  - q371/q372/q373/q374 priced for the record.
  */
object SweepR17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq(
      "q369_twolevel_assign", "q370_twolevel_recall",
      "q345_stream_semdedup", "q356_stream_semdedup_sqrt",
      "q371_stream_gate_admit", "q372_pack_manifest_log",
      "q373_epoch_mixture", "q374_kn3_gate", "q375_gate_rebuild",
      "q376_twolevel_bands", "q377_model_promote", "q378_packlog_vacuum",
      "q379_lm_order_census",
      "q367_semdedup_capaware", "q364_pipeline_prep_v5")
    val dirs0 = Seq("/root/testdata/sf0.1", "/tmp/sf10x13", "/tmp/sf100x")
    val dirs = if (args.exists(_.startsWith("/")))
                 args.filter(_.startsWith("/")).toSeq
               else dirs0
    val rest = args.filterNot(_.startsWith("/"))
    val sel = if (rest.isEmpty) qs else qs.filter(rest.contains)
    val unknown = rest.filterNot(qs.contains)
    require(unknown.isEmpty && (rest.isEmpty || sel.nonEmpty),
      s"unknown query name(s): ${unknown.mkString(", ")} — a mistyped " +
        "arg must fail loudly, not run an empty sweep")
    for (d <- dirs) {
      spark.read.parquet(s"$d/nation.parquet").count()
      for (q <- sel if SparkEntry.queries.contains(q)) {
        def consume(): Unit =
          SparkEntry.queries(q)(spark, d).write.format("noop")
            .mode("overwrite").save()
        try {
          val c0 = System.nanoTime()
          consume(); PinScope.drain()
          val cold = (System.nanoTime() - c0) / 1e9
          val t0 = System.nanoTime()
          consume()
          val dt = (System.nanoTime() - t0) / 1e9
          val n = SparkEntry.queries(q)(spark, d).count()
          println(f"SWEEP $d $q $dt%.2f s (cold $cold%.2f s, $n rows)")
        } catch {
          case e: Throwable =>
            println(s"SWEEP $d $q FAILED: ${e.getMessage}")
        } finally PinScope.drain()
      }
    }
    spark.stop()
  }
}
