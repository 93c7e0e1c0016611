package graft
import org.apache.spark.sql.SparkSession

/** Round-14 scale sweep (BASELINE.md): the queries r14 touched, over
  * sf0.1 plus the 10×/100× VOLUME builds (`tools/make100x.py` growth
  * model). Protocol as SweepR9–R13: local[32], each query run twice
  * per dir — the FIRST run (cold: code + artifact builds) and the
  * SECOND run (warm probe) are BOTH printed this round, because the
  * round's theme is artifact tiers and the honest line needs the
  * build cost next to the probe cost. Targets:
  *
  *  - q339 vs q311: the incremental SemDeDup artifact tier vs the
  *    full re-fit (the r13 verdict's #1 — q311's 377.8 s @100×);
  *  - q340 vs q300: the persisted Hamming band index vs the
  *    full-rescan attestation tier (verdict #3 — 52.8 s @100×);
  *  - q227/q341: the persisted minimizer signature index (verdict #4
  *    — q227 re-derived candidates at 38.8 s @100×);
  *  - q342 vs q329: the IVF-built persisted graph + the de-funneled
  *    backbone rank (verdict #2);
  *  - q270/q273/q275: the GlobalOrder bucket-rank reshapes;
  *  - q280: one more reading before the floor is recorded
  *    (verdict #6).
  *
  * Mode "x100" sweeps /tmp/sf100x; default sweeps /tmp/sf10x13.
  * Remaining args subset the query list. */
object SweepR14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq(
      "q311_semdedup", "q339_semdedup_incremental",
      "q300_simhash_hamming", "q340_hamming_incremental",
      "q227_minimizer_pairs", "q341_minimizer_incremental",
      "q329_ann_beam", "q342_ann_graph_beam",
      "q270_sorted_neighborhood", "q273_propensity_match",
      "q275_fellegi_sunter", "q280_zorder_skipping",
      "q343_nn_descent", "q344_graph_recall",
      "q345_stream_semdedup", "q346_bpe_apply",
      "q347_pipeline_prep_v4")
    val x100 = args.headOption.contains("x100")
    val rest = if (x100) args.tail else args
    val sel = if (rest.isEmpty) qs else qs.filter(rest.contains)
    val alt = if (x100) "/tmp/sf100x" else "/tmp/sf10x13"
    for (d <- Seq("/root/testdata/sf0.1", alt)) {
      spark.read.parquet(s"$d/nation.parquet").count()
      for (q <- sel) {
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
