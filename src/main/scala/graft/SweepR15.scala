package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-15 scale sweep (BASELINE.md): the r14 verdict's #1 — the
  * incremental artifact tiers' O(batch) claim was only ever measured
  * at the declared batch=½-corpus geometry, where q340's probe
  * (51.0 s @100×) LOSES to q300's full rescan (45.1 s). This sweep
  * measures each probe at three batch fractions — 1/2 (the declared
  * query), 1/10, and 1/100 (the realistic daily-intake ratio) — by
  * threading a `batchMod` knob through the factored probe bodies
  * (batch = ids ≡ 1 mod batchMod, always a subset of the odd half, so
  * the standing indexes stay authoritative and untouched). Done =
  * probe cost ∝ batch fraction, or a recorded explanation for any
  * term that is not.
  *
  * Protocol as SweepR9–R14: local[32], each (probe, fraction) run
  * twice per dir — first run prints as cold (includes artifact builds
  * on the first probe of a dir), second as the warm reading. Also
  * sweeps q351's convergence loop and q350's declared insert (the
  * round's new graph tiers) at the default fraction.
  *
  * Mode "x100" sweeps /tmp/sf100x; mode "ops" sweeps the round's six
  * new declared operators (q348–q353) over sf0.1 + /tmp/sf10x13 +
  * /tmp/sf100x (SweepR14's protocol); default sweeps sf0.1 only.
  * Remaining args subset the probe/query list. */
object SweepR15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("ops")) { opsSweep(spark, args.tail); return }
    if (args.headOption.contains("cells")) { cellsSweep(spark); return }
    val probes: Seq[(String, (SparkSession, String, Int) => DataFrame)] =
      Seq(
        "semdedup_probe" -> ((s, d, m) =>
          operators.SimilarityExtOps.semDedupIncParts(s, d, m)._3),
        "hamming_probe" -> ((s, d, m) =>
          operators.DedupExtOps.hammingIncPairs(s, d, m)),
        "minimizer_probe" -> ((s, d, m) =>
          operators.DedupExtOps.minimizerIncPairs(s, d, m)),
        "graph_insert" -> ((s, d, m) =>
          operators.SimilarityExtOps.graphInsertEdges(s, d, m)),
        "pipeline_v4" -> ((s, d, m) =>
          operators.TextExtOps.pipelineV4Report(s, d, m)))
    val x100 = args.headOption.contains("x100")
    val rest = if (x100) args.tail else args
    val sel = if (rest.isEmpty) probes
              else probes.filter(p => rest.contains(p._1))
    val dirs = if (x100) Seq("/tmp/sf100x") else Seq("/root/testdata/sf0.1")
    for (d <- dirs) {
      spark.read.parquet(s"$d/nation.parquet").count()
      for ((name, f) <- sel; m <- Seq(2, 10, 100)) {
        // SweepR14's protocol verbatim: the timed region is ONE noop
        // consumption of the frame; the row count runs after (an r15
        // first cut counted inside the window and double-ran every
        // un-pinned probe, reading ~2x the r14 lines)
        def consume(): Unit =
          f(spark, d, m).write.format("noop").mode("overwrite").save()
        try {
          val c0 = System.nanoTime()
          consume(); PinScope.drain()
          val cold = (System.nanoTime() - c0) / 1e9
          val t0 = System.nanoTime()
          consume()
          val dt = (System.nanoTime() - t0) / 1e9
          val n = f(spark, d, m).count()
          println(f"SWEEP $d $name@1/$m $dt%.2f s (cold $cold%.2f s, $n rows)")
        } catch {
          case e: Throwable =>
            println(s"SWEEP $d $name@1/$m FAILED: ${e.getMessage}")
        } finally PinScope.drain()
      }
      // the round's new declared graph tiers at their declared geometry
      for (q <- Seq("q350_graph_insert", "q351_descent_converge")) {
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

  /** The q345-floor LEVER measured (BASELINE's "cells ∝ √n shrinks
    * every gate rectangle"): the semantic gate's arrival×member pair
    * pass at 16 cells (the declared model) vs √n cells, at 100×
    * volume (200k vectors → √n ≈ 448). Warm (cold) + the rectangle
    * census each probe returns. */
  private def cellsSweep(spark: SparkSession): Unit = {
    val d = "/tmp/sf100x"
    spark.read.parquet(s"$d/nation.parquet").count()
    for (k <- Seq(16, 448)) {
      def probe() = operators.SimilarityExtOps.gateRectangleProbe(spark, d, k)
      try {
        val c0 = System.nanoTime()
        probe().write.format("noop").mode("overwrite").save()
        val cold = (System.nanoTime() - c0) / 1e9
        val t0 = System.nanoTime()
        probe().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val r = probe().collect()(0)
        println(f"SWEEP $d gate_rectangles@k=$k $dt%.2f s (cold $cold%.2f s, " +
                s"pair_rows=${r.getLong(1)} dups=${r.getLong(2)})")
      } catch {
        case e: Throwable =>
          println(s"SWEEP $d gate_rectangles@k=$k FAILED: ${e.getMessage}")
      } finally PinScope.drain()
    }
    spark.stop()
  }

  /** The round's new declared operators over the three volumes. */
  private def opsSweep(spark: SparkSession, rest: Array[String]): Unit = {
    val qs = Seq(
      "q348_langid_train", "q349_span_excise", "q350_graph_insert",
      "q351_descent_converge", "q352_mrl_recall", "q353_sq8_recall",
      "q354_phrase_search", "q355_semdedup_cells",
      "q344_graph_recall", "q345_stream_semdedup")
    val sel = if (rest.isEmpty) qs else qs.filter(rest.contains)
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf10x13", "/tmp/sf100x")) {
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
