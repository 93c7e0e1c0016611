package graft
import org.apache.spark.sql.SparkSession

/** Round-16 scale sweep (BASELINE.md): the round's new declared
  * operators over the three volumes (SweepR14/R15's protocol —
  * local[32], cold = first consumption including artifact builds,
  * warm = second consumption, row count after the timed region).
  *
  * What the rows must show (the r15 verdict's done-conditions):
  *  - q356 (the √n-cell ONLINE gate) well under q345's measured
  *    16-cell floor (59.2 s @100×, 0.56 ms/arrival);
  *  - q358 keeping q354's near-flat line at the ARTIFACT tier (the
  *    probe reads the terms' buckets, so the warm line should track
  *    the postings-list size, not the corpus);
  *  - q360 one token-linear pass (the two gram aggregations are the
  *    only volume terms);
  *  - q344 at the exact-pass cost now that tiers are READ from the
  *    promoted version log instead of re-running descent + insert
  *    (was 49.8 s @100× in r15);
  *  - q361/q362/q357/q359 priced for the record.
  */
object SweepR16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("capcheck")) {
      // the r15 verdict's #6 at VOLUME: under the √n-cell model no
      // cell may approach SemDedupClusterCap — print the max cell
      // occupancy of the persisted model at each swept volume
      for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf10x13", "/tmp/sf100x")) {
        val t = operators.SimilarityExtOps.semDedupSqrtIndexTable(spark, d)
        import org.apache.spark.sql.functions._
        // cells counts the MODEL's 'c' rows (a centroid that wins no
        // assignment must still count toward k, or the census would
        // under-report the declared cell count)
        val r = spark.table(t).where(col("kind") === "m")
          .groupBy("cid").count()
          .agg(max("count").as("mx")).collect()(0)
        val k = spark.table(t).where(col("kind") === "c").count()
        println(s"SWEEP $d sqrt_gate_cap max_cell=${r.getLong(0)} " +
                s"cells=$k cap=" +
                s"${operators.SimilarityExtOps.SemDedupClusterCap}")
      }
      spark.stop(); return
    }
    val qs = Seq(
      "q356_stream_semdedup_sqrt", "q357_graph_promote",
      "q358_phrase_index", "q359_phrase_incremental",
      "q360_gopher_rules", "q361_temperature_mixture",
      "q362_index_config", "q364_pipeline_prep_v5",
      "q365_sequence_packing", "q366_graph_vacuum",
      "q367_semdedup_capaware", "q368_pack_manifest",
      "q344_graph_recall", "q345_stream_semdedup",
      "q352_mrl_recall", "q354_phrase_search")
    val dirs0 = Seq("/root/testdata/sf0.1", "/tmp/sf10x13", "/tmp/sf100x")
    val dirs = if (args.exists(_.startsWith("/"))) args.filter(_.startsWith("/")).toSeq else dirs0
    val rest = args.filterNot(_.startsWith("/"))
    val sel = if (rest.isEmpty) qs else qs.filter(rest.contains)
    val unknown = rest.filterNot(qs.contains)
    require(unknown.isEmpty && (rest.isEmpty || sel.nonEmpty),
      s"unknown query name(s): ${unknown.mkString(", ")} — a mistyped " +
        "arg must fail loudly, not run an empty sweep")
    for (d <- dirs) {
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
