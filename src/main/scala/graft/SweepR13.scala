package graft
import org.apache.spark.sql.SparkSession

/** Round-13 scale sweep (BASELINE.md): the queries r13 touched, over
  * sf0.1 plus the 10×/100× VOLUME builds (`tools/make100x.py` growth
  * model — unique fact rows, dims unchanged). Protocol as SweepR9–R12:
  * local[32], each query run twice per dir with the second run timed
  * (first run warms code + any persisted artifacts). Targets:
  *
  *  - q13 vs q223: the r12 verdict's #3 — the custom AsOfJoinExec's
  *    O(1) merge state vs the window form, measured at volume;
  *  - q96/q103: the winnowed minimizer tier vs r12's 112 s @100× line;
  *  - q292: the two-phase histogram median vs the 5.3 s global sort;
  *  - q280: the split-branch layout attestation vs the 46 s line;
  *  - q227: the map-side minimizer selection (window passes removed);
  *  - q297/q298: the new rows' first scale readings.
  *
  * Mode "x100" sweeps /tmp/sf100x; default sweeps /tmp/sf10x13.
  * Remaining args subset the query list. */
object SweepR13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q13_join_asof", "q223_asof_exec",
      "q96_decontaminate_exact", "q103_decontaminate_exact_incr",
      "q227_minimizer_pairs", "q280_zorder_skipping", "q292_theil_sen",
      "q297_pca_topk", "q298_stream_cdc_snapshot", "q299_bpe_train",
      "q300_simhash_hamming", "q301_ppl_filter",
      // second r13 wave
      "q302_pipeline_prep_v3", "q303_match_recognize",
      "q304_ridge_regression", "q305_phash_dedup", "q306_dsir_weights",
      "q307_holt_forecast", "q308_gbt_stumps",
      // third r13 wave
      "q309_kneser_ney", "q310_logreg_quality", "q311_semdedup",
      "q312_kruskal_wallis", "q313_adamic_adar", "q314_audio_fingerprint",
      "q315_doremi_mixture", "q316_holt_winters", "q317_stream_topk",
      // fourth r13 wave
      "q318_uplift_stump", "q319_fs_em", "q320_conformal",
      "q321_sequential_ab", "q322_mmr_rerank", "q323_cms_artifact",
      "q324_setsim_prefix", "q325_als_user_step", "q326_cox_hazard",
      "q327_dp_release", "q328_kcore", "q329_ann_beam",
      "q330_stream_pit_enrich", "q331_knn_join", "q332_matrix_profile", "q333_hard_negatives", "q334_knn_index", "q335_snapshot_branch", "q336_branch_merge", "q337_stl_lite", "q338_lsh_recall")
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
          consume(); PinScope.drain()
          val t0 = System.nanoTime()
          consume()
          val dt = (System.nanoTime() - t0) / 1e9
          val n = SparkEntry.queries(q)(spark, d).count()
          println(f"SWEEP $d $q $dt%.2f s ($n rows)")
        } catch {
          case e: Throwable =>
            println(s"SWEEP $d $q FAILED: ${e.getMessage}")
        } finally PinScope.drain()
      }
    }
    spark.stop()
  }
}
