package graft
import org.apache.spark.sql.SparkSession

/** Round-10 10× scale sweep (BASELINE.md): the r10 query family over
  * /tmp/sf10x10b — orders and events cloned 10× with SHIFTED keys
  * (key-uniqueness is part of q119/q123's semantics; a raw clone would
  * change the operator, not just the volume), documents/embeddings
  * reusing the r9 exact-clone tables. Protocol as SweepR9: second run
  * timed (artifact builds land in run 1, by declared artifact
  * semantics). */
object SweepR10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q113_funnel", "q118_anomaly_flags", "q119_merge_apply",
      "q120_decontaminate_semantic", "q121_bpe_dict",
      "q122_stream_file_sink", "q123_scd2_history",
      "q124_compact_layout", "q125_kmeans_step", "q126_gdpr_cascade",
      "q127_rrf_fusion", "q128_kll_daily_union", "q129_token_lift",
      "q130_session_paths", "q131_rollup_incremental", "q132_triangles",
      "q133_ngram_freq", "q134_typo_pairs", "q135_rolling_dau",
      "q136_time_travel", "q137_benford", "q138_bfs_layers",
      "q139_max_concurrency", "q140_corr_matrix", "q141_ks_test",
      "q142_token_entropy", "q143_weighted_sample",
      "q144_chi2_independence", "q145_psi_drift", "q146_gini",
      "q147_trend_regression", "q148_mad_outliers", "q149_bigram_lm",
      "q150_overlap_matrix", "q151_percentile_bands",
      "q152_moments_daily_union", "q153_burst_flags",
      "q154_value_histogram", "q155_conversion_lag",
      "q156_attribution", "q157_churn_screen", "q158_top_share",
      "q159_ab_test", "q160_rfm_segments", "q161_forecast_screen")
    // optional args restrict the sweep to a subset (iteration speed);
    // the recorded BASELINE runs always name which subset ran
    val sel = if (args.isEmpty) qs else qs.filter(args.contains)
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf10x10b")) {
      spark.read.parquet(s"$d/nation.parquet").count()
      for (q <- sel) {
        // run twice, report the second (artifact builds land in run 1)
        SparkEntry.queries(q)(spark, d).count(); PinScope.drain()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, d).count()
        println(f"SWEEP $d $q ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
        PinScope.drain()
      }
    }
    spark.stop()
  }
}
