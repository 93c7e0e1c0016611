package graft
import org.apache.spark.sql.SparkSession

/** Round-12 10× scale sweep (BASELINE.md): the r12 query family over
  * /tmp/sf10x12 — built by `tools/make100x.py <sf0.1> /tmp/sf10x12 10`,
  * i.e. the r11 VOLUME growth model at 10× (unique fact rows: shifted
  * keys, tag-token documents, perturbed embeddings; dims unchanged)
  * rather than the r9/r10 exact-clone duplication stress. Protocol as
  * SweepR9–R11: local[32], each query run twice per dir with the
  * second run timed (first run warms code + any artifacts). */
object SweepR12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q170_join_lateral", "q171_subquery_scalar",
      "q172_interval_union", "q173_skyline", "q174_pit_join",
      "q175_bm25", "q176_cumulative_distinct", "q177_cusum_change",
      "q178_sparse_matmul", "q179_freq_bins", "q180_join_nearest",
      "q181_agg_mode", "q182_label_prop", "q183_attribution_linear",
      "q184_weighted_median", "q185_funnel_windowed", "q186_wow_growth",
      "q187_bm25_index", "q188_bm25_incremental", "q189_media_shards",
      "q190_gap_screen", "q191_path_trigrams", "q192_winsorized_mean",
      "q193_key_skew", "q194_behavior_signatures", "q195_topk_ties",
      "q196_journey_strings", "q197_bounce_rate", "q198_order_aging",
      "q199_pareto_curve", "q200_abandonment", "q201_covisitation",
      "q202_clamped_ledger", "q203_fd_audit", "q204_pit_features",
      "q205_share_hierarchy", "q206_audience_artifact",
      "q207_semi_additive", "q208_bootstrap_ci", "q209_decile_migration",
      "q210_fulfillment_sla", "q211_dup_rate_by_source",
      "q212_token_budget", "q213_incremental_audience", "q214_ann_recall",
      "q215_join_size_report", "q216_ltv_curve", "q217_bfs_recursive",
      "q218_dedup_threshold_sweep", "q219_substring_dup",
      "q220_nb_classifier", "q221_bitmap_audience", "q222_kmeans_loop",
      "q223_asof_exec", "q224_vocab_coverage", "q225_twap",
      "q226_group_split", "q227_minimizer_pairs", "q228_textrank",
      "q229_auc_rank", "q230_target_encoding", "q231_mutual_info",
      "q232_kendall_tau", "q233_ewma_spikes", "q234_basket_rules",
      "q235_variant_shred", "q236_feature_hash", "q237_km_survival",
      "q238_reciprocal_match", "q239_quantile_norm",
      "q240_class_balance", "q241_containment_dedup", "q242_gram_novelty",
      "q243_pmi_pairs", "q244_table_checksum", "q245_join_size_pk",
      "q246_novelty_incremental", "q247_mann_whitney", "q248_logrank",
      "q249_spearman", "q250_lead_lag", "q251_anova", "q252_cuped",
      "q253_avg_precision", "q254_bh_fdr", "q255_elasticity",
      "q256_seasonal_index", "q257_attribution_decay",
      "q258_forecast_backtest", "q259_readability", "q260_zipf_fit",
      "q261_template_shingles", "q262_source_mirror", "q263_cmh_test",
      "q264_power_analysis", "q265_neg_sampling", "q266_crossval_nb",
      "q267_stream_alert", "q268_stats_artifact", "q269_item_knn",
      "q270_sorted_neighborhood", "q271_diff_in_diff",
      "q272_isotonic_calibration", "q273_propensity_match",
      "q274_shapley_attribution", "q275_fellegi_sunter",
      "q276_esd_outliers", "q277_seq_2patterns", "q278_dbscan_grid",
      "q279_markov_attribution", "q280_zorder_skipping",
      "q281_stratified_split", "q282_filter_funnel", "q283_embed_drift",
      "q284_assortativity", "q285_stream_cdc_apply", "q286_mcnemar",
      "q287_cohens_kappa", "q288_ece", "q289_spatial_join",
      "q290_ips_offline_eval", "q291_acf", "q292_theil_sen",
      "q293_k_anonymity", "q294_best_split", "q295_pca_power",
      "q296_pc1_source_drift")
    // mode "x100": sweep against the 100x volume build at /tmp/sf100x
    // (tools/make100x.py defaults) instead of the 10x point — the r11
    // protocol asked at two orders. Remaining args subset the list.
    val x100 = args.headOption.contains("x100")
    val rest = if (x100) args.tail else args
    val sel = if (rest.isEmpty) qs else qs.filter(rest.contains)
    val alt = if (x100) "/tmp/sf100x" else "/tmp/sf10x12"
    for (d <- Seq("/root/testdata/sf0.1", alt)) {
      spark.read.parquet(s"$d/nation.parquet").count()
      for (q <- sel) {
        // consume via the noop sink (Bench's r12 protocol fix): count()
        // lets the optimizer prune aggregate expressions / final
        // projections, timing only the row-count skeleton
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
