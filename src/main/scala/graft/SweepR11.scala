package graft
import org.apache.spark.sql.SparkSession

/** Round-11 scale sweeps (BASELINE.md).
  *
  * Mode "q120prod" (default): the r10 verdict's #1 — measure q120's
  * PRODUCTION configuration so the one super-linear r10 sweep entry
  * becomes a measured point. The r10 sweep ran the declared workload
  * model (eval ∝ corpus × frozen 16-cell codebook ⇒ probed-members
  * product ∝ n²); production holds the eval suite at a FIXED release
  * size and scales IVF cells ∝ √n, making probe work ∝ evalCap·√n.
  * Protocol as SweepR9/R10: base = sf0.1, 10× = the r9 exact-clone
  * tables at /tmp/sf01x10; run twice, report the second (the per-cents
  * index artifact builds in run 1, by declared artifact semantics —
  * a codebook change is a reindex, amortized across every release
  * sweep that follows).
  *
  * Mode "x100": the r10 verdict's #2 — the 100× fact sweep over the
  * scale-critical operators. Data at /tmp/sf100x via tools/make100x.py
  * (facts 100×: 60 M lineitem / 15 M orders / 10 M events / 500 k
  * UNIQUE documents via interleaved tag tokens / 200 k perturbed
  * embeddings; dims unchanged). Unlike the r9 exact-clone 10× stress
  * (duplication-factor workload), this measures the VOLUME slope —
  * the "would it survive 100×" question asked directly. Same
  * run-twice/report-second protocol; remaining args subset the list.
  */
object SweepR11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val evalCap = 200 // the fixed "release eval suite" size
    def q120prod(d: String): Unit = {
      val n = spark.read.parquet(s"$d/embeddings.parquet").count()
      val cents = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
      def run() = operators.SimilarityExtOps
        .q120Production(spark, d, evalCap, cents).count()
      run() // run 1 builds the per-cents index artifact
      val t0 = System.nanoTime()
      val m = run()
      println(f"SWEEP $d q120prod n=$n cents=$cents cap=$evalCap " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($m rows)")
    }
    if (args.headOption.contains("x100")) {
      val qs = Seq( // cheap relational floors first, artifact families last
        "q14_agg_hash", "q05_join_inner4", "q38_win_session",
        "q91_pack_sequences", "q131_rollup_incremental",
        "q152_moments_daily_union", "q90_sorted_layout", "q94_tfidf",
        "q46_dedup_minhash", "q56_dedup_embedding", "q87_decontaminate",
        "q96_decontaminate_exact", "q82_dedup_clusters",
        "q108_clusters_incremental", "q115_pagerank",
        "q166_compact_incremental", "q167_snapshot_vacuum")
      val sel = if (args.length > 1) qs.filter(args.tail.contains) else qs
      for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf100x")) {
        spark.read.parquet(s"$d/nation.parquet").count()
        for (q <- sel) {
          try {
            SparkEntry.queries(q)(spark, d).count(); PinScope.drain()
            val t0 = System.nanoTime()
            val n = SparkEntry.queries(q)(spark, d).count()
            println(f"SWEEP $d $q ${(System.nanoTime() - t0) / 1e9}%.2f s" +
              f" ($n rows)")
          } catch {
            case e: Throwable =>
              println(s"SWEEP $d $q FAILED: ${e.getMessage}")
          } finally PinScope.drain()
        }
        q120prod(d)
      }
    } else {
      for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf01x10")) q120prod(d)
    }
    spark.stop()
  }
}
