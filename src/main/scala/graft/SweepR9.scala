package graft
import org.apache.spark.sql.SparkSession
object SweepR9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q46_dedup_minhash", "q101_bpe_tokens",
      "q103_decontaminate_exact_incr", "q104_pipeline_prep",
      "q105_ann_ivfpq", "q106_pack_bpe", "q107_ann_pq_index",
      "q108_clusters_incremental", "q109_stream_dedup_index")
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf01x10")) {
      spark.read.parquet(s"$d/nation.parquet").count()
      for (q <- qs) {
        // run twice, report the second (artifact builds land in run 1)
        SparkEntry.queries(q)(spark, d).count()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, d).count()
        println(f"SWEEP $d $q ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
