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
  */
object SweepR11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val evalCap = 200 // the fixed "release eval suite" size
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf01x10")) {
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
    spark.stop()
  }
}
