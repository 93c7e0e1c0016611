package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SURVEY §13.1 #3 (NOT a declared query):
  * the two-level router's BUILD cost at the 10⁹-vector census point
  * — k = 244k fine cells (the n/cap count where the member cap
  * binds), kc = ⌈√k⌉ ≈ 495 coarse. Synthetic cells: the census-point
  * CELL COUNT with vectors cycled from the 100× corpus pool (a cost
  * measurement needs the row/arithmetic volume, not distinct
  * geometry). Times the fa routing table (k·kc codegen'd distances +
  * the cid-partitioned top-R window) and the per-coarse fine-group
  * aggregation, and prints the packed fine-group byte estimate — the
  * broadcast-ceiling number the build note cares about. */
object ProbeRouterBuild {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pool = operators.SimilarityExtOps
      .latticeFrame(spark, "/tmp/sf100x", Long.MaxValue)
      .where(col("vec_id") % 2 === 0)
      .select((col("vec_id") / 2).cast("long").as("pid"), col("xi"))
    val k = 244000L
    val cents = spark.range(1, k + 1)
      .select(col("id").as("cid"),
              pmod(col("id"), lit(99999L)).as("pid"))
      .join(pool, Seq("pid"))
      .select(col("cid"), col("xi").as("ci"))
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val (coarse, fa) = operators.SimilarityExtOps.twoLevelRouter(cents)
    t("coarse")(coarse)
    t("fa_routing")(fa)
    t("fa_routing2")(fa)
    val packed = fa.groupBy("ccid")
      .agg(collect_list(struct(col("cid"), col("ci"))).as("fc"))
    t("packed_fine_groups")(packed)
    val bytes = k * 9 * (8 + 64 * 8 + 16)
    println(f"PROBE packed_est ${bytes / 1e9}%.2f GB (k=$k R=9)")
    spark.stop()
  }
}
